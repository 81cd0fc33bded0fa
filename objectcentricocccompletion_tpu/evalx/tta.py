"""Test-time augmentation for tracklet refinement.

Rebuild of the reference TTA path (``configs/ococc/ococcnet.py:314-360``
``MultiScaleFlipAug3D`` with double flip + ``LiDARTracklet.merge_augs``
(``lidar_tracklet.py:554``) / ``inverse_aug``
(``tracklet_roi_head_occ.py:746-757``)): run the model on the identity and
flipped variants of a batch, invert each prediction back to the original
frame, and average centers/sizes/scores with heading-aware yaw merging.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..models.ococcnet import TrackletBatch

FLIPS = ((False, False), (True, False), (False, True), (True, True))


def flip_batch(batch: TrackletBatch, fh: bool, fv: bool) -> TrackletBatch:
    """Apply BEV flips to points and boxes (horizontal: y -> -y,
    yaw -> pi - yaw; vertical: x -> -x, yaw -> -yaw)."""
    pts = batch.points
    rois = batch.rois
    gt = batch.gt_boxes
    if fh:
        pts = pts.at[..., 1].multiply(-1)
        rois = rois.at[..., 1].multiply(-1).at[..., 6].multiply(-1) \
            .at[..., 6].add(jnp.pi)
        gt = gt.at[..., 1].multiply(-1).at[..., 6].multiply(-1) \
            .at[..., 6].add(jnp.pi)
    if fv:
        pts = pts.at[..., 0].multiply(-1)
        rois = rois.at[..., 0].multiply(-1).at[..., 6].multiply(-1)
        gt = gt.at[..., 0].multiply(-1).at[..., 6].multiply(-1)
    return batch._replace(points=pts, rois=rois, gt_boxes=gt)


def unflip_boxes(boxes: jax.Array, fh: bool, fv: bool) -> jax.Array:
    """Inverse of the box flip (flips are involutions)."""
    if fv:
        boxes = boxes.at[..., 0].multiply(-1).at[..., 6].multiply(-1)
    if fh:
        boxes = boxes.at[..., 6].add(-jnp.pi).at[..., 6].multiply(-1) \
            .at[..., 1].multiply(-1)
    return boxes


def merge_boxes(box_list: list, score_list: list) -> tuple:
    """Average aligned predictions: centers/sizes mean; yaw via the
    heading-vector mean (sin, cos) anchored to the first prediction's
    orientation to avoid 180-degree cancellation; scores mean."""
    ref = box_list[0]
    sins, coss = [], []
    for b in box_list:
        d = b[..., 6] - ref[..., 6]
        # flip candidates facing opposite the reference
        flip = jnp.cos(d) < 0
        yaw = jnp.where(flip, b[..., 6] + jnp.pi, b[..., 6])
        sins.append(jnp.sin(yaw))
        coss.append(jnp.cos(yaw))
    yaw = jnp.arctan2(sum(sins) / len(sins), sum(coss) / len(coss))
    geom = sum(b[..., :6] for b in box_list) / len(box_list)
    boxes = jnp.concatenate([geom, yaw[..., None]], -1)
    scores = sum(score_list) / len(score_list)
    return boxes, scores


def predict_tta(apply_fn, batch: TrackletBatch,
                flips=FLIPS) -> dict:
    """apply_fn(batch) -> dict with 'boxes' [B, L, 7], 'scores', 'nonempty'.
    Runs each flip variant and merges."""
    box_list, score_list = [], []
    base = None
    for fh, fv in flips:
        out = apply_fn(flip_batch(batch, fh, fv))
        box_list.append(unflip_boxes(out["boxes"], fh, fv))
        score_list.append(out["scores"])
        if base is None:
            base = out
    boxes, scores = merge_boxes(box_list, score_list)
    return dict(base, boxes=boxes, scores=scores)
