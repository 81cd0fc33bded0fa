"""Test-time augmentation for tracklet refinement.

Rebuild of the reference TTA path (``configs/ococc/ococcnet.py:314-360``
``MultiScaleFlipAug3D`` with double flip + ``LiDARTracklet.merge_augs``
(``lidar_tracklet.py:554``) / ``inverse_aug``
(``tracklet_roi_head_occ.py:746-757``)): run the model on the identity and
flipped variants of a batch, invert each prediction back to the original
frame, and merge — by default with the reference's shipped ``'weighted'``
semantics (score-weighted geometry mean + median yaw), optionally with a
heading-vector mean (``merge='vector'``).
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


def merge_boxes_weighted(box_list: list, score_list: list) -> tuple:
    """The reference's shipped ``merge='weighted'`` semantics
    (``LiDARTracklet.merge_augs``, ``lidar_tracklet.py:568-578``, enabled
    by ``configs/ctrl/ctrl_veh_24e.py:158-160``): score-weighted mean of
    the 6 geometry dims, MEDIAN yaw across augs ("in case of flip"), and
    the plain mean of scores. Executed-parity vs the reference method in
    ``tests/test_serialization_parity.py``."""
    all_boxes = jnp.stack(box_list)           # [A, ..., 7]
    all_scores = jnp.stack(score_list)        # [A, ...]
    geom = (jnp.sum(all_boxes[..., :6] * all_scores[..., None], 0)
            / jnp.sum(all_scores, 0)[..., None])
    yaw = jnp.median(all_boxes[..., 6], axis=0)
    boxes = jnp.concatenate([geom, yaw[..., None]], -1)
    return boxes, jnp.mean(all_scores, 0)


def merge_boxes(box_list: list, score_list: list) -> tuple:
    """Redesigned merge (``merge='vector'``): centers/sizes unweighted
    mean; yaw via the heading-vector mean (sin, cos) anchored to the first
    prediction's orientation to avoid 180-degree cancellation; scores
    mean. Unlike the reference's median-yaw 'weighted' mode this is
    continuous in the inputs; kept as the non-default alternative."""
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
                flips=FLIPS, merge: str = "weighted") -> dict:
    """apply_fn(batch) -> dict with 'boxes' [B, L, 7], 'scores', 'nonempty'.
    Runs each flip variant and merges. ``merge``: 'weighted' (default —
    the reference's shipped mode) or 'vector' (heading-vector mean)."""
    box_list, score_list = [], []
    base = None
    for fh, fv in flips:
        out = apply_fn(flip_batch(batch, fh, fv))
        box_list.append(unflip_boxes(out["boxes"], fh, fv))
        score_list.append(out["scores"])
        if base is None:
            base = out
    merge_fn = merge_boxes_weighted if merge == "weighted" else merge_boxes
    boxes, scores = merge_fn(box_list, score_list)
    return dict(base, boxes=boxes, scores=scores)
