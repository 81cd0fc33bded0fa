"""FSD++ seed-box subsystem (W7) — static-shape rebuild of the reference's
seed machinery in ``models/detectors/two_stage_fsdpp.py``:

  * ``seeds_from_output``   — previous detections -> seed boxes
                              (``result2seed`` :817-823 + score filtering
                              ``filter_seed_by_score`` :848-858 + the
                              per-frame cap of ``preprocess_seed`` :838)
  * ``seed_fp_insertion``   — random duplicate boxes shifted +-10 m in xy
                              (``random_fp_insertion`` :860-883)
  * ``seed_dropout_chain``  — track-consistent random seed dropping: frame
                              t's seeds inherit the keep/drop decision of
                              the frame t-1 seed they best overlap (BEV IoU
                              > 0.3), so a dropped object stays dropped for
                              the whole window (``random_drop_seed``
                              :901-940)
  * ``crop_points_by_seeds``— keep only points inside (enlarged) seed
                              boxes, capped per box in scan order
                              (``crop_and_process_points`` :637-680 with
                              ``max_crop_points`` + ``get_inner_win_inds``)
  * ``remove_ground``       — |z| <= 0.2 band filter on the cropped stream
                              (``remove_ground`` :757-761)

Everything is dense/masked: a fixed seed capacity ``S`` with a validity
mask replaces the reference's ragged per-frame lists, so the whole seed
path lives inside one jitted sequence step.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import boxes as box_ops


class Seeds(NamedTuple):
    boxes: jax.Array    # [S, 7]
    labels: jax.Array   # [S] int32
    scores: jax.Array   # [S] float32
    valid: jax.Array    # [S] bool


def empty_seeds(capacity: int) -> Seeds:
    return Seeds(jnp.zeros((capacity, 7)),
                 jnp.zeros((capacity,), jnp.int32),
                 jnp.zeros((capacity,), jnp.float32),
                 jnp.zeros((capacity,), bool))


def seeds_from_output(boxes: jax.Array, labels: jax.Array,
                      scores: jax.Array, valid: jax.Array,
                      capacity: int, score_thr: float = 0.1) -> Seeds:
    """Detector output -> next-frame seeds: filter by score, keep the
    top-``capacity`` by score (the reference's pre_score_thr +
    max_pre_frames truncation)."""
    ok = valid & (scores > score_thr)
    key = jnp.where(ok, scores, -1.0)
    top, idx = jax.lax.top_k(key, capacity)
    return Seeds(boxes[idx], labels[idx].astype(jnp.int32),
                 scores[idx].astype(jnp.float32), top > 0)


def seed_fp_insertion(seeds: Seeds, rng: jax.Array,
                      fp_rate: float) -> Seeds:
    """Append jittered duplicates of a random subset as false-positive
    seeds (training augmentation). Output capacity doubles: the second
    half holds the inserted FPs (masked by the bernoulli draw)."""
    S = seeds.boxes.shape[0]
    r_copy, r_shift = jax.random.split(rng)
    copy = seeds.valid & (jax.random.uniform(r_copy, (S,)) < fp_rate)
    shift = (jax.random.uniform(r_shift, (S, 2)) - 0.5) * 20.0
    fp_boxes = seeds.boxes.at[:, :2].add(shift)
    return Seeds(jnp.concatenate([seeds.boxes, fp_boxes], 0),
                 jnp.concatenate([seeds.labels, seeds.labels], 0),
                 jnp.concatenate([seeds.scores, seeds.scores], 0),
                 jnp.concatenate([seeds.valid, copy], 0))


def seed_dropout_step(prev_boxes, prev_valid, prev_keep, boxes, valid,
                      rng: jax.Array, drop_rate: float,
                      iou_thr: float = 0.3) -> jax.Array:
    """One frame of track-consistent dropout: inherit the keep decision of
    the best-overlapping previous-frame seed (BEV IoU > ``iou_thr``);
    unmatched seeds keep (the reference draws the bernoulli only on the
    base frame, ``random_drop_seed`` :901-916). Pass ``prev_boxes`` None
    for the base frame."""
    if prev_boxes is None:
        fresh = jax.random.uniform(rng, valid.shape) > drop_rate
        return fresh & valid
    iou = box_ops.pairwise_iou_bev(prev_boxes, boxes)
    iou = jnp.where(prev_valid[:, None] & valid[None, :], iou, -1.0)
    best = jnp.max(iou, axis=0)
    best_i = jnp.argmax(iou, axis=0)
    matched = best > iou_thr
    return jnp.where(matched, prev_keep[best_i], True) & valid


def seed_dropout_chain(boxes: jax.Array, valid: jax.Array, rng: jax.Array,
                       drop_rate: float, iou_thr: float = 0.3) -> jax.Array:
    """Track-consistent seed dropout over a window.

    boxes [T, S, 7], valid [T, S] -> keep mask [T, S]. Frame 0 draws a
    bernoulli keep per seed; each later frame matches every seed to the
    best-overlapping (BEV IoU > ``iou_thr``) seed of the PREVIOUS frame and
    inherits its decision, else keeps — the reference chains decisions
    frame-to-frame the same way (``random_drop_seed``)."""
    T, S = valid.shape
    base_keep = jax.random.uniform(rng, (S,)) > drop_rate

    def step(carry, xs):
        prev_boxes, prev_valid, prev_keep = carry
        cur_boxes, cur_valid = xs
        iou = box_ops.pairwise_iou_bev(prev_boxes, cur_boxes)  # [S, S]
        iou = jnp.where(prev_valid[:, None] & cur_valid[None, :], iou, -1.0)
        best = jnp.max(iou, axis=0)
        best_i = jnp.argmax(iou, axis=0)
        matched = best > iou_thr
        keep = jnp.where(matched, prev_keep[best_i], True) & cur_valid
        return (cur_boxes, cur_valid, keep), keep

    keep0 = base_keep & valid[0]
    (_, _, _), keeps = jax.lax.scan(
        step, (boxes[0], valid[0], keep0), (boxes[1:], valid[1:]))
    return jnp.concatenate([keep0[None], keeps], 0)


def crop_points_by_seeds(points: jax.Array, mask: jax.Array, seeds: Seeds,
                         max_crop_points: int = 256,
                         extra_wlh=(1.0, 1.0, 1.0),
                         ground_band: float | None = None) -> jax.Array:
    """Keep mask of points inside any valid (enlarged) seed box, capped at
    ``max_crop_points`` per box in scan order; optionally drop the ground
    band ``|z| <= ground_band`` first. Returns [N] bool."""
    xyz = points[:, :3]
    if ground_band is not None:
        mask = remove_ground(points, mask, ground_band)
    inside = jax.vmap(lambda b: box_ops.points_in_boxes(
        xyz, b, extra_wlh))(seeds.boxes)               # [S, N]
    inside = inside & seeds.valid[:, None] & mask[None, :]
    # box id per point: first containing box (reference's points_in_boxes
    # returns one index per point)
    box_id = jnp.argmax(inside, axis=0)                # [S->] first True
    in_any = jnp.any(inside, axis=0)
    # in-box rank (get_inner_win_inds): running index within each box
    onehot = (jnp.arange(seeds.boxes.shape[0])[:, None] == box_id[None, :]
              ) & in_any[None, :]                      # [S, N]
    rank = jnp.cumsum(onehot, axis=1) - 1              # rank along scan
    my_rank = jnp.sum(jnp.where(onehot, rank, 0), axis=0)
    return in_any & (my_rank < max_crop_points)


def remove_ground(points: jax.Array, mask: jax.Array,
                  band: float = 0.2) -> jax.Array:
    z = points[:, 2]
    return mask & ((z < -band) | (z > band))
