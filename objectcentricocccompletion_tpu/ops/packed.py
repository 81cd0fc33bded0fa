"""Packed segment layout for per-RoI point workloads.

The dense ``[B, L, P]`` RoI layout (``ops/roi_pool.py``) pays the full point
budget ``P`` for every RoI even though real tracklet frames are mostly far
sparser. This module provides the reference's global-budget design
(``max_all_pts``, ``ops/dynamic_point_pool_op.py:29-35``) as a TPU-native
packed layout: the valid points of all ``L`` frames of a tracklet compact
into ONE ``[B, N]`` buffer (``N ~ L * avg_occupancy``) plus per-point segment
(frame) ids, so every per-point matmul/LayerNorm downstream scales with the
*actual* number of points instead of the worst-case budget.

Reductions and broadcasts over the packed layout avoid scatters entirely
(measured 4x slower than the alternatives on v5e):
  * segment max   — masked broadcast-compare ``max_n(where(id==s, x, -inf))``
                    which XLA fuses into a single pass over ``x``,
  * segment sum   — one-hot matmul on the MXU,
  * broadcast-back— row gather from the tiny ``[B, S, C]`` table.

Truncation semantics when a tracklet holds more valid points than ``N``:
by default (``balance=True``) the budget waterfills — every frame keeps up
to an adaptive cap ``T`` (the largest integer with ``sum_l min(c_l, T) <=
N``), so dense close-range frames subsample evenly (the same flavor of
truncation as the reference's per-frame ``max_points=1024`` and per-RoI
``max_inbox_point`` caps) and no frame loses all its points. With
``balance=False`` the pack is a plain stable valid-first sort of the flat
``[L*P]`` buffer, dropping the latest frames' overflow first — the
block-layout truncation of the reference's ``max_all_pts``
(``dynamic_point_pool_op.py:30,35``).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class PackedPoints(NamedTuple):
    order: jax.Array     # [B, N] int32 indices into the flat [L*P] layout
    seg_ids: jax.Array   # [B, N] int32 frame id; == num_segments when invalid
    valid: jax.Array     # [B, N] bool
    # block-aligned mode only (pack_groups_aligned): segment id per
    # ``quantum``-sized block, [B, N // quantum]; None in plain mode
    block_seg: jax.Array | None = None


def pack_groups(mask: jax.Array, budget: int,
                balance: bool = True) -> PackedPoints:
    """Build the packed index set from a ``[B, L, P]`` validity mask.

    Valid points of every frame compact to the front of a ``[B, budget]``
    buffer in (frame, point) order; invalid slots point at the overflow
    segment ``L``. See the module docstring for the over-budget semantics
    of ``balance``.
    """
    B, L, P = mask.shape
    if balance:
        mask = waterfill_cap(mask, budget)
    flat = mask.reshape(B, L * P)
    order = jnp.argsort(~flat, axis=-1, stable=True)[:, :budget]
    valid = jnp.take_along_axis(flat, order, axis=-1)
    seg_ids = jnp.where(valid, order // P, L).astype(jnp.int32)
    return PackedPoints(order.astype(jnp.int32), seg_ids, valid)


def pack_groups_aligned(mask: jax.Array, budget: int,
                        quantum: int = 128) -> PackedPoints:
    """Block-aligned packing: each frame's points start at a
    ``quantum``-aligned offset, so every quantum-sized block of the packed
    buffer belongs to EXACTLY ONE frame. Segment reductions then collapse
    to a dense per-block masked max (one pass over the data, the same cost
    profile as the dense [B, L, P] layout) plus a tiny combine over the
    [B, N/quantum] block maxima — no O(num_segments) compare per element.

    The price is fragmentation: up to ``quantum - 1`` wasted slots per
    frame. The waterfill budget accounts for the aligned footprint
    (``sum_l ceil(min(c_l, T)/quantum)*quantum <= budget``).
    """
    B, L, P = mask.shape
    assert budget % quantum == 0, (budget, quantum)
    # every frame must be able to claim at least one block, else the
    # aligned waterfill could zero out the whole tracklet
    assert budget >= L * quantum, (budget, L, quantum)
    counts = jnp.sum(mask, axis=-1)                      # [B, L]

    def fits(T):
        padded = jnp.ceil(jnp.minimum(counts, T[:, None]) / quantum
                          ) * quantum
        return jnp.sum(padded, axis=-1) <= budget

    lo = jnp.zeros((B,), jnp.int32)
    hi = jnp.full((B,), P, jnp.int32)
    for _ in range(P.bit_length()):
        mid = (lo + hi + 1) // 2
        ok = fits(mid)
        lo = jnp.where(ok, mid, lo)
        hi = jnp.where(ok, hi, mid - 1)
    cap = lo[:, None]                                    # [B, 1]
    kept = jnp.minimum(counts, cap)                      # [B, L]
    base = (jnp.cumsum(jnp.ceil(kept / quantum).astype(jnp.int32),
                       axis=-1) - jnp.ceil(kept / quantum).astype(jnp.int32)
            ) * quantum                                  # [B, L] exclusive

    rank = jnp.cumsum(mask, axis=-1) - 1                 # within-frame rank
    keep = mask & (rank < cap[..., None])
    dest = jnp.where(keep, base[..., None] + rank, budget)  # [B, L, P]
    flatdest = dest.reshape(B, L * P)
    # order[d] = flat point index whose destination is slot d (inverse
    # permutation; destinations have alignment gaps, so invert by scatter
    # — out-of-budget destinations drop)
    flat_idx = jnp.broadcast_to(
        jnp.arange(L * P, dtype=jnp.int32), (B, L * P))
    inv = jnp.full((B, budget), -1, jnp.int32)
    binx = jnp.arange(B)[:, None]
    inv = inv.at[binx, flatdest].set(flat_idx, mode="drop")
    slot_filled = inv >= 0
    order = jnp.where(slot_filled, inv, 0).astype(jnp.int32)
    seg_src = jnp.broadcast_to(jnp.arange(L)[None, :, None],
                               (B, L, P)).reshape(B, L * P)
    seg_ids = jnp.where(
        slot_filled,
        jnp.take_along_axis(seg_src, order, axis=-1),
        L).astype(jnp.int32)
    # block segment: every block lies inside one frame by construction
    block_seg = seg_ids.reshape(B, budget // quantum, quantum)[:, :, 0]
    return PackedPoints(order, seg_ids, slot_filled, block_seg)


def segment_max_blocked(x: jax.Array, valid: jax.Array,
                        block_seg: jax.Array, num_segments: int,
                        neg: float = -1e30) -> jax.Array:
    """Segment max over a block-aligned packed layout: dense masked max
    within each quantum block, then a one-hot max over the few block
    maxima. x [B, N, C], valid [B, N], block_seg [B, NB] -> [B, S, C]."""
    B, N, C = x.shape
    NB = block_seg.shape[1]
    q = N // NB
    xb = x.reshape(B, NB, q, C)
    vb = valid.reshape(B, NB, q)
    bmax = jnp.max(jnp.where(vb[..., None], xb, neg), axis=2)  # [B, NB, C]
    oh = block_seg[..., None] == jnp.arange(num_segments)      # [B, NB, S]
    out = jnp.max(jnp.where(oh[..., None], bmax[:, :, None, :], neg),
                  axis=1)
    nonempty = jnp.any(oh, axis=1)
    return jnp.where(nonempty[..., None], out, 0.0)


def segment_mean_blocked(x: jax.Array, valid: jax.Array,
                         block_seg: jax.Array,
                         num_segments: int) -> jax.Array:
    """Blocked counterpart of :func:`segment_mean`."""
    B, N, C = x.shape
    NB = block_seg.shape[1]
    q = N // NB
    xb = jnp.where(valid[..., None], x, 0.0).reshape(B, NB, q, C)
    bsum = jnp.sum(xb, axis=2)                                 # [B, NB, C]
    bcnt = jnp.sum(valid.reshape(B, NB, q), axis=2)            # [B, NB]
    oh = (block_seg[..., None] == jnp.arange(num_segments)
          ).astype(x.dtype)                                    # [B, NB, S]
    s = jnp.einsum("bns,bnc->bsc", oh, bsum)
    n = jnp.einsum("bns,bn->bs", oh, bcnt.astype(x.dtype))
    return s / jnp.clip(n[..., None], 1, None)


def waterfill_cap(mask: jax.Array, budget: int) -> jax.Array:
    """Cap each frame's valid count at the largest per-sample ``T`` with
    ``sum_l min(count_l, T) <= budget`` (vectorized binary search), keeping
    each frame's first ``T`` valid points. Leaves under-budget samples
    untouched."""
    B, L, P = mask.shape
    counts = jnp.sum(mask, axis=-1)                      # [B, L] int

    def fits(T):  # [B] total under cap T [B]
        return jnp.sum(jnp.minimum(counts, T[:, None]), axis=-1) <= budget

    lo = jnp.zeros((B,), jnp.int32)
    hi = jnp.full((B,), P, jnp.int32)
    # invariant: fits(lo) always true (lo=0), search the largest fitting T
    for _ in range(P.bit_length()):
        mid = (lo + hi + 1) // 2
        ok = fits(mid)
        lo = jnp.where(ok, mid, lo)
        hi = jnp.where(ok, hi, mid - 1)
    rank = jnp.cumsum(mask, axis=-1) - 1                 # within-frame rank
    return mask & (rank < lo[:, None, None])


def pack_rows(x: jax.Array, order: jax.Array) -> jax.Array:
    """Gather per-point rows into the packed layout.

    x: [B, L, P, C] or [B, L, P]; order: [B, N]. Returns [B, N, C] / [B, N].
    """
    if x.ndim == 3:
        B, L, P = x.shape
        return jnp.take_along_axis(x.reshape(B, L * P), order, axis=-1)
    B, L, P, C = x.shape
    return jnp.take_along_axis(
        x.reshape(B, L * P, C), order[..., None], axis=1)


import os

_USE_SCATTER = [os.environ.get("OCOCC_SEG_SCATTER", "0") == "1"]


def set_segment_max_impl(scatter: bool) -> None:
    """Switch the packed segment-max between the fused one-hot
    broadcast-compare (default) and a vmapped sorted scatter-max."""
    _USE_SCATTER[0] = bool(scatter)


def segment_max(x: jax.Array, seg_ids: jax.Array, num_segments: int,
                neg: float = -1e30) -> jax.Array:
    """Max over each segment; empty segments get 0 (the reference's
    empty-RoI alignment, ``fsd_bbox_head.py:252-273``).

    x: [B, N, C]; seg_ids: [B, N] (invalid rows carry id >= num_segments).
    Returns [B, num_segments, C].
    """
    if _USE_SCATTER[0]:
        def one(xi, si):
            return jax.ops.segment_max(
                xi, si, num_segments=num_segments + 1,
                indices_are_sorted=True)[:num_segments]
        out = jax.vmap(one)(x, jnp.minimum(seg_ids, num_segments))
        return jnp.where(jnp.isfinite(out) & (out > neg / 2), out, 0.0)
    oh = seg_ids[..., None] == jnp.arange(num_segments)      # [B, N, S]
    out = jnp.max(jnp.where(oh[..., None], x[:, :, None, :], neg), axis=1)
    nonempty = jnp.any(oh, axis=1)                           # [B, S]
    return jnp.where(nonempty[..., None], out, 0.0)


def segment_sum(x: jax.Array, seg_ids: jax.Array,
                num_segments: int) -> jax.Array:
    """One-hot-matmul segment sum (MXU). x: [B, N, C] -> [B, S, C]."""
    oh = (seg_ids[..., None] == jnp.arange(num_segments)).astype(x.dtype)
    return jnp.einsum("bns,bnc->bsc", oh, x)


def segment_mean(x: jax.Array, seg_ids: jax.Array,
                 num_segments: int) -> jax.Array:
    oh = (seg_ids[..., None] == jnp.arange(num_segments)).astype(x.dtype)
    s = jnp.einsum("bns,bnc->bsc", oh, x)
    n = jnp.sum(oh, axis=1)[..., None]
    return s / jnp.clip(n, 1, None)


def segment_any(seg_ids: jax.Array, num_segments: int) -> jax.Array:
    """[B, S] bool: segment has at least one packed point."""
    return jnp.any(seg_ids[..., None] == jnp.arange(num_segments), axis=1)


def broadcast_back(g: jax.Array, seg_ids: jax.Array) -> jax.Array:
    """Per-segment features back to their points: [B, S, C], [B, N] ->
    [B, N, C]. Out-of-range (invalid) ids clamp — callers mask anyway."""
    S = g.shape[1]
    ids = jnp.clip(seg_ids, 0, S - 1)
    return jnp.take_along_axis(g, ids[..., None], axis=1)


def broadcast_back_blocked(g: jax.Array, block_seg: jax.Array,
                           n_points: int) -> jax.Array:
    """Blocked broadcast-back: gather per BLOCK (budget/quantum rows)
    and broadcast within each block for free — [B, S, C], [B, NB] ->
    [B, n_points, C] with n_points = NB * quantum."""
    B, S, C = g.shape
    NB = block_seg.shape[1]
    q = n_points // NB
    ids = jnp.clip(block_seg, 0, S - 1)
    gb = jnp.take_along_axis(g, ids[..., None], axis=1)     # [B, NB, C]
    return jnp.broadcast_to(gb[:, :, None, :], (B, NB, q, C)).reshape(
        B, n_points, C)
