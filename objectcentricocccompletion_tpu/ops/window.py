"""Sparse window partitioning for SST — static-shape, sort-based.

Rebuild of the reference's window machinery
(``ops/sst/sst_ops.py:266-313`` ``get_window_coors``,
``get_inner_win_inds`` (CUDA ``ingroup_indices``), ``flat2window`` /
``window2flat`` and the drop-level batching of
``models/middle_encoders/sst_input_layer_v2.py``).

TPU design: voxels sort by window id; the in-window rank (the CUDA
``ingroup_indices`` kernel) falls out of the sorted layout as
``position - first_position_of_window``; windows compact to a static
``max_windows`` buffer and tokens scatter to a dense
``[max_windows, window_capacity]`` layout with a validity mask. The
reference's drop-levels (per-occupancy token budgets to save attention
compute) are replaced by one fixed capacity — masked attention makes the
extra tokens mathematically inert, and one static shape beats three
recompiled buckets on TPU. Tokens beyond capacity and windows beyond the
budget are dropped, mirroring the reference's voxel dropping.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class WindowPartition(NamedTuple):
    win_of_voxel: jax.Array   # [V] compact window slot (-1 dropped)
    rank_in_win: jax.Array    # [V] token slot within window (-1 dropped)
    coors_in_win: jax.Array   # [V, 3] (x, y, z) position inside the window
    num_windows: jax.Array    # [] int32


def window_ids(coords: jax.Array, valid: jax.Array, sparse_shape,
               window_shape, shifted: bool) -> tuple[jax.Array, jax.Array]:
    """Per-voxel window key + in-window coords (get_window_coors).

    coords: [V, 3] (x, y, z) voxel integer coords.
    """
    sx, sy, sz = sparse_shape
    wx, wy, wz = window_shape
    nx = int(np.ceil(sx / wx)) + 1
    ny = int(np.ceil(sy / wy)) + 1
    nz = int(np.ceil(sz / wz)) + 1
    if shifted:
        ox, oy, oz = wx // 2, wy // 2, wz // 2
    else:
        ox, oy, oz = wx, wy, wz
    if sz == wz:
        oz = 0
    shift = jnp.asarray([ox, oy, oz], jnp.int32)
    sc = coords + shift
    wc = sc // jnp.asarray([wx, wy, wz], jnp.int32)
    key = (wc[:, 0] * (ny * nz) + wc[:, 1] * nz + wc[:, 2])
    key = jnp.where(valid, key, nx * ny * nz + 1)
    inwin = sc % jnp.asarray([wx, wy, wz], jnp.int32)
    return key, inwin


def partition(coords: jax.Array, valid: jax.Array, sparse_shape,
              window_shape, shifted: bool, max_windows: int,
              capacity: int) -> WindowPartition:
    v = coords.shape[0]
    key, inwin = window_ids(coords, valid, sparse_shape, window_shape,
                            shifted)
    big = key.max() + 1  # not used; invalid already big
    order = jnp.argsort(key)
    skey = key[order]
    limit = (int(np.ceil(sparse_shape[0] / window_shape[0])) + 1) * \
            (int(np.ceil(sparse_shape[1] / window_shape[1])) + 1) * \
            (int(np.ceil(sparse_shape[2] / window_shape[2])) + 1)
    ok = skey <= limit
    first = jnp.concatenate([jnp.ones((1,), bool),
                             skey[1:] != skey[:-1]]) & ok
    win_slot_sorted = jnp.cumsum(first) - 1
    num_windows = jnp.sum(first).astype(jnp.int32)
    # rank = index - first index of this window
    idx = jnp.arange(v)
    first_pos = jnp.where(first, idx, 0)
    first_pos = jax.lax.associative_scan(jnp.maximum, first_pos)
    rank_sorted = idx - first_pos

    keep = ok & (win_slot_sorted < max_windows) & (rank_sorted < capacity)
    win_sorted = jnp.where(keep, win_slot_sorted, -1).astype(jnp.int32)
    rank_sorted = jnp.where(keep, rank_sorted, -1).astype(jnp.int32)

    win_of_voxel = jnp.zeros((v,), jnp.int32).at[order].set(win_sorted)
    rank_in_win = jnp.zeros((v,), jnp.int32).at[order].set(rank_sorted)
    return WindowPartition(win_of_voxel, rank_in_win, inwin, num_windows)


def window_counts(part: WindowPartition, max_windows: int) -> jax.Array:
    """[max_windows] token count per compact window slot."""
    ok = part.win_of_voxel >= 0
    seg = jnp.where(ok, part.win_of_voxel, max_windows)
    return jax.ops.segment_sum(ok.astype(jnp.int32), seg,
                               num_segments=max_windows + 1)[:max_windows]


def split_by_occupancy(part: WindowPartition, max_windows: int,
                       small_capacity: int, max_small: int,
                       max_large: int) -> tuple[WindowPartition,
                                                WindowPartition]:
    """Two-level drop-level batching (``sst_input_layer_v2.drop_voxel``):
    windows with <= ``small_capacity`` tokens batch at the small capacity,
    the rest at the full capacity — attention cost scales with T^2, so the
    (typically dominant) sparse windows stop paying for the dense budget.

    Returns (small, large) partitions with compacted window slots."""
    counts = window_counts(part, max_windows)
    occupied = counts > 0
    is_small = occupied & (counts <= small_capacity)
    is_large = occupied & ~is_small
    small_slot = jnp.cumsum(is_small.astype(jnp.int32)) - 1
    large_slot = jnp.cumsum(is_large.astype(jnp.int32)) - 1

    w = part.win_of_voxel
    safe = jnp.clip(w, 0, max_windows - 1)
    valid = w >= 0

    in_small = valid & is_small[safe] & (small_slot[safe] < max_small)
    win_small = jnp.where(in_small, small_slot[safe], -1).astype(jnp.int32)
    rank_small = jnp.where(in_small, part.rank_in_win, -1)

    in_large = valid & is_large[safe] & (large_slot[safe] < max_large)
    win_large = jnp.where(in_large, large_slot[safe], -1).astype(jnp.int32)
    rank_large = jnp.where(in_large, part.rank_in_win, -1)

    n_small = jnp.minimum(jnp.sum(is_small), max_small).astype(jnp.int32)
    n_large = jnp.minimum(jnp.sum(is_large), max_large).astype(jnp.int32)
    return (WindowPartition(win_small, rank_small, part.coors_in_win,
                            n_small),
            WindowPartition(win_large, rank_large, part.coors_in_win,
                            n_large))


def flat_to_window(feats: jax.Array, part: WindowPartition,
                   max_windows: int, capacity: int
                   ) -> tuple[jax.Array, jax.Array]:
    """[V, C] -> ([max_windows, capacity, C], token mask)."""
    ok = (part.win_of_voxel >= 0) & (part.rank_in_win >= 0)
    w = jnp.where(ok, part.win_of_voxel, max_windows)
    r = jnp.where(ok, part.rank_in_win, 0)
    out = jnp.zeros((max_windows + 1, capacity, feats.shape[-1]),
                    feats.dtype)
    out = out.at[w, r].set(jnp.where(ok[:, None], feats, 0.0), mode="drop")
    m = jnp.zeros((max_windows + 1, capacity), bool)
    m = m.at[w, r].set(ok, mode="drop")
    return out[:max_windows], m[:max_windows]


def window_to_flat(wfeats: jax.Array, part: WindowPartition,
                   num_voxels: int) -> jax.Array:
    """[max_windows, capacity, C] -> [V, C]; dropped voxels get zeros."""
    ok = (part.win_of_voxel >= 0) & (part.rank_in_win >= 0)
    w = jnp.clip(part.win_of_voxel, 0, wfeats.shape[0] - 1)
    r = jnp.clip(part.rank_in_win, 0, wfeats.shape[1] - 1)
    out = wfeats[w, r]
    return jnp.where(ok[:, None], out, 0.0)
