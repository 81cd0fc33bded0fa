"""Incremental (voxel-diff) point selection for FSD++ (W7).

Rebuild of ``models/detectors/incremental_ops.py:14-188``: given previous
frames' points and the current frame, keep only current points whose voxel
cell was NOT occupied by any previous frame. The torch.unique set-difference
becomes a sorted-key membership test with static shapes: hash both coord
sets, sort the reference set, binary-search the queries.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _hash(points: jax.Array, mask: jax.Array, voxel_size, pc_range
          ) -> jax.Array:
    vs = jnp.asarray(voxel_size, points.dtype)
    lo = jnp.asarray(pc_range[:3], points.dtype)
    grid = np.floor((np.asarray(pc_range[3:]) - np.asarray(pc_range[:3]))
                    / np.asarray(voxel_size)).astype(np.int64) + 1
    assert int(grid.prod()) < 2**31, "grid too large for int32 keys"
    c = jnp.floor((points[:, :3] - lo) / vs).astype(jnp.int32)
    c = jnp.clip(c, 0, jnp.asarray(grid - 1, jnp.int32))
    key = (c[:, 0] * int(grid[1] * grid[2]) + c[:, 1] * int(grid[2])
           + c[:, 2])
    return jnp.where(mask, key, jnp.int32(grid.prod()))


def incremental_points_mask(prev_points: jax.Array, prev_mask: jax.Array,
                            cur_points: jax.Array, cur_mask: jax.Array,
                            voxel_size, pc_range) -> jax.Array:
    """True for current points in voxels unseen by the previous points
    (``find_delta_points_by_voxelization`` semantics)."""
    pk = _hash(prev_points, prev_mask, voxel_size, pc_range)
    ck = _hash(cur_points, cur_mask, voxel_size, pc_range)
    sorted_prev = jnp.sort(pk)
    pos = jnp.clip(jnp.searchsorted(sorted_prev, ck), 0,
                   sorted_prev.shape[0] - 1)
    seen = sorted_prev[pos] == ck
    return cur_mask & ~seen
