"""Dynamic voxelization + segment substrate — static-shape, sort-based.

TPU-native replacement for the reference's ``voxel_layer`` CUDA extension
(``ops/voxel/src/``: ``dynamic_voxelize`` point->voxel coords with OOB -> -1,
``DynamicScatter`` mean/max per voxel) and the ``torch.unique``-driven
``scatter_v2`` pattern used by every dynamic VFE
(``ops/sst/sst_ops.py:150-181``).

Design: no torch.unique / no data-dependent shapes. Points hash to linearized
voxel ids; a single sort groups them; "unique" voxel slots are the sorted
first-occurrences, compacted to a static ``max_voxels`` buffer. Every output
carries a validity mask. Downstream segment reductions use
``jax.ops.segment_*`` with the static voxel count.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class VoxelizeResult(NamedTuple):
    coords: jax.Array       # [V, 3] int32 voxel integer coords (z, y, x
                            # ordering NOT applied — stored as (x, y, z))
    voxel_valid: jax.Array  # [V] bool
    point2voxel: jax.Array  # [N] int32 index into the V buffer (-1 invalid)
    point_valid: jax.Array  # [N] bool (input mask & in-range)
    num_voxels: jax.Array   # [] int32


def compute_voxel_coords(points: jax.Array, voxel_size, pc_range
                         ) -> tuple[jax.Array, jax.Array]:
    """Integer voxel coords + in-range mask for points [..., 3]."""
    vs = jnp.asarray(voxel_size, points.dtype)
    lo = jnp.asarray(pc_range[:3], points.dtype)
    hi = jnp.asarray(pc_range[3:], points.dtype)
    grid = jnp.floor((jnp.asarray(pc_range[3:]) - jnp.asarray(pc_range[:3]))
                     / jnp.asarray(voxel_size)).astype(jnp.int32)
    coords = jnp.floor((points - lo) / vs).astype(jnp.int32)
    in_range = jnp.all((points >= lo) & (points < hi), axis=-1)
    coords = jnp.clip(coords, 0, grid - 1)
    return coords, in_range


def voxelize(points: jax.Array, mask: jax.Array, voxel_size, pc_range,
             max_voxels: int) -> VoxelizeResult:
    """points [N, >=3]; mask [N]. Static output with V = max_voxels."""
    n = points.shape[0]
    coords, in_range = compute_voxel_coords(points[:, :3], voxel_size,
                                            pc_range)
    valid = mask & in_range
    grid = jnp.floor((jnp.asarray(pc_range[3:]) - jnp.asarray(pc_range[:3]))
                     / jnp.asarray(voxel_size)).astype(jnp.int32)
    key = (coords[:, 0].astype(jnp.int32) * grid[1] * grid[2]
           + coords[:, 1].astype(jnp.int32) * grid[2]
           + coords[:, 2].astype(jnp.int32))
    big = grid[0] * grid[1] * grid[2] + 1
    key = jnp.where(valid, key, big)

    order = jnp.argsort(key)
    skey = key[order]
    first = jnp.concatenate(
        [jnp.ones((1,), bool), skey[1:] != skey[:-1]]) & (skey < big)
    # voxel slot of each sorted point = running count of firsts - 1
    slot_sorted = jnp.cumsum(first) - 1
    num_voxels = jnp.sum(first).astype(jnp.int32)
    slot_sorted = jnp.where(skey < big, slot_sorted, -1)

    # scatter voxel coords into the static buffer from first-occurrences
    vcoords = jnp.zeros((max_voxels, 3), jnp.int32)
    src_idx = jnp.where(first, slot_sorted, max_voxels)
    vcoords = vcoords.at[src_idx].set(coords[order], mode="drop")
    voxel_valid = jnp.arange(max_voxels) < num_voxels

    # map back to input order
    p2v = jnp.full((n,), -1, jnp.int32)
    p2v = p2v.at[order].set(jnp.where(slot_sorted < max_voxels,
                                      slot_sorted, -1).astype(jnp.int32))
    p2v = jnp.where(valid, p2v, -1)
    return VoxelizeResult(vcoords, voxel_valid, p2v, valid, num_voxels)


def scatter_to_voxels(feats: jax.Array, p2v: jax.Array, max_voxels: int,
                      mode: str = "max") -> jax.Array:
    """Per-voxel reduction of point features (scatter_v2 equivalent).

    feats [N, C]; p2v [N] with -1 for dropped points. Invalid points map to
    an overflow slot that is sliced away.
    """
    seg = jnp.where(p2v >= 0, p2v, max_voxels)
    if mode == "max":
        out = jax.ops.segment_max(feats, seg, num_segments=max_voxels + 1)
        out = jnp.where(jnp.isfinite(out), out, 0.0)
    elif mode in ("mean", "avg"):
        s = jax.ops.segment_sum(feats, seg, num_segments=max_voxels + 1)
        c = jax.ops.segment_sum(jnp.ones_like(feats[:, :1]), seg,
                                num_segments=max_voxels + 1)
        out = s / jnp.clip(c, 1, None)
    elif mode == "sum":
        out = jax.ops.segment_sum(feats, seg, num_segments=max_voxels + 1)
    else:
        raise ValueError(mode)
    return out[:max_voxels]


def gather_from_voxels(vfeats: jax.Array, p2v: jax.Array) -> jax.Array:
    """Broadcast voxel features back to points (map_voxel_center_to_point)."""
    safe = jnp.clip(p2v, 0, vfeats.shape[0] - 1)
    out = vfeats[safe]
    return jnp.where((p2v >= 0)[:, None], out, 0.0)
