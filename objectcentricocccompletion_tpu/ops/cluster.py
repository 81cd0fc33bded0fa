"""On-device connected-component clustering over a sparse voxel grid.

TPU-native replacement for FSD's CPU scipy ``connected_components`` call
(``models/detectors/single_stage_fsd.py:26, 922-1000``) — the reference's
host round-trip becomes iterative min-label propagation over the voxel hash
grid: every active voxel repeatedly adopts the minimum label in its
neighborhood. With pointer-jumping (label -> label[label]) convergence is
logarithmic in cluster diameter; a fixed iteration count makes the whole
thing one jitted loop.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import sparse_conv as sc


def connected_components(coords: jax.Array, valid: jax.Array,
                         grid_shape, connect_radius: int = 1,
                         num_iters: int = 16) -> jax.Array:
    """coords [V, 3] int32 active voxels; returns [V] int32 component labels
    (equal label = same component; -1 for invalid)."""
    v = coords.shape[0]
    grid = sc.build_grid(coords, valid, grid_shape)
    r = connect_radius
    offs = np.stack(np.meshgrid(*([np.arange(-r, r + 1)] * 3),
                                indexing="ij"), -1).reshape(-1, 3)
    offs = offs[np.any(offs != 0, axis=1)]
    table = sc.neighbor_table(grid, coords, valid, offs)  # [K, V]

    labels0 = jnp.where(valid, jnp.arange(v, dtype=jnp.int32), jnp.int32(v))

    def body(_, labels):
        neigh = jnp.where(table >= 0, labels[jnp.clip(table, 0, v - 1)],
                          jnp.int32(v))
        m = jnp.min(neigh, axis=0)
        labels = jnp.minimum(labels, m)
        # pointer jumping: label <- label[label]
        labels = jnp.where(labels < v, labels[jnp.clip(labels, 0, v - 1)],
                           labels)
        return labels

    labels = jax.lax.fori_loop(0, num_iters, body, labels0)
    return jnp.where(valid, labels, -1)


def connected_components_dist(coords: jax.Array, valid: jax.Array,
                              grid_shape, centers: jax.Array,
                              connect_dist: float,
                              window_radius: int = 2,
                              num_iters: int = 16) -> jax.Array:
    """Distance-constrained CC — the reference ``find_connected_componets``
    semantics (``single_stage_fsd.py:26-60``): voxels are linked only when
    their mean centers lie within ``connect_dist`` in the xy-plane.

    coords [V, 3] voxel integer coords; centers [V, 3] per-voxel mean of
    member points; candidates come from a ``(2r+1)^2`` xy voxel window (pick
    ``window_radius >= ceil(connect_dist / voxel_xy)``), the distance test
    prunes them. Returns [V] labels (-1 invalid)."""
    v = coords.shape[0]
    grid = sc.build_grid(coords, valid, grid_shape)
    r = window_radius
    offs = np.stack(np.meshgrid(np.arange(-r, r + 1), np.arange(-r, r + 1),
                                np.arange(1), indexing="ij"),
                    -1).reshape(-1, 3)
    offs = offs[np.any(offs != 0, axis=1)]
    table = sc.neighbor_table(grid, coords, valid, offs)  # [K, V]

    safe = jnp.clip(table, 0, v - 1)
    d2 = jnp.sum(
        (centers[safe][..., :2] - centers[None, :, :2]) ** 2, axis=-1)
    linked = (table >= 0) & (d2 < connect_dist ** 2)      # [K, V]

    labels0 = jnp.where(valid, jnp.arange(v, dtype=jnp.int32), jnp.int32(v))

    def body(_, labels):
        neigh = jnp.where(linked, labels[safe], jnp.int32(v))
        m = jnp.min(neigh, axis=0)
        labels = jnp.minimum(labels, m)
        labels = jnp.where(labels < v, labels[jnp.clip(labels, 0, v - 1)],
                           labels)
        return labels

    labels = jax.lax.fori_loop(0, num_iters, body, labels0)
    return jnp.where(valid, labels, -1)


def compact_labels(labels: jax.Array, max_clusters: int
                   ) -> tuple[jax.Array, jax.Array]:
    """Relabel arbitrary component ids to compact [0, C); -1 stays -1.

    Returns (compact labels [V], num_clusters)."""
    v = labels.shape[0]
    valid = labels >= 0
    big = jnp.iinfo(jnp.int32).max
    key = jnp.where(valid, labels, big)
    order = jnp.argsort(key)
    skey = key[order]
    sval = valid[order]
    first = jnp.concatenate([jnp.ones((1,), bool),
                             skey[1:] != skey[:-1]]) & sval
    slot = jnp.cumsum(first) - 1
    num = jnp.sum(first).astype(jnp.int32)
    compact_sorted = jnp.where(sval, slot, -1).astype(jnp.int32)
    out = jnp.zeros((v,), jnp.int32).at[order].set(compact_sorted)
    out = jnp.where(out < max_clusters, out, -1)
    return jnp.where(valid, out, -1), jnp.minimum(num, max_clusters)
