"""Submanifold / strided sparse 3D convolution — gather-GEMM formulation.

TPU-native replacement for spconv 2.x (``SubMConv3d``/``SparseConv3d``, used
by the reference's ``SparseEncoder`` (CenterPoint) and ``SimpleSparseUNet``
(FSD/CTRL); see ``ops/spconv`` + ``overwrite_spconv/write_spconv2.py``).

Instead of CUDA rule tables + gather-scatter GEMM, neighbor lookup is a
binary search over sorted linearized voxel keys (static shapes, XLA-friendly)
and the conv is K=27 gathers feeding one batched ``[K, V, Cin] x
[K, Cin, Cout]`` einsum on the MXU. Missing neighbors gather zeros, matching
sparse-conv semantics exactly.

All buffers are padded to a static ``max_voxels``; validity masks flow
through. This is the "bucketed gather -> dense GEMM" design called out in
SURVEY.md section 7 step 6.
"""
from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np


class SparseGrid(NamedTuple):
    """A set of active voxels with a search structure."""
    coords: jax.Array        # [V, 3] int32 (x, y, z)
    valid: jax.Array         # [V] bool
    sorted_keys: jax.Array   # [V] int64 (invalid -> +inf key)
    sorted_to_slot: jax.Array  # [V] int32: position in coords for sorted key
    grid_shape: tuple        # static (gx, gy, gz)
    # [gx*gy*gz] int32 linear-key -> slot (-1 empty); None for huge grids.
    # O(1) gather lookup instead of O(log V) binary search per query;
    # default whenever the map fits in HBM (both paths verified equal).
    dense_index: jax.Array | None = None


def _keys(coords: jax.Array, valid: jax.Array, grid_shape) -> jax.Array:
    gx, gy, gz = grid_shape
    # int32 linearized keys: every realistic LiDAR grid fits (e.g. 4096 x
    # 4096 x 120 = 2.01e9 < 2^31); guard against silent overflow.
    assert int(gx) * int(gy) * int(gz) + 1 < 2**31, (
        f"voxel grid {grid_shape} overflows int32 keys")
    key = (coords[:, 0].astype(jnp.int32) * (gy * gz)
           + coords[:, 1].astype(jnp.int32) * gz
           + coords[:, 2].astype(jnp.int32))
    return jnp.where(valid, key, jnp.int32(gx) * gy * gz + 1)


# dense index allowed up to this many cells (int32 -> 512 MB HBM at 2^27).
# The alternative — searchsorted over sorted keys — measured 689 ms/step on
# the full-scale CenterPoint encoder (48% of the whole train step): TPU
# lowers the per-query binary search to a serial chain of gathers. The
# dense map is one scatter + O(1) gather lookups and the 512 MB transient
# is cheap next to that (BENCH_NOTES).
DENSE_INDEX_MAX_CELLS = 2 ** 27


def build_grid(coords: jax.Array, valid: jax.Array,
               grid_shape: Sequence[int],
               dense_index: bool | None = None) -> SparseGrid:
    """``dense_index``: force (True/False) or auto (None: dense when the
    grid has <= DENSE_INDEX_MAX_CELLS cells)."""
    grid_shape = tuple(int(g) for g in grid_shape)
    n_cells = grid_shape[0] * grid_shape[1] * grid_shape[2]
    if dense_index is None:
        dense_index = n_cells <= DENSE_INDEX_MAX_CELLS
    key = _keys(coords, valid, grid_shape)
    if dense_index:
        V = coords.shape[0]
        # layout: [1 lead pad][n_cells cells][3 tail pad]. The lead pad
        # keeps z-triple slice gathers starting at cell -1 in bounds
        # (neighbor_table fast path); invalid rows carry the sentinel key
        # n_cells+1 -> tail pad. lookup masks both via query validity.
        dense = jnp.full((n_cells + 4,), -1, jnp.int32)
        dense = dense.at[key + 1].set(jnp.arange(V, dtype=jnp.int32))
        empty = jnp.zeros((0,), jnp.int32)
        return SparseGrid(coords, valid, empty, empty, grid_shape, dense)
    order = jnp.argsort(key)
    return SparseGrid(coords, valid, key[order], order.astype(jnp.int32),
                      grid_shape, None)


def lookup(grid: SparseGrid, query_coords: jax.Array,
           query_valid: jax.Array) -> jax.Array:
    """Index (into grid.coords) of each query coord, or -1 if absent."""
    gx, gy, gz = grid.grid_shape
    in_bounds = jnp.all(
        (query_coords >= 0)
        & (query_coords < jnp.asarray([gx, gy, gz], jnp.int32)), axis=-1)
    qv = query_valid & in_bounds
    qkey = _keys(query_coords, qv, grid.grid_shape)
    if grid.dense_index is not None:
        n = grid.dense_index.shape[0]
        slot = grid.dense_index[jnp.clip(qkey + 1, 0, n - 1)]
        # qv already excludes out-of-bounds queries, whose sentinel key
        # points at the (garbage) pad slots beyond n_cells
        return jnp.where(qv & (qkey < n), slot, -1)
    pos = jnp.searchsorted(grid.sorted_keys, qkey)
    pos = jnp.clip(pos, 0, grid.sorted_keys.shape[0] - 1)
    hit = (grid.sorted_keys[pos] == qkey) & qv
    slot = grid.sorted_to_slot[pos]
    return jnp.where(hit, slot, -1)


def kernel_offsets(ksize: int | Sequence[int]) -> np.ndarray:
    if isinstance(ksize, int):
        ksize = (ksize,) * 3
    rr = [np.arange(k) - k // 2 for k in ksize]
    return np.stack(np.meshgrid(*rr, indexing="ij"), -1).reshape(-1, 3)


def neighbor_table(grid: SparseGrid, out_coords: jax.Array,
                   out_valid: jax.Array, offsets: np.ndarray,
                   stride: int = 1) -> jax.Array:
    """[K, V] neighbor input-slot per output voxel per kernel offset.

    For submanifold (stride 1): in = out + offset. For strided conv the
    caller passes output coords in the downsampled lattice and
    ``in = out * stride + offset`` (offsets here include the padding shift).

    All K offsets resolve through ONE batched lookup (one big gather beats
    K small dispatches on TPU). When the offset list factors into
    z-consecutive triples (every 3^3 conv cube; z is the innermost key
    dim) and the grid has a dense index, each (dx, dy) group resolves as
    ONE 3-wide slice gather instead of 3 scalar gathers — 4-byte random
    gathers are the dominant table cost at full CenterPoint scale.
    """
    offsets = np.asarray(offsets)
    K = len(offsets)
    V = out_coords.shape[0]
    if grid.dense_index is not None and _z_triples(offsets):
        gx, gy, gz = grid.grid_shape
        g_off = jnp.asarray(offsets[::3], jnp.int32)      # [K/3, 3]
        q = out_coords[None, :, :] * stride + g_off[:, None, :]  # [K/3,V,3]
        x, y, z0 = q[..., 0], q[..., 1], q[..., 2]
        # raw key of the dz0 neighbor; alignment must hold even when the
        # triple starts at cell z=-1 (lead pad) or the column is invalid
        key0 = x * (gy * gz) + y * gz + z0
        n = grid.dense_index.shape[0]
        start = jnp.clip(key0.reshape(-1) + 1, 0, n - 3)
        rows = jax.lax.gather(
            grid.dense_index, start[:, None],
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(),
                start_index_map=(0,)),
            slice_sizes=(3,),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)  # [K/3*V, 3]
        slots = rows.reshape(K // 3, V, 3).transpose(0, 2, 1)
        xy_ok = (x >= 0) & (x < gx) & (y >= 0) & (y < gy) \
            & out_valid[None, :]                              # [K/3, V]
        zq = z0[:, None, :] + jnp.arange(3, dtype=jnp.int32)[None, :, None]
        ok = xy_ok[:, None, :] & (zq >= 0) & (zq < gz)        # [K/3, 3, V]
        return jnp.where(ok, slots, -1).reshape(K, V)
    q = (out_coords[None, :, :] * stride
         + jnp.asarray(offsets, jnp.int32)[:, None, :])
    qv = jnp.broadcast_to(out_valid[None, :], (K, V))
    return lookup(grid, q.reshape(K * V, 3), qv.reshape(K * V)).reshape(K, V)


def _z_triples(offsets: np.ndarray) -> bool:
    """True if consecutive offset triples share (dx, dy) and step z by +1
    with dz0 >= -1 (so the slice start stays within the lead pad)."""
    if len(offsets) % 3 != 0:
        return False
    o = offsets.reshape(-1, 3, 3)
    return bool(
        np.all(o[:, 0, :2] == o[:, 1, :2]) and np.all(o[:, 1, :2] == o[:, 2, :2])
        and np.all(o[:, 1, 2] == o[:, 0, 2] + 1)
        and np.all(o[:, 2, 2] == o[:, 1, 2] + 1)
        and np.all(o[:, 0, 2] >= -1))


def sparse_conv_apply(feats: jax.Array, table: jax.Array,
                      weights: jax.Array, out_valid: jax.Array) -> jax.Array:
    """feats [V, Cin]; table [K, V]; weights [K, Cin, Cout] -> [V, Cout].

    One batched gather + einsum; misses contribute zero. (A bf16
    cast-before-gather variant measured NO win here: the random row
    gather is row-rate-bound, not byte-bound, and XLA's
    allow-excess-precision elides the operand rounding of f32-accumulated
    dots anyway — BENCH_NOTES.)
    """
    safe = jnp.clip(table, 0, feats.shape[0] - 1)
    gathered = feats[safe]                      # [K, V, Cin]
    gathered = jnp.where((table >= 0)[..., None], gathered, 0.0)
    out = jnp.einsum("kvc,kcd->vd", gathered, weights,
                     preferred_element_type=jnp.float32)
    return jnp.where(out_valid[:, None], out, 0.0)


def downsample_coords(grid: SparseGrid, ksize: int, stride: int,
                      padding: int, max_out: int
                      ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Output lattice of a strided sparse conv: the exact spconv output set
    {(i + padding - k) / stride : k in [0, ksize), divisible, in range}.

    Returns (out_coords [max_out, 3], out_valid [max_out], out_grid_shape).
    """
    gx, gy, gz = grid.grid_shape
    ogx = (gx + 2 * padding - ksize) // stride + 1
    ogy = (gy + 2 * padding - ksize) // stride + 1
    ogz = (gz + 2 * padding - ksize) // stride + 1

    offs = np.stack(np.meshgrid(*([np.arange(ksize)] * 3), indexing="ij"),
                    -1).reshape(-1, 3)
    cand_list, valid_list = [], []
    for off in offs:
        num = grid.coords + padding - jnp.asarray(off, jnp.int32)
        div_ok = jnp.all(num % stride == 0, axis=-1)
        oc = num // stride
        in_rng = jnp.all(
            (oc >= 0) & (oc < jnp.asarray([ogx, ogy, ogz], jnp.int32)),
            axis=-1)
        cand_list.append(oc)
        valid_list.append(grid.valid & div_ok & in_rng)
    cand = jnp.concatenate(cand_list, 0)
    cval = jnp.concatenate(valid_list, 0)

    key = (cand[:, 0].astype(jnp.int32) * (ogy * ogz)
           + cand[:, 1].astype(jnp.int32) * ogz
           + cand[:, 2].astype(jnp.int32))
    n_cells = int(ogx) * int(ogy) * int(ogz)
    key = jnp.where(cval, key, n_cells)
    # dedup + rank via a dense occupancy map + cumsum instead of the
    # argsort over K*V candidates the reference's rule builder implies —
    # an O(cells) streaming pass beats an O(KV log KV) sort-with-gathers
    # at full scale, and yields the same key-sorted output order.
    occ = jnp.zeros((n_cells + 1,), jnp.int32).at[key].max(
        1, mode="promise_in_bounds")
    csum = jnp.cumsum(occ)
    n_out = csum[n_cells - 1].astype(jnp.int32)
    slot = jnp.where(cval, csum[key] - 1, max_out)   # rank among occupied
    out_coords = jnp.zeros((max_out, 3), jnp.int32)
    out_coords = out_coords.at[jnp.clip(slot, 0, max_out)].set(
        cand, mode="drop")
    out_valid = jnp.arange(max_out) < jnp.minimum(n_out, max_out)
    return out_coords, out_valid, (ogx, ogy, ogz)


def strided_conv_offsets(ksize: int, padding: int) -> np.ndarray:
    """Input-lattice offsets for a strided conv: in = out*stride + k - pad."""
    offs = np.stack(np.meshgrid(*([np.arange(ksize)] * 3), indexing="ij"),
                    -1).reshape(-1, 3)
    return offs - padding


def scatter_to_dense(feats: jax.Array, coords: jax.Array, valid: jax.Array,
                     grid_shape) -> jax.Array:
    """Sparse voxels -> dense [gx, gy, gz, C] canvas (SparseConvTensor
    .dense() equivalent, used at the encoder -> BEV boundary)."""
    gx, gy, gz = (int(g) for g in grid_shape)
    out = jnp.zeros((gx, gy, gz, feats.shape[-1]), feats.dtype)
    idx = jnp.where(valid[:, None], coords, gx)  # oob -> dropped
    return out.at[idx[:, 0], idx[:, 1], idx[:, 2]].set(
        jnp.where(valid[:, None], feats, 0.0), mode="drop")
