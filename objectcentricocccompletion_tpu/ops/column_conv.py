"""Column-dense sparse 3D convolution: z fully dense per active column.

The gather-GEMM substrate (``ops/sparse_conv.py``) pays one random row
gather per (output voxel, kernel tap) — 27 taps x V voxels per layer — and
the full-scale CenterPoint profile pins ~60% of the step on exactly that
(row-rate-bound at ~200M rows/s, BENCH_NOTES). LiDAR grids are sparse in
(x, y) but their z-extent is tiny (41 cells at stage 1, 6 by stage 4), so
this module keeps every active column (x, y) DENSE in z:

  feats: [N_cols, gz, C]   occ: [N_cols, gz] active-voxel mask

A 3x3x3 conv then needs only NINE gathers of whole columns (contiguous
``gz*C`` rows — sequential bytes, not random words) and the z-axis falls to
a dense width-3 conv the MXU executes as implicit GEMM. The FLOP inflation
from computing at inactive z cells is 10-20x, but at <= 0.2 TFLOP per layer
the MXU absorbs it for free while the gather count drops ~27 * occupancy /
9 ~ 100x. Inactive cells hold zeros and outputs re-mask by ``occ``, so the
math per active voxel is bit-identical to submanifold semantics
(equivalence vs the gather substrate is pinned in
``tests/test_column_encoder.py``).

Replaces spconv rule tables (``mmdet3d/ops/spconv``) for the encoder
topologies the reference uses: SubM(k3), strided SparseConv(k3 s2 p1), and
the (3,1,1)-s(2,1,1) z-compression of ``SparseEncoder``
(``models/middle_encoders/sparse_encoder.py:15-160``).
"""
from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np


class ColumnGrid(NamedTuple):
    """Active (x, y) columns of a sparse voxel grid, z kept dense."""
    col_xy: jax.Array     # [N, 2] int32
    col_valid: jax.Array  # [N] bool
    occ: jax.Array        # [N, gz] bool active-voxel mask
    grid_shape: tuple     # static (gx, gy, gz)
    col_index: jax.Array  # [gx*gy + 1] int32 2D cell -> column slot, -1 empty


def _key2d(xy: jax.Array, valid: jax.Array, gx: int, gy: int) -> jax.Array:
    key = xy[..., 0].astype(jnp.int32) * gy + xy[..., 1].astype(jnp.int32)
    return jnp.where(valid, key, gx * gy)


def build_columns(coords: jax.Array, valid: jax.Array,
                  grid_shape: Sequence[int], max_cols: int
                  ) -> tuple[ColumnGrid, jax.Array]:
    """Collapse active voxels [V, 3] into their (x, y) columns.

    Returns (grid, col_of_voxel [V] int32) where ``col_of_voxel`` maps each
    input voxel to its column slot (``max_cols`` when dropped/invalid).
    Columns order by linearized (x, y) key; overflow beyond ``max_cols``
    drops the highest keys (static-budget truncation, same contract as the
    gather path's ``max_voxels``).
    """
    gx, gy, gz = (int(g) for g in grid_shape)
    key = _key2d(coords, valid, gx, gy)                    # [V]
    n_cells = gx * gy
    occ2d = jnp.zeros((n_cells + 1,), jnp.int32).at[key].max(
        1, mode="promise_in_bounds")
    csum = jnp.cumsum(occ2d)
    n_cols = csum[n_cells - 1].astype(jnp.int32)
    col_of_voxel = jnp.where(valid, csum[key] - 1, max_cols)
    col_of_voxel = jnp.where(col_of_voxel < max_cols, col_of_voxel,
                             max_cols).astype(jnp.int32)

    col_xy = jnp.zeros((max_cols, 2), jnp.int32)
    col_xy = col_xy.at[col_of_voxel].set(coords[:, :2], mode="drop")
    col_valid = jnp.arange(max_cols) < jnp.minimum(n_cols, max_cols)

    occ = jnp.zeros((max_cols, gz), bool)
    occ = occ.at[col_of_voxel, coords[:, 2]].set(valid, mode="drop")
    occ &= col_valid[:, None]

    ckey = _key2d(col_xy, col_valid, gx, gy)
    col_index = jnp.full((n_cells + 1,), -1, jnp.int32)
    col_index = col_index.at[ckey].set(
        jnp.arange(max_cols, dtype=jnp.int32), mode="drop")
    # the sentinel cell may have been written by invalid columns
    col_index = col_index.at[n_cells].set(-1)
    return (ColumnGrid(col_xy, col_valid, occ, (gx, gy, gz), col_index),
            col_of_voxel)


def scatter_voxel_feats(feats: jax.Array, coords: jax.Array,
                        col_of_voxel: jax.Array, max_cols: int,
                        gz: int) -> jax.Array:
    """[V, C] voxel features -> [max_cols, gz, C] column-dense tensor."""
    out = jnp.zeros((max_cols + 1, gz, feats.shape[-1]), feats.dtype)
    out = out.at[col_of_voxel, coords[:, 2]].set(feats, mode="drop")
    return out[:max_cols]


def neighbor_columns(grid: ColumnGrid, out_xy: jax.Array | None = None,
                     out_valid: jax.Array | None = None,
                     stride: int = 1, pad: int = 1) -> jax.Array:
    """[9, N] column slot of each 3x3 (dx, dy) neighbor, -1 when absent.

    ``out_xy`` defaults to the grid's own columns (submanifold). For a
    strided conv pass the OUTPUT columns: neighbor (kx, ky) of output
    column o sits at ``o*stride + k - pad`` in the input lattice.
    """
    gx, gy, _ = grid.grid_shape
    if out_xy is None:
        out_xy, out_valid = grid.col_xy, grid.col_valid
        base = out_xy - pad
    else:
        base = out_xy * stride - pad
    offs = np.stack(np.meshgrid(np.arange(3), np.arange(3),
                                indexing="ij"), -1).reshape(-1, 2)
    q = base[None, :, :] + jnp.asarray(offs, jnp.int32)[:, None, :]  # [9,N,2]
    ok = (out_valid[None, :] & jnp.all(q >= 0, -1)
          & (q[..., 0] < gx) & (q[..., 1] < gy))
    qkey = _key2d(q, ok, gx, gy)
    slot = grid.col_index[qkey]
    return jnp.where(ok, slot, -1)


def _pad_rows(feats: jax.Array) -> jax.Array:
    """[N, gz, C] -> [N+1, gz*C] flat rows with a trailing zero row.

    Gathers must run on 2D rows: a direct [M] -> [M, gz, C] gather lowers
    to a multi-dim-slice gather the TPU executes at ~34 GB/s (measured —
    it cost more than the rest of the encoder combined), while the same
    bytes as flat [N, R] row gathers stream at near-HBM rate. The zero row
    serves missing neighbors, replacing a full-tensor ``where`` pass."""
    N, gz, C = feats.shape
    flat = feats.reshape(N, gz * C)
    return jnp.concatenate([flat, jnp.zeros((1, gz * C), feats.dtype)], 0)


def _gather_columns_padded(padded: jax.Array, slots: jax.Array,
                           gz: int) -> jax.Array:
    """padded [N+1, gz*C] (zero last row), slots [M] (-1 missing) ->
    [M, gz, C]."""
    N = padded.shape[0] - 1
    idx = jnp.where(slots >= 0, slots, N)
    g = jnp.take(padded, idx, axis=0)
    return g.reshape(slots.shape[0], gz, padded.shape[1] // gz)


def _gather_columns(feats: jax.Array, slots: jax.Array) -> jax.Array:
    """feats [N, gz, C], slots [M] (-1 missing) -> [M, gz, C], zeros when
    missing."""
    return _gather_columns_padded(_pad_rows(feats), slots, feats.shape[1])


def _zconv(g: jax.Array, w: jax.Array, stride: int,
           padding: tuple[int, int]) -> jax.Array:
    """Dense width-3 conv over z: g [N, gz, Cin], w [3, Cin, Cout].

    Implemented as three shifted-slice GEMMs, NOT ``conv_general_dilated``:
    the TPU conv lowering at these tiny channel counts (16-64) picked a
    z-minor layout that forced transposes around every gather and ran the
    MXU at ~1% peak (measured 3.75 s/step vs the gather substrate's 0.76).
    Plain einsums keep the row-major [N, gz, C] layout end to end and the
    small-K GEMMs run at bandwidth."""
    pl, ph = padding
    gp = jnp.pad(g, ((0, 0), (pl, ph), (0, 0)))
    W = gp.shape[1]
    out_w = (W - 3) // stride + 1
    wd = w.astype(g.dtype)
    out = None
    for dz in range(3):
        sl = gp[:, dz:dz + stride * (out_w - 1) + 1:stride, :]
        y = jnp.einsum("nzc,cd->nzd", sl, wd[dz],
                       preferred_element_type=jnp.float32)
        out = y if out is None else out + y
    return out


def conv3x3x3(feats: jax.Array, nbrs: jax.Array, w: jax.Array,
              out_occ: jax.Array, stride: int = 1,
              z_padding: tuple[int, int] = (1, 1)) -> jax.Array:
    """3x3x3 sparse conv in column layout.

    feats [N_in, gz, Cin]; nbrs [9, N_out] input-column slot per (dx, dy)
    tap; w [27, Cin, Cout] in ``kernel_offsets(3)`` order ((dx, dy, dz),
    dx outermost — the gather substrate's layout, so parameters
    interchange); out_occ [N_out, gz_out]. Returns [N_out, gz_out, Cout]
    masked to the active set.

    Nine whole-column gathers + nine dense z-convs accumulated; each
    z-conv is an implicit GEMM on the MXU.
    """
    w3 = w.reshape(3, 3, 3, w.shape[-2], w.shape[-1])
    padded = _pad_rows(feats)
    gz = feats.shape[1]
    out = None
    for k in range(9):
        g = _gather_columns_padded(padded, nbrs[k], gz)
        y = _zconv(g, w3[k // 3, k % 3], stride, z_padding)
        out = y if out is None else out + y
    return jnp.where(out_occ[..., None], out, 0.0)


def downsample_columns(grid: ColumnGrid, max_out_cols: int
                       ) -> tuple[ColumnGrid, jax.Array]:
    """Output lattice of a k3 s2 p1 strided conv, column form.

    Output columns: every (x', y') with ``x' = (x + 1 - kx) / 2`` reachable
    from an active input column (exact spconv output set, matching
    ``sparse_conv.downsample_coords`` restricted to (x, y)); output occ
    from the same rule over z through the 3x3 neighbor table. Returns
    (out_grid, nbrs [9, N_out] into the INPUT grid's columns).
    """
    gx, gy, gz = grid.grid_shape
    ogx = (gx + 2 - 3) // 2 + 1
    ogy = (gy + 2 - 3) // 2 + 1
    ogz = (gz + 2 - 3) // 2 + 1

    offs = np.stack(np.meshgrid(np.arange(3), np.arange(3),
                                indexing="ij"), -1).reshape(-1, 2)
    cand, cval = [], []
    for off in offs:
        num = grid.col_xy + 1 - jnp.asarray(off, jnp.int32)
        ok = (grid.col_valid & jnp.all(num % 2 == 0, -1)
              & jnp.all(num >= 0, -1)
              & (num[:, 0] // 2 < ogx) & (num[:, 1] // 2 < ogy))
        cand.append(num // 2)
        cval.append(ok)
    cand = jnp.concatenate(cand, 0)
    cval = jnp.concatenate(cval, 0)

    n_cells = ogx * ogy
    key = _key2d(cand, cval, ogx, ogy)
    occ2d = jnp.zeros((n_cells + 1,), jnp.int32).at[key].max(
        1, mode="promise_in_bounds")
    csum = jnp.cumsum(occ2d)
    n_out = csum[n_cells - 1].astype(jnp.int32)
    slot = jnp.where(cval, csum[key] - 1, max_out_cols)
    out_xy = jnp.zeros((max_out_cols, 2), jnp.int32)
    out_xy = out_xy.at[jnp.clip(slot, 0, max_out_cols)].set(
        cand, mode="drop")
    out_valid = jnp.arange(max_out_cols) < jnp.minimum(n_out, max_out_cols)

    nbrs = neighbor_columns(grid, out_xy, out_valid, stride=2, pad=1)

    # out occ: OR over the 27 taps of the input occ — gather the 9
    # neighbor columns' occ and stride-2 OR over z windows
    occ_in = jnp.where((nbrs >= 0)[..., None],
                       grid.occ[jnp.clip(nbrs, 0, grid.occ.shape[0] - 1)],
                       False)                                  # [9, N, gz]
    occ_pad = jnp.pad(occ_in, ((0, 0), (0, 0), (1, 1)))
    occ_any = jnp.any(occ_pad, axis=0)                         # [N, gz+2]
    zwin = [occ_any[:, dz:dz + 2 * ogz - 1:2] for dz in range(3)]
    out_occ = zwin[0][:, :ogz] | zwin[1][:, :ogz] | zwin[2][:, :ogz]
    out_occ &= out_valid[:, None]

    ckey = _key2d(out_xy, out_valid, ogx, ogy)
    col_index = jnp.full((n_cells + 1,), -1, jnp.int32)
    col_index = col_index.at[ckey].set(
        jnp.arange(max_out_cols, dtype=jnp.int32), mode="drop")
    col_index = col_index.at[n_cells].set(-1)
    out_grid = ColumnGrid(out_xy, out_valid, out_occ, (ogx, ogy, ogz),
                          col_index)
    return out_grid, nbrs


def zcompress(feats: jax.Array, occ: jax.Array, w: jax.Array
              ) -> tuple[jax.Array, jax.Array]:
    """(3,1,1)-kernel stride-(2,1,1) padding-0 conv (``conv_out``): pure
    z-compression, no cross-column taps at all. feats [N, gz, C],
    w [3, C, D] -> ([N, gz', D], occ' [N, gz'])."""
    gz = feats.shape[1]
    ogz = (gz - 3) // 2 + 1
    out_occ = jnp.stack([occ[:, dz:dz + 2 * ogz - 1:2][:, :ogz]
                         for dz in range(3)], 0).any(0)
    out = _zconv(feats, w, 2, (0, 0))[:, :ogz]
    return jnp.where(out_occ[..., None], out, 0.0), out_occ


def columns_to_bev(feats: jax.Array, grid: ColumnGrid) -> jax.Array:
    """[N, gz, C] -> dense BEV [gx, gy, C*gz] (channel-major per z slice,
    matching ``SparseEncoder``'s ``.dense().transpose`` output layout)."""
    gx, gy, gz = grid.grid_shape
    C = feats.shape[-1]
    rows = feats.transpose(0, 2, 1).reshape(feats.shape[0], C * gz)
    rows = jnp.where(grid.col_valid[:, None], rows, 0.0)
    key = _key2d(grid.col_xy, grid.col_valid, gx, gy)
    canvas = jnp.zeros((gx * gy + 1, C * gz), feats.dtype)
    canvas = canvas.at[key].set(rows, mode="drop")
    return canvas[:gx * gy].reshape(gx, gy, C * gz)
