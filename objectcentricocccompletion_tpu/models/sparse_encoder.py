"""Sparse 3D encoder (CenterPoint middle encoder) on two interchangeable
sparse-conv substrates.

Rebuild of the reference ``SparseEncoder``
(``models/middle_encoders/sparse_encoder.py:15-160``, 'basicblock' variant as
configured in ``configs/centerpoint/cp_voxel_full_6e_car_occ.py:37-45``):

  conv_input: SubM(k3) in->base
  stage i (i=0..3): [SparseConv k3 s2 p1 downsample when i>0] +
                    residual SubM basic blocks per encoder_channels[i]
  conv_out:  SparseConv (3,1,1) stride (2,1,1) compressing z
  dense:     scatter to [H, W, D*C] BEV canvas

Two layouts share one parameter tree (checkpoints interchange; equivalence
pinned by test):

* ``layout='gather'``: rule-table gather-GEMM (``ops/sparse_conv.py``) —
  27 random row gathers per voxel per conv.
* ``layout='column'``: column-dense z (``ops/column_conv.py``) — 9
  whole-column gathers per conv, z as dense MXU GEMMs. Measured at full
  CenterPoint scale: 1.24 s/step vs gather's 0.76 — the TPU gather unit
  processes ~55M rows/s nearly INDEPENDENT of row width (656-2048
  elements, microbenchmarked), so 9 wide gathers cost the same as 27
  narrow ones and the layout's 3x row-count advantage evaporates. The
  substrate is kept as the foundation for a Pallas fused gather-conv
  (DMA streams columns at byte rate, not row rate), which is the path to
  beating the gather substrate.

Voxel budgets per stage are static (``max_voxels`` per level); LayerNorm
replaces BN1d (see ``models/vfe.py`` rationale).
"""
from __future__ import annotations

from typing import Any, NamedTuple, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import column_conv as cc
from ..ops import sparse_conv as sc
from .layers import LN_EPS


class GatherCtx(NamedTuple):
    """Connectivity of one stage in the gather-GEMM layout."""
    table: jax.Array   # [27, V]
    valid: jax.Array   # [V]

    def conv(self, feats, w):
        return sc.sparse_conv_apply(feats, self.table, w, self.valid)

    def mask(self, x):
        return jnp.where(self.valid[:, None], x, 0.0)


class ColumnCtx(NamedTuple):
    """Connectivity of one stage in the column-dense layout."""
    nbrs: jax.Array    # [9, N] column slots
    occ: jax.Array     # [N, gz]

    def conv(self, feats, w):
        return cc.conv3x3x3(feats, self.nbrs, w, self.occ)

    def mask(self, x):
        return jnp.where(self.occ[..., None], x, 0.0)


class SubMConv(nn.Module):
    out_channels: int
    ksize: int = 3
    use_norm_act: bool = True
    dtype: jnp.dtype = jnp.float32   # activation/compute dtype; params f32

    @nn.compact
    def __call__(self, feats, ctx):
        k = self.ksize ** 3
        w = self.param(
            "kernel", nn.initializers.he_normal(),
            (k, feats.shape[-1], self.out_channels))
        out = ctx.conv(feats.astype(self.dtype), w)
        if self.use_norm_act:
            out = nn.LayerNorm(epsilon=LN_EPS)(out)
            out = nn.relu(out)
            out = ctx.mask(out).astype(self.dtype)
        return out


class SparseBasicBlock(nn.Module):
    """Residual block of two SubM convs (reference ``SparseBasicBlock``)."""
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, ctx):
        identity = feats
        x = SubMConv(self.channels, dtype=self.dtype,
                     name="conv1")(feats, ctx)
        k = 27
        w2 = self.param("conv2_kernel", nn.initializers.he_normal(),
                        (k, self.channels, self.channels))
        x = ctx.conv(x, w2)
        x = nn.LayerNorm(epsilon=LN_EPS, name="norm2")(x)
        if identity.shape[-1] != self.channels:
            identity = nn.Dense(self.channels, use_bias=False,
                                dtype=self.dtype, name="proj")(identity)
        x = nn.relu(x + identity.astype(x.dtype))
        return ctx.mask(x).astype(self.dtype)


class SparseEncoder(nn.Module):
    base_channels: int = 16
    output_channels: int = 128
    encoder_channels: Sequence[Sequence[int]] = (
        (16, 16, 32), (32, 32, 64), (64, 64, 128), (128, 128))
    grid_shape: Sequence[int] = (1504, 1504, 41)   # (x, y, z)
    max_voxels_per_stage: Sequence[int] = (60000, 60000, 40000, 20000)
    layout: str = "gather"                         # 'gather' | 'column'
    # column budgets per stage (column layout only). Columns are strictly
    # fewer than voxels (z stacking) and shrink ~4x per (x, y) downsample;
    # None = same as max_voxels_per_stage (safe but memory-hungry).
    max_columns_per_stage: Sequence[int] | None = None
    # remat the residual blocks (column layout): activations are [N, gz, C]
    # z-dense — cheap to recompute on the MXU, expensive to keep in HBM
    remat_blocks: bool = True
    # activation/compute dtype for the column layout (params stay f32).
    # The column path is bandwidth-bound end to end, so bf16 is ~2x.
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, voxel_feats: jax.Array, coords: jax.Array,
                 valid: jax.Array):
        """voxel_feats [V0, C]; coords [V0, 3] (x, y, z); valid [V0].

        Returns a dense BEV map [gx/8, gy/8, D_out * output_channels].
        """
        if self.layout == "column":
            return self._call_column(voxel_feats, coords, valid)
        return self._call_gather(voxel_feats, coords, valid)

    # ---------------- column-dense layout ----------------

    def _call_column(self, voxel_feats, coords, valid):
        gs = tuple(int(g) for g in self.grid_shape)
        col_budgets = (tuple(self.max_columns_per_stage)
                       if self.max_columns_per_stage is not None
                       else tuple(self.max_voxels_per_stage))
        Block = (nn.remat(SparseBasicBlock) if self.remat_blocks
                 else SparseBasicBlock)
        dt = jnp.dtype(self.dtype)
        grid, col_of = cc.build_columns(coords, valid, gs, col_budgets[0])
        x = cc.scatter_voxel_feats(voxel_feats.astype(dt), coords, col_of,
                                   col_budgets[0], gs[2])
        ctx = ColumnCtx(cc.neighbor_columns(grid), grid.occ)

        x = SubMConv(self.base_channels, dtype=dt,
                     name="conv_input")(x, ctx)

        for i, stage in enumerate(self.encoder_channels):
            if i > 0:
                new_grid, s_nbrs = cc.downsample_columns(
                    grid, col_budgets[i])
                k = 27
                w = self.param(
                    f"down{i}_kernel", nn.initializers.he_normal(),
                    (k, x.shape[-1], stage[0]))
                x = cc.conv3x3x3(x, s_nbrs, w, new_grid.occ, stride=2)
                x = nn.LayerNorm(epsilon=LN_EPS, name=f"down{i}_norm")(x)
                x = nn.relu(x)
                x = jnp.where(new_grid.occ[..., None], x, 0.0).astype(dt)
                grid = new_grid
                ctx = ColumnCtx(cc.neighbor_columns(grid), grid.occ)
            for j, c in enumerate(stage):
                x = Block(c, dtype=dt, name=f"stage{i}_block{j}")(x, ctx)

        w_out = self.param("conv_out_kernel", nn.initializers.he_normal(),
                           (3, x.shape[-1], self.output_channels))
        x, out_occ = cc.zcompress(x, grid.occ, w_out)
        x = nn.relu(nn.LayerNorm(epsilon=LN_EPS, name="conv_out_norm")(x))
        x = jnp.where(out_occ[..., None], x, 0.0)
        gx, gy, gz = grid.grid_shape
        ogz = (gz - 3) // 2 + 1
        out_grid = cc.ColumnGrid(grid.col_xy, grid.col_valid, out_occ,
                                 (gx, gy, ogz), grid.col_index)
        return cc.columns_to_bev(x, out_grid)

    # ---------------- gather-GEMM layout ----------------

    def _call_gather(self, voxel_feats, coords, valid):
        gs = tuple(int(g) for g in self.grid_shape)
        grid = sc.build_grid(coords, valid, gs)
        offs27 = sc.kernel_offsets(3)
        table = sc.neighbor_table(grid, coords, valid, offs27)
        ctx = GatherCtx(table, valid)

        x = SubMConv(self.base_channels, name="conv_input")(
            voxel_feats, ctx)

        for i, stage in enumerate(self.encoder_channels):
            if i > 0:
                vmax = self.max_voxels_per_stage[i]
                out_coords, out_valid, ogs = sc.downsample_coords(
                    grid, 3, 2, 1, vmax)
                s_offs = sc.strided_conv_offsets(3, 1)
                s_table = sc.neighbor_table(grid, out_coords, out_valid,
                                            s_offs, stride=2)
                k = 27
                w = self.param(
                    f"down{i}_kernel", nn.initializers.he_normal(),
                    (k, x.shape[-1], stage[0]))
                x = sc.sparse_conv_apply(x, s_table, w, out_valid)
                x = nn.LayerNorm(epsilon=LN_EPS, name=f"down{i}_norm")(x)
                x = nn.relu(x)
                x = jnp.where(out_valid[:, None], x, 0.0)
                coords, valid = out_coords, out_valid
                grid = sc.build_grid(coords, valid, ogs)
                table = sc.neighbor_table(grid, coords, valid, offs27)
                ctx = GatherCtx(table, valid)
            for j, c in enumerate(stage):
                x = SparseBasicBlock(c, name=f"stage{i}_block{j}")(x, ctx)

        # conv_out: (3,1,1) stride (2,1,1) padding 0 over z
        gs3 = grid.grid_shape
        vmax = self.max_voxels_per_stage[-1]
        # output lattice: z' = (z - k)/2 for k in 0..2 (padding 0)
        offs_z = np.stack([np.zeros(3, np.int64), np.zeros(3, np.int64),
                           np.arange(3)], -1)  # (0, 0, k)
        cand, cval = [], []
        ogz = (gs3[2] - 3) // 2 + 1
        for off in offs_z:
            num_z = grid.coords[:, 2] - jnp.int32(off[2])
            ok = (num_z % 2 == 0) & (num_z >= 0) & (num_z // 2 < ogz) \
                & grid.valid
            oc = jnp.stack([grid.coords[:, 0], grid.coords[:, 1],
                            num_z // 2], -1)
            cand.append(oc)
            cval.append(ok)
        cand = jnp.concatenate(cand, 0)
        cval = jnp.concatenate(cval, 0)
        ogs_out = (gs3[0], gs3[1], ogz)
        key = (cand[:, 0].astype(jnp.int32) * (gs3[1] * ogz)
               + cand[:, 1].astype(jnp.int32) * ogz + cand[:, 2])
        big = gs3[0] * gs3[1] * ogz + 1
        key = jnp.where(cval, key, big)
        order = jnp.argsort(key)
        skey = key[order]
        first = jnp.concatenate([jnp.ones((1,), bool),
                                 skey[1:] != skey[:-1]]) & (skey < big)
        slot = jnp.cumsum(first) - 1
        oc_buf = jnp.zeros((vmax, 3), jnp.int32)
        oc_buf = oc_buf.at[jnp.where(first, slot, vmax)].set(
            cand[order], mode="drop")
        o_valid = jnp.arange(vmax) < jnp.minimum(
            jnp.sum(first), vmax).astype(jnp.int32)

        # in = (x, y, 2*z + k), k in 0..2 — a z-triple, so the scaled
        # coords route through neighbor_table's slice-gather fast path
        out_offs = np.stack([np.zeros(3, np.int64), np.zeros(3, np.int64),
                             np.arange(3)], -1).astype(np.int64)
        scaled = oc_buf * jnp.asarray([1, 1, 2], jnp.int32)
        o_table = sc.neighbor_table(grid, scaled, o_valid, out_offs)
        w_out = self.param("conv_out_kernel", nn.initializers.he_normal(),
                           (3, x.shape[-1], self.output_channels))
        x = sc.sparse_conv_apply(x, o_table, w_out, o_valid)
        x = nn.relu(nn.LayerNorm(epsilon=LN_EPS, name="conv_out_norm")(x))
        x = jnp.where(o_valid[:, None], x, 0.0)

        dense = sc.scatter_to_dense(x, oc_buf, o_valid, ogs_out)
        gx, gy, gz = ogs_out
        return dense.transpose(0, 1, 3, 2).reshape(gx, gy,
                                                   gz * self.output_channels)
