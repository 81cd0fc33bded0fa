"""Sparse 3D encoder (CenterPoint middle encoder) on the gather-GEMM
sparse-conv substrate.

Rebuild of the reference ``SparseEncoder``
(``models/middle_encoders/sparse_encoder.py:15-160``, 'basicblock' variant as
configured in ``configs/centerpoint/cp_voxel_full_6e_car_occ.py:37-45``):

  conv_input: SubM(k3) in->base
  stage i (i=0..3): [SparseConv k3 s2 p1 downsample when i>0] +
                    residual SubM basic blocks per encoder_channels[i]
  conv_out:  SparseConv (3,1,1) stride (2,1,1) compressing z
  dense:     scatter to [H, W, D*C] BEV canvas

Voxel budgets per stage are static (``max_voxels`` per level); LayerNorm
replaces BN1d (see ``models/vfe.py`` rationale).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import sparse_conv as sc
from .layers import LN_EPS


class SubMConv(nn.Module):
    out_channels: int
    ksize: int = 3
    use_norm_act: bool = True

    @nn.compact
    def __call__(self, feats, table, valid):
        k = self.ksize ** 3
        w = self.param(
            "kernel", nn.initializers.he_normal(),
            (k, feats.shape[-1], self.out_channels))
        out = sc.sparse_conv_apply(feats, table, w, valid)
        if self.use_norm_act:
            out = nn.LayerNorm(epsilon=LN_EPS)(out)
            out = nn.relu(out)
            out = jnp.where(valid[:, None], out, 0.0)
        return out


class SparseBasicBlock(nn.Module):
    """Residual block of two SubM convs (reference ``SparseBasicBlock``)."""
    channels: int

    @nn.compact
    def __call__(self, feats, table, valid):
        identity = feats
        x = SubMConv(self.channels, name="conv1")(feats, table, valid)
        k = 27
        w2 = self.param("conv2_kernel", nn.initializers.he_normal(),
                        (k, self.channels, self.channels))
        x = sc.sparse_conv_apply(x, table, w2, valid)
        x = nn.LayerNorm(epsilon=LN_EPS, name="norm2")(x)
        if identity.shape[-1] != self.channels:
            identity = nn.Dense(self.channels, use_bias=False,
                                name="proj")(identity)
        x = nn.relu(x + identity)
        return jnp.where(valid[:, None], x, 0.0)


class SparseEncoder(nn.Module):
    base_channels: int = 16
    output_channels: int = 128
    encoder_channels: Sequence[Sequence[int]] = (
        (16, 16, 32), (32, 32, 64), (64, 64, 128), (128, 128))
    grid_shape: Sequence[int] = (1504, 1504, 41)   # (x, y, z)
    max_voxels_per_stage: Sequence[int] = (60000, 60000, 40000, 20000)

    @nn.compact
    def __call__(self, voxel_feats: jax.Array, coords: jax.Array,
                 valid: jax.Array):
        """voxel_feats [V0, C]; coords [V0, 3] (x, y, z); valid [V0].

        Returns a dense BEV map [gx/8, gy/8, D_out * output_channels].
        """
        gs = tuple(int(g) for g in self.grid_shape)
        grid = sc.build_grid(coords, valid, gs)
        offs27 = sc.kernel_offsets(3)
        table = sc.neighbor_table(grid, coords, valid, offs27)

        x = SubMConv(self.base_channels, name="conv_input")(
            voxel_feats, table, valid)

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
            for j, c in enumerate(stage):
                x = SparseBasicBlock(c, name=f"stage{i}_block{j}")(
                    x, table, valid)

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
