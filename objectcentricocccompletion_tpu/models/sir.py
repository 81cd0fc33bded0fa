"""Sparse Instance Recognition (SIR) encoder — dense masked formulation.

Rebuild of the reference's ``SIRLayer`` voxel encoder and ``SIR`` backbone
(``models/voxel_encoders/voxel_encoder.py:686-832``,
``models/backbones/sir.py:16-87``) used by both the OcOccNet RoI encoder
(``ococc_bbox_head.py:237-316``) and the occupancy auto-encoder
(``occ_ae_head.py:203-264``).

Instead of torch_scatter segment reductions over ragged (point -> RoI) index
sets, groups are dense: inputs are ``[G, P, C]`` with a ``[G, P]`` mask where
``G = B * L`` RoIs and ``P`` points per RoI. The scatter-max/broadcast-back
pair becomes a masked max over axis=-2 plus a free broadcast; every Linear is
a large ``[G*P, C_in] x [C_in, C_out]`` matmul on the MXU.

Per block (cfg mirrors ``configs/ococc/ococcnet.py:34-82``):
  * gate the input features with ``rel_mlp(f_cluster / 10)`` (multiplicative),
  * two VFE layers; after the first, concat the broadcast per-group max,
  * the block's "cluster feature" is concat(max1, max2) -> 256 channels,
  * blocks chain through point features; cluster feats of all blocks concat
    to the final per-RoI descriptor (6 blocks x 256 = 1536).

The reference's growing rel-MLP widths (an aliasing quirk of
``[[16, 32]] * 6`` + in-place append in ``SIRLayer.__init__``) are not
reproduced; each block gets an independent ``rel_mlp_hidden -> in_dim`` MLP.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import packed as pk
from ..ops.masked import masked_max, masked_mean
from .layers import Mlp, VfeLayer


class SIRBlock(nn.Module):
    """One SIR block in either point layout.

    Dense (``seg_ids is None``): inputs are ``[G, P, C]`` with a ``[G, P]``
    mask; the group reduce is a masked max over axis -2.

    Packed (``seg_ids`` given): inputs are ``[B, N, C]`` where ``N`` is the
    tracklet's global point budget (``ops/packed.py``); the group reduce is a
    segment max over the per-point frame ids (invalid rows carry
    ``id == num_segments`` and drop out of every reduction), and the
    broadcast-back is a row gather from the tiny ``[B, S, C]`` table. Both
    layouts share the identical parameter structure.
    """
    feat_channels: Sequence[int] = (128, 128)
    rel_mlp_hidden: Sequence[int] = (16, 32)
    mode: str = "max"
    act: str = "gelu"
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, in_feats: jax.Array, f_rel: jax.Array,
                 mask: jax.Array, seg_ids: jax.Array | None = None,
                 num_segments: int | None = None,
                 block_seg: jax.Array | None = None, *,
                 train: bool = False):
        """Returns (point_feats [.., 128], cluster [G or B*S, 256])."""
        gate = Mlp(tuple(self.rel_mlp_hidden) + (in_feats.shape[-1],),
                   act=self.act, dtype=self.dtype,
                   name="rel_mlp")(f_rel, train=train)
        x = in_feats.astype(self.dtype) * gate

        if seg_ids is None:
            def reduce(x):
                fn = masked_max if self.mode == "max" else masked_mean
                return fn(x, mask, axis=-2)

            def broadcast(g, x):
                return jnp.broadcast_to(g[..., None, :], x.shape)
        elif block_seg is not None:
            # block-aligned packing: dense per-block reduce + tiny combine;
            # broadcast-back gathers per BLOCK, free within the block
            def reduce(x):
                fn = (pk.segment_max_blocked if self.mode == "max"
                      else pk.segment_mean_blocked)
                return fn(x, mask, block_seg, num_segments)

            def broadcast(g, x):
                return pk.broadcast_back_blocked(g, block_seg, x.shape[1])
        else:
            def reduce(x):
                fn = pk.segment_max if self.mode == "max" else pk.segment_mean
                return fn(x, seg_ids, num_segments)

            def broadcast(g, x):
                return pk.broadcast_back(g, seg_ids)

        cluster_feats = []
        for i, c in enumerate(self.feat_channels):
            x = VfeLayer(c, act=self.act, dropout=self.dropout,
                         dtype=self.dtype, name=f"vfe_{i}")(x, train=train)
            g = reduce(x)
            cluster_feats.append(g)
            if i != len(self.feat_channels) - 1:
                x = jnp.concatenate([x, broadcast(g, x)], axis=-1)
        return x, jnp.concatenate(cluster_feats, axis=-1)


class SIREncoder(nn.Module):
    """Stack of SIR blocks in either of the two reference wirings.

    ``geo_input=True`` (RoI encoder, ``ococc_bbox_head.roi_encode``):
      block input = [xyz / xyz_normalizer, point_feats, f_cluster / 10],
      rel input = f_cluster / rel_dist_scaler; no residual shortcut (shapes
      never match in the reference either).

    ``geo_input=False`` (AE ``SIR`` backbone): block input =
      [xyz / xyz_normalizer, point_feats]; f_cluster defaults to the
      group-mean-centered xyz / rel_dist_scaler; residual shortcut applies on
      blocks whose input width matches the output
      (``voxel_encoder.py:819-827``).
    """
    num_blocks: int = 6
    feat_channels: Sequence[int] = (128, 128)
    rel_mlp_hidden: Sequence[int] = (16, 32)
    xyz_normalizer: Sequence[float] = (1.0, 1.0, 1.0)
    rel_dist_scaler: float = 10.0
    geo_input: bool = False
    with_shortcut: bool = True
    act: str = "gelu"
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xyz: jax.Array, feats: jax.Array, mask: jax.Array,
                 f_cluster: jax.Array | None = None,
                 seg_ids: jax.Array | None = None,
                 num_segments: int | None = None,
                 block_seg: jax.Array | None = None, *,
                 train: bool = False):
        """Dense: xyz [G, P, 3], feats [G, P, F], mask [G, P],
        f_cluster [G, P, R] or None -> (point_feats [G, P, 128],
        roi_feats [G, num_blocks*256]).

        Packed (``seg_ids`` [B, N] given, see ``ops/packed.py``): leading
        dims are [B, N]; returns roi_feats [B, num_segments, num_blocks*256].
        """
        norm = jnp.asarray(self.xyz_normalizer, xyz.dtype)
        xyz_n = xyz / norm

        if f_cluster is None:
            if seg_ids is None:
                center = masked_mean(xyz, mask, axis=-2)
                f_cluster = xyz - center[..., None, :]
            else:
                if block_seg is not None:
                    center = pk.segment_mean_blocked(xyz, mask, block_seg,
                                                     num_segments)
                    f_cluster = xyz - pk.broadcast_back_blocked(
                        center, block_seg, xyz.shape[1])
                else:
                    center = pk.segment_mean(xyz, seg_ids, num_segments)
                    f_cluster = xyz - pk.broadcast_back(center, seg_ids)
        f_rel = f_cluster / self.rel_dist_scaler

        out_feats = feats
        cluster_list = []
        for i in range(self.num_blocks):
            parts = [xyz_n, out_feats]
            if self.geo_input:
                parts.append(f_rel)
            in_feats = jnp.concatenate(parts, axis=-1)
            point_feats, cluster = SIRBlock(
                self.feat_channels, self.rel_mlp_hidden, act=self.act,
                dropout=self.dropout, dtype=self.dtype,
                name=f"block_{i}"
            )(in_feats, f_rel, mask, seg_ids, num_segments, block_seg,
              train=train)
            if (self.with_shortcut and not self.geo_input
                    and out_feats.shape == point_feats.shape):
                point_feats = point_feats + out_feats
            out_feats = point_feats
            cluster_list.append(cluster)

        return out_feats, jnp.concatenate(cluster_list, axis=-1)
