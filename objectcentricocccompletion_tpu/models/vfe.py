"""Dynamic voxel feature encoders.

Rebuild of the reference ``DynamicVFE`` / ``DynamicScatterVFE``
(``models/voxel_encoders/voxel_encoder.py:93-612``): per-point decoration
(cluster-center offset, voxel-center offset, distance), a stack of
Linear->Norm->ReLU layers with per-voxel max-reduction and broadcast-concat
between layers, final per-voxel feature by max.

Operates on the static-shape voxelization of ``ops/voxelize.py`` — ragged
``torch.unique`` groups become segment reductions over a fixed voxel buffer.
Norm layers are LayerNorm rather than (Sync)BatchNorm: with masked/padded
point buffers LN is both simpler and statistically safer, and under global-
batch pjit there is no cross-replica moment sync to replicate.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import voxelize as vx
from .layers import LN_EPS


class DynamicVFE(nn.Module):
    feat_channels: Sequence[int] = (64, 64)
    with_cluster_center: bool = True
    with_voxel_center: bool = True
    with_distance: bool = False
    voxel_size: Sequence[float] = (0.1, 0.1, 0.15)
    pc_range: Sequence[float] = (-74.88, -74.88, -2, 74.88, 74.88, 4)
    mode: str = "max"
    # computation dtype of the Linear layers (decoration + LN stats stay
    # float32); None = float32
    dtype: str | None = None

    @nn.compact
    def __call__(self, points: jax.Array, vres: vx.VoxelizeResult,
                 max_voxels: int):
        """points [N, 3+F]; vres from ops.voxelize. Returns voxel feats
        [V, C] and the per-point features of the last layer [N, C]."""
        xyz = points[:, :3]
        feats = [points]
        if self.with_cluster_center:
            vmean = vx.scatter_to_voxels(xyz, vres.point2voxel, max_voxels,
                                         "mean")
            feats.append(xyz - vx.gather_from_voxels(vmean, vres.point2voxel))
        if self.with_voxel_center:
            vs = jnp.asarray(self.voxel_size, points.dtype)
            lo = jnp.asarray(self.pc_range[:3], points.dtype)
            centers = (vres.coords.astype(points.dtype) + 0.5) * vs + lo
            feats.append(xyz - vx.gather_from_voxels(centers,
                                                     vres.point2voxel))
        if self.with_distance:
            feats.append(jnp.linalg.norm(xyz, axis=-1, keepdims=True))
        x = jnp.concatenate(feats, -1)
        x = jnp.where(vres.point_valid[:, None], x, 0.0)

        point_feats = x
        for i, c in enumerate(self.feat_channels):
            point_feats = nn.Dense(
                c, use_bias=False,
                dtype=jnp.dtype(self.dtype) if self.dtype else None,
                name=f"vfe_{i}")(point_feats)
            point_feats = nn.LayerNorm(epsilon=LN_EPS,
                                       name=f"norm_{i}")(point_feats)
            point_feats = nn.relu(point_feats)
            point_feats = jnp.where(vres.point_valid[:, None], point_feats,
                                    0.0)
            vfeat = vx.scatter_to_voxels(point_feats, vres.point2voxel,
                                         max_voxels, self.mode)
            if i != len(self.feat_channels) - 1:
                point_feats = jnp.concatenate(
                    [point_feats,
                     vx.gather_from_voxels(vfeat, vres.point2voxel)], -1)
        return vfeat, point_feats
