"""TrackletSegmentor — whole-tracklet sparse-UNet point feature extractor.

Rebuild of the reference's ``TrackletSegmentor``
(``models/detectors/tracklet_detector.py:24-190``, configured in
``configs/ctrl/ctrl_veh_24e.py:14-80``): the tracklet's merged multi-frame
point cloud is tanh-scaled (intensity/elongation), tagged with a scalar
timestamp encoding (frame index / normalizer), voxelized, and pushed
through DynamicVFE + a submanifold sparse UNet; the voxel features gather
back per point. The output is a per-point feature vector the RoI head
consumes alongside the raw point features — the segmentor is "actually a
feature extractor" (reference comment at :185).

Dense/static here: one call processes a [N, 3+F] cloud with a mask; the
CTRL/OcOccNet wrapper vmaps over the batch of tracklets.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import voxelize as vx
from .vfe import DynamicVFE


@dataclasses.dataclass(frozen=True)
class TrackletSegmentorConfig:
    voxel_size: Sequence[float] = (0.25, 0.25, 0.25)   # seg_voxel_size
    pc_range: Sequence[float] = (-100.0, -100.0, -10.0, 100.0, 100.0, 10.0)
    max_voxels: int = 16384
    vfe_channels: Sequence[int] = (64, 64)
    unet_channels: Sequence[int] = (64, 64, 128)
    tanh_dims: Sequence[int] = (3, 4)
    timestamp_normalizer: float = 100.0


def tiny_segmentor_config() -> TrackletSegmentorConfig:
    return TrackletSegmentorConfig(
        voxel_size=(1.0, 1.0, 1.0), max_voxels=512,
        vfe_channels=(16, 16), unet_channels=(16, 16))


class TrackletSegmentor(nn.Module):
    cfg: TrackletSegmentorConfig

    def setup(self):
        c = self.cfg
        self.vfe = DynamicVFE(feat_channels=tuple(c.vfe_channels),
                              voxel_size=c.voxel_size, pc_range=c.pc_range)
        from .fsd import SparseUNet
        self.unet = SparseUNet(tuple(c.unet_channels), c.max_voxels)

    @property
    def out_channels(self) -> int:
        # per-point VFE feats + gathered UNet voxel feats
        return self.cfg.vfe_channels[-1] + self.cfg.unet_channels[0]

    def __call__(self, points: jax.Array, frame_inds: jax.Array,
                 mask: jax.Array) -> jax.Array:
        """points [N, 3+F] (shared-frame), frame_inds [N] int, mask [N]
        -> per-point features [N, out_channels]."""
        import numpy as np
        c = self.cfg
        xyz = points[:, :3]
        rest = points[:, 3:]
        td = [d - 3 for d in c.tanh_dims if d - 3 < rest.shape[-1]]
        if td:
            rest = rest.at[:, jnp.asarray(td)].set(
                jnp.tanh(rest[:, jnp.asarray(td)]))
        ts_feat = (frame_inds.astype(points.dtype)
                   / c.timestamp_normalizer)[:, None]
        pts = jnp.concatenate([xyz, rest, ts_feat], -1)

        vres = vx.voxelize(pts, mask, c.voxel_size, c.pc_range,
                           c.max_voxels)
        vfeat, pfeat = self.vfe(pts, vres, c.max_voxels)
        grid = tuple(np.maximum(np.floor(
            (np.asarray(c.pc_range[3:]) - np.asarray(c.pc_range[:3]))
            / np.asarray(c.voxel_size)), 1).astype(int))
        vout = self.unet(vfeat, vres.coords, vres.voxel_valid, grid)
        out = jnp.concatenate(
            [pfeat, vx.gather_from_voxels(vout, vres.point2voxel)], -1)
        return jnp.where(mask[:, None], out, 0.0)
