"""DynamicCenterPoint (W2): dense single-frame LiDAR detector.

Rebuild of the reference ``DynamicCenterPoint``
(``models/detectors/dynamic_voxelnet.py:74``): dynamic voxelization ->
DynamicVFE -> sparse 3D encoder -> dense BEV -> SECOND + FPN -> CenterHead.
Configured after ``configs/centerpoint/cp_voxel_full_6e_car_occ.py``.

Single-sample functional design: ``__call__`` consumes one frame's padded
point buffer; batching is vmap/shard_map at the training-step level (frames
are large, so one frame per device step is the natural unit, matching the
reference's samples_per_gpu).
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import flax.linen as nn
import jax

from ..ops import voxelize as vx
from . import centerpoint_head as cph
from .second import SECOND, SECONDFPN
from .sparse_encoder import SparseEncoder
from .vfe import DynamicVFE


@dataclasses.dataclass(frozen=True)
class CenterPointConfig:
    voxel_size: Sequence[float] = (0.1, 0.1, 0.15)
    pc_range: Sequence[float] = (-75.2, -75.2, -2.0, 75.2, 75.2, 4.0)
    max_voxels: int = 60000
    max_points: int = 160000
    vfe_channels: Sequence[int] = (16, 16)
    num_classes: int = 1
    out_size_factor: int = 8
    encoder_layout: str = "gather"   # 'gather' | 'column' (same params)
    encoder_dtype: str = "bfloat16"  # column-layout activations (params f32)
    encoder_remat: bool = True

    @property
    def grid_shape(self):
        import numpy as np
        g = np.round((np.asarray(self.pc_range[3:])
                      - np.asarray(self.pc_range[:3]))
                     / np.asarray(self.voxel_size)).astype(int)
        return tuple(g)


def tiny_centerpoint_config() -> CenterPointConfig:
    return CenterPointConfig(
        voxel_size=(0.4, 0.4, 0.3), pc_range=(-6.4, -6.4, -1.2, 6.4, 6.4,
                                              8.4),
        max_voxels=2048, max_points=4096, vfe_channels=(8, 8))


class DynamicCenterPoint(nn.Module):
    cfg: CenterPointConfig

    def setup(self):
        c = self.cfg
        self.vfe = DynamicVFE(feat_channels=c.vfe_channels,
                              voxel_size=c.voxel_size, pc_range=c.pc_range)
        scale = max(c.vfe_channels[-1] // 16, 1)
        self.encoder = SparseEncoder(
            base_channels=c.vfe_channels[-1],
            output_channels=8 * scale * 16,
            encoder_channels=tuple(
                tuple(x * scale for x in s)
                for s in ((16, 16, 32), (32, 32, 64), (64, 64, 128),
                          (128, 128))),
            grid_shape=c.grid_shape,
            max_voxels_per_stage=(c.max_voxels, c.max_voxels,
                                  c.max_voxels // 2, c.max_voxels // 4),
            max_columns_per_stage=(c.max_voxels, c.max_voxels // 2,
                                   c.max_voxels // 4, c.max_voxels // 8),
            layout=c.encoder_layout, dtype=c.encoder_dtype,
            remat_blocks=c.encoder_remat)
        self.backbone = SECOND()
        self.neck = SECONDFPN()
        self.head = cph.CenterHead(num_classes=c.num_classes)

    def __call__(self, points: jax.Array, mask: jax.Array) -> dict:
        """points [N, 3+F]; mask [N] -> head prediction maps."""
        c = self.cfg
        vres = vx.voxelize(points, mask, c.voxel_size, c.pc_range,
                           c.max_voxels)
        vfeat, _ = self.vfe(points, vres, c.max_voxels)
        bev = self.encoder(vfeat, vres.coords, vres.voxel_valid)
        feats = self.backbone(bev)
        fused = self.neck(feats)
        return self.head(fused)

    def loss(self, points, mask, gt_boxes, gt_labels, gt_valid):
        preds = self(points, mask)
        return cph.center_head_loss(
            preds, gt_boxes, gt_labels, gt_valid, self.cfg.voxel_size,
            self.cfg.pc_range, self.cfg.out_size_factor)

    def predict(self, points, mask, max_out: int = 500):
        preds = self(points, mask)
        return cph.decode(preds, self.cfg.voxel_size, self.cfg.pc_range,
                          self.cfg.out_size_factor, max_out)
