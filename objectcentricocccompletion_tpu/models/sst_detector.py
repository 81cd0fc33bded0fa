"""SST single-stage detector (W3): SST backbone + conv neck + Anchor3DHead.

Assembly mirrors the reference ``DynamicVoxelNet`` with the SST middle
encoder/backbone (``configs/sst_refactor/sst_waymoD5_1x_3class_8heads_v2.py``
+ ``configs/_base_/models/sst_base.py``): after the windowed transformer the
BEV canvas passes through dilated convs (the 'attached convs' of SSTv2) and
a 1-level FPN, then dense anchors.
"""
from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from . import anchor_head as ah
from .sst import SST, SSTConfig, tiny_sst_config


@dataclasses.dataclass(frozen=True)
class SSTDetectorConfig:
    sst: SSTConfig = dataclasses.field(default_factory=SSTConfig)
    anchors: ah.AnchorConfig = dataclasses.field(
        default_factory=ah.AnchorConfig)
    num_classes: int = 1
    neck_channels: int = 384
    max_gt: int = 128


def tiny_sst_detector_config() -> SSTDetectorConfig:
    return SSTDetectorConfig(sst=tiny_sst_config(), neck_channels=64,
                             max_gt=8)


class SSTDetector(nn.Module):
    cfg: SSTDetectorConfig

    def setup(self):
        c = self.cfg
        self.backbone = SST(c.sst)
        n_anchor = len(c.anchors.sizes) * len(c.anchors.rotations)
        self.head = ah.AnchorHead(num_classes=c.num_classes,
                                  num_anchors_per_cell=n_anchor,
                                  feat_channels=c.neck_channels,
                                  dtype=c.sst.compute_dtype)

    @nn.compact
    def _neck(self, bev):
        dt = jnp.dtype(self.cfg.sst.compute_dtype)
        x = bev.astype(dt)
        # attached convs filling BEV holes — the shipped dilation sequence
        # (sst_waymoD5_1x_3class_8heads.py:66-70: d=1, 1, 2 with matching
        # symmetric padding, which stride-1 SAME reproduces exactly)
        for i, d in enumerate((1, 1, 2)):
            x = nn.Conv(self.cfg.neck_channels, (3, 3),
                        kernel_dilation=(d, d), use_bias=False, dtype=dt,
                        name=f"dil{i}")(x)
            # GroupNorm statistics stay float32 (promotion); [None]/[0]
            # keeps torch per-sample (H, W, C/G) statistics on the
            # unbatched BEV map
            x = nn.GroupNorm(num_groups=16,
                             epsilon=1e-3)(x[None])[0].astype(dt)
            x = nn.relu(x)
        return x

    def __call__(self, points, mask):
        bev = self.backbone(points, mask)
        feat = self._neck(bev)
        cls, reg, dirc = self.head(feat)
        # losses and box decode run in float32 regardless of compute dtype
        return dict(cls=cls.astype(jnp.float32),
                    reg=reg.astype(jnp.float32),
                    dir=dirc.astype(jnp.float32), bev_hw=feat.shape[:2])

    def _anchors(self, hw):
        return ah.generate_anchors(hw, self.cfg.sst.pc_range,
                                   self.cfg.anchors)

    def loss(self, points, mask, gt_boxes, gt_labels, gt_valid):
        out = self(points, mask)
        anchors = self._anchors(out["bev_hw"])
        return ah.anchor_head_loss(out["cls"], out["reg"], out["dir"],
                                   anchors, gt_boxes, gt_labels, gt_valid,
                                   self.cfg.anchors, self.cfg.num_classes)

    def predict(self, points, mask, max_out: int = 500):
        out = self(points, mask)
        anchors = self._anchors(out["bev_hw"])
        return ah.anchor_head_decode(out["cls"], out["reg"], out["dir"],
                                     anchors, self.cfg.anchors, max_out)
