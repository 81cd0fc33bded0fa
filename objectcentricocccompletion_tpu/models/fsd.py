"""FSD — fully sparse detector (W4), single-stage.

Rebuild of the reference ``SingleStageFSD``
(``models/detectors/single_stage_fsd.py:156-1200``):
  1. ``VoteSegmentor``: dynamic voxelization -> DynamicVFE -> sparse UNet
     (``SimpleSparseUNet``) -> per-point features -> ``VoteSegHead`` giving
     foreground logits + center-vote offsets,
  2. vote-shifted foreground points cluster into instances — the reference's
     CPU scipy connected-components becomes on-device label propagation
     (``ops/cluster.py``),
  3. a segment-form SIR encoder summarizes each cluster,
  4. ``SparseClusterHeadV2``-style MLPs predict per-cluster class scores and
     boxes (center = cluster mean + regressed delta, log sizes, sin/cos yaw).

Shapes are static throughout: fixed budgets for points, voxels, foreground
points, and clusters, all masked.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import cluster as cl
from ..ops import sparse_conv as sc
from ..ops import voxelize as vx
from .layers import LN_EPS, Mlp
from .sparse_encoder import SparseBasicBlock, SubMConv
from .vfe import DynamicVFE


@dataclasses.dataclass(frozen=True)
class FSDConfig:
    voxel_size: Sequence[float] = (0.32, 0.32, 0.6)
    pc_range: Sequence[float] = (-74.88, -74.88, -2.0, 74.88, 74.88, 4.0)
    max_points: int = 160000
    max_voxels: int = 40000
    vfe_channels: Sequence[int] = (64, 64)
    unet_channels: Sequence[int] = (64, 64, 128)   # per level
    max_fg_points: int = 4096
    cluster_voxel_size: Sequence[float] = (0.5, 0.5, 6.0)
    max_clusters: int = 256
    num_classes: int = 1
    seg_score_thresh: float = 0.3
    head_channels: int = 256
    # True = FSD (connected-component clusters); False = FSDv2-style virtual
    # voxels (every occupied vote-voxel is its own instance;
    # models/detectors/single_stage_fsd_v2.py:37)
    use_clustering: bool = True

    @property
    def grid_shape(self):
        import numpy as np
        return tuple(np.round(
            (np.asarray(self.pc_range[3:]) - np.asarray(self.pc_range[:3]))
            / np.asarray(self.voxel_size)).astype(int))


def tiny_fsd_config() -> FSDConfig:
    return FSDConfig(voxel_size=(0.8, 0.8, 1.2),
                     pc_range=(-9.6, -9.6, -2.0, 9.6, 9.6, 2.8),
                     max_points=4096, max_voxels=2048, vfe_channels=(16, 16),
                     unet_channels=(16, 32, 32), max_fg_points=512,
                     max_clusters=32, head_channels=64)


class SparseUNet(nn.Module):
    """Symmetric sparse UNet (SimpleSparseUNet equivalent): SubM stages with
    stride-2 downsamples, nearest-parent upsampling + skip concat."""
    channels: Sequence[int] = (64, 64, 128)
    max_voxels: int = 40000

    @nn.compact
    def __call__(self, feats, coords, valid, grid_shape):
        levels = []
        grid = sc.build_grid(coords, valid, grid_shape)
        offs = sc.kernel_offsets(3)
        x = feats
        for i, c in enumerate(self.channels):
            if i > 0:
                out_coords, out_valid, ogs = sc.downsample_coords(
                    grid, 3, 2, 1, self.max_voxels)
                s_table = sc.neighbor_table(
                    grid, out_coords, out_valid,
                    sc.strided_conv_offsets(3, 1), stride=2)
                w = self.param(f"down{i}", nn.initializers.he_normal(),
                               (27, x.shape[-1], c))
                x = sc.sparse_conv_apply(x, s_table, w, out_valid)
                x = nn.relu(nn.LayerNorm(epsilon=LN_EPS,
                                         name=f"down{i}_norm")(x))
                coords, valid = out_coords, out_valid
                grid = sc.build_grid(coords, valid, ogs)
            table = sc.neighbor_table(grid, coords, valid, offs)
            x = SubMConv(c, name=f"enc{i}_conv")(x, table, valid)
            x = SparseBasicBlock(c, name=f"enc{i}_block")(x, table, valid)
            levels.append((x, coords, valid, grid))

        # decoder: coarse -> fine with nearest-parent gather + skip concat
        x, coords, valid, grid = levels[-1]
        for i in range(len(self.channels) - 2, -1, -1):
            fx, fcoords, fvalid, fgrid = levels[i]
            parent = (fcoords + 1) // 2
            idx = sc.lookup(grid, parent, fvalid)
            up = jnp.where((idx >= 0)[:, None],
                           x[jnp.clip(idx, 0, x.shape[0] - 1)], 0.0)
            x = jnp.concatenate([fx, up], -1)
            table = sc.neighbor_table(fgrid, fcoords, fvalid, offs)
            x = SubMConv(self.channels[i], name=f"dec{i}_conv")(
                x, table, fvalid)
            coords, valid, grid = fcoords, fvalid, fgrid
        return x  # per-finest-voxel features


class FSD(nn.Module):
    cfg: FSDConfig

    def setup(self):
        c = self.cfg
        self.vfe = DynamicVFE(feat_channels=c.vfe_channels,
                              voxel_size=c.voxel_size, pc_range=c.pc_range)
        self.unet = SparseUNet(c.unet_channels, c.max_voxels)
        self.seg_head = Mlp((64, c.num_classes + 3), is_head=True,
                            act="gelu")
        self.cluster_mlp1 = Mlp((c.head_channels, c.head_channels),
                                act="gelu")
        self.cluster_mlp2 = Mlp((c.head_channels, c.head_channels),
                                act="gelu")
        self.cls_head = Mlp((c.head_channels, c.num_classes), is_head=True,
                            act="gelu")
        self.reg_head = Mlp((c.head_channels, 8), is_head=True, act="gelu")

    def segment(self, points, mask):
        """Stage 1: per-point fg logits [N, ncls] + votes [N, 3]."""
        c = self.cfg
        vres = vx.voxelize(points, mask, c.voxel_size, c.pc_range,
                           c.max_voxels)
        vfeat, pfeat = self.vfe(points, vres, c.max_voxels)
        vout = self.unet(vfeat, vres.coords, vres.voxel_valid, c.grid_shape)
        per_point = jnp.concatenate(
            [pfeat, vx.gather_from_voxels(vout, vres.point2voxel)], -1)
        out = self.seg_head(per_point)
        seg_logits = out[:, :c.num_classes]
        votes = out[:, c.num_classes:]
        pv = vres.point_valid
        return seg_logits, votes, pv

    def group(self, points, seg_logits, votes, point_valid):
        """Stage 2: select fg budget, cluster vote-shifted centers."""
        c = self.cfg
        score = jax.nn.sigmoid(seg_logits).max(-1)
        score = jnp.where(point_valid, score, -1.0)
        top_scores, fg_idx = jax.lax.top_k(score, c.max_fg_points)
        fg_ok = top_scores > c.seg_score_thresh
        fg_pts = points[fg_idx, :3]
        centers = fg_pts + votes[fg_idx]

        cres = vx.voxelize(centers, fg_ok, c.cluster_voxel_size, c.pc_range,
                           c.max_clusters * 8)
        if c.use_clustering:
            import numpy as np
            cgrid = tuple(np.round(
                (np.asarray(c.pc_range[3:]) - np.asarray(c.pc_range[:3]))
                / np.asarray(c.cluster_voxel_size)).astype(int))
            vox_labels = cl.connected_components(cres.coords,
                                                 cres.voxel_valid, cgrid)
        else:   # FSDv2 virtual voxels: each occupied voxel is an instance
            vox_labels = jnp.where(
                cres.voxel_valid,
                jnp.arange(cres.coords.shape[0], dtype=jnp.int32), -1)
        vox_labels, num_clusters = cl.compact_labels(vox_labels,
                                                     c.max_clusters)
        pt_cluster = jnp.where(
            cres.point2voxel >= 0,
            vox_labels[jnp.clip(cres.point2voxel, 0,
                                vox_labels.shape[0] - 1)], -1)
        return fg_idx, fg_ok & (pt_cluster >= 0), pt_cluster, num_clusters

    def cluster_features(self, points, fg_idx, fg_ok, pt_cluster):
        """Segment-form SIR over clusters: two MLP+max rounds."""
        c = self.cfg
        C = c.max_clusters
        fg_points = points[fg_idx]
        seg = jnp.where(fg_ok, pt_cluster, C)
        cmean = jax.ops.segment_sum(fg_points[:, :3], seg, num_segments=C + 1)
        cnt = jax.ops.segment_sum(jnp.ones_like(fg_points[:, :1]), seg,
                                  num_segments=C + 1)
        cmean = (cmean / jnp.clip(cnt, 1, None))[:C]
        rel = fg_points[:, :3] - jnp.where(
            (pt_cluster >= 0)[:, None],
            cmean[jnp.clip(pt_cluster, 0, C - 1)], 0.0)
        x = jnp.concatenate([rel, fg_points[:, 3:]], -1)
        x = self.cluster_mlp1(x)
        g = jax.ops.segment_max(jnp.where(fg_ok[:, None], x, -1e30), seg,
                                num_segments=C + 1)[:C]
        g = jnp.where(jnp.isfinite(g), g, 0.0)
        xg = jnp.concatenate(
            [x, jnp.where((pt_cluster >= 0)[:, None],
                          g[jnp.clip(pt_cluster, 0, C - 1)], 0.0)], -1)
        x2 = self.cluster_mlp2(xg)
        g2 = jax.ops.segment_max(jnp.where(fg_ok[:, None], x2, -1e30), seg,
                                 num_segments=C + 1)[:C]
        g2 = jnp.where(jnp.isfinite(g2), g2, 0.0)
        cluster_valid = (cnt[:C, 0] > 0)
        return jnp.concatenate([g, g2], -1), cmean, cluster_valid

    def __call__(self, points, mask):
        seg_logits, votes, pv = self.segment(points, mask)
        fg_idx, fg_ok, pt_cluster, _ = self.group(points, seg_logits, votes,
                                                  pv)
        feats, cmean, cvalid = self.cluster_features(points, fg_idx, fg_ok,
                                                     pt_cluster)
        cls = self.cls_head(feats)
        reg = self.reg_head(feats)
        # decode: center = cluster mean + delta; sizes log; yaw sin/cos
        ctr = cmean + reg[:, :3]
        size = jnp.exp(jnp.clip(reg[:, 3:6], -4, 3))
        # safe atan2: empty clusters output exactly (0, 0) (zero-init bias),
        # where arctan2 has NaN gradients; double-where keeps grads finite
        sn, cs = reg[:, 6], reg[:, 7]
        ok = sn * sn + cs * cs > 1e-12
        yaw = jnp.where(ok,
                        jnp.arctan2(jnp.where(ok, sn, 0.0),
                                    jnp.where(ok, cs, 1.0)), 0.0)
        boxes = jnp.concatenate(
            [ctr[:, :2], (ctr[:, 2] - size[:, 2] / 2)[:, None], size,
             yaw[:, None]], -1)
        return dict(seg_logits=seg_logits, votes=votes, point_valid=pv,
                    cls=cls, boxes=boxes, cluster_valid=cvalid,
                    cluster_centers=cmean)


def fsd_loss(model_out, points, gt_boxes, gt_labels, gt_valid,
             vote_weight=1.0, seg_weight=3.0, cls_weight=1.0,
             reg_weight=2.0):
    """Training losses (mirrors VoteSegHead + SparseClusterHeadV2 recipes:
    per-point focal-ish BCE segmentation, L1 votes to GT gravity centers,
    per-cluster focal cls by center-in-box, L1 box regression)."""
    from ..core import boxes as box_ops
    from .anchor_head import focal_loss

    pv = model_out["point_valid"]
    xyz = points[:, :3]
    inb = box_ops.points_in_boxes(xyz[None], gt_boxes[None])  # [1?]
    # points_in_boxes broadcasting: arrange [G, N] manually
    inbox = jax.vmap(
        lambda b: box_ops.points_in_boxes(xyz[None], b[None, None])[0, 0]
    )(gt_boxes)  # [G, N]
    inbox = inbox & gt_valid[:, None]
    fg = jnp.any(inbox, axis=0)
    gt_of_point = jnp.argmax(inbox, axis=0)

    seg = model_out["seg_logits"][:, 0]
    seg_bce = focal_loss(seg, fg.astype(seg.dtype))
    loss_seg = seg_weight * jnp.sum(seg_bce * pv) / jnp.clip(
        jnp.sum(pv), 1, None)

    gctr = box_ops.gravity_center(gt_boxes)[gt_of_point]
    vote_tgt = gctr - xyz
    vw = (fg & pv).astype(seg.dtype)
    loss_vote = vote_weight * jnp.sum(
        jnp.abs(model_out["votes"] - vote_tgt) * vw[:, None]
    ) / jnp.clip(jnp.sum(vw), 1, None)

    # cluster targets: match each cluster center to the gt box containing it
    cc = model_out["cluster_centers"]
    cin = jax.vmap(
        lambda b: box_ops.points_in_boxes(cc[None], b[None, None])[0, 0]
    )(gt_boxes)
    cin = cin & gt_valid[:, None]
    c_pos = jnp.any(cin, axis=0) & model_out["cluster_valid"]
    c_gt = gt_boxes[jnp.argmax(cin, axis=0)]

    cls_tgt = c_pos.astype(seg.dtype)[:, None]
    cw = model_out["cluster_valid"].astype(seg.dtype)[:, None]
    loss_cls = cls_weight * jnp.sum(
        focal_loss(model_out["cls"], cls_tgt) * cw) / jnp.clip(
        jnp.sum(c_pos), 1, None)

    pb = model_out["boxes"]
    yaw_err = jnp.abs(jnp.sin(pb[:, 6] - c_gt[:, 6]))
    l1 = (jnp.abs(pb[:, :6] - c_gt[:, :6]).sum(-1) + yaw_err)
    loss_reg = reg_weight * jnp.sum(l1 * c_pos) / jnp.clip(
        jnp.sum(c_pos), 1, None)

    total = loss_seg + loss_vote + loss_cls + loss_reg
    return dict(loss_seg=loss_seg, loss_vote=loss_vote, loss_cls=loss_cls,
                loss_reg=loss_reg, loss=total,
                num_fg_points=jnp.sum(fg & pv), num_pos_clusters=jnp.sum(
                    c_pos))
