"""FSD — fully sparse detector (W4), single-stage, multi-class.

Rebuild of the reference ``SingleStageFSD``
(``models/detectors/single_stage_fsd.py:391-1000``) at reference depth:

  1. ``VoteSegmentor``: dynamic voxelization -> DynamicVFE -> sparse UNet
     (``SimpleSparseUNet``) -> per-point features -> ``VoteSegHead``
     (``models/decode_heads/segmentation_head.py``) emitting per-class
     foreground logits and PER-CLASS center-vote offsets [N, ncls, 3],
  2. per-class foreground sampling (``SingleStageFSD.sample``,
     ``:700-748``): sigmoid score of class c against its own threshold,
     vote-shift by the class-c offset,
  3. ``ClusterAssigner`` (``:922-1000``) per class: voxelize the shifted
     centers at the CLASS-SPECIFIC cluster_voxel_size, drop almost-empty
     voxels (min_points), then connected components linking voxels whose
     mean centers lie within the class-specific ``connected_dist`` in the
     xy-plane — the CPU scipy call becomes on-device label propagation
     (``ops/cluster.py::connected_components_dist``),
  4. ``SIR`` backbone over clusters (``models/backbones/sir.py:16-87``):
     ``num_blocks`` true SIRLayer blocks (rel-MLP gate + 2 VFE layers +
     per-cluster max) in segment form, cluster descriptor = concat of all
     block maxima (2 * C1 * num_blocks channels),
  5. ``SparseClusterHeadV2`` (``models/dense_heads/sparse_cluster_head_v2.py:45``):
     shared MLP then one ``FSDSeparateHead`` per task (= per class on
     Waymo) with separate center/dim/rot/score branches; boxes decode with
     ``BasePointBBoxCoder`` against the cluster's vote-center mean.

``use_clustering=False`` selects the FSDv2 path
(``single_stage_fsd_v2.py:37``): no connected components — vote-shifted
points voxelize into per-class VIRTUAL voxels (each its own instance), the
virtual-point projector MLP embeds shifted coords + point features, and the
same task-head structure (= ``FSDV2Head``, ``fsd_v2_head.py:18``) predicts
per virtual voxel.

Everything is static-shape: per-class budgets for foreground points and
clusters, all masked.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..core import coder
from ..ops import cluster as cl
from ..ops import voxelize as vx
from .layers import Mlp
from .sparse_encoder import GatherCtx, SparseBasicBlock, SubMConv
from .vfe import DynamicVFE

from ..ops import sparse_conv as sc


@dataclasses.dataclass(frozen=True)
class FSDConfig:
    # classes (configs/fsd/fsd_waymoD1_1x.py:9)
    class_names: Tuple[str, ...] = ("Car", "Pedestrian", "Cyclist")

    # segmentor (seg_voxel_size / point_cloud_range, fsd_waymoD1_1x.py:7-8)
    voxel_size: Sequence[float] = (0.32, 0.32, 0.6)
    pc_range: Sequence[float] = (-74.88, -74.88, -2.0, 74.88, 74.88, 4.0)
    max_points: int = 160000
    max_voxels: int = 40000
    vfe_channels: Sequence[int] = (64, 64)
    unet_channels: Sequence[int] = (64, 64, 128)   # per level
    seg_head_hidden: Sequence[int] = (128, 128)    # VoteSegHead hidden_dims

    # per-class sampling + clustering (fsd_waymoD1_1x.py:10,273-289)
    seg_score_thresh: Tuple[float, ...] = (0.3, 0.25, 0.25)
    max_fg_per_class: int = 4096
    cluster_voxel_size: Tuple[Tuple[float, float, float], ...] = (
        (0.3, 0.3, 6.0), (0.05, 0.05, 6.0), (0.2, 0.2, 6.0))
    connected_dist: Tuple[float, ...] = (0.6, 0.1, 0.4)
    min_points: int = 2
    max_clusters_per_class: int = 128
    max_cluster_voxels: int = 512     # per-class voxel budget for clustering

    # SIR backbone (fsd_waymoD1_1x.py:99-110)
    sir_blocks: int = 3
    sir_channels: Tuple[int, int] = (128, 128)
    rel_mlp_hidden: Tuple[int, int] = (16, 32)
    xyz_normalizer: Tuple[float, float, float] = (20.0, 20.0, 4.0)

    # SparseClusterHeadV2 (fsd_waymoD1_1x.py:112-140)
    shared_mlp: Tuple[int, ...] = (1024, 1024)
    head_hidden: int = 128
    head_layers: int = 2

    # losses (fsd_waymoD1_1x.py:70-84,115-124)
    seg_focal_gamma: float = 3.0
    seg_focal_alpha: float = 0.8
    seg_weight: float = 1.0
    vote_weight: float = 1.0
    cls_focal_gamma: float = 2.0
    cls_focal_alpha: float = 0.25
    cls_weight: float = 2.0
    center_weight: float = 0.5
    size_weight: float = 0.5
    rot_weight: float = 0.2

    # computation dtype for the VFE/UNet/SIR/head compute path (params,
    # LayerNorm statistics, losses and box decode stay float32; the
    # reference trains fp16 via mmcv — bfloat16 needs no loss scaling)
    compute_dtype: str = "float32"

    # True = FSD (per-class connected-component clusters); False = FSDv2
    # virtual voxels (single_stage_fsd_v2.py:37)
    use_clustering: bool = True
    virtual_proj_hidden: Tuple[int, ...] = (64, 64)   # FSDv2 projector
    # FSDv2 virtual-voxel grid + mixer (virtual_point_projector /
    # VirtualVoxelMixer, single_stage_fsd_v2.py:85-230)
    virtual_voxel_size: Tuple[float, float, float] = (0.4, 0.4, 0.4)
    max_virtual_voxels: int = 8192
    virtual_mixer_channels: int = 64

    @property
    def num_classes(self) -> int:
        return len(self.class_names)

    @property
    def max_clusters(self) -> int:
        return self.num_classes * self.max_clusters_per_class

    @property
    def grid_shape(self):
        return tuple(np.round(
            (np.asarray(self.pc_range[3:]) - np.asarray(self.pc_range[:3]))
            / np.asarray(self.voxel_size)).astype(int))


def tiny_fsd_config(num_classes: int = 3) -> FSDConfig:
    names = ("Car", "Pedestrian", "Cyclist")[:num_classes]
    return FSDConfig(
        class_names=names,
        voxel_size=(0.8, 0.8, 1.2),
        pc_range=(-9.6, -9.6, -2.0, 9.6, 9.6, 2.8),
        max_points=4096, max_voxels=2048, vfe_channels=(16, 16),
        unet_channels=(16, 32, 32), seg_head_hidden=(32,),
        seg_score_thresh=(0.3, 0.25, 0.25)[:num_classes],
        max_fg_per_class=256,
        cluster_voxel_size=((0.5, 0.5, 4.8), (0.2, 0.2, 4.8),
                            (0.4, 0.4, 4.8))[:num_classes],
        connected_dist=(0.6, 0.2, 0.4)[:num_classes],
        max_clusters_per_class=16, max_cluster_voxels=128,
        sir_blocks=2, sir_channels=(32, 32), rel_mlp_hidden=(8, 16),
        shared_mlp=(64,), head_hidden=32,
        virtual_voxel_size=(0.8, 0.8, 1.2), max_virtual_voxels=1024,
        virtual_mixer_channels=16, virtual_proj_hidden=(16, 16))


class SparseUNet(nn.Module):
    """Symmetric sparse UNet (SimpleSparseUNet equivalent): SubM stages with
    stride-2 downsamples, nearest-parent upsampling + skip concat."""
    channels: Sequence[int] = (64, 64, 128)
    max_voxels: int = 40000
    dtype: str = "float32"

    @nn.compact
    def __call__(self, feats, coords, valid, grid_shape):
        levels = []
        grid = sc.build_grid(coords, valid, grid_shape)
        offs = sc.kernel_offsets(3)
        from .layers import LN_EPS
        dt = jnp.dtype(self.dtype)
        x = feats.astype(dt)
        for i, c in enumerate(self.channels):
            if i > 0:
                out_coords, out_valid, ogs = sc.downsample_coords(
                    grid, 3, 2, 1, self.max_voxels)
                s_table = sc.neighbor_table(
                    grid, out_coords, out_valid,
                    sc.strided_conv_offsets(3, 1), stride=2)
                w = self.param(f"down{i}", nn.initializers.he_normal(),
                               (27, x.shape[-1], c))
                x = sc.sparse_conv_apply(x, s_table, w.astype(dt), out_valid)
                from .layers import make_ln
                x = nn.relu(make_ln(f"down{i}_norm")(x)).astype(dt)
                coords, valid = out_coords, out_valid
                grid = sc.build_grid(coords, valid, ogs)
            table = sc.neighbor_table(grid, coords, valid, offs)
            ctx = GatherCtx(table, valid)
            x = SubMConv(c, dtype=dt, name=f"enc{i}_conv")(x, ctx)
            x = SparseBasicBlock(c, dtype=dt, name=f"enc{i}_block")(x, ctx)
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
            x = SubMConv(self.channels[i], dtype=dt, name=f"dec{i}_conv")(
                x, GatherCtx(table, fvalid))
            coords, valid, grid = fcoords, fvalid, fgrid
        return x  # per-finest-voxel features


class SegmentSIR(nn.Module):
    """SIR backbone in segment form (``models/backbones/sir.py:16-87`` over
    ragged clusters): per block, rel-MLP gate of f_cluster, two VFE layers
    with a broadcast per-cluster max between them; cluster descriptor =
    concat of both maxima across all blocks."""
    num_blocks: int = 3
    feat_channels: Tuple[int, int] = (128, 128)
    rel_mlp_hidden: Tuple[int, int] = (16, 32)
    xyz_normalizer: Tuple[float, float, float] = (20.0, 20.0, 4.0)
    rel_dist_scaler: float = 10.0
    act: str = "gelu"
    dtype: str = "float32"

    @nn.compact
    def __call__(self, xyz, feats, f_cluster, seg, valid, num_segments):
        """xyz [N, 3]; feats [N, F]; f_cluster [N, 3]; seg [N] cluster slot
        (invalid points map anywhere, masked by ``valid``);
        returns (point_feats [N, C1], cluster_feats [C, 2*C1*num_blocks])."""
        from ..ops.masked import segment_max
        from .layers import VfeLayer
        dt = jnp.dtype(self.dtype)
        norm = jnp.asarray(self.xyz_normalizer, xyz.dtype)
        xyz_n = (xyz / norm).astype(dt)
        f_rel = (f_cluster / self.rel_dist_scaler).astype(dt)
        feats = feats.astype(dt)
        seg_safe = jnp.where(valid, seg, num_segments)
        C1 = self.feat_channels[0]

        h = feats
        clusters = []
        for i in range(self.num_blocks):
            xin = jnp.concatenate([xyz_n, h], -1)
            gate = Mlp(tuple(self.rel_mlp_hidden) + (xin.shape[-1],),
                       act=self.act, dtype=dt,
                       name=f"block_{i}_rel_mlp")(f_rel)
            x = xin * gate
            x = VfeLayer(C1, act=self.act, dtype=dt,
                         name=f"block_{i}_vfe_0")(x)
            g1 = segment_max(jnp.where(valid[:, None], x, -1e30),
                             seg_safe, num_segments + 1)[:num_segments]
            x = jnp.concatenate(
                [x, jnp.where(valid[:, None],
                              g1[jnp.clip(seg, 0, num_segments - 1)], 0.0)],
                -1)
            x = VfeLayer(self.feat_channels[1], act=self.act, dtype=dt,
                         name=f"block_{i}_vfe_1")(x)
            g2 = segment_max(jnp.where(valid[:, None], x, -1e30),
                             seg_safe, num_segments + 1)[:num_segments]
            clusters.append(jnp.concatenate([g1, g2], -1))
            h = x
        return h, jnp.concatenate(clusters, -1)


class SparseClusterHead(nn.Module):
    """``SparseClusterHeadV2`` / ``FSDV2Head`` task heads
    (``sparse_cluster_head_v2.py:18-158``): shared MLP, then per task a
    ``FSDSeparateHead`` with center(3)/dim(3)/rot(2)/score branches."""
    num_tasks: int = 3
    shared_mlp: Tuple[int, ...] = (1024, 1024)
    hidden: int = 128
    layers: int = 2
    act: str = "relu"
    dtype: str = "float32"
    # the reference config's norm_cfg=dict(type='LN') carries NO eps ->
    # torch default 1e-5 (not the occ stack's 1e-3); executed-transplant
    # pinned (tests/test_detector_transplant.py, round 5)
    ln_eps: float = 1e-5

    @nn.compact
    def __call__(self, feats, train: bool = False):
        dt = jnp.dtype(self.dtype)
        x = Mlp(self.shared_mlp, act=self.act, dtype=dt, ln_eps=self.ln_eps,
                name="shared")(feats, train=train)
        cls_list, reg_list = [], []
        hid = (self.hidden,) * self.layers
        for t in range(self.num_tasks):
            kw = dict(is_head=True, act=self.act, dtype=dt,
                      ln_eps=self.ln_eps)
            score = Mlp(hid + (1,), name=f"task{t}_score", **kw)(
                x, train=train)
            center = Mlp(hid + (3,), name=f"task{t}_center", **kw)(
                x, train=train)
            dim = Mlp(hid + (3,), name=f"task{t}_dim", **kw)(x, train=train)
            rot = Mlp(hid + (2,), name=f"task{t}_rot", **kw)(x, train=train)
            cls_list.append(score)
            reg_list.append(jnp.concatenate([center, dim, rot], -1))
        # logits/regressions leave in f32: losses and box decode stay f32
        return (jnp.concatenate(cls_list, -1).astype(jnp.float32),  # [C, T]
                jnp.stack(reg_list, -2).astype(jnp.float32))        # [C,T,8]


class FSD(nn.Module):
    cfg: FSDConfig

    def setup(self):
        c = self.cfg
        ncls = c.num_classes
        dt = c.compute_dtype
        self.vfe = DynamicVFE(feat_channels=c.vfe_channels,
                              voxel_size=c.voxel_size, pc_range=c.pc_range,
                              dtype=dt)
        self.unet = SparseUNet(c.unet_channels, c.max_voxels, dtype=dt)
        # VoteSegHead: per-class logits + per-class 3-d vote offsets
        # (one fused head Linear == the reference's separate conv_seg +
        # voting Linears; act is ReLU per the shipped act_cfg,
        # fsd_waymoD1_1x_car.py:68 — was gelu until the round-5 executed
        # transplant caught it)
        self.seg_head = Mlp(tuple(c.seg_head_hidden) + (ncls + ncls * 3,),
                            is_head=True, act="relu", ln_eps=1e-5,
                            dtype=jnp.dtype(dt))
        self.sir = SegmentSIR(
            num_blocks=c.sir_blocks, feat_channels=c.sir_channels,
            rel_mlp_hidden=c.rel_mlp_hidden, xyz_normalizer=c.xyz_normalizer,
            dtype=dt)
        self.head = SparseClusterHead(
            num_tasks=ncls, shared_mlp=c.shared_mlp, hidden=c.head_hidden,
            layers=c.head_layers, dtype=dt)
        if not c.use_clustering:
            self.virtual_proj = Mlp(tuple(c.virtual_proj_hidden),
                                    act="gelu", dtype=jnp.dtype(dt))
            self.ori_proj = Mlp(tuple(c.virtual_proj_hidden), act="gelu",
                                dtype=jnp.dtype(dt))
            self.mixer1 = SubMConv(c.virtual_mixer_channels,
                                   dtype=jnp.dtype(dt), name="mixer1")
            self.mixer2 = SubMConv(c.virtual_mixer_channels,
                                   dtype=jnp.dtype(dt), name="mixer2")

    def segment(self, points, mask):
        """Stage 1: per-point fg logits [N, ncls] + votes [N, ncls, 3]."""
        c = self.cfg
        ncls = c.num_classes
        vres = vx.voxelize(points, mask, c.voxel_size, c.pc_range,
                           c.max_voxels)
        vfeat, pfeat = self.vfe(points, vres, c.max_voxels)
        vout = self.unet(vfeat, vres.coords, vres.voxel_valid, c.grid_shape)
        per_point = jnp.concatenate(
            [pfeat, vx.gather_from_voxels(vout, vres.point2voxel)], -1)
        out = self.seg_head(per_point).astype(jnp.float32)
        seg_logits = out[:, :ncls]
        votes = out[:, ncls:].reshape(-1, ncls, 3)
        return seg_logits, votes, vres.point_valid, per_point

    def group(self, points, seg_logits, votes, point_valid):
        """Per-class fg sampling + clustering.

        Returns (fg_idx [ncls, Nf], fg_label [ncls, Nf] global cluster slot
        or -1, centers [ncls, Nf, 3] vote-shifted points)."""
        c = self.cfg
        ncls = c.num_classes
        Kc = c.max_clusters_per_class
        xyz = points[:, :3]

        fg_idx_list, label_list, centers_list = [], [], []
        for cls_id in range(ncls):
            score = jax.nn.sigmoid(seg_logits[:, cls_id])
            score = jnp.where(point_valid, score, -1.0)
            top_scores, fg_idx = jax.lax.top_k(score, c.max_fg_per_class)
            fg_ok = top_scores > c.seg_score_thresh[cls_id]
            centers = xyz[fg_idx] + votes[fg_idx, cls_id]

            vsize = c.cluster_voxel_size[cls_id]
            cgrid = tuple(np.maximum(np.round(
                (np.asarray(c.pc_range[3:]) - np.asarray(c.pc_range[:3]))
                / np.asarray(vsize)), 1).astype(int))
            cres = vx.voxelize(centers, fg_ok, vsize, c.pc_range,
                               c.max_cluster_voxels)
            # drop almost-empty voxels (filter_almost_empty, min_points)
            seg_tmp = jnp.where(cres.point2voxel >= 0, cres.point2voxel,
                                c.max_cluster_voxels)
            counts = jax.ops.segment_sum(
                jnp.ones_like(centers[:, :1]), seg_tmp,
                num_segments=c.max_cluster_voxels + 1)[:c.max_cluster_voxels,
                                                       0]
            vox_ok = cres.voxel_valid & (counts >= c.min_points)

            vmean = vx.scatter_to_voxels(centers, cres.point2voxel,
                                         c.max_cluster_voxels, "mean")
            win = int(np.ceil(c.connected_dist[cls_id]
                              / min(vsize[0], vsize[1]))) + 1
            vox_labels = cl.connected_components_dist(
                cres.coords, vox_ok, cgrid, vmean,
                c.connected_dist[cls_id], window_radius=min(win, 4))
            vox_labels, _ = cl.compact_labels(vox_labels, Kc)
            pt_label = jnp.where(
                cres.point2voxel >= 0,
                vox_labels[jnp.clip(cres.point2voxel, 0,
                                    vox_labels.shape[0] - 1)], -1)
            pt_label = jnp.where(fg_ok & (pt_label >= 0),
                                 pt_label + cls_id * Kc, -1)
            fg_idx_list.append(fg_idx)
            label_list.append(pt_label)
            centers_list.append(centers)
        return (jnp.stack(fg_idx_list), jnp.stack(label_list),
                jnp.stack(centers_list))

    def _virtual_voxels(self, points, seg_logits, votes, pv, pfeat):
        """FSDv2 feature path (``single_stage_fsd_v2.extract_feat``):
        vote-shifted VIRTUAL points (projected features) union the original
        points (ori_proj features), voxelize at the virtual voxel size, mix
        through two submanifold convs, and every voxel containing a class-c
        virtual point becomes a class-c instance with the voxel center as
        its base point.

        Returns (cluster_feats [C, Dm], cluster_xyz [C, 3],
        cluster_valid [C])."""
        c = self.cfg
        ncls = c.num_classes
        Kc = c.max_clusters_per_class
        C = c.max_clusters
        V = c.max_virtual_voxels
        xyz = points[:, :3]

        # per-class foreground virtual points (sample() semantics)
        idx_list, ok_list, ctr_list, cls_list = [], [], [], []
        for cls_id in range(ncls):
            score = jax.nn.sigmoid(seg_logits[:, cls_id])
            score = jnp.where(pv, score, -1.0)
            top, fg_idx = jax.lax.top_k(score, c.max_fg_per_class)
            idx_list.append(fg_idx)
            ok_list.append(top > c.seg_score_thresh[cls_id])
            ctr_list.append(xyz[fg_idx] + votes[fg_idx, cls_id])
            cls_list.append(jnp.full((c.max_fg_per_class,), cls_id,
                                     jnp.int32))
        v_idx = jnp.concatenate(idx_list)
        v_ok = jnp.concatenate(ok_list)
        v_ctr = jnp.concatenate(ctr_list)
        v_cls = jnp.concatenate(cls_list)

        # virtual features: proj([feats, offset/10, logits, extra]);
        # original features: ori_proj(feats)
        offset = (v_ctr - xyz[v_idx]) / 10.0
        vfeat = self.virtual_proj(jnp.concatenate(
            [pfeat[v_idx], offset, seg_logits[v_idx],
             points[v_idx, 3:]], -1))
        ofeat = self.ori_proj(pfeat)

        union_pts = jnp.concatenate([xyz, v_ctr], 0)
        union_feat = jnp.concatenate([ofeat, vfeat], 0)
        union_ok = jnp.concatenate([pv, v_ok], 0)
        union_cls = jnp.concatenate(
            [jnp.full((xyz.shape[0],), -1, jnp.int32), v_cls], 0)

        vres = vx.voxelize(union_pts, union_ok, c.virtual_voxel_size,
                           c.pc_range, V)
        feat_v = vx.scatter_to_voxels(union_feat, vres.point2voxel, V,
                                      "mean")
        # mixer: two submanifold convs over the virtual grid
        vgrid = tuple(np.maximum(np.round(
            (np.asarray(c.pc_range[3:]) - np.asarray(c.pc_range[:3]))
            / np.asarray(c.virtual_voxel_size)), 1).astype(int))
        grid = sc.build_grid(vres.coords, vres.voxel_valid, vgrid)
        table = sc.neighbor_table(grid, vres.coords, vres.voxel_valid,
                                  sc.kernel_offsets(3))
        mix_ctx = GatherCtx(table, vres.voxel_valid)
        x = self.mixer1(feat_v, mix_ctx)
        x = self.mixer2(x, mix_ctx)

        # class-c virtual indicator per voxel
        seg = jnp.where(vres.point2voxel >= 0, vres.point2voxel, V)
        onehot = (jax.nn.one_hot(union_cls, ncls, dtype=jnp.float32)
                  * union_ok[:, None])
        has_cls = jax.ops.segment_max(
            onehot, seg, num_segments=V + 1)[:V] > 0       # [V, ncls]
        has_cls = has_cls & vres.voxel_valid[:, None]

        centers = ((vres.coords + 0.5)
                   * jnp.asarray(c.virtual_voxel_size, jnp.float32)
                   + jnp.asarray(c.pc_range[:3], jnp.float32))

        cluster_feats = jnp.zeros((C, x.shape[-1]), x.dtype)
        cluster_xyz = jnp.zeros((C, 3), jnp.float32)
        cluster_valid = jnp.zeros((C,), bool)
        for cls_id in range(ncls):
            flag = has_cls[:, cls_id]
            rank = jnp.cumsum(flag.astype(jnp.int32)) - 1
            slot = jnp.where(flag & (rank < Kc), cls_id * Kc + rank, C)
            cluster_feats = cluster_feats.at[slot].set(x, mode="drop")
            cluster_xyz = cluster_xyz.at[slot].set(centers, mode="drop")
            cluster_valid = cluster_valid.at[slot].set(flag, mode="drop")
        return cluster_feats, cluster_xyz, cluster_valid

    def __call__(self, points, mask, train: bool = False):
        c = self.cfg
        ncls = c.num_classes
        C = c.max_clusters
        seg_logits, votes, pv, pfeat = self.segment(points, mask)

        if not c.use_clustering:   # FSDv2 virtual-voxel path
            cluster_feats, cluster_xyz, cluster_valid = \
                self._virtual_voxels(points,
                                     jax.lax.stop_gradient(seg_logits),
                                     jax.lax.stop_gradient(votes), pv,
                                     pfeat)
            cluster_class = jnp.arange(C, dtype=jnp.int32) \
                // c.max_clusters_per_class
            cls_logits, reg_preds = self.head(cluster_feats, train=train)
            boxes_tasks = coder.point_decode(reg_preds,
                                             cluster_xyz[:, None, :])
            own = jnp.take_along_axis(
                boxes_tasks, cluster_class[:, None, None].astype(jnp.int32)
                .repeat(7, -1), axis=1)[:, 0]
            return dict(seg_logits=seg_logits, votes=votes, point_valid=pv,
                        cls=cls_logits, reg_tasks=reg_preds,
                        boxes_tasks=boxes_tasks, boxes=own,
                        cluster_valid=cluster_valid,
                        cluster_centers=cluster_xyz,
                        cluster_class=cluster_class)

        fg_idx, fg_label, fg_centers = self.group(
            points, jax.lax.stop_gradient(seg_logits),
            jax.lax.stop_gradient(votes), pv)

        # flatten per-class foreground sets
        flat_idx = fg_idx.reshape(-1)                       # [ncls*Nf]
        flat_label = fg_label.reshape(-1)
        flat_centers = fg_centers.reshape(-1, 3)
        valid = flat_label >= 0
        seg_ids = jnp.where(valid, flat_label, C)

        # cluster base point = mean of predicted centers (extract_feat,
        # single_stage_fsd.py:471-474)
        csum = jax.ops.segment_sum(flat_centers, seg_ids, num_segments=C + 1)
        cnt = jax.ops.segment_sum(jnp.ones_like(flat_centers[:, :1]),
                                  seg_ids, num_segments=C + 1)
        cluster_xyz = (csum / jnp.clip(cnt, 1, None))[:C]
        cluster_valid = cnt[:C, 0] > 0
        cluster_class = jnp.arange(C, dtype=jnp.int32) \
            // c.max_clusters_per_class

        # per-point SIR input: [seg_logits, votes, point feats]
        xyz = points[flat_idx, :3]
        feats = jnp.concatenate(
            [seg_logits[flat_idx],
             votes[flat_idx].reshape(-1, ncls * 3),
             pfeat[flat_idx]], -1)
        if not c.use_clustering:   # FSDv2 virtual-point projector
            feats = jnp.concatenate(
                [feats, self.virtual_proj(
                    jnp.concatenate([flat_centers, feats], -1))], -1)
        f_cluster = xyz - jnp.where(
            valid[:, None], cluster_xyz[jnp.clip(flat_label, 0, C - 1)], 0.0)
        _, cluster_feats = self.sir(xyz, feats, f_cluster, seg_ids, valid, C)

        cls_logits, reg_preds = self.head(cluster_feats, train=train)

        # decode every task's boxes against the cluster base point
        boxes_tasks = coder.point_decode(
            reg_preds, cluster_xyz[:, None, :])             # [C, T, 7]
        own = jnp.take_along_axis(
            boxes_tasks, cluster_class[:, None, None].astype(jnp.int32)
            .repeat(7, -1), axis=1)[:, 0]                   # [C, 7]

        return dict(seg_logits=seg_logits, votes=votes, point_valid=pv,
                    cls=cls_logits,                   # [C, T] task logits
                    reg_tasks=reg_preds,              # [C, T, 8]
                    boxes_tasks=boxes_tasks,          # [C, T, 7]
                    boxes=own,                        # own-class decode
                    cluster_valid=cluster_valid,
                    cluster_centers=cluster_xyz,
                    cluster_class=cluster_class)


def focal_bce(logits, targets, alpha, gamma):
    p = jax.nn.sigmoid(logits)
    ce = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    p_t = p * targets + (1 - p) * (1 - targets)
    a_t = alpha * targets + (1 - alpha) * (1 - targets)
    return a_t * ((1 - p_t) ** gamma) * ce


def fsd_loss(model_out, points, gt_boxes, gt_labels, gt_valid,
             cfg: FSDConfig | None = None):
    """Reference loss recipe.

    * segmentation: per-class sigmoid focal (gamma 3, alpha 0.8) with
      per-point class targets from box membership (``VoteSegHead.losses``),
    * votes: L1 to the gravity center of the containing box, on the point's
      OWN class channel only,
    * cluster head, per task t (``SparseClusterHeadV2.loss_single_task``):
      focal cls (gamma 2, alpha 0.25, w 2) with positives = clusters whose
      base point lies in a class-t GT box; L1 on the 8-d point-coder target
      with center/size/rot weights 0.5/0.5/0.2, averaged over positives.
    """
    from ..core import boxes as box_ops
    cfg = cfg or FSDConfig()
    f32 = jnp.float32

    pv = model_out["point_valid"]
    xyz = points[:, :3]
    inbox = jax.vmap(
        lambda b: box_ops.points_in_boxes(xyz[None], b[None, None])[0, 0]
    )(gt_boxes)  # [G, N]
    inbox = inbox & gt_valid[:, None]
    fg = jnp.any(inbox, axis=0)
    gt_of_point = jnp.argmax(inbox, axis=0)
    point_cls = gt_labels[gt_of_point]                      # [N]

    seg_logits = model_out["seg_logits"]                    # [N, ncls]
    ncls = seg_logits.shape[-1]
    seg_tgt = (jax.nn.one_hot(point_cls, ncls)
               * fg[:, None].astype(f32))
    seg_ce = focal_bce(seg_logits, seg_tgt, cfg.seg_focal_alpha,
                       cfg.seg_focal_gamma)
    pvf = pv.astype(f32)
    loss_seg = cfg.seg_weight * jnp.sum(seg_ce * pvf[:, None]) / jnp.clip(
        jnp.sum(pvf), 1, None)

    # votes: own-class channel only
    gctr = box_ops.gravity_center(gt_boxes)[gt_of_point]
    vote_tgt = gctr - xyz
    own_vote = jnp.take_along_axis(
        model_out["votes"], point_cls[:, None, None].repeat(3, -1),
        axis=1)[:, 0]
    vw = (fg & pv).astype(f32)
    loss_vote = cfg.vote_weight * jnp.sum(
        jnp.abs(own_vote - vote_tgt) * vw[:, None]) / jnp.clip(
        jnp.sum(vw), 1, None)

    # cluster head: per-task assignment + losses
    cc = model_out["cluster_centers"]
    cvalid = model_out["cluster_valid"]
    cin = jax.vmap(
        lambda b: box_ops.points_in_boxes(cc[None], b[None, None])[0, 0]
    )(gt_boxes)                                            # [G, C]
    cin = cin & gt_valid[:, None]

    code_w = jnp.asarray([cfg.center_weight] * 3 + [cfg.size_weight] * 3
                         + [cfg.rot_weight] * 2, f32)
    loss_cls = 0.0
    loss_center = 0.0
    loss_size = 0.0
    loss_rot = 0.0
    num_pos_total = 0.0
    for t in range(ncls):
        t_mask = (gt_labels == t) & gt_valid
        cin_t = cin & t_mask[:, None]
        pos = jnp.any(cin_t, axis=0) & cvalid               # [C]
        gt_idx = jnp.argmax(cin_t, axis=0)
        gt_t = gt_boxes[gt_idx]

        cls_tgt = pos.astype(f32)
        cw = cvalid.astype(f32)
        cls_avg = jnp.clip(jnp.sum(cw), 1, None)
        loss_cls += cfg.cls_weight * jnp.sum(
            focal_bce(model_out["cls"][:, t], cls_tgt,
                      cfg.cls_focal_alpha, cfg.cls_focal_gamma) * cw
        ) / cls_avg

        reg_tgt = coder.point_encode(gt_t, cc)              # [C, 8]
        err = jnp.abs(model_out["reg_tasks"][:, t] - reg_tgt) * code_w
        posf = pos.astype(f32)
        num_pos = jnp.sum(posf)
        reg_avg = jnp.clip(num_pos, 1, None)
        loss_center += jnp.sum(err[:, :3] * posf[:, None]) / reg_avg
        loss_size += jnp.sum(err[:, 3:6] * posf[:, None]) / reg_avg
        loss_rot += jnp.sum(err[:, 6:8] * posf[:, None]) / reg_avg
        num_pos_total += num_pos

    total = (loss_seg + loss_vote + loss_cls + loss_center + loss_size
             + loss_rot)
    return dict(loss_seg=loss_seg, loss_vote=loss_vote, loss_cls=loss_cls,
                loss_center=loss_center, loss_size=loss_size,
                loss_rot=loss_rot, loss=total,
                num_fg_points=jnp.sum(fg & pv),
                num_pos_clusters=num_pos_total)
