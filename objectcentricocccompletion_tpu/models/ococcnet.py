"""OcOccNet — tracklet box refinement + object-centric occupancy completion.

TPU-native rebuild of the reference second stage:
``TrackletDetectorOCC`` -> ``TrackletRoIHeadOCC`` -> ``OccBBoxHead`` +
``OccAutoEncoder`` + ``OccDecoder``
(``models/detectors/tracklet_detector_occ.py``,
``models/roi_heads/tracklet_roi_head_occ.py``,
``models/roi_heads/bbox_heads/ococc_bbox_head.py``,
``models/roi_heads/bbox_heads/occ_ae_head.py``).

Data model: one tracklet = ``L`` frames, each with one RoI box and at most
``P`` points — everything dense with masks (see ``ops/roi_pool.py``). The
reference's assigner/sampler/reorder machinery reduces to elementwise masks
because GT alignment happens per-frame by timestamp in the data pipeline.

Forward graph (cfg names refer to ``configs/ococc/ococcnet.py``):
  1. pool points into per-frame RoIs (extra_wlh margin) -> 13-d geometry,
  2. RoI encoder: 6 SIR blocks over [global xyz, 8 point feats, geometry]
     -> 1536-d per-RoI observation feature,
  3. occupancy AE encoder: 6 SIR blocks over box-local coords + boundary
     feats + snapped voxel centers -> 1536-d local shape latent,
  4. causal temporal transformer across the tracklet's frames (sinusoidal
     frame encoding + MLP-encoded 7-dof RoI "box pos encoding"),
  5. fuse: shape_latent = MLP([ae_latent ; transformer_out]) (fused_mode
     'concat'); rcnn feature = MLP([shape_latent ; roi_encoder_out])
     (rcnn_trans=False),
  6. heads: IoU-soft classification, DeltaXYZWLHR box residuals, and the
     implicit occupancy decoder conditioned on shape_latent.
"""
from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..configs.ococcnet_config import OcOccNetConfig
from ..core import boxes as box_ops
from ..core import coder
from ..ops import packed as pk
from ..ops import roi_pool as rp
from .layers import Mlp, sinusoidal_position_encoding
from .occ_decoder import OccDecoder
from .sir import SIREncoder
from .transformer import TemporalEncoder


class TrackletBatch(NamedTuple):
    """One device-batch of regularized tracklets (all arrays static-shape)."""
    points: jax.Array        # [B, L, P, 3+F] shared-frame xyz + features
    points_mask: jax.Array   # [B, L, P] bool
    rois: jax.Array          # [B, L, 7] per-frame proposal boxes
    roi_scores: jax.Array    # [B, L] detector scores
    frame_inds: jax.Array    # [B, L] int32 temporal indices (may be shifted)
    gt_boxes: jax.Array      # [B, L, 7] per-frame GT box (ts-aligned)
    gt_valid: jax.Array      # [B, L] bool GT exists at this frame
    occ_points: jax.Array    # [B, K, 3] GT-box-frame occupancy samples
    occ_labels: jax.Array    # [B, K] int {1 occupied, 0 free}
    occ_mask: jax.Array      # [B, K] bool sample validity
    occ_score: jax.Array     # [B] annotation confidence (label_iou)


class OcOccNet(nn.Module):
    cfg: OcOccNetConfig

    def setup(self):
        cfg = self.cfg
        import jax.numpy as _jnp
        dt = _jnp.dtype(cfg.compute_dtype)
        self.with_occ = cfg.variant == "ococc"
        # remat applies to the dense layout only; the packed path's static
        # num_segments must not become a traced checkpoint argument
        use_remat = (getattr(cfg, "remat_sir", False)
                     and not getattr(cfg, "packed_point_budget", None))
        Encoder = nn.remat(SIREncoder) if use_remat else SIREncoder
        seg_mode = getattr(cfg, "use_segmentor", None)
        if seg_mode:
            from .tracklet_segmentor import (TrackletSegmentor,
                                             TrackletSegmentorConfig,
                                             tiny_segmentor_config)
            seg_cfg = (tiny_segmentor_config() if seg_mode == "tiny"
                       else TrackletSegmentorConfig())
            self.segmentor = TrackletSegmentor(seg_cfg)
        self.roi_encoder = Encoder(
            num_blocks=cfg.num_blocks, feat_channels=cfg.feat_channels,
            rel_mlp_hidden=cfg.rel_mlp_hidden,
            xyz_normalizer=cfg.xyz_normalizer, geo_input=True, act=cfg.act,
            dtype=dt)
        if not self.with_occ:
            # CTRL baseline: FullySparseBboxHead = RoI encoder + heads
            self.conv_cls = Mlp(tuple(cfg.cls_mlp) + (1,), is_head=True,
                                act=cfg.act, dropout=cfg.cls_dropout,
                                dtype=dt)
            self.conv_reg = Mlp(tuple(cfg.reg_mlp) + (coder.CODE_SIZE,),
                                is_head=True, act=cfg.act,
                                dropout=cfg.reg_dropout, dtype=dt)
            return
        self.ae_encoder = Encoder(
            num_blocks=cfg.num_blocks, feat_channels=cfg.feat_channels,
            rel_mlp_hidden=cfg.rel_mlp_hidden,
            xyz_normalizer=cfg.ae_xyz_normalizer, geo_input=False,
            act=cfg.act, dtype=dt)
        self.roi_pos_enc = Mlp(tuple(cfg.roi_pos_enc_mlp) + (cfg.d_model,),
                               is_head=True, act=cfg.act, dtype=dt)
        self.temporal = TemporalEncoder(
            num_layers=cfg.num_enc_layers, num_heads=cfg.attn_num_heads,
            ffn_dim=cfg.attn_ffn_dim, attn_dropout=cfg.attn_dropout,
            dtype=dt)
        self.conv_latent = Mlp(tuple(cfg.latent_mlp) + (cfg.d_model,),
                               is_head=True, act=cfg.act,
                               dropout=cfg.latent_dropout, dtype=dt)
        self.conv_fused = Mlp(tuple(cfg.fusion_mlp) + (cfg.d_model,),
                              is_head=True, act=cfg.act,
                              dropout=cfg.fusion_dropout, dtype=dt)
        self.conv_cls = Mlp(tuple(cfg.cls_mlp) + (1,), is_head=True,
                            act=cfg.act, dropout=cfg.cls_dropout, dtype=dt)
        self.conv_reg = Mlp(tuple(cfg.reg_mlp) + (coder.CODE_SIZE,),
                            is_head=True, act=cfg.act,
                            dropout=cfg.reg_dropout, dtype=dt)
        self.occ_decoder = OccDecoder(
            mlp_dims=self.cfg.occ_mlp, num_freqs=self.cfg.pos_encode_freqs,
            act=self.cfg.act, dropout=self.cfg.occ_dropout,
            pos_thresh=self.cfg.occ_pos_thresh, dtype=dt)

    def __call__(self, batch: TrackletBatch, *, train: bool = False) -> dict:
        cfg = self.cfg
        B, L, P, _ = batch.points.shape
        G = B * L

        pts_xyz = batch.points[..., :3]
        pts_feats = batch.points[..., 3:]
        if getattr(cfg, "use_segmentor", None):
            # whole-tracklet UNet features (TrackletSegmentor) append to
            # the per-point features consumed by the RoI encoder
            flat_p = batch.points.reshape(B, L * P, -1)
            flat_m = batch.points_mask.reshape(B, L * P)
            finds = jnp.broadcast_to(
                batch.frame_inds[:, :, None], (B, L, P)).reshape(B, L * P)
            seg_feats = jnp.stack(
                [self.segmentor(flat_p[b], finds[b], flat_m[b])
                 for b in range(B)], 0)
            pts_feats = jnp.concatenate(
                [pts_feats, seg_feats.reshape(B, L, P, -1)], -1)
        pool = rp.roi_pool(pts_xyz, batch.points_mask, batch.rois,
                           cfg.extra_wlh)

        if getattr(cfg, "packed_point_budget", None):
            roi_feats, ae_feats, nonempty = self._encode_packed(
                batch, pool, pts_xyz, pts_feats, train=train)
            return self._heads(batch, roi_feats, ae_feats, nonempty,
                               train=train)

        # optional per-RoI point compaction (the reference's
        # max_inbox_point cap, dynamic_point_pool_op.py:29): gather valid
        # pooled points to the front and truncate to the budget — the SIR
        # encoders then run at the smaller static P. Points are
        # permutation-invariant under the masked-max reductions.
        Q = getattr(cfg, "roi_point_budget", None)
        if Q and Q < P:
            order = jnp.argsort(~pool.mask, axis=-1,
                                stable=True)[..., :Q]    # valid first

            def take(x):
                if x.ndim == 3:
                    return jnp.take_along_axis(x, order, axis=2)
                return jnp.take_along_axis(x, order[..., None], axis=2)

            pts_xyz = take(pts_xyz)
            pts_feats = take(pts_feats)
            pool = rp.RoiPoolInfo(take(pool.mask), take(pool.local_xyz),
                                  take(pool.boundary_offset),
                                  take(pool.is_in_margin),
                                  take(pool.rel_xyz))
            P = Q

        nonempty = jnp.any(pool.mask, axis=-1)  # [B, L]

        def flat(x):
            return x.reshape((G,) + x.shape[2:])

        # ---- RoI observation encoder (ococc_bbox_head.roi_encode) ----
        roi_score_feat = jnp.broadcast_to(
            batch.roi_scores[..., None, None], (B, L, P, 1))
        enc_feats = jnp.concatenate([pts_feats, roi_score_feat], axis=-1)
        f_cluster = jnp.concatenate(
            [pool.local_xyz, pool.boundary_offset,
             pool.is_in_margin[..., None], pool.rel_xyz], axis=-1)  # 13-d
        # under remat the (non-array) train flag must not enter the
        # checkpointed call; SIR carries no dropout in any shipped config
        enc_kw = {} if getattr(cfg, "remat_sir", False) else \
            {"train": train}
        _, roi_feats = self.roi_encoder(
            flat(pts_xyz), flat(enc_feats), flat(pool.mask),
            flat(f_cluster), **enc_kw)
        roi_feats = roi_feats.reshape(B, L, -1)
        roi_feats = jnp.where(nonempty[..., None], roi_feats, 0.0)

        if not self.with_occ:   # CTRL: heads straight off the RoI encoder
            return self._heads(batch, roi_feats, None, nonempty, train=train)

        # ---- occupancy auto-encoder (occ_ae_head.encode) ----
        vox_centers = rp.quantize_to_voxel_centers(
            pool.local_xyz, batch.rois[..., 3:6], cfg.ae_voxel_size)
        ae_in = jnp.concatenate(
            [pts_feats[..., :2], pool.boundary_offset,
             pool.is_in_margin[..., None], vox_centers], axis=-1)  # 12-d
        _, ae_feats = self.ae_encoder(
            flat(pool.local_xyz), flat(ae_in), flat(pool.mask), **enc_kw)
        ae_feats = ae_feats.reshape(B, L, -1)
        ae_feats = jnp.where(nonempty[..., None], ae_feats, 0.0)
        return self._heads(batch, roi_feats, ae_feats, nonempty, train=train)

    def _encode_packed(self, batch: TrackletBatch, pool: rp.RoiPoolInfo,
                       pts_xyz: jax.Array, pts_feats: jax.Array, *,
                       train: bool):
        """Packed-segment encoders (the reference's global point budget,
        ``max_all_pts`` in ``ops/dynamic_point_pool_op.py:29-35``): valid
        pooled points of all frames compact into one [B, N] buffer with
        frame segment ids, so SIR matmul/LN bandwidth scales with actual
        occupancy instead of the [B, L, P] worst case."""
        cfg = self.cfg
        B, L = batch.rois.shape[:2]
        # cfg.packed_point_budget is defined at train length reg_len; the
        # effective budget scales with the actual (eval-bucket) length so
        # long tracklets keep the same average points per frame
        q = getattr(cfg, "packed_quantum", 0)
        per_frame = max(cfg.packed_point_budget // cfg.reg_len, q or 1)
        N = L * per_frame
        if q:
            N = -(-N // q) * q                    # round up to quantum
            packed = pk.pack_groups_aligned(pool.mask, N, q)
        else:
            packed = pk.pack_groups(pool.mask, N)
        seg = packed.seg_ids
        bseg = packed.block_seg

        # one fused row gather for every per-point channel
        allc = jnp.concatenate(
            [pts_xyz, pts_feats, pool.local_xyz, pool.boundary_offset,
             pool.is_in_margin[..., None], pool.rel_xyz], axis=-1)
        pc = pk.pack_rows(allc, packed.order)
        # sequence parallelism: pin the packed point axis to the model
        # mesh axis (no-op unless enabled) — every downstream per-point
        # matmul/LN shards, XLA inserts the segment-reduce collectives
        from ..parallel import sp as _sp
        pc = _sp.shard_seq(pc, 1)
        F = pts_feats.shape[-1]
        p_xyz = pc[..., 0:3]
        p_feats = pc[..., 3:3 + F]
        o = 3 + F
        p_local = pc[..., o:o + 3]
        p_boundary = pc[..., o + 3:o + 9]
        p_margin = pc[..., o + 9:o + 10]
        p_rel = pc[..., o + 10:o + 13]

        nonempty = pk.segment_any(seg, L)  # [B, L] post-truncation

        enc_kw = {"train": train}
        def bb(table):
            # per-frame data to per-point: block-level gather when aligned
            if bseg is not None:
                return pk.broadcast_back_blocked(table, bseg, N)
            return pk.broadcast_back(table, seg)

        # ---- RoI observation encoder ----
        roi_score_pt = bb(batch.roi_scores[..., None])
        enc_feats = jnp.concatenate([p_feats, roi_score_pt], axis=-1)
        f_cluster = jnp.concatenate(
            [p_local, p_boundary, p_margin, p_rel], axis=-1)  # 13-d
        _, roi_feats = self.roi_encoder(
            p_xyz, enc_feats, packed.valid, f_cluster, seg, L, bseg,
            **enc_kw)
        roi_feats = jnp.where(nonempty[..., None], roi_feats, 0.0)

        if not self.with_occ:
            return roi_feats, None, nonempty

        # ---- occupancy auto-encoder ----
        roi_sizes_pt = bb(batch.rois[..., 3:6])
        vox_centers = rp.quantize_to_voxel_centers_aligned(
            p_local, roi_sizes_pt, cfg.ae_voxel_size)
        ae_in = jnp.concatenate(
            [p_feats[..., :2], p_boundary, p_margin, vox_centers], axis=-1)
        _, ae_feats = self.ae_encoder(
            p_local, ae_in, packed.valid, None, seg, L, bseg, **enc_kw)
        ae_feats = jnp.where(nonempty[..., None], ae_feats, 0.0)
        return roi_feats, ae_feats, nonempty

    def _heads(self, batch: TrackletBatch, roi_feats: jax.Array,
               ae_feats: jax.Array | None, nonempty: jax.Array, *,
               train: bool) -> dict:
        cfg = self.cfg
        if not self.with_occ:   # CTRL: heads straight off the RoI encoder
            cls_logit = self.conv_cls(
                roi_feats, train=train)[..., 0].astype(jnp.float32)
            bbox_pred = self.conv_reg(
                roi_feats, train=train).astype(jnp.float32)
            return dict(cls_logit=cls_logit, bbox_pred=bbox_pred,
                        shape_latent=roi_feats, ae_latent=roi_feats,
                        nonempty=nonempty)

        # ---- temporal transformer ----
        pos = sinusoidal_position_encoding(batch.frame_inds, cfg.d_model)
        pos = pos + self.roi_pos_enc(batch.rois, train=train)
        window = -1 if train else cfg.test_attn_window
        fused = self.temporal(roi_feats, pos, causal=True, window=window,
                              train=train)

        # ---- latent fusion (fused_mode='concat') ----
        shape_latent = self.conv_latent(
            jnp.concatenate([ae_feats, fused], axis=-1),
            train=train).astype(jnp.float32)

        rcnn_in = fused if cfg.rcnn_trans else roi_feats
        rcnn_feats = self.conv_fused(
            jnp.concatenate([shape_latent, rcnn_in], axis=-1), train=train)

        cls_logit = self.conv_cls(rcnn_feats,
                                  train=train)[..., 0].astype(jnp.float32)
        bbox_pred = self.conv_reg(rcnn_feats,
                                  train=train).astype(jnp.float32)

        return dict(
            cls_logit=cls_logit,       # [B, L]
            bbox_pred=bbox_pred,       # [B, L, 7]
            shape_latent=shape_latent,  # [B, L, D]
            ae_latent=ae_feats,        # [B, L, D]
            nonempty=nonempty,         # [B, L]
        )

    def decode_occ(self, shape_latent: jax.Array, queries: jax.Array, *,
                   train: bool = False) -> jax.Array:
        """Occupancy logits for box-local ``queries`` [..., K, 3] conditioned
        on ``shape_latent`` [..., D]."""
        return self.occ_decoder(shape_latent, queries, train=train)


def gt_occ_to_roi_frame(occ_points: jax.Array, gt_boxes: jax.Array,
                        rois: jax.Array) -> jax.Array:
    """Transform GT-box-frame occupancy samples into each RoI's local frame.

    occ_points: [B, K, 3] (gravity-centered GT-box frame);
    gt_boxes, rois: [B, L, 7]. Returns [B, L, K, 3].
    Mirrors ``ococc_bbox_head.loss_occ`` (``ococc_bbox_head.py:680-699``).
    """
    pts = occ_points[:, None]  # [B, 1, K, 3]
    ego = box_ops.local_to_global(pts, gt_boxes)       # -> ego frame
    return box_ops.box_local_coords(ego, rois)         # -> RoI frame


class OcOccNetWithLoss(nn.Module):
    """Training wrapper computing the reference loss dict.

    Loss semantics follow ``OccBBoxHead.loss`` / ``loss_occ``
    (``ococc_bbox_head.py:433-811``) with globally-synced average factors
    (the ``sync_cls/reg_avg_factor`` reduce_means become free because loss
    is computed on the global batch under pjit).
    """
    cfg: OcOccNetConfig

    def setup(self):
        self.net = OcOccNet(self.cfg, name="net")

    def __call__(self, batch: TrackletBatch, *, train: bool = True):
        cfg = self.cfg
        out = self.net(batch, train=train)
        B, L = out["cls_logit"].shape
        f32 = jnp.float32

        iou = box_ops.aligned_iou_3d(batch.rois, batch.gt_boxes)
        iou = jnp.where(batch.gt_valid, iou, 0.0)

        # --- classification: IoU-soft labels, BCE, masked by nonempty ---
        soft = jnp.clip((iou - cfg.cls_neg_thr)
                        / (cfg.cls_pos_thr - cfg.cls_neg_thr), 0.0, 1.0)
        cls_w = out["nonempty"].astype(f32)
        bce = _bce_with_logits(out["cls_logit"], soft)
        cls_avg = f32(B * L)
        loss_cls = cfg.loss_cls_weight * jnp.sum(bce * cls_w) / cls_avg

        # --- box regression: L1 with code weights over positive RoIs ---
        pos = batch.gt_valid & out["nonempty"]
        posf = pos.astype(f32)
        num_pos = jnp.sum(posf)
        targets = coder.encode_roi_targets(batch.rois, batch.gt_boxes)
        code_w = jnp.asarray(cfg.rcnn_code_weights, f32)
        l1 = jnp.abs(out["bbox_pred"] - targets) * code_w
        loss_bbox = (cfg.loss_bbox_weight
                     * jnp.sum(l1 * posf[..., None])
                     / jnp.clip(num_pos, 1.0, None))

        loss_corner = 0.0
        if cfg.corner_loss_weight > 0:
            # FullySparseBboxHead corner loss (fsd_bbox_head.py:
            # get_corner_loss_lidar): huber of the min-over-heading-flip
            # corner distance between decoded and GT boxes, positives only
            pred_boxes = coder.decode_from_rois(batch.rois,
                                                out["bbox_pred"])
            pc = box_ops.corners_3d(pred_boxes)
            gc0 = box_ops.corners_3d(batch.gt_boxes)
            gt_flip = batch.gt_boxes.at[..., 6].add(jnp.pi)
            gc1 = box_ops.corners_3d(gt_flip)
            dist = jnp.minimum(
                jnp.linalg.norm(pc - gc0, axis=-1),
                jnp.linalg.norm(pc - gc1, axis=-1))        # [B, L, 8]
            quad = jnp.minimum(dist, 1.0)
            huber = 0.5 * quad ** 2 + (dist - quad)
            loss_corner = (cfg.corner_loss_weight
                           * jnp.sum(jnp.mean(huber, -1) * posf)
                           / jnp.clip(num_pos, 1.0, None))

        if cfg.variant != "ococc":   # CTRL: box losses only
            total = loss_cls + loss_bbox + loss_corner
            losses = dict(loss_rcnn_cls=loss_cls, loss_rcnn_bbox=loss_bbox,
                          loss_rcnn_corner=loss_corner,
                          loss=total, num_pos_rois=num_pos)
            return total, losses

        # --- occupancy completion ---
        queries = gt_occ_to_roi_frame(batch.occ_points, batch.gt_boxes,
                                      batch.rois)  # [B, L, K, 3]
        from ..parallel import sp as _sp
        queries = _sp.shard_seq(queries, 2)  # SP: shard the K query axis
        occ_logits = self.net.decode_occ(out["shape_latent"], queries,
                                         train=train)
        occ_lab = jnp.broadcast_to(
            (batch.occ_labels == 1)[:, None], occ_logits.shape).astype(f32)
        conf = (batch.occ_score > cfg.occ_label_thresh).astype(f32)
        occ_w = (posf[..., None]
                 * conf[:, None, None]
                 * batch.occ_mask[:, None].astype(f32))
        occ_bce = _bce_with_logits(occ_logits, occ_lab)
        K = occ_logits.shape[-1]
        occ_denom = jnp.clip(num_pos * K, 1.0, None)
        loss_occ = cfg.loss_occ_weight * jnp.sum(occ_bce * occ_w) / occ_denom

        total = loss_cls + loss_bbox + loss_occ + loss_corner
        metrics = _metrics(out, soft, cls_w, occ_logits, occ_lab, occ_w,
                           num_pos)
        losses = dict(loss_rcnn_cls=loss_cls, loss_rcnn_bbox=loss_bbox,
                      loss_rcnn_occ=loss_occ, loss=total)
        return total, {**losses, **metrics}

    def predict(self, batch: TrackletBatch):
        """Inference: refined boxes + scores + shape latents."""
        out = self.net(batch, train=False)
        boxes = coder.decode_from_rois(batch.rois, out["bbox_pred"])
        scores = jax.nn.sigmoid(out["cls_logit"])
        return dict(boxes=boxes, scores=scores, **out)

    def decode_occ_queries(self, latent, queries):
        return self.net.decode_occ(latent, queries, train=False)


def _bce_with_logits(logits, targets):
    # numerically-stable binary cross entropy with probabilistic targets
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))


def _metrics(out, soft, cls_w, occ_logits, occ_lab, occ_w, num_pos):
    f32 = jnp.float32
    pred_pos = (jax.nn.sigmoid(out["cls_logit"]) > 0.5)
    lab_pos = soft > 0.5
    valid = cls_w > 0
    acc = _safe_mean((pred_pos == lab_pos) & valid, valid)
    occ_pred = jax.nn.sigmoid(occ_logits) > 0.5
    occ_valid = occ_w > 0
    occ_pos = occ_lab > 0.5
    return dict(
        num_pos_rois=num_pos,
        cls_acc=acc,
        occ_recall_pos=_safe_mean(occ_pred & occ_pos & occ_valid,
                                  occ_pos & occ_valid),
        occ_recall_neg=_safe_mean((~occ_pred) & (~occ_pos) & occ_valid,
                                  (~occ_pos) & occ_valid),
        occ_frac_occupied=_safe_mean(occ_pos & occ_valid, occ_valid),
    ).copy()


def _safe_mean(num_mask, den_mask):
    f32 = jnp.float32
    return (jnp.sum(num_mask.astype(f32))
            / jnp.clip(jnp.sum(den_mask.astype(f32)), 1.0, None))
