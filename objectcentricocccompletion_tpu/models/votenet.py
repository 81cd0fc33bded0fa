"""VoteNet — indoor 3D detection over the PointNet++ substrate.

Rebuild of the reference's stock indoor family (``mmdet3d/models/detectors/
votenet.py``, ``models/backbones/pointnet2_sa_ssg.py``,
``models/dense_heads/vote_head.py`` — the consumer of the ball-query/FPS/
grouping/interpolation kernels replaced TPU-natively in
``ops/pointnet.py``):

  * PointNet++ SSG backbone: stacked set-abstraction layers (FPS centers,
    ball-query grouping, shared MLP + masked max) and feature-propagation
    upsampling back to the seed level,
  * voting module: every seed regresses a center offset + feature residual,
  * proposal head: FPS over the votes, ball-query aggregation, and an MLP
    predicting objectness, center refinement, log-size, (optional) yaw and
    semantic scores.

Everything is static-shape/masked like the rest of the framework; the
sample contract matches the frame datasets (ScanNet / SUN RGB-D readers in
``data/indoor_dataset.py``), so ``training/detector_trainer.py`` and the
KITTI-protocol evaluator drive it unchanged.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import pointnet as pn
from .layers import Mlp


@dataclasses.dataclass(frozen=True)
class VoteNetConfig:
    num_classes: int = 18
    max_points: int = 40000
    in_feats: int = 3                  # rgb channels after xyz
    # (npoint, radius, k, mlp widths) per set-abstraction stage
    sa_layers: Tuple = ((2048, 0.2, 64, (64, 64, 128)),
                       (1024, 0.4, 32, (128, 128, 256)),
                       (512, 0.8, 16, (128, 128, 256)),
                       (256, 1.2, 16, (128, 128, 256)))
    fp_channels: Tuple = ((256, 256), (256, 256))
    num_proposals: int = 256
    vote_mlp: Tuple[int, ...] = (256, 256)
    agg_radius: float = 0.3
    agg_k: int = 16
    agg_mlp: Tuple[int, ...] = (128, 128, 128)
    head_mlp: Tuple[int, ...] = (128, 128)
    with_yaw: bool = False             # False = ScanNet, True = SUN RGB-D
    # loss thresholds (vote_head train_cfg: pos/neg distance)
    pos_dist: float = 0.3
    neg_dist: float = 0.6


def tiny_votenet_config(num_classes: int = 4) -> VoteNetConfig:
    return VoteNetConfig(
        num_classes=num_classes, max_points=1024, in_feats=3,
        sa_layers=((256, 0.4, 16, (16, 16)), (64, 0.8, 8, (16, 32))),
        fp_channels=((32,),), num_proposals=16, vote_mlp=(16,),
        agg_mlp=(16, 16), head_mlp=(16,), agg_k=8)


class SetAbstraction(nn.Module):
    npoint: int
    radius: float
    k: int
    mlp: Sequence[int]

    @nn.compact
    def __call__(self, xyz, feats, mask):
        """xyz [N, 3]; feats [N, C] or None; mask [N] ->
        (centers [P, 3], out [P, C'], center_mask [P])."""
        idx = pn.furthest_point_sample(xyz, mask, self.npoint)
        centers = xyz[idx]
        cmask = mask[idx]
        nidx, nvalid = pn.ball_query(centers, xyz, mask, self.radius,
                                     self.k)
        grouped = xyz[nidx] - centers[:, None, :]
        if feats is not None:
            grouped = jnp.concatenate([grouped, feats[nidx]], -1)
        x = Mlp(tuple(self.mlp), act="relu", name="mlp")(grouped)
        x = jnp.where(nvalid[..., None], x, -1e30)
        x = jnp.max(x, axis=1)
        x = jnp.where(cmask[:, None] & jnp.any(nvalid, -1)[:, None], x, 0.0)
        return centers, x, cmask


class FeaturePropagation(nn.Module):
    mlp: Sequence[int]

    @nn.compact
    def __call__(self, q_xyz, q_feats, s_xyz, s_mask, s_feats):
        up = pn.three_interpolate(q_xyz, s_xyz, s_mask, s_feats)
        x = jnp.concatenate([q_feats, up], -1) if q_feats is not None else up
        return Mlp(tuple(self.mlp), act="relu", name="mlp")(x)


class VoteNet(nn.Module):
    cfg: VoteNetConfig

    @nn.compact
    def __call__(self, points, mask):
        c = self.cfg
        xyz = points[:, :3]
        feats = points[:, 3:3 + c.in_feats] if c.in_feats else None

        # ---- PointNet++ SSG encoder ----
        levels = [(xyz, feats, mask)]
        for i, (npoint, radius, k, mlp) in enumerate(c.sa_layers):
            cx, cf, cm = SetAbstraction(npoint, radius, k, mlp,
                                        name=f"sa{i}")(*levels[-1])
            levels.append((cx, cf, cm))
        # ---- FP decoder back to the seed level ----
        sx, sf, sm = levels[-1]
        for j, mlp in enumerate(c.fp_channels):
            qx, qf, qm = levels[-2 - j]
            sf = FeaturePropagation(mlp, name=f"fp{j}")(qx, qf, sx, sm, sf)
            sx, sm = qx, qm
        seed_xyz, seed_feats, seed_mask = sx, sf, sm

        # ---- voting ----
        vote = Mlp(tuple(c.vote_mlp) + (3 + seed_feats.shape[-1],),
                   is_head=True, act="relu", name="vote")(seed_feats)
        vote_xyz = seed_xyz + vote[:, :3]
        vote_feats = seed_feats + vote[:, 3:]
        vote_xyz = jnp.where(seed_mask[:, None], vote_xyz, 0.0)

        # ---- proposal aggregation ----
        pidx = pn.furthest_point_sample(vote_xyz, seed_mask,
                                        c.num_proposals)
        agg_xyz = vote_xyz[pidx]
        agg_mask = seed_mask[pidx]
        nidx, nvalid = pn.ball_query(agg_xyz, vote_xyz, seed_mask,
                                     c.agg_radius, c.agg_k)
        grouped = jnp.concatenate(
            [vote_xyz[nidx] - agg_xyz[:, None, :], vote_feats[nidx]], -1)
        x = Mlp(tuple(c.agg_mlp), act="relu", name="agg")(grouped)
        x = jnp.max(jnp.where(nvalid[..., None], x, -1e30), axis=1)
        x = jnp.where(agg_mask[:, None], x, 0.0)

        # ---- heads: objectness, center delta, log size, yaw, classes ----
        out_dim = 1 + 3 + 3 + (2 if c.with_yaw else 0) + c.num_classes
        head = Mlp(tuple(c.head_mlp) + (out_dim,), is_head=True,
                   act="relu", name="head")(x)
        obj = head[:, 0]
        center = agg_xyz + head[:, 1:4]
        size = jnp.exp(jnp.clip(head[:, 4:7], -4.0, 3.0))
        o = 7
        if c.with_yaw:
            sn, cs = head[:, 7], head[:, 8]
            ok = sn * sn + cs * cs > 1e-12
            yaw = jnp.where(ok, jnp.arctan2(jnp.where(ok, sn, 0.0),
                                            jnp.where(ok, cs, 1.0)), 0.0)
            o = 9
        else:
            yaw = jnp.zeros_like(obj)
        sem = head[:, o:]
        boxes = jnp.concatenate(
            [center[:, :2], (center[:, 2] - size[:, 2] / 2)[:, None],
             size, yaw[:, None]], -1)
        return dict(seed_xyz=seed_xyz, seed_mask=seed_mask,
                    vote_xyz=vote_xyz, obj=obj, boxes=boxes, sem=sem,
                    proposal_mask=agg_mask)

    # -------------------------------------------------------------- loss
    def loss(self, points, mask, gt_boxes, gt_labels, gt_valid):
        """VoteHead loss recipe (``models/dense_heads/vote_head.py``):
        vote L1 for seeds inside a GT box, objectness by center distance
        (pos < pos_dist, neg > neg_dist, ignore between), masked center /
        log-size / yaw L1 and semantic CE for positive proposals."""
        from ..core import boxes as box_ops
        c = self.cfg
        f32 = jnp.float32
        out = self(points, mask)

        gctr = box_ops.gravity_center(gt_boxes)
        gvalid = gt_valid

        # --- votes: seeds inside a GT box vote for ITS gravity center ---
        seed = out["seed_xyz"]
        inbox = jax.vmap(
            lambda b: box_ops.points_in_boxes(seed[None], b[None, None])
            [0, 0])(gt_boxes) & gvalid[:, None]            # [M, S]
        seed_fg = jnp.any(inbox, 0) & out["seed_mask"]
        seed_gt = jnp.argmax(inbox, 0)
        vote_tgt = gctr[seed_gt]
        vw = seed_fg.astype(f32)
        loss_vote = jnp.sum(
            jnp.abs(out["vote_xyz"] - vote_tgt) * vw[:, None]
        ) / jnp.clip(jnp.sum(vw), 1, None)

        # --- objectness by distance to the nearest GT center ---
        pb = out["boxes"]
        pctr = box_ops.gravity_center(pb)
        d2 = jnp.sum((pctr[:, None] - gctr[None]) ** 2, -1)
        d2 = jnp.where(gvalid[None, :], d2, 1e10)
        dmin = jnp.sqrt(jnp.min(d2, -1))
        near_gt = jnp.argmin(d2, -1)
        pos = (dmin < c.pos_dist) & out["proposal_mask"]
        neg = (dmin > c.neg_dist) & out["proposal_mask"]
        lab = pos.astype(f32)
        w = (pos | neg).astype(f32)
        bce = (jnp.maximum(out["obj"], 0) - out["obj"] * lab
               + jnp.log1p(jnp.exp(-jnp.abs(out["obj"]))))
        loss_obj = jnp.sum(bce * w) / jnp.clip(jnp.sum(w), 1, None)

        # --- box regression for positives ---
        posf = pos.astype(f32)
        npos = jnp.clip(jnp.sum(posf), 1, None)
        tgt = gt_boxes[near_gt]
        loss_center = jnp.sum(
            jnp.abs(pctr - box_ops.gravity_center(tgt))
            * posf[:, None]) / npos
        loss_size = jnp.sum(
            jnp.abs(jnp.log(jnp.clip(pb[:, 3:6], 1e-3, None))
                    - jnp.log(jnp.clip(tgt[:, 3:6], 1e-3, None)))
            * posf[:, None]) / npos
        loss_yaw = jnp.sum(jnp.abs(jnp.sin(pb[:, 6] - tgt[:, 6])) * posf
                           ) / npos if c.with_yaw else 0.0

        # --- semantic classification for positives ---
        sem_lab = jax.nn.one_hot(gt_labels[near_gt], c.num_classes)
        logp = jax.nn.log_softmax(out["sem"], -1)
        loss_sem = -jnp.sum(jnp.sum(sem_lab * logp, -1) * posf) / npos

        total = (loss_vote + 0.5 * loss_obj + loss_center + loss_size
                 + 0.1 * loss_yaw + 0.1 * loss_sem)
        return dict(loss_vote=loss_vote, loss_obj=loss_obj,
                    loss_center=loss_center, loss_size=loss_size,
                    loss_sem=loss_sem, loss=total,
                    num_pos=jnp.sum(posf))

    def predict(self, points, mask, max_out: int = 256):
        out = self(points, mask)
        scores = jax.nn.sigmoid(out["obj"]) * out["proposal_mask"]
        labels = jnp.argmax(out["sem"], -1)
        return out["boxes"], scores, labels, out["proposal_mask"]
