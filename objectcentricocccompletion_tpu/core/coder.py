"""Delta-XYZWLHR box coder and canonical RoI-frame target transforms.

Matches the reference ``DeltaXYZWLHRBBoxCoder``
(``mmdet3d/core/bbox/coders/delta_xyzwhlr_bbox_coder.py``) numerically, and
re-implements the canonical-frame encode/decode pair of
``OccBBoxHead._get_target_single`` (``ococc_bbox_head.py:1213-1239``) /
``FullySparseBboxHead.decode_from_rois`` (``fsd_bbox_head.py:1075-1096``) in
this framework's single local-frame convention (no pi/2 offset — see
``core/boxes.py`` docstring).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import boxes as box_ops

CODE_SIZE = 7


def encode(anchors: jax.Array, targets: jax.Array) -> jax.Array:
    """Deltas taking ``anchors`` to ``targets``; boxes are bottom-center."""
    xa, ya, za, wa, la, ha, ra = jnp.split(anchors, 7, axis=-1)
    xg, yg, zg, wg, lg, hg, rg = jnp.split(targets, 7, axis=-1)
    za = za + ha / 2
    zg = zg + hg / 2
    diag = jnp.sqrt(la**2 + wa**2)
    xt = (xg - xa) / diag
    yt = (yg - ya) / diag
    zt = (zg - za) / ha
    wt = jnp.log(wg / wa)
    lt = jnp.log(lg / la)
    ht = jnp.log(hg / ha)
    rt = rg - ra
    # NOTE: reference emits [xt, yt, zt, wt, lt, ht, rt] where its "wt" slot
    # holds log(w_g/w_a) of dims[3]; we keep the same slot order.
    return jnp.concatenate([xt, yt, zt, wt, lt, ht, rt], axis=-1)


def decode(anchors: jax.Array, deltas: jax.Array) -> jax.Array:
    xa, ya, za, wa, la, ha, ra = jnp.split(anchors, 7, axis=-1)
    xt, yt, zt, wt, lt, ht, rt = jnp.split(deltas, 7, axis=-1)
    za = za + ha / 2
    diag = jnp.sqrt(la**2 + wa**2)
    xg = xt * diag + xa
    yg = yt * diag + ya
    zg = zt * ha + za
    wg = jnp.exp(wt) * wa
    lg = jnp.exp(lt) * la
    hg = jnp.exp(ht) * ha
    rg = rt + ra
    zg = zg - hg / 2
    return jnp.concatenate([xg, yg, zg, wg, lg, hg, rg], axis=-1)


POINT_EPS = 1e-6


def point_encode(boxes: jax.Array, base_points: jax.Array) -> jax.Array:
    """``BasePointBBoxCoder.encode`` (``core/bbox/coders/
    base_point_bbox_coder.py:36-58``): regression target of a box w.r.t. its
    cluster base point — [delta_xyz, log dims, sin yaw, cos yaw] (8-d)."""
    delta = boxes[..., :3] - base_points
    log_dims = jnp.log(boxes[..., 3:6] + POINT_EPS)
    yaw = boxes[..., 6:7]
    return jnp.concatenate(
        [delta, log_dims, jnp.sin(yaw), jnp.cos(yaw)], axis=-1)


def point_decode(reg: jax.Array, base_points: jax.Array) -> jax.Array:
    """Inverse of :func:`point_encode` (``base_point_bbox_coder.py:60-82``).
    Safe atan2 at the exact (0, 0) corner keeps gradients finite."""
    xyz = reg[..., :3] + base_points
    dims = jnp.exp(reg[..., 3:6]) - POINT_EPS
    sn, cs = reg[..., 6], reg[..., 7]
    ok = sn * sn + cs * cs > 1e-12
    yaw = jnp.where(ok, jnp.arctan2(jnp.where(ok, sn, 0.0),
                                    jnp.where(ok, cs, 1.0)), 0.0)
    return jnp.concatenate([xyz, dims, yaw[..., None]], axis=-1)


def canonical_yaw_target(rel_yaw: jax.Array) -> jax.Array:
    """Flip-invariant heading target in (-pi/2, pi/2].

    Mirrors ``ococc_bbox_head.py:1226-1234``: opposite-facing GT boxes are
    flipped by pi, then wrapped to (-pi/2, pi/2) and clamped.
    """
    ry = jnp.mod(rel_yaw, 2 * jnp.pi)
    opposite = (ry > jnp.pi * 0.5) & (ry < jnp.pi * 1.5)
    ry = jnp.where(opposite, jnp.mod(ry + jnp.pi, 2 * jnp.pi), ry)
    ry = jnp.where(ry > jnp.pi, ry - 2 * jnp.pi, ry)
    return jnp.clip(ry, -jnp.pi / 2, jnp.pi / 2)


def encode_roi_targets(rois: jax.Array, gt: jax.Array) -> jax.Array:
    """Regression targets for GT boxes w.r.t. RoI boxes, both [..., 7].

    Canonical transform: GT center into the RoI's local frame rotated by
    -(roi_yaw + pi/2) — the reference's exact parametrization
    (``ococc_bbox_head.py:1221-1224``, executed-pinned by
    tests/test_occ_target_parity.py); GT yaw relative +
    flip-canonicalized; then delta-encode against a zero-centered,
    zero-yaw anchor with RoI sizes.
    """
    roi_yaw = jnp.mod(rois[..., 6], 2 * jnp.pi)
    rel_ctr = box_ops.rotate_z(
        (gt[..., 0:3] - rois[..., 0:3])[..., None, :],
        -(roi_yaw[..., None] + jnp.pi / 2)
    )[..., 0, :]
    rel_yaw = canonical_yaw_target(gt[..., 6] - roi_yaw)
    gt_ct = jnp.concatenate(
        [rel_ctr, gt[..., 3:6], rel_yaw[..., None]], axis=-1
    )
    anchor = jnp.concatenate(
        [jnp.zeros_like(rois[..., 0:3]), rois[..., 3:6],
         jnp.zeros_like(rois[..., 6:7])], axis=-1
    )
    return encode(anchor, gt_ct)


def decode_from_rois(rois: jax.Array, deltas: jax.Array) -> jax.Array:
    """Inverse of :func:`encode_roi_targets`: predicted deltas -> ego boxes."""
    anchor = jnp.concatenate(
        [jnp.zeros_like(rois[..., 0:3]), rois[..., 3:6],
         jnp.zeros_like(rois[..., 6:7])], axis=-1
    )
    local = decode(anchor, deltas)
    ctr = box_ops.rotate_z(local[..., None, 0:3],
                           rois[..., None, 6] + jnp.pi / 2)[..., 0, :]
    ctr = ctr + rois[..., 0:3]
    yaw = local[..., 6:7] + rois[..., 6:7]
    return jnp.concatenate([ctr, local[..., 3:6], yaw], axis=-1)
