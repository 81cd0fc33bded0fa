"""3D box geometry in LiDAR coordinates — pure jnp, fully batched.

Box layout: ``[x, y, z, w, l, h, yaw]`` where
  * ``(x, y, z)`` is the **bottom center** (reference:
    ``mmdet3d/core/bbox/structures/lidar_box3d.py:15-42``),
  * ``w = x_size``, ``l = y_size``, ``h = z_size``,
  * ``yaw`` rotates around the z axis.

Rotation convention matches the reference ``rotation_3d_in_axis`` (reference:
``mmdet3d/core/bbox/structures/utils.py:21-61``): for ``axis=2``,

    out_x =  x * cos(a) + y * sin(a)
    out_y = -x * sin(a) + y * cos(a)

Canonical box-local frame used THROUGHOUT this framework (the reference uses
two frames offset by pi/2 — the CUDA pooling frame vs. the occupancy frame —
and compensates in ``occ_ae_head.py:215-220``; we use one frame everywhere):

    local = rotate_z(p - gravity_center, -yaw)

so that ``local_x`` spans ``w = x_size`` and ``local_y`` spans ``l = y_size``.
A point is inside the box iff ``|local| <= size/2`` componentwise.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def rotate_z(points: jax.Array, angles: jax.Array) -> jax.Array:
    """Rotate ``points[..., 3]`` by ``angles[...]`` around the z axis.

    Matches the reference ``rotation_3d_in_axis(points, angles, axis=2)``
    broadcast to arbitrary leading dims: out_x = x cos + y sin,
    out_y = -x sin + y cos.
    """
    c = jnp.cos(angles)[..., None]
    s = jnp.sin(angles)[..., None]
    x, y, z = points[..., 0:1], points[..., 1:2], points[..., 2:3]
    ox = x * c + y * s
    oy = -x * s + y * c
    return jnp.concatenate([ox, oy, jnp.broadcast_to(z, ox.shape)], axis=-1)


def rotate_z_2d(xy: jax.Array, angles: jax.Array) -> jax.Array:
    """2D variant of :func:`rotate_z` for BEV work."""
    c = jnp.cos(angles)[..., None]
    s = jnp.sin(angles)[..., None]
    x, y = xy[..., 0:1], xy[..., 1:2]
    return jnp.concatenate([x * c + y * s, -x * s + y * c], axis=-1)


def gravity_center(boxes: jax.Array) -> jax.Array:
    """Bottom-center boxes -> gravity (volumetric) centers, shape [..., 3]."""
    return jnp.concatenate(
        [boxes[..., 0:2], boxes[..., 2:3] + 0.5 * boxes[..., 5:6]], axis=-1
    )


def box_local_coords(points: jax.Array, boxes: jax.Array) -> jax.Array:
    """Express ``points[..., 3]`` in the canonical local frame of ``boxes``.

    ``boxes`` broadcasts against the leading dims of ``points``
    (e.g. points [B, L, P, 3] with boxes [B, L, 7]).
    """
    ctr = gravity_center(boxes)
    return rotate_z(points - ctr[..., None, :], -boxes[..., None, 6])


def local_to_global(local: jax.Array, boxes: jax.Array) -> jax.Array:
    """Inverse of :func:`box_local_coords`."""
    ctr = gravity_center(boxes)
    return rotate_z(local, boxes[..., None, 6]) + ctr[..., None, :]


def points_in_boxes(points: jax.Array, boxes: jax.Array,
                    extra_wlh=(0.0, 0.0, 0.0)) -> jax.Array:
    """Boolean inclusion mask of ``points[..., P, 3]`` in ``boxes[..., 7]``.

    ``extra_wlh`` enlarges each size by that margin (total, matching the
    reference extractor's ``extra_wlh`` semantics in
    ``roi_extractors/dynamic_point_roi_extractor.py:101-103``).
    """
    local = box_local_coords(points, boxes)
    half = 0.5 * (boxes[..., None, 3:6] + jnp.asarray(extra_wlh, points.dtype))
    return jnp.all(jnp.abs(local) <= half, axis=-1)


def corners_3d(boxes: jax.Array) -> jax.Array:
    """All 8 corners [..., 8, 3] of bottom-center boxes (yaw about z).

    Counterpart of ``LiDARInstance3DBoxes.corners`` for the corner loss
    (``fsd_bbox_head.py:get_corner_loss_lidar``); corner ORDER differs from
    the reference but the loss is order-consistent pred-vs-gt."""
    w = boxes[..., 3:4]
    l = boxes[..., 4:5]
    h = boxes[..., 5:6]
    sx = jnp.stack([w, -w, -w, w] * 2, axis=-2) * 0.5      # [..., 8, 1]
    sy = jnp.stack([l, l, -l, -l] * 2, axis=-2) * 0.5
    sz = jnp.concatenate(
        [jnp.zeros_like(sx[..., :4, :]),
         jnp.broadcast_to(h[..., None, :], sx[..., :4, :].shape)], axis=-2)
    bev = rotate_z_2d(jnp.concatenate([sx, sy], axis=-1),
                      boxes[..., None, 6]) + boxes[..., None, 0:2]
    z = sz + boxes[..., None, 2:3]
    return jnp.concatenate([bev, z], axis=-1)


def corners_bev(boxes: jax.Array) -> jax.Array:
    """BEV corners [..., 4, 2] of boxes, counter-clockwise in box frame."""
    w = boxes[..., 3:4]
    l = boxes[..., 4:5]
    sx = jnp.stack([w, -w, -w, w], axis=-2) * 0.5  # [..., 4, 1]
    sy = jnp.stack([l, l, -l, -l], axis=-2) * 0.5
    local = jnp.concatenate([sx, sy], axis=-1)  # [..., 4, 2]
    return rotate_z_2d(local, boxes[..., None, 6]) + boxes[..., None, 0:2]


def _polygon_area(verts: jax.Array, nvalid: jax.Array, max_v: int) -> jax.Array:
    """Shoelace area of a convex polygon stored in fixed-size vertex buffers.

    verts: [..., max_v, 2]; nvalid: [...] number of valid vertices.
    Vertices beyond nvalid are ignored by masking the edge terms.
    """
    idx = jnp.arange(max_v)
    nxt = (idx + 1) % max_v
    # Edge i contributes only if i < nvalid; the wrap edge is (nvalid-1, 0):
    # treat vertex j as verts[j % nvalid] by zeroing invalid edges and adding
    # the closing edge explicitly.
    x = verts[..., 0]
    y = verts[..., 1]
    valid = idx[None, :] < nvalid[..., None] if nvalid.ndim else idx < nvalid
    # For simplicity gather the "next valid" vertex: j_next = (i+1) mod nvalid.
    j_next = jnp.where(
        (idx + 1)[None, :] >= nvalid[..., None], 0, (idx + 1)[None, :]
    ) if nvalid.ndim else jnp.where(idx + 1 >= nvalid, 0, idx + 1)
    xn = jnp.take_along_axis(x, j_next, axis=-1)
    yn = jnp.take_along_axis(y, j_next, axis=-1)
    cross = x * yn - xn * y
    cross = jnp.where(valid, cross, 0.0)
    return 0.5 * jnp.abs(jnp.sum(cross, axis=-1))


def rotated_bev_overlap(boxes1: jax.Array, boxes2: jax.Array) -> jax.Array:
    """Paired rotated-rectangle intersection area in BEV.

    boxes1, boxes2: [..., 7] broadcastable; returns [...]. Implements
    Sutherland–Hodgman clipping of box1's 4-gon by box2's 4 half-planes with
    a fixed 8-vertex buffer — the TPU-native replacement for the reference's
    ``iou3d_cuda`` polygon-clip kernel (``ops/iou3d/src/iou3d_kernel.cu``).
    """
    subj = corners_bev(boxes1)  # [..., 4, 2]
    clip = corners_bev(boxes2)  # [..., 4, 2]
    max_v = 8
    pad = jnp.zeros(subj.shape[:-2] + (max_v - 4, 2), subj.dtype)
    verts = jnp.concatenate([subj, pad], axis=-2)  # [..., 8, 2]
    nvalid = jnp.full(subj.shape[:-2], 4, jnp.int32)

    def clip_by_edge(carry, k):
        verts, nvalid = carry
        a = jax.lax.dynamic_index_in_dim(clip, k, axis=-2, keepdims=False)
        b = jax.lax.dynamic_index_in_dim(clip, (k + 1) % 4, axis=-2,
                                         keepdims=False)
        # Inside = left of edge a->b for CCW clip polygon.
        ab = b - a  # [..., 2]
        rel = verts - a[..., None, :]
        side = ab[..., None, 0] * rel[..., 1] - ab[..., None, 1] * rel[..., 0]
        idx = jnp.arange(max_v)
        valid = idx < nvalid[..., None]
        inside = (side >= 0) & valid

        j_next = jnp.where(idx + 1 >= nvalid[..., None], 0, idx + 1)
        vnext = jnp.take_along_axis(verts, j_next[..., None], axis=-2)
        side_next = jnp.take_along_axis(side, j_next, axis=-1)
        inside_next = jnp.take_along_axis(inside, j_next, axis=-1)

        denom = side - side_next
        t = side / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
        inter = verts + t[..., None] * (vnext - verts)

        # Each input edge emits: vertex itself (if inside), then the
        # intersection (if the edge crosses the clip line).
        emit_v = inside & valid
        emit_i = (inside != inside_next) & valid
        # Output slots: vertex first, intersection second -> interleave.
        out_pts = jnp.stack([verts, inter], axis=-2)  # [..., 8, 2, 2]
        out_msk = jnp.stack([emit_v, emit_i], axis=-1)  # [..., 8, 2]
        out_pts = out_pts.reshape(out_pts.shape[:-3] + (2 * max_v, 2))
        out_msk = out_msk.reshape(out_msk.shape[:-2] + (2 * max_v,))
        # Compact valid entries to the front with a stable masked sort.
        order = jnp.argsort(~out_msk, axis=-1, stable=True)[..., :max_v]
        new_verts = jnp.take_along_axis(out_pts, order[..., None], axis=-2)
        new_n = jnp.sum(out_msk, axis=-1).astype(jnp.int32)
        new_n = jnp.minimum(new_n, max_v)
        return (new_verts, new_n), None

    # unroll=4: removes the device loop around 4 trips of tiny
    # [pairs, 8, 2] tensors. Measured NEUTRAL on the flagship bench
    # (202.2 vs 203.1 t/s, within run noise — the ~0.35 ms/step this line
    # profiles at is the per-element argsort/gather chains, not loop
    # overhead); kept for the smaller dispatch count.
    (verts, nvalid), _ = jax.lax.scan(
        clip_by_edge, (verts, nvalid), jnp.arange(4), unroll=4
    )
    area = _polygon_area(verts, nvalid, max_v)
    return jnp.where(nvalid >= 3, area, 0.0)


def aligned_iou_3d(boxes1: jax.Array, boxes2: jax.Array) -> jax.Array:
    """Paired (1-to-1) 3D IoU with rotated BEV overlap x height overlap.

    Matches reference ``LiDARInstance3DBoxes.aligned_iou_3d``
    (``lidar_box3d.py:404-450``).
    """
    top1 = boxes1[..., 2] + boxes1[..., 5]
    top2 = boxes2[..., 2] + boxes2[..., 5]
    bot1 = boxes1[..., 2]
    bot2 = boxes2[..., 2]
    overlap_h = jnp.clip(
        jnp.minimum(top1, top2) - jnp.maximum(bot1, bot2), 0.0, None
    )
    overlap_bev = rotated_bev_overlap(boxes1, boxes2)
    inter = overlap_bev * overlap_h
    vol1 = boxes1[..., 3] * boxes1[..., 4] * boxes1[..., 5]
    vol2 = boxes2[..., 3] * boxes2[..., 4] * boxes2[..., 5]
    return inter / jnp.clip(vol1 + vol2 - inter, 1e-8, None)


def pairwise_iou_bev(boxes1: jax.Array, boxes2: jax.Array) -> jax.Array:
    """Full [N, M] rotated BEV IoU matrix (reference ``boxes_iou_bev``)."""
    b1 = boxes1[:, None, :]
    b2 = boxes2[None, :, :]
    inter = rotated_bev_overlap(
        jnp.broadcast_to(b1, (boxes1.shape[0], boxes2.shape[0], 7)),
        jnp.broadcast_to(b2, (boxes1.shape[0], boxes2.shape[0], 7)),
    )
    a1 = (boxes1[:, 3] * boxes1[:, 4])[:, None]
    a2 = (boxes2[:, 3] * boxes2[:, 4])[None, :]
    return inter / jnp.clip(a1 + a2 - inter, 1e-8, None)


def pairwise_iou_3d(boxes1: jax.Array, boxes2: jax.Array) -> jax.Array:
    """Full [N, M] rotated 3D IoU matrix."""
    n, m = boxes1.shape[0], boxes2.shape[0]
    b1 = jnp.broadcast_to(boxes1[:, None, :], (n, m, 7))
    b2 = jnp.broadcast_to(boxes2[None, :, :], (n, m, 7))
    return aligned_iou_3d(b1, b2)


def nms_bev(boxes: jax.Array, scores: jax.Array, iou_thresh: float,
            max_out: int) -> tuple[jax.Array, jax.Array]:
    """Greedy rotated-BEV NMS with static output size.

    Returns ``(keep_indices[max_out], keep_mask[max_out])`` sorted by score.
    TPU-native replacement for ``iou3d_cuda.nms_gpu``: one IoU matrix plus a
    masked greedy scan (no bitmask blocks, no dynamic shapes).
    """
    n = boxes.shape[0]
    order = jnp.argsort(-scores)
    boxes_s = boxes[order]
    iou = pairwise_iou_bev(boxes_s, boxes_s)
    suppress_pair = iou > iou_thresh

    def body(i, alive):
        # If box i is still alive, kill every lower-scored box it overlaps.
        kill = suppress_pair[i] & (jnp.arange(n) > i) & alive[i]
        return alive & ~kill

    alive = jax.lax.fori_loop(0, n, body, jnp.ones((n,), bool))
    # Compact the first max_out alive entries (score order preserved).
    rank = jnp.cumsum(alive) - 1
    keep_slot = jnp.where(alive, rank, n)  # dead boxes land out of range
    out = jnp.full((max_out,), -1, jnp.int32)
    out = out.at[keep_slot].set(jnp.arange(n, dtype=jnp.int32), mode="drop")
    # Slot j holds sorted-index of the j-th kept box; map back to input order.
    valid = out >= 0
    keep = jnp.where(valid, order[jnp.clip(out, 0, n - 1)], -1)
    return keep, valid
