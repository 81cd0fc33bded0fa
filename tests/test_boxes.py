"""Geometry invariants, modeled on the reference's tests/test_utils/test_box3d.py
plus the debug asserts the reference scattered through its model code
(dynamic_point_roi_extractor.py:94-103, sst_input_layer_v2.py:118-121)."""
import numpy as np
import jax.numpy as jnp
import pytest

from objectcentricocccompletion_tpu.core import boxes as B
from objectcentricocccompletion_tpu.core import coder as C


def rand_boxes(n, seed=0):
    rng = np.random.RandomState(seed)
    ctr = rng.uniform(-20, 20, (n, 3))
    size = rng.uniform(1.0, 6.0, (n, 3))
    yaw = rng.uniform(-np.pi, np.pi, (n, 1))
    return jnp.asarray(np.concatenate([ctr, size, yaw], 1), jnp.float32)


def test_rotate_z_roundtrip():
    rng = np.random.RandomState(1)
    pts = jnp.asarray(rng.randn(100, 3), jnp.float32)
    ang = jnp.asarray(rng.uniform(-np.pi, np.pi, (100,)), jnp.float32)
    back = B.rotate_z(B.rotate_z(pts, ang), -ang)
    np.testing.assert_allclose(back, pts, atol=1e-5)


def test_rotate_z_matches_reference_convention():
    # reference rotation_3d_in_axis(axis=2): out = [x c + y s, -x s + y c, z]
    p = jnp.asarray([[1.0, 0.0, 0.0]])
    a = jnp.asarray([np.pi / 2], jnp.float32)
    out = B.rotate_z(p, a)
    np.testing.assert_allclose(out, [[0.0, -1.0, 0.0]], atol=1e-6)


def test_local_roundtrip():
    bx = rand_boxes(16)
    rng = np.random.RandomState(2)
    pts = jnp.asarray(rng.randn(16, 32, 3) * 5, jnp.float32)
    local = B.box_local_coords(pts, bx)
    back = B.local_to_global(local, bx)
    np.testing.assert_allclose(back, pts, atol=1e-4)


def test_points_in_boxes_axis_aligned():
    box = jnp.asarray([[0.0, 0.0, 0.0, 2.0, 4.0, 2.0, 0.0]])
    pts = jnp.asarray(
        [[[0.0, 0.0, 1.0],     # center -> in
          [0.9, 1.9, 1.9],     # inside all half-sizes
          [1.1, 0.0, 1.0],     # outside x (w/2 = 1)
          [0.0, 2.1, 1.0],     # outside y (l/2 = 2)
          [0.0, 0.0, 2.1],     # above top
          [0.0, 0.0, -0.1]]]   # below bottom
    )
    mask = B.points_in_boxes(pts, box)
    assert mask.tolist() == [[True, True, False, False, False, False]]


def test_points_in_boxes_rotated():
    # 90 deg yaw swaps the roles of w and l in the ego frame.
    box = jnp.asarray([[0.0, 0.0, 0.0, 2.0, 4.0, 2.0, np.pi / 2]])
    pts = jnp.asarray([[[1.5, 0.0, 1.0], [0.0, 1.5, 1.0]]])
    mask = B.points_in_boxes(pts, box)
    assert mask.tolist() == [[True, False]]


def test_aligned_iou_identical():
    bx = rand_boxes(8)
    iou = B.aligned_iou_3d(bx, bx)
    np.testing.assert_allclose(iou, np.ones(8), atol=1e-4)


def test_aligned_iou_disjoint():
    b1 = jnp.asarray([[0, 0, 0, 2, 2, 2, 0.3]], jnp.float32)
    b2 = jnp.asarray([[100, 0, 0, 2, 2, 2, 0.7]], jnp.float32)
    iou = B.aligned_iou_3d(b1, b2)
    np.testing.assert_allclose(iou, [0.0], atol=1e-6)


def test_aligned_iou_axis_aligned_value():
    b1 = jnp.asarray([[0, 0, 0, 2, 2, 2, 0.0]], jnp.float32)
    b2 = jnp.asarray([[1, 0, 0, 2, 2, 2, 0.0]], jnp.float32)
    # inter = 1*2*2 = 4, union = 8 + 8 - 4 = 12
    iou = B.aligned_iou_3d(b1, b2)
    np.testing.assert_allclose(iou, [4 / 12], atol=1e-4)


def test_aligned_iou_rotation_invariance():
    # Rotating both boxes together preserves IoU.
    b1 = jnp.asarray([[0, 0, 0, 2, 4, 2, 0.2]], jnp.float32)
    b2 = jnp.asarray([[0.7, 0.5, 0.3, 2.2, 3.5, 1.8, 0.6]], jnp.float32)
    base = B.aligned_iou_3d(b1, b2)
    for dth in [0.3, 1.1, 2.5]:
        r1 = b1.at[:, 6].add(dth)
        r2 = b2.at[:, 6].add(dth)
        # also rotate centers consistently around origin
        c1 = B.rotate_z(b1[:, None, :3], jnp.asarray([dth]))[:, 0]
        c2 = B.rotate_z(b2[:, None, :3], jnp.asarray([dth]))[:, 0]
        r1 = r1.at[:, :3].set(c1)
        r2 = r2.at[:, :3].set(c2)
        np.testing.assert_allclose(
            B.aligned_iou_3d(r1, r2), base, atol=2e-3
        )


def test_rotated_overlap_vs_montecarlo():
    rng = np.random.RandomState(3)
    b1 = rand_boxes(6, seed=4)
    b2 = b1 + jnp.asarray(
        np.concatenate([rng.uniform(-1, 1, (6, 3)),
                        rng.uniform(-0.5, 0.5, (6, 3)),
                        rng.uniform(-0.5, 0.5, (6, 1))], 1), jnp.float32)
    area = np.asarray(B.rotated_bev_overlap(b1, b2))
    # Monte-Carlo estimate of the BEV intersection.
    for i in range(6):
        bb1, bb2 = np.asarray(b1[i]), np.asarray(b2[i])
        lo = np.minimum(bb1[:2], bb2[:2]) - 6
        hi = np.maximum(bb1[:2], bb2[:2]) + 6
        smp = rng.uniform(lo, hi, (200000, 2))
        box_area = np.prod(hi - lo)

        def inside(b):
            d = smp - b[:2]
            ca, sa = np.cos(b[6]), np.sin(b[6])
            lx = d[:, 0] * ca - d[:, 1] * sa
            ly = d[:, 0] * sa + d[:, 1] * ca
            return (np.abs(lx) <= b[3] / 2) & (np.abs(ly) <= b[4] / 2)

        mc = (inside(bb1) & inside(bb2)).mean() * box_area
        assert abs(mc - area[i]) < max(0.08 * max(mc, area[i]), 0.08), (
            i, mc, area[i])


def test_coder_roundtrip():
    anchors = rand_boxes(32, seed=5)
    targets = rand_boxes(32, seed=6)
    deltas = C.encode(anchors, targets)
    rec = C.decode(anchors, deltas)
    np.testing.assert_allclose(rec, targets, atol=1e-4)


def test_roi_target_roundtrip():
    rois = rand_boxes(32, seed=7)
    gt = np.asarray(rand_boxes(32, seed=8)).copy()
    # constrain GT yaw near roi yaw so canonical flip is identity
    gt[:, 6] = np.asarray(rois[:, 6]) + np.random.RandomState(9).uniform(
        -0.6, 0.6, 32)
    gt = jnp.asarray(gt)
    deltas = C.encode_roi_targets(rois, gt)
    rec = C.decode_from_rois(rois, deltas)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(gt), atol=1e-3)


def test_canonical_yaw_range():
    ry = jnp.linspace(-4 * np.pi, 4 * np.pi, 101)
    out = np.asarray(C.canonical_yaw_target(ry))
    assert (out >= -np.pi / 2 - 1e-6).all() and (out <= np.pi / 2 + 1e-6).all()


def test_nms_bev():
    boxes = jnp.asarray([
        [0, 0, 0, 2, 4, 2, 0.0],
        [0.1, 0.1, 0, 2, 4, 2, 0.0],   # heavy overlap with 0
        [10, 0, 0, 2, 4, 2, 0.5],
        [10.05, 0, 0, 2, 4, 2, 0.5],   # heavy overlap with 2
        [-10, 5, 0, 2, 4, 2, 1.0],
    ], jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.95, 0.2, 0.5])
    keep, valid = B.nms_bev(boxes, scores, 0.5, 4)
    kept = sorted(np.asarray(keep)[np.asarray(valid)].tolist())
    assert kept == [0, 2, 4]
