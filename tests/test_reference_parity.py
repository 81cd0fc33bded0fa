"""Reference-EXECUTED golden parity (VERDICT r2 missing #1 / next #2).

The reference's pure-torch modules import standalone (no mmcv/CUDA):
  * ``mmdet3d/ops/occ/occ_ops.py``            — dense voxel centers, quantize
  * ``mmdet3d/core/bbox/structures/utils.py`` — limit_period,
    rotation_3d_in_axis
  * ``mmdet3d/core/utils/gaussian.py``        — heatmap targets

Instead of hand-derived fixtures, these tests run the reference code itself
(CPU torch) and assert this framework matches — exactly the conventions
SURVEY.md section 7 flags as the parity traps. Skipped when
``/root/reference`` is absent.
"""
import importlib.util
import math
import os

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not available")

torch = pytest.importorskip("torch")


def _load(name, rel):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REF, rel))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_occ_ops():
    return _load("ref_occ_ops", "mmdet3d/ops/occ/occ_ops.py")


@pytest.fixture(scope="module")
def ref_utils():
    return _load("ref_utils", "mmdet3d/core/bbox/structures/utils.py")


@pytest.fixture(scope="module")
def ref_gaussian():
    return _load("ref_gaussian", "mmdet3d/core/utils/gaussian.py")


# ------------------------------------------------------------------ geometry
def test_rotate_z_matches_rotation_3d_in_axis(ref_utils):
    rng = np.random.RandomState(0)
    pts = rng.randn(5, 16, 3).astype(np.float32)
    ang = rng.uniform(-2 * np.pi, 2 * np.pi, (5,)).astype(np.float32)
    ref = ref_utils.rotation_3d_in_axis(
        torch.from_numpy(pts), torch.from_numpy(ang), axis=2).numpy()
    from objectcentricocccompletion_tpu.core import boxes as B
    got = np.asarray(B.rotate_z(jnp.asarray(pts), jnp.asarray(ang)[:, None]))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_wrap_heading_matches_limit_period(ref_utils):
    rng = np.random.RandomState(1)
    vals = rng.uniform(-20, 20, (256,))
    ref = ref_utils.limit_period(
        torch.from_numpy(vals), offset=0.5, period=2 * np.pi).numpy()
    from objectcentricocccompletion_tpu.evalx.waymo_bin import wrap_heading
    got = np.asarray([wrap_heading(float(v)) for v in vals])
    # both wrap into [-pi, pi); the +/-pi boundary itself is equivalent
    diff = np.abs(got - ref)
    diff = np.minimum(diff, np.abs(diff - 2 * np.pi))
    assert diff.max() < 1e-9


def test_box_local_frame_roundtrip_against_reference_rotation(ref_utils):
    """box_local_coords must equal inverse-rotating by the reference's own
    rotation primitive: local = R(-yaw) (p - gravity_center)."""
    rng = np.random.RandomState(2)
    boxes = np.concatenate([
        rng.uniform(-5, 5, (4, 3)), rng.uniform(1, 4, (4, 3)),
        rng.uniform(-np.pi, np.pi, (4, 1))], -1).astype(np.float32)
    pts = rng.uniform(-8, 8, (4, 32, 3)).astype(np.float32)
    gc = boxes[:, :3].copy()
    gc[:, 2] += boxes[:, 5] / 2
    ref_local = ref_utils.rotation_3d_in_axis(
        torch.from_numpy(pts - gc[:, None]),
        torch.from_numpy(-boxes[:, 6]), axis=2).numpy()
    from objectcentricocccompletion_tpu.core import boxes as B
    got = np.asarray(B.box_local_coords(jnp.asarray(pts),
                                        jnp.asarray(boxes)))
    np.testing.assert_allclose(got, ref_local, atol=1e-5)


# ------------------------------------------------------------------- occ ops
def test_dense_voxel_centers_match_reference(ref_occ_ops):
    rng = np.random.RandomState(3)
    sizes = rng.uniform(0.7, 6.0, (8, 3)).astype(np.float32)
    ref_list = ref_occ_ops.generate_dense_voxel_centers(
        torch.from_numpy(sizes), 0.2)
    from objectcentricocccompletion_tpu.evalx.occ_iou import \
        dense_voxel_centers
    for size, ref in zip(sizes, ref_list):
        got = dense_voxel_centers(size, 0.2)
        assert got.shape == tuple(ref.shape)
        np.testing.assert_allclose(got, ref.numpy(), atol=1e-5)


def test_quantize_to_voxel_centers_matches_reference(ref_occ_ops):
    rng = np.random.RandomState(4)
    n_roi, n_pts = 6, 64
    sizes = rng.uniform(1.0, 5.0, (n_roi, 3)).astype(np.float32)
    idx = rng.randint(0, n_roi, (n_pts,))
    pts = (rng.uniform(-0.5, 0.5, (n_pts, 3)) * sizes[idx]).astype(
        np.float32)
    rois = np.concatenate([
        np.zeros((n_roi, 4), np.float32), sizes,
        np.zeros((n_roi, 1), np.float32)], -1)  # (batch, xyz, wlh, yaw)
    ref = ref_occ_ops.quantize_points(
        torch.from_numpy(pts), torch.from_numpy(rois),
        torch.from_numpy(idx), 0.2, to_center=True).numpy()

    from objectcentricocccompletion_tpu.ops import roi_pool as rp
    # dense variant: group points by roi into a [n_roi, P, 3] layout
    got = np.zeros_like(ref)
    for r in range(n_roi):
        sel = idx == r
        if not sel.any():
            continue
        out = rp.quantize_to_voxel_centers(
            jnp.asarray(pts[sel][None]), jnp.asarray(sizes[r][None]), 0.2)
        got[sel] = np.asarray(out[0])
    np.testing.assert_allclose(got, ref, atol=1e-5)
    # packed (aligned) variant
    got2 = rp.quantize_to_voxel_centers_aligned(
        jnp.asarray(pts), jnp.asarray(sizes[idx]), 0.2)
    np.testing.assert_allclose(np.asarray(got2), ref, atol=1e-5)


# ----------------------------------------------------------------- gaussians
def test_gaussian_radius_matches_reference(ref_gaussian):
    rng = np.random.RandomState(5)
    l = rng.uniform(0.5, 30, (64,))
    w = rng.uniform(0.5, 30, (64,))
    from objectcentricocccompletion_tpu.models.centerpoint_head import \
        gaussian_radius
    for overlap in (0.1, 0.5, 0.7):
        ref = np.asarray([
            float(ref_gaussian.gaussian_radius(
                (torch.tensor(li), torch.tensor(wi)), overlap))
            for li, wi in zip(l, w)])
        got = np.asarray(gaussian_radius(jnp.asarray(l), jnp.asarray(w),
                                         overlap))
        np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_heatmap_targets_match_reference_draw(ref_gaussian):
    """make_targets' vectorized render vs the reference's per-object
    draw_heatmap_gaussian loop (CenterHead.get_targets semantics:
    int-cast centers, int-floor radius >= min_radius, max-composited)."""
    rng = np.random.RandomState(6)
    H, W, M = 48, 40, 12
    voxel_size = (0.32, 0.32, 6.0)
    pc_range = (-6.0, -6.0, -2.0, 6.0, 6.0, 4.0)
    osf = 1
    boxes = np.concatenate([
        rng.uniform(-5.5, 5.5, (M, 2)), rng.uniform(-1, 1, (M, 1)),
        rng.uniform(0.7, 5.0, (M, 3)), rng.uniform(-np.pi, np.pi, (M, 1)),
    ], -1).astype(np.float32)
    labels = rng.randint(0, 2, (M,))
    valid = rng.rand(M) < 0.9

    from objectcentricocccompletion_tpu.models.centerpoint_head import \
        make_targets
    heatmap, _, _, _ = make_targets(
        jnp.asarray(boxes), jnp.asarray(labels), jnp.asarray(valid),
        (H, W), 2, voxel_size, pc_range, osf, min_radius=2,
        gaussian_overlap=0.1)

    ref_hm = torch.zeros((2, H, W))
    for k in range(M):
        if not valid[k]:
            continue
        width = boxes[k, 3] / voxel_size[0] / osf
        length = boxes[k, 4] / voxel_size[1] / osf
        radius = ref_gaussian.gaussian_radius(
            (torch.tensor(float(length)), torch.tensor(float(width))),
            min_overlap=0.1)
        radius = max(2, int(radius))
        cx = (boxes[k, 0] - pc_range[0]) / (voxel_size[0] * osf)
        cy = (boxes[k, 1] - pc_range[1]) / (voxel_size[1] * osf)
        center = torch.tensor([cx, cy], dtype=torch.float32)
        ci = center.to(torch.int32)
        if not (0 <= ci[0] < W and 0 <= ci[1] < H):
            continue
        ref_gaussian.draw_heatmap_gaussian(ref_hm[labels[k]], ci, radius)

    got = np.moveaxis(np.asarray(heatmap), -1, 0)  # [H, W, ncls]->[ncls,..]
    np.testing.assert_allclose(got, ref_hm.numpy(), atol=1e-5)
