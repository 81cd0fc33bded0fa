"""Golden numeric parity tests for the OcOccNet loss/target path.

Pins the heading and frame conventions that SURVEY.md section 7 flags as
the easiest things to get subtly wrong (the reference's pi/2 compensations,
``ococc_bbox_head.py:1045-1309``, ``occ_ae_head.py:215-220``): every
expected value below is HAND-COMPUTED from the documented convention in
``core/boxes.py``::

    rotate_z(v, a): x' =  x cos a + y sin a
                    y' = -x sin a + y cos a
    local = rotate_z(p - gravity_center, -yaw)

If a rotation sign, a gravity/bottom-center mixup, or a yaw-wrap rule
drifts, these fail with exact numbers rather than a vague e2e regression.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from objectcentricocccompletion_tpu.core import boxes as box_ops
from objectcentricocccompletion_tpu.core import coder

PI = np.pi


def test_rotate_z_convention():
    # rotate_z((1, 0), pi/2) = (cos, -sin) = (0, -1): yaw is CLOCKWISE
    v = jnp.asarray([[1.0, 0.0, 0.0]])
    out = np.asarray(box_ops.rotate_z(v, jnp.asarray(PI / 2)))
    np.testing.assert_allclose(out, [[0.0, -1.0, 0.0]], atol=1e-6)


def test_box_local_roundtrip_and_values():
    # GT box: bottom-center (5, 0, 0), w=2 l=4 h=1.5, yaw=pi/2
    box = jnp.asarray([5.0, 0.0, 0.0, 2.0, 4.0, 1.5, PI / 2])
    # gravity center = (5, 0, 0.75)
    np.testing.assert_allclose(np.asarray(box_ops.gravity_center(box)),
                               [5.0, 0.0, 0.75], atol=1e-6)
    # box-local (1, 0, 0) -> ego: rotate_z(+yaw) + ctr = (5, -1, 0.75)
    local = jnp.asarray([[1.0, 0.0, 0.0]])
    ego = np.asarray(box_ops.local_to_global(local, box))
    np.testing.assert_allclose(ego, [[5.0, -1.0, 0.75]], atol=1e-6)
    back = np.asarray(box_ops.box_local_coords(jnp.asarray(ego), box))
    np.testing.assert_allclose(back, [[1.0, 0.0, 0.0]], atol=1e-6)


def test_gt_occ_to_roi_frame_golden():
    from objectcentricocccompletion_tpu.models.ococcnet import \
        gt_occ_to_roi_frame
    gt = jnp.asarray([[[5.0, 0.0, 0.0, 2.0, 4.0, 1.5, PI / 2]]])  # [1, 1, 7]
    occ = jnp.asarray([[[1.0, 0.0, 0.0]]])                        # [1, 1, 3]
    # identical RoI -> identity
    out = np.asarray(gt_occ_to_roi_frame(occ, gt, gt))
    np.testing.assert_allclose(out, [[[[1.0, 0.0, 0.0]]]], atol=1e-6)
    # RoI with yaw 0 at the same center: ego point (5, -1, 0.75) minus
    # gravity center (5, 0, 0.75) = (0, -1, 0)
    roi = jnp.asarray([[[5.0, 0.0, 0.0, 2.0, 4.0, 1.5, 0.0]]])
    out = np.asarray(gt_occ_to_roi_frame(occ, gt, roi))
    np.testing.assert_allclose(out, [[[[0.0, -1.0, 0.0]]]], atol=1e-6)
    # RoI shifted +1 in ego x, yaw 0: local = (5, -1, .75) - (6, 0, .75)
    roi2 = jnp.asarray([[[6.0, 0.0, 0.0, 2.0, 4.0, 1.5, 0.0]]])
    out = np.asarray(gt_occ_to_roi_frame(occ, gt, roi2))
    np.testing.assert_allclose(out, [[[[-1.0, -1.0, 0.0]]]], atol=1e-6)


def test_canonical_yaw_target_golden():
    vals = jnp.asarray([0.3, -0.2, 2.0, PI - 0.1, PI, -PI + 0.05, 3 * PI
                        + 0.1])
    out = np.asarray(coder.canonical_yaw_target(vals))
    # hand-derived: flip headings in (pi/2, 3pi/2) by pi, wrap to
    # (-pi/2, pi/2]
    expect = [0.3, -0.2, 2.0 - PI, -0.1, 0.0, 0.05, 0.1]
    np.testing.assert_allclose(out, expect, atol=1e-5)


def test_encode_roi_targets_golden():
    # RoI: bottom-center (10, 2, 0), w=2 l=4 h=1.5, yaw=pi/2
    roi = jnp.asarray([10.0, 2.0, 0.0, 2.0, 4.0, 1.5, PI / 2])
    # GT: ego offset (+1, 0, 0), same size, yaw = pi/2 + 0.3
    gt = jnp.asarray([11.0, 2.0, 0.0, 2.0, 4.0, 1.5, PI / 2 + 0.3])
    t = np.asarray(coder.encode_roi_targets(roi, gt))
    # reference parametrization (executed-pinned in
    # test_occ_target_parity.py): rel_ctr rotated by -(roi_yaw + pi/2) =
    # -pi: (1, 0) -> (-1, 0); diag = sqrt(w^2 + l^2) = sqrt(20);
    # xt = -1/sqrt(20), yt = 0; zt = 0, log-size deltas 0, yaw target 0.3
    expect = [-1.0 / np.sqrt(20.0), 0.0, 0.0, 0.0, 0.0, 0.0, 0.3]
    np.testing.assert_allclose(t, expect, atol=1e-5)

    # opposite-heading GT must produce the SAME canonical target
    gt_flip = gt.at[6].add(PI)
    t2 = np.asarray(coder.encode_roi_targets(roi, gt_flip))
    np.testing.assert_allclose(t2, expect, atol=1e-5)

    # decode inverts encode (up to the canonical flip)
    dec = np.asarray(coder.decode_from_rois(roi, jnp.asarray(t)))
    np.testing.assert_allclose(dec[:6], np.asarray(gt)[:6], atol=1e-5)
    dyaw = np.angle(np.exp(1j * (dec[6] - float(gt[6]))))
    assert min(abs(dyaw), abs(abs(dyaw) - PI)) < 1e-5


def test_aligned_iou_golden():
    # axis-aligned unit cubes offset by 0.5 in x: inter 0.5, union 1.5
    a = jnp.asarray([[0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 0.0]])
    b = jnp.asarray([[0.5, 0.0, 0.0, 1.0, 1.0, 1.0, 0.0]])
    np.testing.assert_allclose(
        np.asarray(box_ops.aligned_iou_3d(a, b)), [1.0 / 3.0], atol=1e-6)
    # 2x4 box vs itself rotated 90 deg: BEV inter 2x2=4, union 12 -> 1/3
    c = jnp.asarray([[0.0, 0.0, 0.0, 2.0, 4.0, 1.0, 0.0]])
    d = jnp.asarray([[0.0, 0.0, 0.0, 2.0, 4.0, 1.0, PI / 2]])
    np.testing.assert_allclose(
        np.asarray(box_ops.aligned_iou_3d(c, d)), [1.0 / 3.0], atol=1e-5)


def test_soft_label_golden():
    """IoU-soft classification labels (get_single_class_soft_label,
    fsd_bbox_head.py:611-689): clip((iou - 0.2) / (0.8 - 0.2), 0, 1),
    exercised through the real loss with constructed IoUs."""
    import dataclasses
    import jax
    from objectcentricocccompletion_tpu.configs import tiny_config
    from objectcentricocccompletion_tpu.models import OcOccNetWithLoss
    from tests.test_model import make_batch

    cfg = tiny_config()
    batch = make_batch(cfg, seed=7)
    # rois == gt everywhere -> iou 1 -> soft label exactly 1 for all
    batch = batch._replace(gt_boxes=batch.rois)
    model = OcOccNetWithLoss(cfg)
    v = model.init({"params": jax.random.PRNGKey(0)}, batch, train=False)
    _, aux = model.apply(v, batch, train=False)
    # with labels == 1 the BCE equals softplus(-logit) averaged; verify by
    # recomputing from the model's own logits
    pred = model.apply({"params": v["params"]}, batch,
                       method=OcOccNetWithLoss.predict)
    logit = np.log(np.asarray(pred["scores"])
                   / (1 - np.asarray(pred["scores"])))
    expect = np.mean(np.log1p(np.exp(-logit)))
    np.testing.assert_allclose(float(aux["loss_rcnn_cls"]), expect,
                               rtol=1e-4)


def test_occ_sample_frame_golden(tmp_path):
    """sample_occ voxel centers live in the gravity-centered grid frame:
    the (0,0,0) voxel of a [dx,dy,dz] grid has center
    (0.5*vs - size/2, ...)."""
    import pickle
    from objectcentricocccompletion_tpu.configs import tiny_config
    from objectcentricocccompletion_tpu.data.tracklet_dataset import \
        TrackletDataset

    # occ grid 10x20x8 at 0.2 m: size (2, 4, 1.6)
    occ = np.zeros((10, 20, 8), np.int32)
    occ[0, 0, 0] = 1      # occupied
    occ[9, 19, 7] = 2     # free
    seg_dir = tmp_path / "occ" / "seg"
    seg_dir.mkdir(parents=True)
    np.savez(seg_dir / "trk.npz", occ=occ)

    ds = TrackletDataset.__new__(TrackletDataset)   # bypass file loading
    ds.cfg = tiny_config()
    ds.occ_anno_root = str(tmp_path / "occ")
    ds.mirror_occ = False
    ds.oid2occ = None
    ds.occ_compute_score = False
    pts, labels, score = ds.sample_occ("seg", "trk",
                                       np.random.RandomState(0))
    assert score == 1.0
    vs = ds.cfg.ae_voxel_size
    lo_exp = np.asarray([0.5 * vs - 1.0, 0.5 * vs - 2.0, 0.5 * vs - 0.8])
    hi_exp = -lo_exp
    occ_pts = pts[labels == 1]
    free_pts = pts[labels == 0]
    assert len(occ_pts) and len(free_pts)
    np.testing.assert_allclose(occ_pts, np.tile(lo_exp, (len(occ_pts), 1)),
                               atol=1e-6)
    np.testing.assert_allclose(free_pts,
                               np.tile(hi_exp, (len(free_pts), 1)),
                               atol=1e-6)
