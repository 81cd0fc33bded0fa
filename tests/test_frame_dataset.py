"""Frame dataset: kitti->lidar conversion, occ-pred merge (W8), and the
occ-dump -> frame-dataset seam using the evaluator's save_occ output."""
import os
import pickle

import numpy as np
import jax
import pytest

from objectcentricocccompletion_tpu.data.frame_dataset import (
    FrameDataset, camera_to_lidar_boxes)


def write_frame_dataset(root, num_frames=2, seed=0):
    rng = np.random.RandomState(seed)
    os.makedirs(os.path.join(root, "velodyne"), exist_ok=True)
    infos = []
    # identity-ish calib: rect = I, Tr maps lidar->camera with axis swap
    rect = np.eye(4)
    trv2c = np.asarray([[0, -1, 0, 0],
                        [0, 0, -1, 0],
                        [1, 0, 0, 0],
                        [0, 0, 0, 1]], np.float64)
    for i in range(num_frames):
        pts = rng.uniform(-20, 20, (3000, 3))
        # one GT box in lidar frame, then express in camera coords
        lidar_box = np.array([5.0 + 4.0 * i, 2.0, -1.0, 2.0, 4.5, 1.8, 0.4])
        # 20 returns inside the box (GT with 0 lidar points are ignored by
        # the Waymo metric protocol)
        local = rng.uniform(-0.4, 0.4, (20, 3)) * lidar_box[3:6]
        c, s = np.cos(lidar_box[6]), np.sin(lidar_box[6])
        obj = np.stack([local[:, 0] * c - local[:, 1] * s,
                        local[:, 0] * s + local[:, 1] * c,
                        local[:, 2]], -1)
        obj += lidar_box[:3] + np.array([0, 0, lidar_box[5] / 2])
        pts = np.concatenate([pts, obj], 0)
        extra = rng.rand(len(pts), 3)
        arr = np.concatenate([pts, extra], -1).astype(np.float32)
        vp = f"velodyne/{i:06d}.bin"
        arr.tofile(os.path.join(root, vp))
        cam_xyz = (rect @ trv2c) @ np.concatenate(
            [lidar_box[:3], [1.0]])
        annos = dict(
            name=np.array(["Car", "DontCare"]),
            location=np.stack([cam_xyz[:3], np.zeros(3)], 0),
            dimensions=np.array([[4.5, 1.8, 2.0], [0, 0, 0]]),  # l, h, w
            rotation_y=np.array([-lidar_box[6] - np.pi / 2, 0.0]),
        )
        infos.append(dict(
            point_cloud=dict(velodyne_path=vp),
            calib=dict(R0_rect=rect, Tr_velo_to_cam=trv2c),
            annos=annos, timestamp=1000 + i, segment_name="seg-f"))
    with open(os.path.join(root, "infos.pkl"), "wb") as f:
        pickle.dump(infos, f)
    return os.path.join(root, "infos.pkl")


def test_camera_to_lidar_roundtrip(tmp_path):
    info_path = write_frame_dataset(str(tmp_path))
    ds = FrameDataset(info_path, str(tmp_path), max_points=4096)
    s = ds.build_sample(0, np.random.RandomState(0))
    assert s["gt_valid"].sum() == 1
    box = s["gt_boxes"][0]
    np.testing.assert_allclose(box[:3], [5.0, 2.0, -1.0], atol=1e-5)
    np.testing.assert_allclose(box[3:6], [2.0, 4.5, 1.8], atol=1e-5)
    assert abs((box[6] - 0.4 + np.pi) % (2 * np.pi) - np.pi) < 1e-5


def test_occ_pred_merge(tmp_path):
    info_path = write_frame_dataset(str(tmp_path))
    occ_root = str(tmp_path / "occ_pred")
    d = os.path.join(occ_root, "seg-f", "1000")
    os.makedirs(d)
    occ = np.concatenate([np.full((10, 3), 3.0),
                          np.full((10, 1), 0.77)], -1).astype(np.float32)
    occ.tofile(os.path.join(d, "1_trk9.bin"))
    ds = FrameDataset(info_path, str(tmp_path), max_points=8192,
                      occ_pred_root=occ_root)
    s = ds.build_sample(0, np.random.RandomState(0))
    pts = s["points"][s["points_mask"]]
    merged = pts[np.isclose(pts[:, 3], 0.77)]
    assert len(merged) == 10
    np.testing.assert_allclose(merged[:, :3], 3.0)
    # frame 1 (ts 1001) has no occ files -> unchanged count
    s1 = ds.build_sample(1, np.random.RandomState(0))
    assert s1["points_mask"].sum() == 3020


def test_sequences_grouping(tmp_path):
    """sequences() groups frames per segment in timestamp order — the
    contract the FSD++ SequenceLoader relies on."""
    info_path = write_frame_dataset(str(tmp_path), num_frames=4)
    # scramble: move frames 2,3 to another segment, reverse timestamps
    infos = pickle.load(open(info_path, "rb"))
    infos[2]["segment_name"] = "seg-z"
    infos[3]["segment_name"] = "seg-z"
    infos[2]["timestamp"] = 2001
    infos[3]["timestamp"] = 2000
    pickle.dump(infos, open(info_path, "wb"))
    ds = FrameDataset(info_path, str(tmp_path))
    seqs = ds.sequences()
    assert seqs == [[0, 1], [3, 2]]


def test_w8_occ_augmented_retrain_loop(tmp_path):
    """W8 end-to-end: predicted-occupancy dumps merge into the point cloud
    and an FSD detector genuinely TRAINS on the augmented frames (the
    reference retrains FSDv2 with occ points concatenated,
    configs/fsdv2/fsdv2_waymo_car_occ_1x.py)."""
    import jax
    import jax.numpy as jnp
    from objectcentricocccompletion_tpu.models.fsd import (
        FSD, fsd_loss, tiny_fsd_config)
    from objectcentricocccompletion_tpu.training.detector_trainer import (
        FrameLoader, make_detector_train_step)
    from objectcentricocccompletion_tpu.training.optim import make_optimizer
    from objectcentricocccompletion_tpu.parallel.train import make_mesh

    info_path = write_frame_dataset(str(tmp_path), num_frames=3)
    occ_root = str(tmp_path / "occ_pred")
    for i in range(3):
        d = os.path.join(occ_root, "seg-f", str(1000 + i))
        os.makedirs(d)
        occ = np.concatenate([
            np.random.RandomState(i).uniform(4, 6, (20, 3)),
            np.full((20, 1), 0.9)], -1).astype(np.float32)
        occ.tofile(os.path.join(d, "1_trk.bin"))

    cfg = tiny_fsd_config(num_classes=1)
    ds = FrameDataset(info_path, str(tmp_path), max_points=cfg.max_points,
                      max_gt=8, occ_pred_root=occ_root)
    # merged occ points present in the training sample
    s = ds.build_sample(0, np.random.RandomState(0))
    pts = s["points"][s["points_mask"]]
    assert (np.isclose(pts[:, 3], 0.9)).sum() == 20

    class FSDWithLoss(FSD):
        def loss(self, points, mask, gt_boxes, gt_labels, gt_valid):
            out = self(points, mask)
            return fsd_loss(out, points, gt_boxes, gt_labels, gt_valid,
                            self.cfg)

    model = FSDWithLoss(cfg)
    loader = FrameLoader(ds, batch_size=1)
    batch = next(loader)
    params = model.init(jax.random.PRNGKey(0), batch.points[0],
                        batch.points_mask[0])["params"]
    tx, _ = make_optimizer(1e-3, 10)
    from objectcentricocccompletion_tpu.training.detector_trainer import \
        DetectorState
    state = DetectorState(jnp.zeros((), jnp.int32), params, tx.init(params))
    mesh = make_mesh(jax.devices()[:1])
    step = make_detector_train_step(model, tx, mesh)
    losses = []
    for i in range(3):
        state, aux = step(state, next(loader), jax.random.PRNGKey(i))
        losses.append(float(aux["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] != losses[0]   # parameters actually moved


def test_frame_augment_rigid_consistency(tmp_path):
    """Geometry augmentation (reference train pipeline: RandomFlip3D +
    GlobalRotScaleTrans + range filters) transforms points and boxes
    together: interior points stay interior, sizes scale, and the sample
    is deterministic in the rng."""
    from objectcentricocccompletion_tpu.data.dbsampler import (
        points_in_box_host)

    info_path = write_frame_dataset(str(tmp_path), num_frames=1, seed=3)
    base = FrameDataset(info_path, str(tmp_path), max_points=4096,
                        max_gt=8)
    aug = FrameDataset(info_path, str(tmp_path), max_points=4096, max_gt=8,
                       augment=True, flip_ratio_horizontal=1.0,
                       translation_std=(0.2, 0.2, 0.1),
                       pc_range=(-80, -80, -10, 80, 80, 10))
    s0 = base.build_sample(0, np.random.RandomState(0))
    s1 = aug.build_sample(0, np.random.RandomState(0))
    s1b = aug.build_sample(0, np.random.RandomState(0))
    for k in s1:
        np.testing.assert_array_equal(s1[k], s1b[k])   # deterministic

    # the transform moved things (padded rows correspond one-to-one; only
    # the masks differ after the range filter)
    assert not np.allclose(s1["points"][:, :3], s0["points"][:, :3])
    # sizes scaled by a single global factor in [0.95, 1.05]
    v0, v1 = s0["gt_valid"], s1["gt_valid"]
    common = min(v0.sum(), v1.sum())
    ratio = s1["gt_boxes"][:common, 3:6] / s0["gt_boxes"][:common, 3:6]
    assert np.allclose(ratio, ratio.flat[0], atol=1e-5)
    assert 0.95 <= ratio.flat[0] <= 1.05

    # membership preserved: points inside box 0 before == after (rigid +
    # uniform scale transform both sides identically)
    b0, b1 = s0["gt_boxes"][0], s1["gt_boxes"][0]
    m0 = points_in_box_host(s0["points"][:, :3], b0) & s0["points_mask"]
    m1 = points_in_box_host(s1["points"][:, :3], b1) & s1["points_mask"]
    np.testing.assert_array_equal(m0, m1)

    # range filter: every surviving point/box center in range
    p = s1["points"][s1["points_mask"]][:, :3]
    assert np.all((p >= -80) & (p <= 80))


def test_frame_augment_flip_only_matches_reference_convention(tmp_path):
    """flip_ratio=1, rot/scale degenerate: y negates, yaw -> pi - yaw
    (LiDARInstance3DBoxes.flip('horizontal'), lidar_box3d.py:209-212)."""
    info_path = write_frame_dataset(str(tmp_path), num_frames=1, seed=5)
    base = FrameDataset(info_path, str(tmp_path), max_points=4096,
                        max_gt=8)
    aug = FrameDataset(info_path, str(tmp_path), max_points=4096, max_gt=8,
                       augment=True, flip_ratio_horizontal=1.0,
                       rot_range=(0.0, 0.0), scale_range=(1.0, 1.0))
    s0 = base.build_sample(0, np.random.RandomState(1))
    s1 = aug.build_sample(0, np.random.RandomState(1))
    np.testing.assert_allclose(s1["points"][:, 1], -s0["points"][:, 1],
                               atol=1e-6)
    np.testing.assert_allclose(s1["gt_boxes"][:, 1], -s0["gt_boxes"][:, 1],
                               atol=1e-6)
    np.testing.assert_allclose(s1["gt_boxes"][:, 6],
                               np.pi - s0["gt_boxes"][:, 6], atol=1e-6)


def test_multi_sweep_loading(tmp_path):
    """num_sweeps > 0 concatenates previous frames transformed past-ego ->
    world -> current-ego with a trailing time-lag channel (the reference's
    LoadPointsFromMultiSweepsWaymo, loading.py:703-871)."""
    from objectcentricocccompletion_tpu.data.frame_dataset import (
        write_synthetic_frames)

    info_path = write_synthetic_frames(str(tmp_path), num_frames=3,
                                       num_points=2000, num_boxes=4)
    ds = FrameDataset(info_path, str(tmp_path), max_points=8192, max_gt=8,
                      num_sweeps=2, load_dim=6, use_dim=5)
    s = ds.build_sample(2, np.random.RandomState(0))
    pts = s["points"][s["points_mask"]]
    assert pts.shape[1] == 6                    # 5 dims + time lag
    lags = np.unique(pts[:, 5])
    np.testing.assert_array_equal(sorted(lags), [-2.0, -1.0, 0.0])
    # 3 frames x 2000 points all fit the budget
    assert pts.shape[0] == 6000

    # the idx-0 sweep of frame 2 is frame 1 (pose x=2) seen from frame 2
    # (pose x=4): its points shift by -2 in x
    raw1 = np.fromfile(f"{tmp_path}/velodyne/000001.bin",
                       np.float32).reshape(-1, 6)[:, :5]
    got = pts[pts[:, 5] == -1.0][:, :3]
    np.testing.assert_allclose(
        np.sort(got[:, 0]), np.sort(raw1[:, 0] - 2.0), atol=1e-4)
    np.testing.assert_allclose(np.sort(got[:, 1]), np.sort(raw1[:, 1]),
                               atol=1e-4)

    # frame 0 has no sweeps: only the zero-lag channel appears
    s0 = ds.build_sample(0, np.random.RandomState(0))
    p0 = s0["points"][s0["points_mask"]]
    assert np.all(p0[:, 5] == 0.0) and p0.shape[0] == 2000
