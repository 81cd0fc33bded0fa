"""Stage-1 -> stage-2 bridge: bins -> tracklet dataset -> model loss.

This is the full-pipeline seam test: write detection + GT bins, extract
tracklets and per-frame points, assign candidates, then load the produced
dataset through TrackletDataset into the OcOccNet loss."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from objectcentricocccompletion_tpu.configs import tiny_config
from objectcentricocccompletion_tpu.data.loader import TrainLoader
from objectcentricocccompletion_tpu.data.tracklet_dataset import \
    TrackletDataset
from objectcentricocccompletion_tpu.evalx.waymo_bin import (
    WaymoObject, write_bin)
from objectcentricocccompletion_tpu.models import OcOccNetWithLoss
from objectcentricocccompletion_tpu.tools_ctrl.generate_tracklets import (
    assign_candidates, tracklets_from_bin, write_tracklet_dataset)


def make_bins(tmp_path, T=10, n_trk=2):
    rng = np.random.RandomState(0)
    preds, gts, poses = [], [], {}
    for k in range(n_trk):
        base = rng.uniform(-10, 10, 2)
        for i in range(T):
            ts = 1000000 + i * 100000
            poses[ts] = np.eye(4)
            box = (base[0] + 0.3 * i, base[1] + 2.0 * k, -0.9,
                   2.0, 4.5, 1.8, 0.3 + 0.01 * i)
            gts.append(WaymoObject(box, 1.0, 1, f"gt_{k}", "seg-b", ts,
                                   num_lidar_points=30, difficulty=1))
            noisy = tuple(np.asarray(box)
                          + rng.uniform(-0.05, 0.05, 7))
            preds.append(WaymoObject(noisy, 0.8, 1, f"pd_{k}", "seg-b", ts))
    write_bin(preds, str(tmp_path / "pd.bin"))
    write_bin(gts, str(tmp_path / "gt.bin"))
    return poses


def frame_points_provider(seed=1):
    rng = np.random.RandomState(seed)

    def get_points(segment, ts):
        # dense cloud covering the scene so every box catches points
        pts = rng.uniform(-16, 16, (30000, 3)).astype(np.float32)
        pts[:, 2] = rng.uniform(-1.5, 1.5, 30000)
        extra = rng.rand(30000, 2).astype(np.float32)
        return np.concatenate([pts, extra], -1)

    return get_points


def test_tracklets_from_bin_roundtrip(tmp_path):
    poses = make_bins(tmp_path)
    trks = tracklets_from_bin(str(tmp_path / "pd.bin"))
    assert len(trks) == 2
    assert all(len(t) == 10 for t in trks)
    # heading roundtrip: waymo conversion back matches our writer input
    assert np.all(np.abs(trks[0].boxes[:, 3:6] - [2.0, 4.5, 1.8]) < 0.1)


def test_candidate_assignment(tmp_path):
    poses = make_bins(tmp_path)
    pred = tracklets_from_bin(str(tmp_path / "pd.bin"))
    gt = tracklets_from_bin(str(tmp_path / "gt.bin"))
    cands = assign_candidates(pred, gt, affinity_thresh=0.3)
    for p, cl in zip(pred, cands):
        ids = [c.id for c in cl]
        assert f"gt_{p.id.split('_')[1]}" in ids


def test_full_bridge_to_model(tmp_path):
    cfg = tiny_config()
    poses = make_bins(tmp_path)
    paths = write_tracklet_dataset(
        str(tmp_path / "pd.bin"), str(tmp_path / "gt.bin"),
        frame_points_provider(), str(tmp_path / "trk_ds"), poses)
    ds = TrackletDataset(cfg=cfg, min_tracklet_points=10,
                         occ_anno_root=None, **paths)
    assert len(ds) == 2
    batch = next(TrainLoader(ds, batch_size=2))
    assert bool(batch.gt_valid.any())
    model = OcOccNetWithLoss(cfg)
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                           train=False)
    total, aux = model.apply(variables, batch, train=False)
    assert np.isfinite(float(total))
    assert float(aux["num_pos_rois"]) > 0


def test_create_data_tracklets_cli(tmp_path):
    """tools/create_data.py tracklets: .bin -> tracklet dataset consumable
    by TrackletDataset (the detector -> OcOccNet/CTRL bridge)."""
    import os
    import subprocess
    import sys

    from objectcentricocccompletion_tpu.configs import tiny_config
    from objectcentricocccompletion_tpu.data.frame_dataset import \
        FrameDataset
    from objectcentricocccompletion_tpu.data.tracklet_dataset import \
        TrackletDataset
    from objectcentricocccompletion_tpu.evalx.waymo_bin import (
        WaymoObject, write_bin)
    from tests.test_frame_dataset import write_frame_dataset

    info_path = write_frame_dataset(str(tmp_path), num_frames=3)
    ds = FrameDataset(info_path, str(tmp_path), max_points=4096)
    objs = []
    for i in range(3):
        s = ds.build_sample(i, np.random.RandomState(0))
        info = ds.infos[i]
        for box in s["gt_boxes"][s["gt_valid"]]:
            objs.append(WaymoObject(tuple(box), 1.0, 1, "trk-shared",
                                    info["segment_name"],
                                    int(info["timestamp"])))
    gt_bin = str(tmp_path / "gt.bin")
    write_bin(objs, gt_bin)

    out_dir = str(tmp_path / "prep")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "create_data.py"),
         "tracklets", "--pred-bin", gt_bin, "--gt-bin", gt_bin,
         "--infos", info_path, "--data-root", str(tmp_path),
         "--out-dir", out_dir],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr

    tds = TrackletDataset(
        proposals_file=os.path.join(out_dir, "proposals.pkl"),
        gt_candidates_file=os.path.join(out_dir, "gt_candidates.pkl"),
        pose_file=os.path.join(out_dir, "poses.pkl"), occ_anno_root=None,
        cfg=tiny_config(), min_tracklet_length=1, min_tracklet_points=1)
    assert len(tds) == 1            # one shared track id, 3 frames
    s = tds.build_sample(0, np.random.RandomState(0))
    assert int(s["points_mask"].sum()) > 0
    assert int(s["gt_valid"].sum()) > 0


def test_track_velocity_and_extend(tmp_path):
    """Velocity extrapolation extends a constant-velocity track backward
    with the correct positions and decayed scores."""
    import pickle
    from objectcentricocccompletion_tpu.data.tracklet_dataset import \
        TrackletRecord
    from objectcentricocccompletion_tpu.tools_ctrl.extend_tracks import (
        extend_record, shared_frame_boxes, track_velocity)

    T = 8
    dt = 100000                       # 0.1 s
    ts = [1_000_000 + i * dt for i in range(T)]
    full_ts = [1_000_000 - 3 * dt + i * dt for i in range(T + 5)]
    # 2 m/s along +x, identity poses (ego == world)
    boxes = np.zeros((T, 7), np.float32)
    boxes[:, 0] = 5.0 + 0.2 * np.arange(T)
    boxes[:, 3:6] = [2.0, 4.5, 1.6]
    poses = {t: np.eye(4) for t in full_ts}
    rec = TrackletRecord("seg", "t1", 1, False, boxes, ts,
                         np.full((T,), 0.9, np.float32), None)

    velo = track_velocity(shared_frame_boxes(rec, poses), ts)
    np.testing.assert_allclose(velo[:, 0], 2.0, atol=1e-4)
    np.testing.assert_allclose(velo[:, 1:], 0.0, atol=1e-6)

    ext = extend_record(rec, poses, full_ts, extend_length=3, min_length=2,
                        score_multiplier=0.9)
    assert len(ext) == T + 3
    # backward-extrapolated x positions continue the 2 m/s motion
    np.testing.assert_allclose(
        ext.boxes[:3, 0], [5.0 - 0.6, 5.0 - 0.4, 5.0 - 0.2], atol=1e-3)
    assert list(ext.ts) == full_ts[:3] + ts
    # reference quirk, reproduced: backward scores decay oldest-first
    # (lidar_tracklet.py:699-700), so the oldest frame scores highest
    s = np.asarray(ext.scores[:3])
    assert s[0] > s[1] > s[2]
    assert s.max() < 0.9

    # extend_all also extrapolates forward
    ext2 = extend_record(rec, poses, full_ts, min_length=2,
                         extend_all=True)
    assert len(ext2) == len(full_ts)
    np.testing.assert_allclose(ext2.boxes[-1, 0],
                               5.0 + 0.2 * (T - 1) + 0.2 * 2, atol=1e-3)


def test_merge_bins_and_roundtrip(tmp_path):
    from objectcentricocccompletion_tpu.evalx.waymo_bin import read_bin
    from objectcentricocccompletion_tpu.tools_ctrl.extend_tracks import \
        merge_bins

    box = (1.0, 2.0, -0.5, 2.0, 4.0, 1.5, 0.3)
    a = str(tmp_path / "a.bin")
    b = str(tmp_path / "b.bin")
    write_bin([WaymoObject(box, 0.5, 1, "x", "seg", 1)], a)
    write_bin([WaymoObject(box, 0.7, 1, "y", "seg", 2)] * 2, b)
    out = str(tmp_path / "m.bin")
    merge_bins([a, b], out)
    recs = read_bin(out)
    assert len(recs) == 3
    assert {r["id"] for r in recs} == {"x", "y"}
