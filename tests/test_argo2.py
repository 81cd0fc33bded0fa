"""Argoverse 2 reader: write an av2-layout fixture, load, verify boxes."""
import os

import numpy as np
import pytest

pd = pytest.importorskip("pandas")

from objectcentricocccompletion_tpu.data.argo2_dataset import (
    Argo2Dataset, av2_box_to_lidar, quat_to_yaw)


def write_av2_fixture(root, log_id="log0", ts=315966070819970000):
    ldir = os.path.join(root, "train", log_id, "sensors", "lidar")
    os.makedirs(ldir, exist_ok=True)
    rng = np.random.RandomState(0)
    pts = pd.DataFrame({
        "x": rng.uniform(-50, 50, 5000).astype(np.float32),
        "y": rng.uniform(-50, 50, 5000).astype(np.float32),
        "z": rng.uniform(-2, 3, 5000).astype(np.float32),
        "intensity": rng.randint(0, 255, 5000).astype(np.float32),
    })
    pts.to_feather(os.path.join(ldir, f"{ts}.feather"))
    yaw = 0.7
    annos = pd.DataFrame({
        "timestamp_ns": [ts, ts, ts + 1],
        "tx_m": [10.0, -5.0, 0.0], "ty_m": [2.0, 8.0, 0.0],
        "tz_m": [0.5, 0.3, 0.0],
        "length_m": [4.5, 0.8, 4.0], "width_m": [2.0, 0.7, 2.0],
        "height_m": [1.8, 1.8, 1.5],
        "qw": [np.cos(yaw / 2), 1.0, 1.0], "qx": [0.0, 0.0, 0.0],
        "qy": [0.0, 0.0, 0.0], "qz": [np.sin(yaw / 2), 0.0, 0.0],
        "category": ["REGULAR_VEHICLE", "PEDESTRIAN", "BUS"],
        "num_interior_pts": [25, 10, 5],
    })
    annos.to_feather(os.path.join(root, "train", log_id,
                                  "annotations.feather"))
    return ts


def test_quat_to_yaw():
    for y in [-2.0, 0.0, 0.5, 3.0]:
        q = (np.cos(y / 2), 0.0, 0.0, np.sin(y / 2))
        got = quat_to_yaw(*q)
        assert abs((got - y + np.pi) % (2 * np.pi) - np.pi) < 1e-6


def test_argo2_dataset(tmp_path):
    ts = write_av2_fixture(str(tmp_path))
    ds = Argo2Dataset(str(tmp_path), "train", max_points=8192)
    assert len(ds) == 1
    s = ds.build_sample(0, np.random.RandomState(0))
    assert s["points_mask"].sum() == 5000
    # only the two annos at this exact ts load (3rd has ts+1)
    assert s["gt_valid"].sum() == 2
    veh = s["gt_boxes"][0]
    np.testing.assert_allclose(veh[:3], [10.0, 2.0, 0.5 - 0.9], atol=1e-5)
    np.testing.assert_allclose(veh[3:6], [2.0, 4.5, 1.8], atol=1e-5)
    assert abs(veh[6] - (0.7 - np.pi / 2)) < 1e-5
    assert s["gt_labels"][0] == 0 and s["gt_labels"][1] == 1
