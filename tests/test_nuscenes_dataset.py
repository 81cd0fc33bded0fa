"""NuScenes/Lyft info-pkl readers: box-origin conversion, class mapping,
point filters, sweep motion compensation, detector-trainer contract."""
import os
import pickle

import numpy as np
import pytest

from objectcentricocccompletion_tpu.data.nuscenes_dataset import (
    LYFT_CLASSES, LyftDataset, NuScenesDataset)


def write_nuscenes_fixture(root, n_frames=2, sweep=True):
    os.makedirs(os.path.join(root, "samples"), exist_ok=True)
    infos = []
    rng = np.random.RandomState(0)
    for i in range(n_frames):
        pts = rng.uniform(-20, 20, (500, 5)).astype(np.float32)
        path = f"samples/frame{i}.bin"
        pts.tofile(os.path.join(root, path))
        sweeps = []
        if sweep:
            sp = rng.uniform(-20, 20, (100, 5)).astype(np.float32)
            spath = f"samples/sweep{i}.bin"
            sp.tofile(os.path.join(root, spath))
            rot = np.eye(3)
            sweeps.append(dict(data_path=spath,
                               sensor2lidar_rotation=rot,
                               sensor2lidar_translation=np.array(
                                   [100.0, 0.0, 0.0]),
                               timestamp=(1000 + i) * 1e6 - 5e5))
        # gravity-centered boxes: car at z-center 1.0, h=2 -> bottom 0.0
        gt_boxes = np.array([[5.0, 2.0, 1.0, 2.0, 4.5, 2.0, 0.3],
                             [8.0, -3.0, 0.9, 0.7, 0.7, 1.8, 0.0],
                             [0.0, 0.0, 0.5, 1.0, 1.0, 1.0, 0.0]],
                            np.float32)
        infos.append(dict(
            token=f"tok{i}", timestamp=(1000 + i) * 1e6,
            lidar_path=path, sweeps=sweeps,
            gt_boxes=gt_boxes,
            gt_names=np.array(["car", "pedestrian", "alien"]),
            num_lidar_pts=np.array([50, 20, 0]),
            valid_flag=np.array([True, True, False])))
    info_path = os.path.join(root, "nus_infos.pkl")
    with open(info_path, "wb") as f:
        pickle.dump(dict(infos=infos, metadata=dict(version="test")), f)
    return info_path


def test_box_conversion_and_class_mapping(tmp_path):
    info_path = write_nuscenes_fixture(str(tmp_path))
    ds = NuScenesDataset(info_path, str(tmp_path), max_points=1024,
                         max_gt=8)
    assert len(ds) == 2
    s = ds.build_sample(0, np.random.RandomState(0))
    # "alien" is not a class; zero-point box filtered by num_lidar_pts
    assert int(s["gt_valid"].sum()) == 2
    car = s["gt_boxes"][0]
    # gravity z 1.0, h 2.0 -> bottom z 0.0
    np.testing.assert_allclose(car, [5.0, 2.0, 0.0, 2.0, 4.5, 2.0, 0.3],
                               atol=1e-6)
    assert s["gt_labels"][0] == NuScenesDataset.CLASSES.index("car")
    assert s["gt_labels"][1] == NuScenesDataset.CLASSES.index("pedestrian")
    assert int(s["points_mask"].sum()) == 500   # no sweeps by default


def test_sweep_aggregation(tmp_path):
    info_path = write_nuscenes_fixture(str(tmp_path))
    ds = NuScenesDataset(info_path, str(tmp_path), max_points=2048,
                         max_gt=8, max_sweeps=1)
    s = ds.build_sample(0, np.random.RandomState(0))
    pts = s["points"][s["points_mask"]]
    assert len(pts) == 600
    swept = pts[pts[:, 4] > 0]          # time-lag channel marks sweeps
    assert len(swept) == 100
    # translated by +100 m in x by the sensor2lidar transform
    assert swept[:, 0].min() > 50.0
    np.testing.assert_allclose(swept[:, 4], 0.5, atol=1e-3)


def test_lyft_classes_and_trainer_contract(tmp_path):
    info_path = write_nuscenes_fixture(str(tmp_path), sweep=False)
    ds = LyftDataset(info_path, str(tmp_path), max_points=1024, max_gt=8)
    s = ds.build_sample(0, np.random.RandomState(0))
    # lyft has no traffic_cone; car/pedestrian still map
    assert s["gt_labels"][0] == LYFT_CLASSES.index("car")

    # the detector FrameLoader consumes the sample contract directly
    from objectcentricocccompletion_tpu.training.detector_trainer import \
        FrameLoader
    batch = next(FrameLoader(ds, batch_size=2))
    assert batch.points.shape == (2, 1024, 5)
    assert batch.gt_boxes.shape == (2, 8, 7)


def test_valid_flag_gating(tmp_path):
    info_path = write_nuscenes_fixture(str(tmp_path))
    ds = NuScenesDataset(info_path, str(tmp_path), max_points=1024,
                         max_gt=8, use_valid_flag=True)
    s = ds.build_sample(0, np.random.RandomState(0))
    assert int(s["gt_valid"].sum()) == 2
