"""ScanNet / SUN RGB-D info-pkl readers: axis alignment, box-origin
conversion, class gating, and the detector-loader contract."""
import os
import pickle

import numpy as np

from objectcentricocccompletion_tpu.data.indoor_dataset import (
    SCANNET_CLASSES, ScanNetDataset, SUNRGBDDataset)


def write_scannet_fixture(root, yawed=False):
    os.makedirs(os.path.join(root, "points"), exist_ok=True)
    rng = np.random.RandomState(0)
    infos = []
    for i in range(2):
        pts = rng.uniform(0, 8, (400, 6)).astype(np.float32)
        path = f"points/scene{i}.bin"
        pts.tofile(os.path.join(root, path))
        # 90-degree axis-align rotation + translation
        m = np.eye(4)
        m[:2, :2] = [[0.0, -1.0], [1.0, 0.0]]
        m[:3, 3] = [1.0, 2.0, 0.0]
        if yawed:
            boxes = np.array([[2.0, 3.0, 1.0, 1.5, 0.8, 1.0, 0.4],
                              [5.0, 5.0, 0.5, 0.6, 0.6, 1.2, -0.2]],
                             np.float32)
        else:
            boxes = np.array([[2.0, 3.0, 1.0, 1.5, 0.8, 1.0],
                              [5.0, 5.0, 0.5, 0.6, 0.6, 1.2]], np.float32)
        infos.append(dict(
            point_cloud=dict(lidar_idx=f"scene{i}"),
            pts_path=path,
            annos=dict(gt_num=2, gt_boxes_upright_depth=boxes,
                       **{"class": np.array([1, 2])},
                       axis_align_matrix=m)))
    info_path = os.path.join(root, "infos.pkl")
    with open(info_path, "wb") as f:
        pickle.dump(infos, f)
    return info_path


def test_scannet_alignment_and_boxes(tmp_path):
    info_path = write_scannet_fixture(str(tmp_path))
    ds = ScanNetDataset(info_path, str(tmp_path), max_points=1024,
                        max_gt=8)
    assert len(ds) == 2
    s = ds.build_sample(0, np.random.RandomState(0))
    assert int(s["gt_valid"].sum()) == 2
    # gravity z 1.0, h 1.0 -> bottom 0.5; yaw 0 for axis-aligned boxes
    np.testing.assert_allclose(s["gt_boxes"][0],
                               [2.0, 3.0, 0.5, 1.5, 0.8, 1.0, 0.0],
                               atol=1e-6)
    assert s["gt_labels"][0] == 1   # "bed"
    # points were axis-aligned: x' = -y + 1, y' = x + 2
    pts = s["points"][s["points_mask"]]
    raw = np.fromfile(os.path.join(str(tmp_path), "points/scene0.bin"),
                      np.float32).reshape(-1, 6)
    assert pts[:, 0].min() >= 1.0 - 8.0 - 1e-5
    np.testing.assert_allclose(sorted(pts[:, 0]),
                               sorted(-raw[:, 1] + 1.0), atol=1e-4)


def test_sunrgbd_yawed_boxes(tmp_path):
    info_path = write_scannet_fixture(str(tmp_path), yawed=True)
    ds = SUNRGBDDataset(info_path, str(tmp_path), max_points=1024,
                        max_gt=8)
    s = ds.build_sample(0, np.random.RandomState(0))
    np.testing.assert_allclose(s["gt_boxes"][0, 6], 0.4, atol=1e-6)
    # SUN RGB-D does not axis-align points
    raw = np.fromfile(os.path.join(str(tmp_path), "points/scene0.bin"),
                      np.float32).reshape(-1, 6)
    pts = s["points"][s["points_mask"]]
    np.testing.assert_allclose(sorted(pts[:, 0]), sorted(raw[:, 0]),
                               atol=1e-5)


def test_indoor_loader_contract(tmp_path):
    from objectcentricocccompletion_tpu.training.detector_trainer import \
        FrameLoader
    info_path = write_scannet_fixture(str(tmp_path))
    ds = ScanNetDataset(info_path, str(tmp_path), max_points=512, max_gt=8)
    batch = next(FrameLoader(ds, batch_size=2))
    assert batch.points.shape == (2, 512, 6)
    assert batch.gt_boxes.shape == (2, 8, 7)
    # class budget gating: labels beyond the class list drop
    assert int(np.asarray(batch.gt_valid).sum()) == 4
