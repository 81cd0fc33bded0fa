"""GT-database copy-paste augmentation (ObjectSample counterpart)."""
import numpy as np

from objectcentricocccompletion_tpu.data.dbsampler import (
    DBSampler, GTDatabase, apply_db_sample, points_in_box_host)
from objectcentricocccompletion_tpu.data.frame_dataset import FrameDataset
from tests.test_frame_dataset import write_frame_dataset


def test_points_in_box_host():
    box = np.array([2.0, 1.0, -1.0, 2.0, 4.0, 1.5, 0.5])
    inside = box[:3] + np.array([0.1, 0.1, 0.2])
    outside = box[:3] + np.array([5.0, 0.0, 0.0])
    m = points_in_box_host(np.stack([inside, outside]), box)
    assert m.tolist() == [True, False]


def _dataset(tmp_path, n=4):
    info_path = write_frame_dataset(str(tmp_path), num_frames=n)
    return FrameDataset(info_path, str(tmp_path), max_points=4096,
                        max_gt=8)


def test_db_build_and_sample(tmp_path):
    ds = _dataset(tmp_path)
    db = GTDatabase.build_from_frames(ds, min_points=1)
    assert len(db) > 0 and 0 in db.entries   # Car crops collected
    # crops are stored box-local: centered, yaw-aligned
    box, crop = db.entries[0][0]
    assert np.all(np.abs(crop[:, 0]) <= box[3] / 2 + 1e-5)
    assert np.all(np.abs(crop[:, 1]) <= box[4] / 2 + 1e-5)

    sampler = DBSampler(db, {0: 3}, seed=0)
    rng = np.random.RandomState(0)
    s = ds.build_sample(0, rng)
    before = int(s["gt_valid"].sum())
    out = apply_db_sample(s, sampler)
    after = int(out["gt_valid"].sum())
    assert after > before
    new_boxes = out["gt_boxes"][before:after]
    # no BEV collision among all placed boxes
    from objectcentricocccompletion_tpu.data import np_geometry as npg
    allb = out["gt_boxes"][out["gt_valid"]]
    for i in range(len(allb)):
        for j in range(i + 1, len(allb)):
            assert npg.aligned_iou_3d(allb[i:i+1], allb[j:j+1])[0] < 1e-3
    # pasted points actually land inside their boxes
    pts = out["points"][out["points_mask"]]
    for b in new_boxes:
        assert points_in_box_host(pts[:, :3], b, margin=1e-3).sum() > 0
    # static shapes preserved
    assert out["points"].shape == s["points"].shape
    assert out["gt_boxes"].shape == s["gt_boxes"].shape


def test_dataset_integration(tmp_path):
    ds = _dataset(tmp_path)
    db = GTDatabase.build_from_frames(ds, min_points=1)
    ds.db_sampler = DBSampler(db, {0: 4}, seed=1)
    s = ds.build_sample(1, np.random.RandomState(1))
    assert int(s["gt_valid"].sum()) > 1   # originals + pasted
