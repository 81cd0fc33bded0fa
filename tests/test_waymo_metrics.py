"""Native C++ Waymo metrics evaluator: build + semantic checks through the
subprocess interface (perfect predictions, misses, heading errors,
difficulty gating, range buckets)."""
import math
import numpy as np
import pytest

from objectcentricocccompletion_tpu.evalx.waymo_bin import (
    WaymoObject, write_bin)
from objectcentricocccompletion_tpu.evalx.waymo_metrics import (
    compute_metrics, ensure_built)


def gt_obj(i, box, ts=1000, npts=50, diff=1, typ=1):
    return WaymoObject(box, 1.0, typ, f"gt_{i}", "seg-a", ts,
                       num_lidar_points=npts, difficulty=diff)


def pred_obj(i, box, score, ts=1000, typ=1):
    return WaymoObject(box, score, typ, f"pd_{i}", "seg-a", ts)


def boxes_grid(n, seed=0):
    rng = np.random.RandomState(seed)
    out = []
    for i in range(n):
        out.append((10.0 + 15 * i, 5.0 * (i % 3), 0.0, 2.0, 4.5, 1.8,
                    float(rng.uniform(-np.pi, np.pi))))
    return out


def test_binary_builds():
    assert ensure_built()


def test_perfect_predictions(tmp_path):
    boxes = boxes_grid(4)
    gts = [gt_obj(i, b) for i, b in enumerate(boxes)]
    preds = [pred_obj(i, b, 0.9 - 0.1 * i) for i, b in enumerate(boxes)]
    write_bin(preds, str(tmp_path / "pd.bin"))
    write_bin(gts, str(tmp_path / "gt.bin"))
    m = compute_metrics(str(tmp_path / "pd.bin"), str(tmp_path / "gt.bin"))
    assert m["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/mAP"] == pytest.approx(1.0)
    assert m["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_2/mAP"] == pytest.approx(1.0)
    assert m["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/mAPH"] == pytest.approx(1.0)


def test_half_recall(tmp_path):
    boxes = boxes_grid(4)
    gts = [gt_obj(i, b) for i, b in enumerate(boxes)]
    preds = [pred_obj(i, b, 0.9) for i, b in enumerate(boxes[:2])]
    write_bin(preds, str(tmp_path / "pd.bin"))
    write_bin(gts, str(tmp_path / "gt.bin"))
    m = compute_metrics(str(tmp_path / "pd.bin"), str(tmp_path / "gt.bin"))
    assert m["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/mAP"] == pytest.approx(0.5)


def test_heading_flip_hurts_only_maph(tmp_path):
    boxes = boxes_grid(4)
    gts = [gt_obj(i, b) for i, b in enumerate(boxes)]
    flipped = [b[:6] + (b[6] + math.pi,) for b in boxes]
    preds = [pred_obj(i, b, 0.9) for i, b in enumerate(flipped)]
    write_bin(preds, str(tmp_path / "pd.bin"))
    write_bin(gts, str(tmp_path / "gt.bin"))
    m = compute_metrics(str(tmp_path / "pd.bin"), str(tmp_path / "gt.bin"))
    assert m["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/mAP"] == pytest.approx(1.0)
    assert m["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/mAPH"] < 0.05


def test_difficulty_gating(tmp_path):
    boxes = boxes_grid(4)
    # two L1 gts, one few-point L2, one explicit L2
    gts = [gt_obj(0, boxes[0]), gt_obj(1, boxes[1]),
           gt_obj(2, boxes[2], npts=3),
           gt_obj(3, boxes[3], diff=2)]
    # predict only the two L1 boxes
    preds = [pred_obj(i, boxes[i], 0.9) for i in range(2)]
    write_bin(preds, str(tmp_path / "pd.bin"))
    write_bin(gts, str(tmp_path / "gt.bin"))
    m = compute_metrics(str(tmp_path / "pd.bin"), str(tmp_path / "gt.bin"))
    # L1: only 2 gts -> perfect. L2: 4 gts, 2 found -> 0.5
    assert m["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/mAP"] == pytest.approx(1.0)
    assert m["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_2/mAP"] == pytest.approx(0.5)
    # predicting an L2-only box must NOT hurt L1 (ignored, not FP)
    preds2 = preds + [pred_obj(2, boxes[2], 0.95)]
    write_bin(preds2, str(tmp_path / "pd2.bin"))
    m2 = compute_metrics(str(tmp_path / "pd2.bin"), str(tmp_path / "gt.bin"))
    assert m2["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/mAP"] == pytest.approx(1.0)
    assert m2["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_2/mAP"] == pytest.approx(0.75)


def test_range_buckets(tmp_path):
    near = (10.0, 0.0, 0.0, 2.0, 4.5, 1.8, 0.3)    # dist 10 -> [0, 30)
    far = (60.0, 0.0, 0.0, 2.0, 4.5, 1.8, 0.3)     # dist 60 -> [50, inf)
    gts = [gt_obj(0, near), gt_obj(1, far)]
    preds = [pred_obj(0, near, 0.9)]                # find only the near one
    write_bin(preds, str(tmp_path / "pd.bin"))
    write_bin(gts, str(tmp_path / "gt.bin"))
    m = compute_metrics(str(tmp_path / "pd.bin"), str(tmp_path / "gt.bin"))
    assert m["RANGE_TYPE_VEHICLE_[0, 30)_LEVEL_1/mAP"] == pytest.approx(1.0)
    assert m["RANGE_TYPE_VEHICLE_[50, +inf)_LEVEL_1/mAP"] == pytest.approx(0.0)
    assert m["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/mAP"] == pytest.approx(0.5)


def test_false_positive_lowers_ap(tmp_path):
    boxes = boxes_grid(2)
    gts = [gt_obj(i, b) for i, b in enumerate(boxes)]
    fake = (100.0, 50.0, 0.0, 2.0, 4.5, 1.8, 0.0)
    preds = [pred_obj(0, boxes[0], 0.9), pred_obj(1, boxes[1], 0.8),
             pred_obj(2, fake, 0.95)]   # high-scoring FP first
    write_bin(preds, str(tmp_path / "pd.bin"))
    write_bin(gts, str(tmp_path / "gt.bin"))
    m = compute_metrics(str(tmp_path / "pd.bin"), str(tmp_path / "gt.bin"))
    ap = m["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/mAP"]
    # PR: (0, 0), (0.5, 1/2), (1.0, 2/3); monotone envelope lifts the
    # r=0.5 precision to 2/3 -> AP = 2/3
    assert ap == pytest.approx(2 / 3, abs=1e-6)
    assert ap < 1.0
