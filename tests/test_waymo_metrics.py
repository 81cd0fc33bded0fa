"""Native C++ Waymo metrics evaluator: build + semantic checks through the
subprocess interface.

The binary implements the official protocol: per-score-cutoff HUNGARIAN
matching and AP with the delta = 0.05 recall-gap penalty (gaps between
adjacent recall points beyond delta contribute zero precision). Tests use
dense score distributions (recall deltas < delta) so expected values are
exact; one test pins the documented sparse-score penalty itself.
"""
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


def boxes_grid(n, seed=0, near=True):
    """n disjoint vehicle boxes; all within [0, 30) range when near."""
    rng = np.random.RandomState(seed)
    out = []
    for i in range(n):
        r = 8.0 + 20.0 * (i // 12) if near else 55.0 + 8 * (i // 12)
        ang = (i % 12) / 12.0 * 2 * np.pi
        out.append((r * np.cos(ang), r * np.sin(ang), 0.0, 2.0, 4.5, 1.8,
                    float(rng.uniform(-np.pi, np.pi))))
    return out


def scores(n, lo=0.3, hi=0.95):
    return np.linspace(hi, lo, n)


def test_binary_builds():
    assert ensure_built()


def test_perfect_predictions(tmp_path):
    n = 30   # recall deltas 1/30 < 0.05 -> no gap penalty
    boxes = boxes_grid(n)
    gts = [gt_obj(i, b) for i, b in enumerate(boxes)]
    preds = [pred_obj(i, b, s)
             for i, (b, s) in enumerate(zip(boxes, scores(n)))]
    write_bin(preds, str(tmp_path / "pd.bin"))
    write_bin(gts, str(tmp_path / "gt.bin"))
    m = compute_metrics(str(tmp_path / "pd.bin"), str(tmp_path / "gt.bin"))
    assert m["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/mAP"] == pytest.approx(
        1.0, abs=1e-6)
    assert m["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_2/mAP"] == pytest.approx(
        1.0, abs=1e-6)
    assert m["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/mAPH"] == pytest.approx(
        1.0, abs=1e-6)


def test_sparse_scores_recall_gap_penalty(tmp_path):
    """Official quirk: with few distinct scores the recall gaps exceed
    delta=0.05 and the excess contributes zero precision — 4 perfect
    predictions score 4 * 0.05 = 0.2, not 1.0."""
    boxes = boxes_grid(4)
    gts = [gt_obj(i, b) for i, b in enumerate(boxes)]
    preds = [pred_obj(i, b, 0.9 - 0.1 * i) for i, b in enumerate(boxes)]
    write_bin(preds, str(tmp_path / "pd.bin"))
    write_bin(gts, str(tmp_path / "gt.bin"))
    m = compute_metrics(str(tmp_path / "pd.bin"), str(tmp_path / "gt.bin"))
    assert m["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/mAP"] == pytest.approx(
        0.2, abs=1e-6)


def test_half_recall(tmp_path):
    n = 20   # recall deltas exactly 0.05
    boxes = boxes_grid(n)
    gts = [gt_obj(i, b) for i, b in enumerate(boxes)]
    preds = [pred_obj(i, b, s)
             for i, (b, s) in enumerate(zip(boxes[:10], scores(10)))]
    write_bin(preds, str(tmp_path / "pd.bin"))
    write_bin(gts, str(tmp_path / "gt.bin"))
    m = compute_metrics(str(tmp_path / "pd.bin"), str(tmp_path / "gt.bin"))
    assert m["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/mAP"] == pytest.approx(
        0.5, abs=1e-6)


def test_heading_flip_hurts_only_maph(tmp_path):
    n = 30
    boxes = boxes_grid(n)
    gts = [gt_obj(i, b) for i, b in enumerate(boxes)]
    flipped = [b[:6] + (b[6] + math.pi,) for b in boxes]
    preds = [pred_obj(i, b, s)
             for i, (b, s) in enumerate(zip(flipped, scores(n)))]
    write_bin(preds, str(tmp_path / "pd.bin"))
    write_bin(gts, str(tmp_path / "gt.bin"))
    m = compute_metrics(str(tmp_path / "pd.bin"), str(tmp_path / "gt.bin"))
    assert m["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/mAP"] == pytest.approx(
        1.0, abs=1e-6)
    assert m["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/mAPH"] < 0.05


def test_difficulty_gating(tmp_path):
    boxes = boxes_grid(32)
    # 24 L1 gts, 4 few-point L2, 4 explicit L2
    gts = ([gt_obj(i, boxes[i]) for i in range(24)]
           + [gt_obj(24 + i, boxes[24 + i], npts=3) for i in range(4)]
           + [gt_obj(28 + i, boxes[28 + i], diff=2) for i in range(4)])
    # predict only the 24 L1 boxes (dense distinct scores)
    preds = [pred_obj(i, boxes[i], s)
             for i, s in zip(range(24), scores(24))]
    write_bin(preds, str(tmp_path / "pd.bin"))
    write_bin(gts, str(tmp_path / "gt.bin"))
    m = compute_metrics(str(tmp_path / "pd.bin"), str(tmp_path / "gt.bin"))
    # L1: 24 gts all found -> 1.0. L2: 32 gts, 24 found -> 0.75
    assert m["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/mAP"] == pytest.approx(
        1.0, abs=1e-6)
    assert m["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_2/mAP"] == pytest.approx(
        0.75, abs=1e-6)
    # predicting L2-only boxes must NOT hurt L1 (ignored, not FP)
    preds2 = preds + [pred_obj(24 + i, boxes[24 + i], 0.97 - 0.001 * i)
                      for i in range(4)]
    write_bin(preds2, str(tmp_path / "pd2.bin"))
    m2 = compute_metrics(str(tmp_path / "pd2.bin"), str(tmp_path / "gt.bin"))
    assert m2["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/mAP"] == pytest.approx(
        1.0, abs=1e-6)
    assert m2["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_2/mAP"] == pytest.approx(
        0.875, abs=1e-6)


def test_range_buckets(tmp_path):
    near = boxes_grid(20, near=True)       # dists < 30
    far = boxes_grid(20, seed=1, near=False)   # dists >= 50
    gts = ([gt_obj(i, b) for i, b in enumerate(near)]
           + [gt_obj(100 + i, b) for i, b in enumerate(far)])
    preds = [pred_obj(i, b, s)
             for i, (b, s) in enumerate(zip(near, scores(20)))]
    write_bin(preds, str(tmp_path / "pd.bin"))
    write_bin(gts, str(tmp_path / "gt.bin"))
    m = compute_metrics(str(tmp_path / "pd.bin"), str(tmp_path / "gt.bin"))
    assert m["RANGE_TYPE_VEHICLE_[0, 30)_LEVEL_1/mAP"] == pytest.approx(
        1.0, abs=1e-6)
    assert m["RANGE_TYPE_VEHICLE_[50, +inf)_LEVEL_1/mAP"] == pytest.approx(
        0.0, abs=1e-6)
    assert m["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/mAP"] == pytest.approx(
        0.5, abs=1e-6)


def test_false_positive_lowers_ap(tmp_path):
    n = 20
    boxes = boxes_grid(n)
    gts = [gt_obj(i, b) for i, b in enumerate(boxes)]
    fake = (100.0, 50.0, 0.0, 2.0, 4.5, 1.8, 0.0)
    preds = [pred_obj(i, b, s)
             for i, (b, s) in enumerate(zip(boxes, scores(n, 0.3, 0.9)))]
    preds.append(pred_obj(n, fake, 0.95))   # highest-scoring FP
    write_bin(preds, str(tmp_path / "pd.bin"))
    write_bin(gts, str(tmp_path / "gt.bin"))
    m = compute_metrics(str(tmp_path / "pd.bin"), str(tmp_path / "gt.bin"))
    ap = m["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/mAP"]
    # at cutoff passing i true positives: r=i/20, p=i/(i+1); the precision
    # envelope lifts every point to the best dominating operating point
    # max_{j>=i} j/(j+1) = 20/21, so AP = 20 * 0.05 * 20/21
    expect = sum(0.05 * 20 / 21 for i in range(1, 21))
    assert ap == pytest.approx(expect, abs=1e-6)
    assert ap < 1.0


def test_hungarian_beats_greedy(tmp_path):
    """Two preds, two gts arranged so greedy score-order matching loses a
    TP but the official Hungarian assignment (maximize total IoU) finds
    both: A overlaps gt1 @0.72 and gt2 @0.8; B overlaps gt2 @0.75 only."""
    def car(x):
        return (x, 0.0, 0.0, 2.0, 4.5, 1.8, 0.0)
    gt1 = car(0.0)
    gt2 = car(0.548)
    pa = car(0.326)     # IoU(pa,gt1)=0.72, IoU(pa,gt2)~0.8
    pb = car(0.834)     # IoU(pb,gt2)=0.75, IoU(pb,gt1)~0.41
    gts = [gt_obj(0, gt1), gt_obj(1, gt2)]
    preds = [pred_obj(0, pa, 0.9), pred_obj(1, pb, 0.5)]
    write_bin(preds, str(tmp_path / "pd.bin"))
    write_bin(gts, str(tmp_path / "gt.bin"))
    m = compute_metrics(str(tmp_path / "pd.bin"), str(tmp_path / "gt.bin"))
    # both matched -> recall 1.0 at full precision; with the 0.05 gap
    # penalty two points contribute 2 * 0.05. Greedy would strand pred B
    # (A takes gt2, B under-laps gt1) and cap this at 0.05 * 1 + 0.05 * 0.5.
    assert m["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/mAP"] == pytest.approx(
        0.1, abs=1e-6)


def test_ped_cyc_classes(tmp_path):
    """Pedestrian and cyclist use the 0.5 IoU threshold and evaluate
    independently of vehicles."""
    n = 20
    rng = np.random.RandomState(3)
    peds = [(5.0 + 1.5 * i, -6.0, 0.0, 0.8, 0.8, 1.7,
             float(rng.uniform(-np.pi, np.pi))) for i in range(n)]
    cycs = [(5.0 + 1.5 * i, 6.0, 0.0, 0.8, 1.8, 1.7,
             float(rng.uniform(-np.pi, np.pi))) for i in range(n)]
    gts = ([gt_obj(i, b, typ=2) for i, b in enumerate(peds)]
           + [gt_obj(100 + i, b, typ=4) for i, b in enumerate(cycs)])
    # jitter peds slightly (IoU stays above 0.5) and find half the cyclists
    jit = [(b[0] + 0.08, b[1], b[2], b[3], b[4], b[5], b[6]) for b in peds]
    preds = ([pred_obj(i, b, s, typ=2)
              for i, (b, s) in enumerate(zip(jit, scores(n)))]
             + [pred_obj(100 + i, b, s, typ=4)
                for i, (b, s) in enumerate(zip(cycs[:10], scores(10)))])
    write_bin(preds, str(tmp_path / "pd.bin"))
    write_bin(gts, str(tmp_path / "gt.bin"))
    m = compute_metrics(str(tmp_path / "pd.bin"), str(tmp_path / "gt.bin"))
    assert m["OBJECT_TYPE_TYPE_PEDESTRIAN_LEVEL_1/mAP"] == pytest.approx(
        1.0, abs=1e-6)
    assert m["OBJECT_TYPE_TYPE_CYCLIST_LEVEL_1/mAP"] == pytest.approx(
        0.5, abs=1e-6)
    assert m["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/mAP"] == 0.0
