"""KITTI AP evaluator semantics (modeled on the reference's
tests/test_metrics/test_kitti_eval.py intent)."""
import numpy as np

from objectcentricocccompletion_tpu.evalx.kitti_eval import (
    eval_class, gt_difficulty, kitti_eval)


def boxes(n, seed=0):
    rng = np.random.RandomState(seed)
    return np.concatenate(
        [rng.uniform(-20, 20, (n, 2)), np.full((n, 1), -1.0),
         np.abs(rng.normal([2.0, 4.5, 1.7], 0.05, (n, 3))),
         rng.uniform(-np.pi, np.pi, (n, 1))], -1).astype(np.float32)


def test_gt_difficulty():
    d = gt_difficulty(np.array([50, 30, 26, 10]),
                      np.array([0, 1, 2, 0]),
                      np.array([0.1, 0.2, 0.4, 0.1]))
    assert d.tolist() == [0, 1, 2, 3]


def test_perfect_predictions_ap1():
    gb = boxes(5)
    preds = [dict(boxes=gb, scores=np.linspace(0.9, 0.5, 5),
                  labels=np.zeros(5, int))]
    gts = [dict(boxes=gb, labels=np.zeros(5, int),
                difficulty=np.zeros(5, int))]
    m = kitti_eval(preds, gts)
    assert abs(m["Car_3d_easy"] - 1.0) < 1e-6
    assert abs(m["Car_3d_hard"] - 1.0) < 1e-6


def test_ignored_harder_gt_not_fp():
    gb = boxes(4)
    diff = np.array([0, 0, 2, 2])   # two hard GT
    # predict ALL four -> at easy level the two hard matches are ignored
    preds = [dict(boxes=gb, scores=np.array([0.9, 0.8, 0.95, 0.85]),
                  labels=np.zeros(4, int))]
    gts = [dict(boxes=gb, labels=np.zeros(4, int), difficulty=diff)]
    m = kitti_eval(preds, gts)
    assert abs(m["Car_3d_easy"] - 1.0) < 1e-6   # not penalized
    assert abs(m["Car_3d_hard"] - 1.0) < 1e-6


def test_misses_reduce_ap():
    gb = boxes(4)
    preds = [dict(boxes=gb[:2], scores=np.array([0.9, 0.8]),
                  labels=np.zeros(2, int))]
    gts = [dict(boxes=gb, labels=np.zeros(4, int),
                difficulty=np.zeros(4, int))]
    m = kitti_eval(preds, gts)
    assert 0.3 < m["Car_3d_easy"] < 0.6
