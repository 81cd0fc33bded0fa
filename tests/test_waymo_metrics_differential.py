"""Differential validation of the native Waymo metrics binary (VERDICT r2
next #7): an INDEPENDENT numpy/scipy implementation of the official
matcher + AP protocol, fuzzed against the C++ binary over randomized scenes
(scores, headings, difficulties, ranges, multiple classes/frames).

The referee shares no code with the binary: scipy's
``linear_sum_assignment`` is the matcher (vs the binary's hand-rolled
potentials Hungarian), BEV intersection is a Sutherland–Hodgman polygon
clip in numpy (vs the C++ clip), AP integration re-derived from the
protocol description (quantile cutoffs, recall-gap delta=0.05,
heading-accuracy-weighted APH, L1-ignore semantics).
"""
import math
import os
import subprocess

import numpy as np
import pytest

scipy_opt = pytest.importorskip("scipy.optimize")

from objectcentricocccompletion_tpu.evalx.waymo_bin import (WaymoObject,
                                                            write_bin)
from objectcentricocccompletion_tpu.evalx.waymo_metrics import \
    compute_metrics

RECALL_DELTA = 0.05


# ------------------------------------------------------- referee geometry
def _wrap(a):
    return (a + np.pi) % (2 * np.pi) - np.pi


def _to_waymo(box):
    """Our layout (cx, cy, z_bottom, w, l, h, yaw) -> waymo wire values
    (center z, heading) — the same conversion the .bin writer applies."""
    cx, cy, cz, w, l, h, yaw = box
    return cx, cy, cz + h / 2, w, l, h, _wrap(-yaw - 0.5 * math.pi)


def _bev_poly(cx, cy, w, l, heading):
    c, s = math.cos(heading), math.sin(heading)
    pts = []
    for dx, dy in ((l / 2, w / 2), (-l / 2, w / 2), (-l / 2, -w / 2),
                   (l / 2, -w / 2)):
        pts.append((cx + dx * c - dy * s, cy + dx * s + dy * c))
    return pts


def _clip_polygon(subject, cx, cy, nx, ny):
    """Keep the half-plane (p - c) . n <= 0 (Sutherland–Hodgman step)."""
    out = []
    n = len(subject)
    for i in range(n):
        a, b = subject[i], subject[(i + 1) % n]
        da = (a[0] - cx) * nx + (a[1] - cy) * ny
        db = (b[0] - cx) * nx + (b[1] - cy) * ny
        if da <= 0:
            out.append(a)
            if db > 0:
                t = da / (da - db)
                out.append((a[0] + t * (b[0] - a[0]),
                            a[1] + t * (b[1] - a[1])))
        elif db <= 0:
            t = da / (da - db)
            out.append((a[0] + t * (b[0] - a[0]),
                        a[1] + t * (b[1] - a[1])))
    return out


def _poly_area(poly):
    if len(poly) < 3:
        return 0.0
    area = 0.0
    for i in range(len(poly)):
        j = (i + 1) % len(poly)
        area += poly[i][0] * poly[j][1] - poly[j][0] * poly[i][1]
    return abs(area) / 2


def _iou3d(a, b):
    """a, b: waymo-convention (cx, cy, cz, w, l, h, heading)."""
    pa = _bev_poly(a[0], a[1], a[3], a[4], a[6])
    pb = _bev_poly(b[0], b[1], b[3], b[4], b[6])
    clipped = pa
    for i in range(4):
        x0, y0 = pb[i]
        x1, y1 = pb[(i + 1) % 4]
        ex, ey = x1 - x0, y1 - y0
        # inward normal for a CCW/CW-agnostic clip: use edge normal whose
        # sign keeps the polygon's own centroid inside
        nx, ny = ey, -ex
        ccx = sum(p[0] for p in pb) / 4
        ccy = sum(p[1] for p in pb) / 4
        if (ccx - x0) * nx + (ccy - y0) * ny > 0:
            nx, ny = -nx, -ny
        clipped = _clip_polygon(clipped, x0, y0, nx, ny)
        if not clipped:
            return 0.0
    inter_bev = _poly_area(clipped)
    za = (a[2] - a[5] / 2, a[2] + a[5] / 2)
    zb = (b[2] - b[5] / 2, b[2] + b[5] / 2)
    hov = max(0.0, min(za[1], zb[1]) - max(za[0], zb[0]))
    inter = inter_bev * hov
    union = a[3] * a[4] * a[5] + b[3] * b[4] * b[5] - inter
    return inter / union if union > 1e-9 else 0.0


# --------------------------------------------------------- referee metric
def referee_ap(preds, gts, cls, level, iou_thresh, rng_lo=0.0,
               rng_hi=1e18, num_cutoffs=100):
    """preds/gts: list of dicts with keys box (waymo convention), score,
    type, context, ts, num_points, difficulty."""
    def gt_level(g):
        if g["difficulty"] == 2:
            return 2
        if 0 <= g["num_points"] < 5:
            return 2
        return 1

    def in_range(b):
        return rng_lo <= math.hypot(b[0], b[1]) < rng_hi

    frames = {}
    num_gt = 0
    for g in gts:
        if g["type"] != cls or g["num_points"] == 0:
            continue
        if not in_range(g["box"]):
            continue
        ignored = level == 1 and gt_level(g) == 2
        f = frames.setdefault((g["context"], g["ts"]),
                              dict(preds=[], gts=[], ign=[]))
        f["gts"].append(g)
        f["ign"].append(ignored)
        num_gt += 0 if ignored else 1
    scores = []
    for p in preds:
        if p["type"] != cls or not in_range(p["box"]):
            continue
        frames.setdefault((p["context"], p["ts"]),
                          dict(preds=[], gts=[], ign=[]))["preds"].append(p)
        scores.append(p["score"])
    if num_gt == 0 or not scores:
        return 0.0, 0.0

    for f in frames.values():
        f["preds"].sort(key=lambda p: -p["score"])
        f["iou"] = np.array([[_iou3d(p["box"], g["box"]) for g in f["gts"]]
                             for p in f["preds"]]).reshape(
                                 len(f["preds"]), len(f["gts"]))

    scores = np.sort(np.asarray(scores))
    k = min(num_cutoffs, len(scores))
    idx = (np.arange(k) * (len(scores) - 1) / max(k - 1, 1)).astype(int)
    cutoffs = np.unique(scores[idx])[::-1]

    rows = []
    for cutoff in cutoffs:
        tp = fp = tph = 0.0
        for f in frames.values():
            m = sum(1 for p in f["preds"] if p["score"] >= cutoff)
            if m == 0:
                continue
            iou = f["iou"][:m]
            valid = iou >= iou_thresh
            if valid.any():
                # max-total-IoU one-to-one matching; forbidden pairs get 0
                # benefit and are dropped afterwards
                benefit = np.where(valid, iou, 0.0)
                ri, ci = scipy_opt.linear_sum_assignment(-benefit)
                match = {int(r): int(c) for r, c in zip(ri, ci)
                         if valid[r, c]}
            else:
                match = {}
            for i in range(m):
                j = match.get(i)
                if j is None:
                    fp += 1
                elif f["ign"][j]:
                    pass
                else:
                    dh = _wrap(f["preds"][i]["box"][6] - f["gts"][j]["box"][6])
                    tp += 1
                    tph += max(0.0, 1.0 - abs(dh) / math.pi)
        if tp + fp <= 0:
            continue
        rows.append((tp / num_gt, tp / (tp + fp), tph / (tp + fp)))
    rows.sort()
    # precision envelope: max precision over points with recall >= r
    # (PASCAL/Waymo smoothing; makes tied-recall ordering irrelevant)
    for i in range(len(rows) - 2, -1, -1):
        rows[i] = (rows[i][0], max(rows[i][1], rows[i + 1][1]),
                   max(rows[i][2], rows[i + 1][2]))
    ap = aph = 0.0
    last_r = 0.0
    for r, p, ph in rows:
        dr = r - last_r
        if dr <= 0:
            continue
        ap += p * min(dr, RECALL_DELTA)
        aph += ph * min(dr, RECALL_DELTA)
        last_r = r
    return ap, aph


# --------------------------------------------------------------- scene gen
def random_scene(seed, n_frames=4, n_gt_per_frame=8, fp_per_frame=4):
    rng = np.random.RandomState(seed)
    preds, gts = [], []
    for fr in range(n_frames):
        ts = 1000 + fr
        for k in range(n_gt_per_frame):
            cls = int(rng.choice([1, 2, 4]))
            size = {1: [2.1, 4.8, 1.8], 2: [0.9, 0.9, 1.8],
                    4: [0.8, 1.8, 1.7]}[cls]
            d = rng.uniform(3, 70)
            ang = rng.uniform(0, 2 * np.pi)
            box = [d * np.cos(ang), d * np.sin(ang), rng.uniform(-1, 0.5),
                   size[0] * rng.uniform(0.9, 1.1),
                   size[1] * rng.uniform(0.9, 1.1),
                   size[2] * rng.uniform(0.9, 1.1),
                   rng.uniform(-np.pi, np.pi)]
            npts = int(rng.choice([0, 2, 4, 6, 30, 200]))
            diff = int(rng.choice([1, 1, 1, 2]))
            gts.append(dict(box=box, type=cls, ts=ts, num_points=npts,
                            difficulty=diff, id=f"gt{fr}_{k}"))
            if rng.rand() < 0.8:   # matching prediction with jitter
                jit = np.asarray(box) + np.concatenate([
                    rng.uniform(-0.3, 0.3, 3), rng.uniform(-0.1, 0.1, 3),
                    rng.uniform(-0.3, 0.3, 1)])
                preds.append(dict(box=list(jit), type=cls, ts=ts,
                                  score=float(rng.rand()),
                                  id=f"p{fr}_{k}"))
        for k in range(fp_per_frame):
            cls = int(rng.choice([1, 2, 4]))
            d = rng.uniform(3, 70)
            ang = rng.uniform(0, 2 * np.pi)
            preds.append(dict(
                box=[d * np.cos(ang), d * np.sin(ang), rng.uniform(-1, 1),
                     rng.uniform(0.7, 2.5), rng.uniform(0.7, 5.0),
                     rng.uniform(1.2, 2.2), rng.uniform(-np.pi, np.pi)],
                type=cls, ts=ts, score=float(rng.rand()),
                id=f"fp{fr}_{k}"))
    return preds, gts


def _run_differential(tmp_path, preds, gts, min_checks=8):
    pred_objs = [WaymoObject(tuple(p["box"]), p["score"], p["type"],
                             p["id"], "seg-ref", p["ts"]) for p in preds]
    gt_objs = [WaymoObject(tuple(g["box"]), 1.0, g["type"], g["id"],
                           "seg-ref", g["ts"],
                           num_lidar_points=g["num_points"],
                           difficulty=g["difficulty"]) for g in gts]
    pb = str(tmp_path / "pred.bin")
    gb = str(tmp_path / "gt.bin")
    write_bin(pred_objs, pb)
    write_bin(gt_objs, gb)
    got = compute_metrics(pb, gb)

    wp = [dict(p, box=_to_waymo(p["box"]), context="seg-ref",
               num_points=-1, difficulty=0) for p in preds]
    wg = [dict(g, box=_to_waymo(g["box"]), context="seg-ref", score=1.0)
          for g in gts]

    checks = []
    for cls, name in ((1, "VEHICLE"), (2, "PEDESTRIAN"), (4, "CYCLIST")):
        thr = 0.7 if cls == 1 else 0.5
        for level in (1, 2):
            key = f"OBJECT_TYPE_TYPE_{name}_LEVEL_{level}"
            if f"{key}/mAP" not in got:
                continue
            ap, aph = referee_ap(wp, wg, cls, level, thr)
            checks.append((key, got[f"{key}/mAP"], ap,
                           got[f"{key}/mAPH"], aph))
    # range breakdowns for vehicles
    for lo, hi, tag in ((0, 30, "[0, 30)"), (30, 50, "[30, 50)"),
                        (50, 1e18, "[50, +inf)")):
        for level in (1, 2):
            key = f"RANGE_TYPE_VEHICLE_{tag}_LEVEL_{level}"
            if f"{key}/mAP" not in got:
                continue
            ap, aph = referee_ap(wp, wg, 1, level, 0.7, lo, hi)
            checks.append((key, got[f"{key}/mAP"], ap,
                           got[f"{key}/mAPH"], aph))

    assert len(checks) >= min_checks, sorted(got)
    for key, bin_ap, ref_ap, bin_aph, ref_aph in checks:
        assert abs(bin_ap - ref_ap) < 1e-3, (key, bin_ap, ref_ap)
        assert abs(bin_aph - ref_aph) < 1e-3, (key, bin_aph, ref_aph)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5])
def test_binary_matches_numpy_referee(tmp_path, seed):
    preds, gts = random_scene(seed)
    _run_differential(tmp_path, preds, gts)


# ------------------------------------------------- degenerate protocol corners
def _vehicle_gt(rng, ts, k, npts=30, diff=1, d=None):
    d = rng.uniform(5, 60) if d is None else d
    ang = rng.uniform(0, 2 * np.pi)
    box = [d * np.cos(ang), d * np.sin(ang), rng.uniform(-1, 0.5),
           2.1 * rng.uniform(0.9, 1.1), 4.8 * rng.uniform(0.9, 1.1),
           1.8 * rng.uniform(0.9, 1.1), rng.uniform(-np.pi, np.pi)]
    return dict(box=box, type=1, ts=ts, num_points=npts, difficulty=diff,
                id=f"gt{ts}_{k}")


def degenerate_scene(kind, seed=0):
    """Protocol corners that historically break AP implementations."""
    rng = np.random.RandomState(100 + seed)
    preds, gts = [], []
    if kind == "score_ties":
        # every prediction across all frames shares one of two scores:
        # cutoff selection and tie ordering must agree
        for fr in range(4):
            ts = 1000 + fr
            for k in range(6):
                g = _vehicle_gt(rng, ts, k)
                gts.append(g)
                jit = np.asarray(g["box"]) + np.concatenate([
                    rng.uniform(-0.2, 0.2, 3), rng.uniform(-0.05, 0.05, 3),
                    rng.uniform(-0.2, 0.2, 1)])
                preds.append(dict(box=list(jit), type=1, ts=ts,
                                  score=0.5 if k % 2 else 0.75,
                                  id=f"p{fr}_{k}"))
    elif kind == "duplicates_one_gt":
        # several near-identical predictions compete for a single GT:
        # only the highest-scoring one may count as TP
        for fr in range(3):
            ts = 1000 + fr
            g = _vehicle_gt(rng, ts, 0)
            gts.append(g)
            for k in range(5):
                jit = np.asarray(g["box"]) + np.concatenate([
                    rng.uniform(-0.1, 0.1, 3), np.zeros(3),
                    rng.uniform(-0.05, 0.05, 1)])
                preds.append(dict(box=list(jit), type=1, ts=ts,
                                  score=float(0.9 - 0.1 * k),
                                  id=f"p{fr}_{k}"))
    elif kind == "contained_boxes":
        # a small box fully inside a big GT: IoU below threshold -> FP
        for fr in range(3):
            ts = 1000 + fr
            g = _vehicle_gt(rng, ts, 0)
            gts.append(g)
            small = list(g["box"])
            small[3] *= 0.4
            small[4] *= 0.4
            preds.append(dict(box=small, type=1, ts=ts,
                              score=float(rng.rand()), id=f"pi{fr}"))
            jit = np.asarray(g["box"]) + np.concatenate([
                rng.uniform(-0.2, 0.2, 3), np.zeros(3),
                rng.uniform(-0.1, 0.1, 1)])
            preds.append(dict(box=list(jit), type=1, ts=ts,
                              score=float(rng.rand()), id=f"pm{fr}"))
    elif kind == "all_l2":
        # every GT is LEVEL_2 (few points or hard): the L1 curve is empty
        for fr in range(4):
            ts = 1000 + fr
            for k in range(5):
                g = _vehicle_gt(rng, ts, k,
                                npts=int(rng.choice([1, 2, 3, 4])),
                                diff=2)
                gts.append(g)
                if rng.rand() < 0.7:
                    jit = np.asarray(g["box"]) + np.concatenate([
                        rng.uniform(-0.2, 0.2, 3), np.zeros(3),
                        rng.uniform(-0.1, 0.1, 1)])
                    preds.append(dict(box=list(jit), type=1, ts=ts,
                                      score=float(rng.rand()),
                                      id=f"p{fr}_{k}"))
    elif kind == "empty_predictions":
        # GT present, zero predictions of that class: AP must be 0 and the
        # binary must not crash on an empty curve
        for fr in range(3):
            ts = 1000 + fr
            for k in range(4):
                gts.append(_vehicle_gt(rng, ts, k))
    elif kind == "many_unique_scores":
        # >100 distinct scores forces the cutoff quantization path
        for fr in range(4):
            ts = 1000 + fr
            for k in range(16):
                g = _vehicle_gt(rng, ts, k)
                gts.append(g)
                jit = np.asarray(g["box"]) + np.concatenate([
                    rng.uniform(-0.35, 0.35, 3), rng.uniform(-0.1, 0.1, 3),
                    rng.uniform(-0.3, 0.3, 1)])
                preds.append(dict(
                    box=list(jit), type=1, ts=ts,
                    score=float((fr * 16 + k) + rng.rand()) / 70.0,
                    id=f"p{fr}_{k}"))
            for k in range(10):
                fp = _vehicle_gt(rng, ts, 100 + k)
                preds.append(dict(box=fp["box"], type=1, ts=ts,
                                  score=float(rng.rand()),
                                  id=f"fp{fr}_{k}"))
    elif kind == "one_box":
        # minimal scene: one GT, one prediction
        g = _vehicle_gt(rng, 1000, 0)
        gts.append(g)
        preds.append(dict(box=list(g["box"]), type=1, ts=1000, score=0.9,
                          id="p0"))
    elif kind == "heading_flips":
        # predictions heading-flipped by pi: TPs with 0 heading accuracy
        # separate mAP from mAPH
        for fr in range(3):
            ts = 1000 + fr
            for k in range(6):
                g = _vehicle_gt(rng, ts, k)
                gts.append(g)
                flip = list(g["box"])
                flip[6] = _wrap(flip[6] + np.pi)
                preds.append(dict(box=flip, type=1, ts=ts,
                                  score=float(rng.rand()), id=f"p{fr}_{k}"))
    else:
        raise ValueError(kind)
    return preds, gts


@pytest.mark.parametrize("kind", [
    "score_ties", "duplicates_one_gt", "contained_boxes", "all_l2",
    "empty_predictions", "many_unique_scores", "one_box", "heading_flips"])
def test_binary_matches_referee_degenerate(tmp_path, kind):
    preds, gts = degenerate_scene(kind)
    _run_differential(tmp_path, preds, gts, min_checks=2)
