"""SST: window partition round-trip invariants (the reference's debug
asserts as real tests), attention masking, and detector forward/loss."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from objectcentricocccompletion_tpu.ops import window as W
from objectcentricocccompletion_tpu.models.sst import tiny_sst_config
from objectcentricocccompletion_tpu.models.sst_detector import (
    SSTDetector, tiny_sst_detector_config)
from objectcentricocccompletion_tpu.models import anchor_head as ah


def test_window_partition_roundtrip():
    """flat -> window -> flat must be identity for kept voxels
    (reference sst_ops.py:55-61 round-trip debug checks)."""
    rng = np.random.RandomState(0)
    V = 256
    coords = rng.randint(0, 24, (V, 3)).astype(np.int32)
    coords[:, 2] = 0
    valid = rng.rand(V) > 0.1
    part = W.partition(jnp.asarray(coords), jnp.asarray(valid),
                       (24, 24, 1), (4, 4, 1), False, 128, 16)
    feats = jnp.asarray(rng.randn(V, 8).astype(np.float32))
    tokens, tmask = W.flat_to_window(feats, part, 128, 16)
    back = W.window_to_flat(tokens, part, V)
    kept = np.asarray((part.win_of_voxel >= 0))
    np.testing.assert_allclose(np.asarray(back)[kept],
                               np.asarray(feats)[kept], atol=1e-6)
    assert kept.sum() == np.asarray(valid).sum()  # capacity 16 = window size
    # all voxels in one window share the window id
    wid = np.asarray(part.win_of_voxel)
    cw = coords[:, :2] // 4
    for w in np.unique(wid[kept]):
        cells = cw[(wid == w) & kept]
        assert (cells == cells[0]).all()


def test_window_shifted_differs():
    coords = jnp.asarray([[5, 5, 0], [6, 6, 0]], jnp.int32)
    valid = jnp.asarray([True, True])
    p0 = W.partition(coords, valid, (16, 16, 1), (4, 4, 1), False, 64, 16)
    p1 = W.partition(coords, valid, (16, 16, 1), (4, 4, 1), True, 64, 16)
    # unshifted: cells (1,1); shifted by 2: (5+2)//4=1, (6+2)//4=2 ->
    # different windows in the shifted partition
    assert np.asarray(p0.win_of_voxel)[0] == np.asarray(p0.win_of_voxel)[1]
    assert np.asarray(p1.win_of_voxel)[0] != np.asarray(p1.win_of_voxel)[1]


def make_sst_frame(cfg, seed=0, num_boxes=3):
    rng = np.random.RandomState(seed)
    s = cfg.sst
    lo, hi = np.asarray(s.pc_range[:3]), np.asarray(s.pc_range[3:])
    ctr = rng.uniform(lo + 2, hi - 2, (num_boxes, 3))
    ctr[:, 2] = -0.5
    size = np.abs(rng.normal([2.0, 4.5, 1.7], 0.1, (num_boxes, 3)))
    yaw = rng.uniform(-np.pi, np.pi, (num_boxes, 1))
    boxes = np.concatenate([ctr, size, yaw], -1).astype(np.float32)
    pts = [rng.uniform(lo, hi, (1500, 3))]
    for b in boxes:
        local = (rng.rand(150, 3) - 0.5) * b[3:6]
        c, sn = np.cos(b[6]), np.sin(b[6])
        pts.append(np.stack([
            local[:, 0] * c - local[:, 1] * sn + b[0],
            local[:, 0] * sn + local[:, 1] * c + b[1],
            local[:, 2] + b[2] + b[5] / 2], -1))
    pts = np.concatenate(pts, 0)
    points = np.concatenate([pts, rng.rand(len(pts), 2)], -1).astype(
        np.float32)
    pad = s.max_points - len(points)
    points = np.pad(points, ((0, pad), (0, 0)))
    mask = np.arange(s.max_points) < len(pts)
    gt_pad = cfg.max_gt - num_boxes
    gt_boxes = np.pad(boxes, ((0, gt_pad), (0, 0)))
    gt_valid = np.arange(cfg.max_gt) < num_boxes
    return (jnp.asarray(points), jnp.asarray(mask), jnp.asarray(gt_boxes),
            jnp.zeros((cfg.max_gt,), jnp.int32), jnp.asarray(gt_valid))


def test_sst_detector_forward_loss_decode():
    cfg = tiny_sst_detector_config()
    points, mask, boxes, labels, valid = make_sst_frame(cfg)
    model = SSTDetector(cfg)
    variables = model.init(jax.random.PRNGKey(0), points, mask)
    losses = model.apply(variables, points, mask, boxes, labels, valid,
                         method=model.loss)
    assert np.isfinite(float(losses["loss"]))
    assert float(losses["num_pos_anchors"]) >= 3

    def loss_fn(params):
        return model.apply({"params": params}, points, mask, boxes, labels,
                           valid, method=model.loss)["loss"]

    g = jax.grad(loss_fn)(variables["params"])
    assert all(bool(jnp.isfinite(x).all())
               for x in jax.tree_util.tree_leaves(g))

    out_boxes, scores, out_labels, ok = model.apply(
        variables, points, mask, method=model.predict)
    assert out_boxes.shape == (500, 7)


def test_anchor_assignment_recovers_gt():
    """Anchors exactly on GT must be positive; far anchors negative."""
    acfg = ah.AnchorConfig()
    gt = jnp.asarray([[0.0, 0.0, -0.9, 2.08, 4.73, 1.77, 0.0]])
    anchors = jnp.asarray([
        [0.0, 0.0, -0.9, 2.08, 4.73, 1.77, 0.0],     # perfect
        [30.0, 30.0, -0.9, 2.08, 4.73, 1.77, 0.0],   # far
    ])
    best, pos, neg = ah.assign(anchors, gt, jnp.asarray([0]),
                               jnp.asarray([True]), acfg)
    assert bool(pos[0]) and not bool(pos[1])
    assert bool(neg[1])


def test_split_by_occupancy():
    """Two-level drop-level batching: window token sets are preserved
    exactly across the (small, large) split."""
    from objectcentricocccompletion_tpu.ops import window as win
    rng = np.random.RandomState(0)
    V = 256
    coords = rng.randint(0, 16, (V, 3)).astype(np.int32)
    coords[:, 2] = 0
    valid = rng.rand(V) > 0.1
    p = win.partition(jnp.asarray(coords), jnp.asarray(valid),
                      (16, 16, 1), (4, 4, 1), False, 64, 16)
    counts = np.asarray(win.window_counts(p, 64))
    ps, pl = win.split_by_occupancy(p, 64, 4, 64, 64)
    wv = np.asarray(p.win_of_voxel)
    sv = np.asarray(ps.win_of_voxel)
    lv = np.asarray(pl.win_of_voxel)
    for i in range(V):
        if wv[i] < 0:
            assert sv[i] < 0 and lv[i] < 0
        elif counts[wv[i]] <= 4:
            assert sv[i] >= 0 and lv[i] < 0
        else:
            assert lv[i] >= 0 and sv[i] < 0
    # ranks preserved within each level
    assert (np.asarray(ps.rank_in_win)[sv >= 0]
            == np.asarray(p.rank_in_win)[sv >= 0]).all()
    assert int(ps.num_windows) + int(pl.num_windows) \
        == int((counts > 0).sum())


def test_sst_two_level_matches_single_level():
    """Attention is permutation/padding invariant: the two-level batched
    SST must produce the SAME features as the single-bucket path (windows
    below the small budget attend identically at either capacity)."""
    import dataclasses
    from objectcentricocccompletion_tpu.models.sst import SST
    cfg1 = dataclasses.replace(tiny_sst_config(), small_capacity=0)
    cfg2 = dataclasses.replace(tiny_sst_config(), small_capacity=4,
                               max_small_windows=64, max_large_windows=64)
    rng = np.random.RandomState(1)
    n = cfg1.max_points
    pts = np.zeros((n, 5), np.float32)
    m = n // 2
    pts[:m, :3] = rng.uniform(-9, 9, (m, 3))
    pts[:m, 2] = rng.uniform(-1.5, 3.5, m)
    pts[:m, 3:] = rng.rand(m, 2)
    mask = np.arange(n) < m
    pts, mask = jnp.asarray(pts), jnp.asarray(mask)
    m1 = SST(cfg1)
    v = m1.init(jax.random.PRNGKey(0), pts, mask)
    out1 = m1.apply(v, pts, mask)
    out2 = SST(cfg2).apply(v, pts, mask)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               atol=2e-5, rtol=2e-5)


def test_sst_bf16_compute_close_to_f32():
    """bfloat16 compute (the production/bench dtype; the reference trains
    SST in fp16) keeps params/LN stats in f32 and must track the f32 loss
    closely on the tiny config."""
    import dataclasses
    import jax
    import numpy as np
    from objectcentricocccompletion_tpu.models.sst_detector import (
        SSTDetector, SSTDetectorConfig, tiny_sst_detector_config)

    cfg32 = tiny_sst_detector_config()
    cfg16 = dataclasses.replace(cfg32, sst=dataclasses.replace(
        cfg32.sst, compute_dtype="bfloat16"))
    rng = np.random.RandomState(0)
    n = 256
    pts = rng.uniform(-9, 9, (n, 3)).astype(np.float32)
    pts = np.concatenate([pts, rng.rand(n, 2).astype(np.float32)], -1)
    mask = np.arange(n) < 200
    gt = np.array([[1.0, 2.0, -0.5, 2.0, 4.5, 1.7, 0.3]], np.float32)
    gtl = np.zeros((1,), np.int32)
    gtv = np.ones((1,), bool)

    m32 = SSTDetector(cfg32)
    m16 = SSTDetector(cfg16)
    p32 = m32.init(jax.random.PRNGKey(0), pts, mask)["params"]
    # param trees are dtype-independent (params stay f32)
    d32 = m32.apply({"params": p32}, pts, mask, gt, gtl, gtv,
                    method=m32.loss)
    d16 = m16.apply({"params": p32}, pts, mask, gt, gtl, gtv,
                    method=m16.loss)
    for leaf in jax.tree_util.tree_leaves(p32):
        assert leaf.dtype == np.float32
    for k in d32:
        a, b = float(d32[k]), float(d16[k])
        assert np.isfinite(b), (k, b)
        assert abs(a - b) <= 0.05 * max(abs(a), 1e-3) + 2e-2, (k, a, b)


def test_multiclass_assignment_class_restricted():
    """3-class anchors (waymo_3class_anchor_config, sst_base.py:19-69):
    matching is class-restricted with per-class thresholds — a car GT
    sitting exactly on a cell can only claim car anchors; other-class
    anchors at the same cell are background."""
    import jax.numpy as jnp

    acfg = ah.waymo_3class_anchor_config()
    pc = (-8.0, -8.0, -3.0, 8.0, 8.0, 3.0)
    anchors = ah.generate_anchors((8, 8), pc, acfg)
    A = anchors.shape[0]
    R, S = len(acfg.rotations), len(acfg.sizes)
    anchor_classes = (jnp.arange(A) // R) % S

    # GT = the car anchor at one cell and the pedestrian anchor at another
    car = np.asarray(anchors[(10 * S + 0) * R + 0])       # cell 10, car, r0
    ped = np.asarray(anchors[(30 * S + 2) * R + 0])       # cell 30, ped, r0
    gt_boxes = jnp.asarray(np.stack([car, ped]))
    gt_labels = jnp.asarray([0, 2], dtype=jnp.int32)
    gt_valid = jnp.asarray([True, True])

    best_gt, pos, neg = ah.assign(anchors, gt_boxes, gt_labels, gt_valid,
                                  acfg, anchor_classes)
    pos, neg, best_gt = map(np.asarray, (pos, neg, best_gt))
    assert pos.sum() >= 2
    # every positive anchor's class equals its matched GT's class
    lab = np.asarray(gt_labels)[best_gt[pos]]
    np.testing.assert_array_equal(np.asarray(anchor_classes)[pos], lab)
    # the cyclist (class 1) anchors at the car GT's cell are background
    cyc_at_car = (10 * S + 1) * R
    assert neg[cyc_at_car] and neg[cyc_at_car + 1]
    # per-class thresholds: the structure carries tuples
    assert len(acfg.pos_iou_thr) == 3


def test_heading_sin_difference_loss_surface_and_decode():
    """diff_rad_by_sin semantics (anchor3d_head.add_sin_difference:
    |sin(p)cos(t) - cos(p)sin(t)| = |sin(p - t)|): the heading loss term
    vanishes at p = t and p = t + pi (the dir head resolves the flip) and
    is NONZERO at the old formulation's spurious minimum p = pi - t; at
    decode the raw heading delta applies directly (no arcsin fold), so
    |delta| > pi/2 survives."""
    import jax.numpy as jnp
    from objectcentricocccompletion_tpu.core import coder

    acfg = ah.AnchorConfig()
    anchor = jnp.asarray([[0.0, 0.0, -1.0, 2.0, 4.7, 1.8, 0.0]])
    t = 0.6
    gt = anchor.at[0, 6].set(t)

    def bbox_loss(p6):
        reg = coder.encode(anchor, gt).at[0, 6].set(p6)
        out = ah.anchor_head_loss(
            jnp.zeros((1, 1)), reg, jnp.zeros((1, 2)), anchor, gt,
            jnp.zeros((1,), jnp.int32), jnp.asarray([True]), acfg)
        return float(out["loss_bbox"])

    assert bbox_loss(t) < 1e-6
    assert abs(bbox_loss(t + np.pi)) < 1e-6          # pi flip: dir head's job
    assert bbox_loss(np.pi - t) > 0.4                # NOT a minimum

    # decode: heading delta 2.0 (> pi/2) passes through raw; dir bin 0
    reg = jnp.zeros((1, 7)).at[0, 6].set(2.0)
    cls = jnp.full((1, 1), 5.0)
    dirp = jnp.asarray([[5.0, -5.0]])
    boxes, _, _, _ = ah.anchor_head_decode(cls, reg, dirp, anchor, acfg,
                                           max_out=1)
    # reference: limit_period(2.0 - pi/4, 0, pi) + pi/4 = 2.0 (2 < pi)
    np.testing.assert_allclose(float(boxes[0, 6]), 2.0, atol=1e-5)
