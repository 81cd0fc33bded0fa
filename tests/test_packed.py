"""Packed segment layout (ops/packed.py + SIR packed mode).

The packed path is the reference's global point budget
(``max_all_pts``, ``ops/dynamic_point_pool_op.py:29-35``); when the budget
covers every valid point it must reproduce the dense [B, L, P] path exactly
(same parameters, same math, different data layout).
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from objectcentricocccompletion_tpu.configs import tiny_config
from objectcentricocccompletion_tpu.models import OcOccNetWithLoss
from objectcentricocccompletion_tpu.ops import packed as pk

from test_model import make_batch


def test_pack_groups_valid_first_frame_order():
    mask = np.zeros((1, 3, 4), bool)
    mask[0, 0, [1, 3]] = True          # frame 0: 2 points
    mask[0, 2, [0, 1, 2]] = True       # frame 2: 3 points
    p = pk.pack_groups(jnp.asarray(mask), budget=4)
    # valid-first, frame order; budget 4 truncates the LAST frame's overflow
    np.testing.assert_array_equal(p.seg_ids[0], [0, 0, 2, 2])
    np.testing.assert_array_equal(p.order[0], [1, 3, 8, 9])
    assert bool(p.valid[0].all())


def test_pack_groups_overflow_segment():
    mask = np.zeros((1, 2, 4), bool)
    mask[0, 1, 0] = True
    p = pk.pack_groups(jnp.asarray(mask), budget=3)
    np.testing.assert_array_equal(p.seg_ids[0], [1, 2, 2])  # invalid -> L
    np.testing.assert_array_equal(np.asarray(p.valid[0]), [True, False,
                                                           False])


def test_segment_primitives_match_numpy():
    rng = np.random.RandomState(0)
    B, N, S, C = 2, 64, 5, 7
    x = rng.randn(B, N, C).astype(np.float32)
    ids = rng.randint(0, S + 1, (B, N))   # S = overflow/invalid
    ids[:, 0] = 0                          # ensure segment 0 nonempty
    got_max = np.asarray(pk.segment_max(
        jnp.asarray(x), jnp.asarray(ids), S))
    got_sum = np.asarray(pk.segment_sum(
        jnp.asarray(x), jnp.asarray(ids), S))
    got_mean = np.asarray(pk.segment_mean(
        jnp.asarray(x), jnp.asarray(ids), S))
    for b in range(B):
        for s in range(S):
            rows = x[b][ids[b] == s]
            if len(rows) == 0:
                np.testing.assert_allclose(got_max[b, s], 0.0)
                np.testing.assert_allclose(got_sum[b, s], 0.0, atol=1e-6)
                continue
            np.testing.assert_allclose(got_max[b, s], rows.max(0), rtol=1e-6)
            np.testing.assert_allclose(got_sum[b, s], rows.sum(0), rtol=1e-5,
                                       atol=1e-5)
            np.testing.assert_allclose(got_mean[b, s], rows.mean(0),
                                       rtol=1e-5, atol=1e-6)


def test_broadcast_back_gathers_rows():
    g = jnp.arange(2 * 3 * 4, dtype=jnp.float32).reshape(2, 3, 4)
    ids = jnp.asarray([[0, 2, 1, 3], [2, 2, 0, 0]])  # 3 == invalid (clamps)
    out = np.asarray(pk.broadcast_back(g, ids))
    np.testing.assert_array_equal(out[0, 1], np.asarray(g)[0, 2])
    np.testing.assert_array_equal(out[1, 0], np.asarray(g)[1, 2])


def _outs(cfg, batch, variables):
    model = OcOccNetWithLoss(cfg)
    total, aux = model.apply(variables, batch, train=False)
    return total, aux


import pytest


@pytest.mark.parametrize("quantum", [0, 16])
def test_packed_matches_dense_full_budget(quantum):
    """With budget >= all valid points the packed model must reproduce the
    dense path (loss + every metric) on identical parameters — in both
    tight (quantum=0) and block-aligned packing modes."""
    cfg = tiny_config()
    cfg_dense = dataclasses.replace(cfg, roi_point_budget=None)
    batch = make_batch(cfg, seed=3, all_points_valid=False)
    model = OcOccNetWithLoss(cfg_dense)
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                           train=False)

    # aligned mode: the full-coverage footprint includes per-frame padding
    budget = cfg.reg_len * cfg.max_points_per_frame
    cfg_packed = dataclasses.replace(cfg, roi_point_budget=None,
                                     packed_point_budget=budget,
                                     packed_quantum=quantum)

    t_dense, aux_dense = _outs(cfg_dense, batch, variables)
    t_packed, aux_packed = _outs(cfg_packed, batch, variables)
    np.testing.assert_allclose(np.asarray(t_packed), np.asarray(t_dense),
                               rtol=2e-5, atol=1e-5)
    for k in aux_dense:
        np.testing.assert_allclose(
            np.asarray(aux_packed[k]), np.asarray(aux_dense[k]),
            rtol=2e-4, atol=2e-5, err_msg=k)


@pytest.mark.parametrize("quantum", [0, 16])
def test_packed_matches_dense_ctrl_variant(quantum):
    cfg = dataclasses.replace(tiny_config(), variant="ctrl",
                              roi_point_budget=None)
    batch = make_batch(cfg, seed=5, all_points_valid=False)
    model = OcOccNetWithLoss(cfg)
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                           train=False)
    budget = cfg.reg_len * cfg.max_points_per_frame
    cfg_packed = dataclasses.replace(cfg, packed_point_budget=budget,
                                     packed_quantum=quantum)
    t_dense, _ = _outs(cfg, batch, variables)
    t_packed, _ = _outs(cfg_packed, batch, variables)
    np.testing.assert_allclose(np.asarray(t_packed), np.asarray(t_dense),
                               rtol=2e-5, atol=1e-5)


def test_packed_gradients_flow():
    cfg = dataclasses.replace(tiny_config(), roi_point_budget=None,
                              packed_point_budget=128, packed_quantum=16)
    batch = make_batch(cfg, seed=7, all_points_valid=False)
    model = OcOccNetWithLoss(cfg)
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                           train=False)

    def loss_fn(params):
        total, _ = model.apply({"params": params}, batch, train=False)
        return total

    grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in leaves)
    nonzero = sum(bool(jnp.any(g != 0)) for g in leaves)
    assert nonzero > len(leaves) * 0.9


def test_packed_truncation_drops_late_frames():
    """balance=False: when the budget binds, early frames keep their
    points and late frames lose theirs (block-layout truncation)."""
    mask = np.ones((1, 4, 8), bool)
    p = pk.pack_groups(jnp.asarray(mask), budget=20, balance=False)
    ids = np.asarray(p.seg_ids[0])
    np.testing.assert_array_equal(np.bincount(ids, minlength=5),
                                  [8, 8, 4, 0, 0])


def test_waterfill_caps_dense_frames_evenly():
    """balance=True (default): over-budget samples cap every frame at the
    waterfill level; sparse frames keep everything."""
    mask = np.zeros((2, 4, 16), bool)
    mask[0, 0, :16] = True   # dense
    mask[0, 1, :16] = True   # dense
    mask[0, 2, :3] = True    # sparse: kept whole
    mask[0, 3, :2] = True
    mask[1, :, :2] = True    # under budget: untouched
    p = pk.pack_groups(jnp.asarray(mask), budget=15)
    ids0 = np.asarray(p.seg_ids[0])
    # T=5: 5+5+3+2 = 15 <= 15
    np.testing.assert_array_equal(
        np.bincount(ids0[ids0 < 4], minlength=4), [5, 5, 3, 2])
    ids1 = np.asarray(p.seg_ids[1])
    np.testing.assert_array_equal(
        np.bincount(ids1[ids1 < 4], minlength=4), [2, 2, 2, 2])


def test_waterfill_noop_under_budget():
    rng = np.random.RandomState(0)
    mask = rng.rand(3, 5, 32) < 0.4
    capped = np.asarray(pk.waterfill_cap(jnp.asarray(mask), budget=5 * 32))
    np.testing.assert_array_equal(capped, mask)


def test_pack_groups_aligned_structure():
    """Aligned packing: each frame starts at a quantum-aligned slot,
    every block belongs to one frame, gaps are invalid."""
    mask = np.zeros((1, 3, 8), bool)
    mask[0, 0, :3] = True    # 3 pts -> 1 block
    mask[0, 1, :5] = True    # 5 pts -> 2 blocks (q=4)
    mask[0, 2, :2] = True    # 2 pts -> 1 block
    p = pk.pack_groups_aligned(jnp.asarray(mask), budget=16, quantum=4)
    seg = np.asarray(p.seg_ids[0])
    val = np.asarray(p.valid[0])
    # frame 0: slots 0-2; frame 1: slots 4-8; frame 2: slots 12-13
    np.testing.assert_array_equal(seg[:3], [0, 0, 0])
    assert not val[3]
    np.testing.assert_array_equal(seg[4:9], [1] * 5)
    assert not val[9] and not val[10] and not val[11]
    np.testing.assert_array_equal(seg[12:14], [2, 2])
    np.testing.assert_array_equal(np.asarray(p.block_seg[0]), [0, 1, 1, 2])
    # order maps slots back to the right flat indices
    np.testing.assert_array_equal(np.asarray(p.order[0][:3]), [0, 1, 2])
    np.testing.assert_array_equal(np.asarray(p.order[0][4:9]),
                                  8 + np.arange(5))


def test_pack_groups_aligned_waterfill():
    """Over-budget: the aligned waterfill caps frames accounting for the
    block footprint."""
    mask = np.ones((1, 4, 16), bool)     # 4 frames x 16 pts, q=4
    p = pk.pack_groups_aligned(jnp.asarray(mask), budget=16, quantum=4)
    seg = np.asarray(p.seg_ids[0])
    val = np.asarray(p.valid[0])
    # cap T=4: each frame keeps 4 points in exactly one block
    assert val.all()
    np.testing.assert_array_equal(
        seg, np.repeat(np.arange(4), 4))
    np.testing.assert_array_equal(np.asarray(p.block_seg[0]), [0, 1, 2, 3])


def test_segment_max_blocked_matches_plain():
    rng = np.random.RandomState(0)
    B, L, P, C, q = 2, 4, 12, 5, 4
    mask = rng.rand(B, L, P) < 0.5
    budget = L * ((P + q - 1) // q) * q
    p = pk.pack_groups_aligned(jnp.asarray(mask), budget=budget, quantum=q)
    x = jnp.asarray(rng.randn(B, budget, C).astype(np.float32))
    got = pk.segment_max_blocked(x, p.valid, p.block_seg, L)
    want = pk.segment_max(x, p.seg_ids, L)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)
    got_m = pk.segment_mean_blocked(x, p.valid, p.block_seg, L)
    want_m = pk.segment_mean(
        jnp.where(p.valid[..., None], x, 0.0), p.seg_ids, L)
    np.testing.assert_allclose(np.asarray(got_m), np.asarray(want_m),
                               rtol=1e-5, atol=1e-6)
