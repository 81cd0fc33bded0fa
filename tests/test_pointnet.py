"""PointNet++ primitive ops."""
import numpy as np
import jax.numpy as jnp

from objectcentricocccompletion_tpu.ops import pointnet as pn


def test_knn():
    pts = jnp.asarray([[0, 0, 0], [1, 0, 0], [5, 0, 0], [9, 9, 9.]])
    mask = jnp.asarray([True, True, True, False])
    q = jnp.asarray([[0.1, 0, 0.]])
    idx, dist = pn.knn(q, pts, mask, 2)
    assert np.asarray(idx).tolist() == [[0, 1]]
    assert abs(float(dist[0, 0]) - 0.01) < 1e-6


def test_ball_query_pads():
    pts = jnp.asarray([[0, 0, 0], [0.5, 0, 0], [5, 0, 0.]])
    mask = jnp.ones(3, bool)
    q = jnp.asarray([[0.0, 0, 0.]])
    idx, ok = pn.ball_query(q, pts, mask, 1.0, 3)
    assert np.asarray(ok).tolist() == [[True, True, False]]
    assert np.asarray(idx)[0, 2] == np.asarray(idx)[0, 0]  # padded


def test_fps_spreads():
    rng = np.random.RandomState(0)
    pts = np.concatenate([rng.randn(50, 3) * 0.1,
                          rng.randn(50, 3) * 0.1 + 10.0])
    mask = np.ones(100, bool)
    idx = pn.furthest_point_sample(jnp.asarray(pts), jnp.asarray(mask), 2)
    a, b = np.asarray(pts)[np.asarray(idx)]
    assert np.linalg.norm(a - b) > 10  # one from each cluster


def test_three_interpolate_exact_at_points():
    pts = jnp.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0.]])
    feats = jnp.asarray([[1.0], [2.0], [3.0]])
    mask = jnp.ones(3, bool)
    out = pn.three_interpolate(pts, pts, mask, feats)
    np.testing.assert_allclose(np.asarray(out), np.asarray(feats), atol=1e-4)


def test_group_points_centering():
    pts = jnp.asarray([[1.0, 1, 1, 7], [2, 2, 2, 8.]])
    idx = jnp.asarray([[0, 1]])
    centers = jnp.asarray([[1.0, 1, 1]])
    g = pn.group_points(pts, idx, centers)
    np.testing.assert_allclose(np.asarray(g)[0, 0], [0, 0, 0, 7])
    np.testing.assert_allclose(np.asarray(g)[0, 1], [1, 1, 1, 8])


def test_incremental_points_mask():
    from objectcentricocccompletion_tpu.ops.incremental import (
        incremental_points_mask)
    prev = jnp.asarray([[0.05, 0.05, 0.05], [1.05, 0.05, 0.05]])
    prev_m = jnp.ones(2, bool)
    cur = jnp.asarray([[0.08, 0.02, 0.01],    # same voxel as prev[0] -> drop
                       [2.05, 0.05, 0.05],    # new voxel -> keep
                       [1.02, 0.08, 0.02]])   # same as prev[1] -> drop
    cur_m = jnp.ones(3, bool)
    m = incremental_points_mask(prev, prev_m, cur, cur_m,
                                (0.1, 0.1, 0.1), (0, 0, 0, 4, 4, 4))
    assert np.asarray(m).tolist() == [False, True, False]


def test_assign_score_withk():
    from objectcentricocccompletion_tpu.ops.pointnet import \
        assign_score_withk
    rng = np.random.RandomState(0)
    N, Q, k, M, C = 10, 4, 3, 2, 5
    scores = jnp.asarray(rng.rand(Q, k, M))
    pf = jnp.asarray(rng.randn(N, M, C))
    cf = jnp.asarray(rng.randn(N, M, C))
    idx = jnp.asarray(rng.randint(0, N, (Q, k)))
    out = assign_score_withk(scores, pf, cf, idx)
    assert out.shape == (Q, C)
    # manual reference for one (q, c)
    q, c = 1, 2
    ref = 0.0
    for kk in range(k):
        for m in range(M):
            ref += float(scores[q, kk, m]) * (
                float(pf[int(idx[q, kk]), m, c])
                - float(cf[int(idx[q, 0]), m, c]))
    np.testing.assert_allclose(float(out[q, c]), ref, rtol=1e-5)
    assert assign_score_withk(scores, pf, cf, idx, "max").shape == (Q, C)
    assert assign_score_withk(scores, pf, cf, idx, "none").shape == (Q, k, C)
