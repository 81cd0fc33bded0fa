"""Sparse conv substrate: voxelization grouping, neighbor lookup, and
equivalence of the sparse gather-GEMM conv against a dense 3D convolution."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from objectcentricocccompletion_tpu.ops import sparse_conv as sc
from objectcentricocccompletion_tpu.ops import voxelize as vx


def test_voxelize_grouping():
    pts = jnp.asarray([
        [0.05, 0.05, 0.05],   # voxel (0,0,0)
        [0.08, 0.01, 0.02],   # voxel (0,0,0)
        [0.15, 0.05, 0.05],   # voxel (1,0,0)
        [5.0, 5.0, 5.0],      # out of range
    ])
    mask = jnp.asarray([True, True, True, True])
    res = vx.voxelize(pts, mask, (0.1, 0.1, 0.1), (0, 0, 0, 1, 1, 1), 8)
    assert int(res.num_voxels) == 2
    p2v = np.asarray(res.point2voxel)
    assert p2v[0] == p2v[1] != p2v[2]
    assert p2v[3] == -1
    feats = jnp.asarray([[1.0], [3.0], [5.0], [100.0]])
    vmax = vx.scatter_to_voxels(feats, res.point2voxel, 8, "max")
    got = sorted(np.asarray(vmax[:2]).ravel().tolist())
    assert got == [3.0, 5.0]
    vmean = vx.scatter_to_voxels(feats, res.point2voxel, 8, "mean")
    assert sorted(np.asarray(vmean[:2]).ravel().tolist()) == [2.0, 5.0]
    back = vx.gather_from_voxels(vmax, res.point2voxel)
    assert np.asarray(back)[3] == 0.0


def _random_sparse(rng, n_active, grid_shape, vmax, cin):
    all_coords = np.stack(np.meshgrid(*[np.arange(g) for g in grid_shape],
                                      indexing="ij"), -1).reshape(-1, 3)
    sel = rng.choice(len(all_coords), n_active, replace=False)
    coords = np.zeros((vmax, 3), np.int32)
    coords[:n_active] = all_coords[sel]
    valid = np.arange(vmax) < n_active
    feats = np.zeros((vmax, cin), np.float32)
    feats[:n_active] = rng.randn(n_active, cin)
    return (jnp.asarray(coords), jnp.asarray(valid), jnp.asarray(feats))


def _dense_from_sparse(coords, valid, feats, grid_shape):
    dense = np.zeros(tuple(grid_shape) + (feats.shape[-1],), np.float32)
    c = np.asarray(coords)[np.asarray(valid)]
    f = np.asarray(feats)[np.asarray(valid)]
    dense[c[:, 0], c[:, 1], c[:, 2]] = f
    return dense


def test_subm_conv_matches_dense():
    """Submanifold conv == dense conv evaluated at active sites only."""
    rng = np.random.RandomState(0)
    gs = (6, 6, 6)
    cin, cout, vmax, n = 4, 5, 64, 40
    coords, valid, feats = _random_sparse(rng, n, gs, vmax, cin)
    w = rng.randn(27, cin, cout).astype(np.float32)

    grid = sc.build_grid(coords, valid, gs)
    offs = sc.kernel_offsets(3)
    table = sc.neighbor_table(grid, coords, valid, offs)
    out = sc.sparse_conv_apply(feats, table, jnp.asarray(w), valid)

    dense = _dense_from_sparse(coords, valid, feats, gs)
    ref = np.zeros(gs + (cout,), np.float32)
    for k, off in enumerate(offs):
        for ix in range(gs[0]):
            for iy in range(gs[1]):
                for iz in range(gs[2]):
                    jx, jy, jz = ix + off[0], iy + off[1], iz + off[2]
                    if 0 <= jx < gs[0] and 0 <= jy < gs[1] and 0 <= jz < gs[2]:
                        ref[ix, iy, iz] += dense[jx, jy, jz] @ w[k]
    c = np.asarray(coords)[np.asarray(valid)]
    np.testing.assert_allclose(
        np.asarray(out)[np.asarray(valid)],
        ref[c[:, 0], c[:, 1], c[:, 2]], atol=1e-4)


def test_strided_conv_matches_dense():
    """Strided sparse conv (k=3, s=2, p=1) == dense strided conv at the
    spconv-defined output sites."""
    rng = np.random.RandomState(1)
    gs = (8, 8, 8)
    cin, cout, vmax, n = 3, 4, 128, 60
    coords, valid, feats = _random_sparse(rng, n, gs, vmax, cin)
    w = rng.randn(27, cin, cout).astype(np.float32)

    grid = sc.build_grid(coords, valid, gs)
    out_coords, out_valid, ogs = sc.downsample_coords(grid, 3, 2, 1, vmax)
    offs = sc.strided_conv_offsets(3, 1)
    table = sc.neighbor_table(grid, out_coords, out_valid, offs, stride=2)
    out = sc.sparse_conv_apply(feats, table, jnp.asarray(w), out_valid)

    dense = _dense_from_sparse(coords, valid, feats, gs)
    oc = np.asarray(out_coords)[np.asarray(out_valid)]
    ov = np.asarray(out)[np.asarray(out_valid)]
    for i in range(len(oc)):
        acc = np.zeros(cout, np.float32)
        for k, off in enumerate(offs):
            j = oc[i] * 2 + off
            if (j >= 0).all() and (j < gs).all():
                acc += dense[j[0], j[1], j[2]] @ w[k]
        np.testing.assert_allclose(ov[i], acc, atol=1e-4)
    # every active input voxel must map into some output voxel's receptive
    # field (spconv output-set completeness)
    assert np.asarray(out_valid).sum() > 0


def test_scatter_to_dense():
    coords = jnp.asarray([[0, 1, 0], [2, 2, 2], [0, 0, 0]], jnp.int32)
    valid = jnp.asarray([True, True, False])
    feats = jnp.asarray([[1.0], [2.0], [99.0]])
    dense = sc.scatter_to_dense(feats, coords, valid, (3, 3, 3))
    assert float(dense[0, 1, 0, 0]) == 1.0
    assert float(dense[2, 2, 2, 0]) == 2.0
    assert float(jnp.abs(dense).sum()) == 3.0


def test_dense_index_matches_search():
    """Dense-index lookup == binary-search lookup on the same voxel set,
    including misses, out-of-bounds queries, and invalid rows."""
    rng = np.random.RandomState(3)
    G = (32, 32, 8)
    V = 200
    lin = rng.choice(G[0] * G[1] * G[2], V, replace=False)
    coords = jnp.asarray(np.stack(
        [lin // (G[1] * G[2]), (lin // G[2]) % G[1], lin % G[2]],
        -1).astype(np.int32))
    valid = jnp.asarray(np.arange(V) < 150)

    q = np.asarray(rng.randint(-2, 34, (300, 3)).astype(np.int32))
    q[:50] = np.asarray(coords)[rng.randint(0, V, 50)]  # guaranteed probes
    q = jnp.asarray(q)
    qv = jnp.asarray(rng.rand(300) > 0.1)

    g_dense = sc.build_grid(coords, valid, G, dense_index=True)
    g_search = sc.build_grid(coords, valid, G, dense_index=False)
    assert g_dense.dense_index is not None
    assert g_search.dense_index is None
    a = sc.lookup(g_dense, q, qv)
    b = sc.lookup(g_search, q, qv)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # hits resolve to the right slots
    hits = np.asarray(a) >= 0
    assert hits.any()
    np.testing.assert_array_equal(
        np.asarray(coords)[np.asarray(a)[hits]], np.asarray(q)[hits])
