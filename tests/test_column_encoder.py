"""Column-dense sparse conv (ops/column_conv.py): numerical equivalence with
the gather-GEMM substrate over the full SparseEncoder topology — SubM convs,
residual blocks, k3 s2 p1 downsamples, (3,1,1)-s(2,1,1) z-compression, and
the BEV scatter — with ONE shared parameter tree."""
import numpy as np
import jax
import jax.numpy as jnp

from objectcentricocccompletion_tpu.models.sparse_encoder import SparseEncoder
from objectcentricocccompletion_tpu.ops import column_conv as cc
from objectcentricocccompletion_tpu.ops import sparse_conv as sc


def _random_voxels(rng, grid_shape, n_active, n_slots, n_feat=7):
    """Random unique active voxels padded to n_slots."""
    gx, gy, gz = grid_shape
    keys = rng.choice(gx * gy * gz, size=n_active, replace=False)
    coords = np.stack([keys // (gy * gz), (keys // gz) % gy, keys % gz],
                      -1).astype(np.int32)
    pad = np.zeros((n_slots - n_active, 3), np.int32)
    coords = np.concatenate([coords, pad], 0)
    valid = np.arange(n_slots) < n_active
    feats = rng.standard_normal((n_slots, n_feat)).astype(np.float32)
    feats[~valid] = 0.0
    return jnp.asarray(feats), jnp.asarray(coords), jnp.asarray(valid)


def test_column_grid_roundtrip():
    rng = np.random.default_rng(0)
    gs = (16, 12, 9)
    feats, coords, valid = _random_voxels(rng, gs, 70, 96)
    grid, col_of = cc.build_columns(coords, valid, gs, max_cols=96)
    x = cc.scatter_voxel_feats(feats, coords, col_of, 96, gs[2])
    # every active voxel's features land at its (column, z) cell
    for i in range(96):
        if not bool(valid[i]):
            continue
        c = int(col_of[i])
        z = int(coords[i, 2])
        assert bool(grid.occ[c, z])
        np.testing.assert_array_equal(np.asarray(x[c, z]),
                                      np.asarray(feats[i]))
    # occupancy count matches the active voxel count
    assert int(grid.occ.sum()) == int(valid.sum())


def test_subm_conv_column_matches_gather():
    rng = np.random.default_rng(1)
    gs = (10, 11, 7)
    feats, coords, valid = _random_voxels(rng, gs, 60, 80, n_feat=5)
    w = jnp.asarray(rng.standard_normal((27, 5, 6)).astype(np.float32))

    sgrid = sc.build_grid(coords, valid, gs)
    table = sc.neighbor_table(sgrid, coords, valid,
                              sc.kernel_offsets(3))
    ref = sc.sparse_conv_apply(feats, table, w, valid)       # [V, 6]

    grid, col_of = cc.build_columns(coords, valid, gs, max_cols=80)
    x = cc.scatter_voxel_feats(feats, coords, col_of, 80, gs[2])
    nbrs = cc.neighbor_columns(grid)
    out = cc.conv3x3x3(x, nbrs, w, grid.occ)                 # [N, gz, 6]

    co = np.clip(np.asarray(col_of), 0, out.shape[0] - 1)
    got = np.asarray(out)[co, np.asarray(coords[:, 2])]
    np.testing.assert_allclose(got[np.asarray(valid)],
                               np.asarray(ref)[np.asarray(valid)],
                               rtol=1e-5, atol=1e-5)


def test_downsample_columns_matches_gather_lattice():
    rng = np.random.default_rng(2)
    gs = (12, 12, 9)
    feats, coords, valid = _random_voxels(rng, gs, 50, 64, n_feat=4)
    sgrid = sc.build_grid(coords, valid, gs)
    out_coords, out_valid, ogs = sc.downsample_coords(sgrid, 3, 2, 1, 128)

    grid, _ = cc.build_columns(coords, valid, gs, max_cols=64)
    new_grid, _ = cc.downsample_columns(grid, 128)

    ref = {tuple(c) for c, v in zip(np.asarray(out_coords),
                                    np.asarray(out_valid)) if v}
    got = set()
    occ = np.asarray(new_grid.occ)
    xy = np.asarray(new_grid.col_xy)
    for n in range(occ.shape[0]):
        if not bool(np.asarray(new_grid.col_valid)[n]):
            continue
        for z in range(occ.shape[1]):
            if occ[n, z]:
                got.add((xy[n, 0], xy[n, 1], z))
    assert got == ref
    assert new_grid.grid_shape == ogs


def test_sparse_encoder_layouts_agree():
    """The full encoder forward agrees across layouts on one param tree."""
    rng = np.random.default_rng(3)
    gs = (20, 20, 17)
    feats, coords, valid = _random_voxels(rng, gs, 120, 160, n_feat=6)

    kw = dict(base_channels=8, output_channels=16,
              encoder_channels=((8, 8), (8, 16), (16, 16), (16, 16)),
              grid_shape=gs, max_voxels_per_stage=(160, 1400, 1400, 1400))
    enc_g = SparseEncoder(layout="gather", **kw)
    enc_c = SparseEncoder(layout="column", **kw)

    params = enc_g.init(jax.random.PRNGKey(0), feats, coords, valid)
    # identical parameter trees: a column-layout apply consumes the
    # gather-layout init directly
    bev_g = enc_g.apply(params, feats, coords, valid)
    bev_c = enc_c.apply(params, feats, coords, valid)
    assert bev_g.shape == bev_c.shape
    np.testing.assert_allclose(np.asarray(bev_c), np.asarray(bev_g),
                               rtol=2e-4, atol=2e-4)
    assert float(jnp.abs(bev_g).max()) > 0


def test_column_encoder_grad_finite():
    rng = np.random.default_rng(4)
    gs = (16, 16, 17)
    feats, coords, valid = _random_voxels(rng, gs, 80, 96, n_feat=6)
    enc = SparseEncoder(layout="column", base_channels=8, output_channels=8,
                        encoder_channels=((8,), (8,), (8,), (8,)),
                        grid_shape=gs,
                        max_voxels_per_stage=(96, 800, 800, 800))
    params = enc.init(jax.random.PRNGKey(0), feats, coords, valid)

    def loss(p):
        return jnp.sum(enc.apply(p, feats, coords, valid) ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert sum(float(jnp.abs(l).sum()) for l in leaves) > 0
