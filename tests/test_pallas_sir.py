"""Fused SIR encoder Pallas kernel vs the jnp composition (interpret mode):
forward parity, empty-group handling, gradient correctness of the
recompute-in-VMEM backward, and the full OcOccNet wiring."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from objectcentricocccompletion_tpu.ops.pallas_sir import (
    fused_sir_encoder, reference_sir_encoder)


def make_block_params(rng, cin, R, C1, h0=8, h1=16):
    def mk(*s):
        return jnp.asarray(rng.randn(*s).astype(np.float32) * 0.2)
    return (mk(R, h0), mk(h0), mk(h0),
            mk(h0, h1), mk(h1), mk(h1),
            mk(h1, cin), mk(cin), mk(cin),
            mk(cin, C1), mk(C1), mk(C1),
            mk(2 * C1, C1), mk(C1), mk(C1))


def make_encoder_params(rng, F, R, C1, nb, geo_input):
    blocks = []
    cin = 3 + F + (R if geo_input else 0)
    for _ in range(nb):
        blocks.append(make_block_params(rng, cin, R, C1))
        cin = 3 + C1 + (R if geo_input else 0)
    return tuple(blocks)


@pytest.mark.parametrize("geo_input,shortcut", [(True, False), (False, True)])
def test_fused_encoder_matches_reference(geo_input, shortcut):
    rng = np.random.RandomState(0)
    G, P, F, R, C1, nb = 4, 64, 8, 13 if geo_input else 3, 32, 3
    xyz = jnp.asarray(rng.randn(G, P, 3).astype(np.float32))
    feats = jnp.asarray(rng.randn(G, P, F).astype(np.float32))
    rel = jnp.asarray(rng.randn(G, P, R).astype(np.float32))
    mask = jnp.asarray(rng.rand(G, P) > 0.3).at[:, 0].set(True)
    params = make_encoder_params(rng, F, R, C1, nb, geo_input)

    c_ref = reference_sir_encoder(xyz, feats, rel, mask, params,
                                  geo_input, shortcut)
    c_out = fused_sir_encoder(xyz, feats, rel, mask, params,
                              geo_input, shortcut, True)
    assert c_out.shape == (G, nb * 2 * C1)
    np.testing.assert_allclose(np.asarray(c_out), np.asarray(c_ref),
                               atol=3e-2, rtol=3e-2)


def test_fused_encoder_empty_group():
    rng = np.random.RandomState(1)
    G, P, F, R, C1, nb = 2, 16, 8, 13, 32, 2
    xyz = jnp.asarray(rng.randn(G, P, 3).astype(np.float32))
    feats = jnp.asarray(rng.randn(G, P, F).astype(np.float32))
    rel = jnp.asarray(rng.randn(G, P, R).astype(np.float32))
    mask = jnp.zeros((G, P), bool).at[1].set(True)   # group 0 empty
    params = make_encoder_params(rng, F, R, C1, nb, True)
    c = fused_sir_encoder(xyz, feats, rel, mask, params, True, False, True)
    assert np.isfinite(np.asarray(c)).all()
    np.testing.assert_allclose(np.asarray(c)[0], 0.0, atol=1e-6)
    assert np.abs(np.asarray(c)[1]).max() > 0


@pytest.mark.parametrize("geo_input,shortcut", [(True, False), (False, True)])
def test_fused_encoder_gradients(geo_input, shortcut):
    rng = np.random.RandomState(2)
    G, P, F, R, C1, nb = 2, 16, 8, 13 if geo_input else 3, 32, 3
    xyz = jnp.asarray(rng.randn(G, P, 3).astype(np.float32))
    feats = jnp.asarray(rng.randn(G, P, F).astype(np.float32))
    rel = jnp.asarray(rng.randn(G, P, R).astype(np.float32))
    mask = jnp.asarray(rng.rand(G, P) > 0.2).at[:, 0].set(True)
    params = make_encoder_params(rng, F, R, C1, nb, geo_input)
    w = jnp.asarray(rng.randn(G, nb * 2 * C1).astype(np.float32))

    def loss_fused(xyz_, feats_, rel_, p_):
        c = fused_sir_encoder(xyz_, feats_, rel_, mask, p_,
                              geo_input, shortcut, True)
        return jnp.sum(c * w)

    def loss_ref(xyz_, feats_, rel_, p_):
        c = reference_sir_encoder(xyz_, feats_, rel_, mask, p_,
                                  geo_input, shortcut)
        return jnp.sum(c * w)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(xyz, feats, rel, params)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(xyz, feats, rel, params)

    def rel_err(a, b):
        return np.abs(np.asarray(a, np.float32)
                      - np.asarray(b, np.float32)).max() / (
            np.abs(np.asarray(b, np.float32)).max() + 1e-6)

    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gr)):
        assert rel_err(a, b) < 3e-2


def test_ococcnet_with_fused_sir_runs():
    """Full OcOccNet with use_pallas_sir=True (interpret on CPU): finite
    loss, finite grads, params carry the fused layout."""
    import dataclasses
    from objectcentricocccompletion_tpu.configs import tiny_config
    from objectcentricocccompletion_tpu.models import OcOccNetWithLoss
    from tests.test_model import make_batch
    cfg = dataclasses.replace(tiny_config(), use_pallas_sir=True)
    batch = make_batch(cfg, seed=12)
    model = OcOccNetWithLoss(cfg)
    v = model.init({"params": jax.random.PRNGKey(0)}, batch, train=False)
    names = str(jax.tree_util.tree_structure(v["params"]))
    assert "gate_w0" in names and "vfe_w2" in names
    total, aux = model.apply(v, batch, train=False)
    assert np.isfinite(float(total))

    def loss_fn(p):
        t, _ = model.apply({"params": p}, batch, train=True,
                           rngs={"dropout": jax.random.PRNGKey(1)})
        return t

    g = jax.grad(loss_fn)(v["params"])
    assert all(bool(jnp.isfinite(x).all())
               for x in jax.tree_util.tree_leaves(g))


def test_fused_matches_einsum_path():
    """The fused encoder must agree with the einsum SIREncoder (SIRBlock)
    when fed the same parameter values — guards the param-layout mapping."""
    import dataclasses
    from objectcentricocccompletion_tpu.models.sir import SIREncoder

    rng = np.random.RandomState(3)
    G, P, F = 3, 32, 8
    xyz = jnp.asarray(rng.randn(G, P, 3).astype(np.float32))
    feats = jnp.asarray(rng.randn(G, P, F).astype(np.float32))
    fc = jnp.asarray(rng.randn(G, P, 13).astype(np.float32))
    mask = jnp.asarray(rng.rand(G, P) > 0.3).at[:, 0].set(True)

    kw = dict(num_blocks=2, feat_channels=(32, 32), rel_mlp_hidden=(8, 16),
              geo_input=True)
    enc_e = SIREncoder(**kw, use_pallas=False)
    enc_p = SIREncoder(**kw, use_pallas=True)
    v_e = enc_e.init(jax.random.PRNGKey(0), xyz, feats, mask, fc)
    v_p = enc_p.init(jax.random.PRNGKey(0), xyz, feats, mask, fc)

    # map einsum params -> fused layout
    pe = v_e["params"]
    pp = jax.tree_util.tree_map(lambda x: x, v_p["params"])
    for b in pe:
        blk = pe[b]
        tgt = pp[b]
        tgt["gate_w0"] = blk["rel_mlp"]["Dense_0"]["kernel"]
        tgt["gate_ln0_scale"] = blk["rel_mlp"]["LayerNorm_0"]["scale"]
        tgt["gate_ln0_bias"] = blk["rel_mlp"]["LayerNorm_0"]["bias"]
        tgt["gate_w1"] = blk["rel_mlp"]["Dense_1"]["kernel"]
        tgt["gate_ln1_scale"] = blk["rel_mlp"]["LayerNorm_1"]["scale"]
        tgt["gate_ln1_bias"] = blk["rel_mlp"]["LayerNorm_1"]["bias"]
        tgt["gate_w2"] = blk["rel_mlp"]["Dense_2"]["kernel"]
        tgt["gate_ln2_scale"] = blk["rel_mlp"]["LayerNorm_2"]["scale"]
        tgt["gate_ln2_bias"] = blk["rel_mlp"]["LayerNorm_2"]["bias"]
        tgt["vfe_w1"] = blk["vfe_0"]["Dense_0"]["kernel"]
        tgt["vfe_ln1_scale"] = blk["vfe_0"]["LayerNorm_0"]["scale"]
        tgt["vfe_ln1_bias"] = blk["vfe_0"]["LayerNorm_0"]["bias"]
        tgt["vfe_w2"] = blk["vfe_1"]["Dense_0"]["kernel"]
        tgt["vfe_ln2_scale"] = blk["vfe_1"]["LayerNorm_0"]["scale"]
        tgt["vfe_ln2_bias"] = blk["vfe_1"]["LayerNorm_0"]["bias"]

    _, c_e = enc_e.apply({"params": pe}, xyz, feats, mask, fc)
    _, c_p = enc_p.apply({"params": pp}, xyz, feats, mask, fc)
    np.testing.assert_allclose(np.asarray(c_p), np.asarray(c_e),
                               atol=3e-2, rtol=3e-2)
