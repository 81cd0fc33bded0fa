"""Fused SIR-block Pallas kernel vs the jnp reference (interpret mode) +
gradient correctness of the recompute backward."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from objectcentricocccompletion_tpu.ops.pallas_sir import (
    _jnp_reference, fused_sir_block)


def make_params(rng, C, R, C1):
    def mk(*s):
        return jnp.asarray(rng.randn(*s).astype(np.float32) * 0.2)
    return (mk(R, 16), mk(16), mk(16),            # gate layer 0 (w, ln scale, ln bias)
            mk(16, 32), mk(32), mk(32),
            mk(32, C), mk(C), mk(C),
            mk(C, C1), mk(C1), mk(C1),
            mk(2 * C1, C1), mk(C1), mk(C1))


@pytest.mark.parametrize("G,P,C,R,C1", [(4, 64, 24, 13, 32)])
def test_fused_matches_reference(G, P, C, R, C1):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(G, P, C).astype(np.float32))
    rel = jnp.asarray(rng.randn(G, P, R).astype(np.float32))
    mask = jnp.asarray(rng.rand(G, P) > 0.3)
    mask = mask.at[:, 0].set(True)
    params = make_params(rng, C, R, C1)

    p_ref, c_ref = _jnp_reference(x, rel, mask, params)
    p_out, c_out = fused_sir_block(x, rel, mask, params, True)
    # the kernel multiplies in bf16 (fp32 accumulate) -> bf16 tolerances
    np.testing.assert_allclose(np.asarray(p_out), np.asarray(p_ref),
                               atol=3e-2, rtol=3e-2)
    np.testing.assert_allclose(np.asarray(c_out), np.asarray(c_ref),
                               atol=3e-2, rtol=3e-2)


def test_fused_empty_group():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 8, 24).astype(np.float32))
    rel = jnp.asarray(rng.randn(2, 8, 13).astype(np.float32))
    mask = jnp.zeros((2, 8), bool).at[1].set(True)   # group 0 empty
    params = make_params(rng, 24, 13, 32)
    p, c = fused_sir_block(x, rel, mask, params, True)
    assert np.isfinite(np.asarray(p)).all()
    np.testing.assert_allclose(np.asarray(c)[0], 0.0, atol=1e-6)
    assert np.abs(np.asarray(c)[1]).max() > 0


def test_fused_gradients_match_reference():
    rng = np.random.RandomState(2)
    G, P, C, R, C1 = 2, 16, 24, 13, 32
    x = jnp.asarray(rng.randn(G, P, C).astype(np.float32))
    rel = jnp.asarray(rng.randn(G, P, R).astype(np.float32))
    mask = jnp.asarray(rng.rand(G, P) > 0.2).at[:, 0].set(True)
    params = make_params(rng, C, R, C1)

    def loss_fused(x_, p_):
        pt, cl = fused_sir_block(x_, rel, mask, p_, True)
        return jnp.sum(pt ** 2) + jnp.sum(cl ** 2)

    def loss_ref(x_, p_):
        pt, cl = _jnp_reference(x_, rel, mask, p_)
        return jnp.sum(pt ** 2) + jnp.sum(cl ** 2)

    gx_f, gp_f = jax.grad(loss_fused, argnums=(0, 1))(x, params)
    gx_r, gp_r = jax.grad(loss_ref, argnums=(0, 1))(x, params)
    # bwd differentiates the fp32 reference; the cotangents entering it come
    # from the bf16-matmul forward, so grads agree at bf16 precision
    def rel_err(a, b):
        return np.abs(np.asarray(a) - np.asarray(b)).max() / (
            np.abs(np.asarray(b)).max() + 1e-6)
    assert rel_err(gx_f, gx_r) < 3e-2
    for a, b in zip(gp_f, gp_r):
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
