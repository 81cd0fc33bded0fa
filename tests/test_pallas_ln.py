"""Fused LayerNorm Pallas kernel (interpret mode): forward/gradient parity
with flax nn.LayerNorm, row padding, odd shapes, and the checkpoint-name
compatibility of the FusedLayerNorm module."""
import numpy as np
import flax.linen as nn
import jax
import jax.numpy as jnp
import pytest

from objectcentricocccompletion_tpu.ops.pallas_ln import (LN_EPS,
                                                          fused_layernorm)


@pytest.mark.parametrize("shape,c", [((64, 128), 128), ((7, 144), 144),
                                     ((3, 5, 32), 32), ((130, 1536), 1536)])
def test_fused_ln_matches_flax(shape, c):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32) * 2 + 0.5)
    scale = jnp.asarray(rng.rand(c).astype(np.float32) + 0.5)
    bias = jnp.asarray(rng.randn(c).astype(np.float32) * 0.1)

    ref = nn.LayerNorm(epsilon=LN_EPS)
    y_ref = ref.apply({"params": {"scale": scale, "bias": bias}}, x)
    y = fused_layernorm(x, scale, bias, LN_EPS, True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-5,
                               rtol=1e-5)


def test_fused_ln_gradients():
    rng = np.random.RandomState(1)
    n, c = 37, 144          # deliberately non-multiple-of-8 rows
    x = jnp.asarray(rng.randn(n, c).astype(np.float32))
    scale = jnp.asarray(rng.rand(c).astype(np.float32) + 0.5)
    bias = jnp.asarray(rng.randn(c).astype(np.float32) * 0.1)
    w = jnp.asarray(rng.randn(n, c).astype(np.float32))

    def loss_fused(x_, s_, b_):
        return jnp.sum(fused_layernorm(x_, s_, b_, LN_EPS, True) * w)

    ref = nn.LayerNorm(epsilon=LN_EPS)

    def loss_ref(x_, s_, b_):
        y = ref.apply({"params": {"scale": s_, "bias": b_}}, x_)
        return jnp.sum(y * w)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4,
                                   rtol=2e-4)


def test_fused_ln_bf16_io():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(32, 128), jnp.bfloat16)
    scale = jnp.ones((128,), jnp.float32)
    bias = jnp.zeros((128,), jnp.float32)
    y = fused_layernorm(x, scale, bias, LN_EPS, True)
    assert y.dtype == jnp.bfloat16
    # fp32 stats in VMEM: mean ~0 / var ~1 after normalization
    yf = np.asarray(y, np.float32)
    np.testing.assert_allclose(yf.mean(-1), 0.0, atol=3e-2)


def test_fused_module_param_names_match_flax():
    """FusedLayerNorm params live under the SAME names as nn.LayerNorm, so
    checkpoints move freely between the fused and plain paths."""
    from objectcentricocccompletion_tpu.models.layers import FusedLayerNorm
    x = jnp.ones((4, 16))
    v_plain = nn.LayerNorm(epsilon=LN_EPS, name="ln").init(
        jax.random.PRNGKey(0), x)
    # interpret path exercised off-TPU through fused_layernorm directly;
    # init only traces shapes
    import objectcentricocccompletion_tpu.ops.pallas_ln as pln
    orig = pln.fused_layernorm

    def fake(x, s, b, eps=LN_EPS, interpret=False):
        return orig(x, s, b, eps, True)
    pln.fused_layernorm = fake
    try:
        v_fused = FusedLayerNorm(epsilon=LN_EPS, name="ln").init(
            jax.random.PRNGKey(0), x)
    finally:
        pln.fused_layernorm = orig
    assert jax.tree_util.tree_structure(v_plain) == \
        jax.tree_util.tree_structure(v_fused)
