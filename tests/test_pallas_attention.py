"""Pallas fused window attention vs the jnp reference (interpreter mode on
the CPU mesh; the compiled path runs on real TPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from objectcentricocccompletion_tpu.ops.pallas_attention import (
    jnp_window_attention, pallas_window_attention)


@pytest.mark.parametrize("W,T,C,H", [(4, 16, 32, 4), (2, 8, 64, 8)])
def test_pallas_matches_jnp(W, T, C, H):
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(W, T, C).astype(np.float32))
    k = jnp.asarray(rng.randn(W, T, C).astype(np.float32))
    v = jnp.asarray(rng.randn(W, T, C).astype(np.float32))
    mask = jnp.asarray(rng.rand(W, T) > 0.3)
    # ensure at least one valid key per window
    mask = mask.at[:, 0].set(True)

    ref = jnp_window_attention(q, k, v, mask, H)
    out = pallas_window_attention(q, k, v, mask, H, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_pallas_fully_masked_window_is_finite():
    q = jnp.ones((1, 4, 8))
    mask = jnp.zeros((1, 4), bool)
    out = pallas_window_attention(q, q, q, mask, 2, interpret=True)
    assert np.isfinite(np.asarray(out)).all()
