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


def test_sst_with_pallas_flag_matches_einsum_path():
    """SST forward with use_pallas_attention=True (interpret mode on CPU)
    equals the einsum path — same params, same outputs."""
    import dataclasses
    from unittest import mock
    from objectcentricocccompletion_tpu.models.sst import tiny_sst_config
    from objectcentricocccompletion_tpu.models.sst_detector import (
        SSTDetector, tiny_sst_detector_config)
    from objectcentricocccompletion_tpu.ops import pallas_attention as pa
    from tests.test_sst import make_sst_frame

    cfg0 = tiny_sst_detector_config()
    points, mask, *_ = make_sst_frame(cfg0)
    m0 = SSTDetector(cfg0)
    v = m0.init(jax.random.PRNGKey(0), points, mask)
    out0 = m0.apply(v, points, mask)

    cfg1 = dataclasses.replace(
        cfg0, sst=dataclasses.replace(cfg0.sst, use_pallas_attention=True))
    m1 = SSTDetector(cfg1)
    orig = pa.pallas_window_attention
    with mock.patch.object(
            pa, "pallas_window_attention",
            lambda q, k, v_, msk, h, interpret=False:
            orig(q, k, v_, msk, h, interpret=True)):
        out1 = m1.apply(v, points, mask)
    np.testing.assert_allclose(np.asarray(out0["cls"]),
                               np.asarray(out1["cls"]), atol=2e-4)


def test_pallas_attention_gradients():
    """The fused attention is differentiable (custom VJP over the einsum
    composition) — grads match the jnp path. Guards SST TRAINING on TPU."""
    import jax
    rng = np.random.RandomState(3)
    W, T, C, H = 3, 16, 32, 4
    q = jnp.asarray(rng.randn(W, T, C).astype(np.float32))
    k = jnp.asarray(rng.randn(W, T, C).astype(np.float32))
    v = jnp.asarray(rng.randn(W, T, C).astype(np.float32))
    mask = jnp.asarray(rng.rand(W, T) > 0.3).at[:, 0].set(True)
    w = jnp.asarray(rng.randn(W, T, C).astype(np.float32))

    def loss_p(q_, k_, v_):
        return jnp.sum(pallas_window_attention(q_, k_, v_, mask, H, True)
                       * w)

    def loss_j(q_, k_, v_):
        return jnp.sum(jnp_window_attention(q_, k_, v_, mask, H) * w)

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(q, k, v)
    gj = jax.grad(loss_j, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gj):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   rtol=1e-4)


def test_pallas_custom_vjp_end_to_end():
    """jax.grad through pallas_window_attention uses the fused backward."""
    rng = np.random.RandomState(2)
    W, T, C, H = 3, 8, 16, 2
    q = jnp.asarray(rng.randn(W, T, C).astype(np.float32))
    k = jnp.asarray(rng.randn(W, T, C).astype(np.float32))
    v = jnp.asarray(rng.randn(W, T, C).astype(np.float32))
    mask = jnp.asarray(rng.rand(W, T) > 0.3).at[:, 0].set(True)

    def loss_pallas(q_, k_, v_):
        return jnp.sum(pallas_window_attention(q_, k_, v_, mask, H,
                                               True) ** 2)

    def loss_ref(q_, k_, v_):
        return jnp.sum(jnp_window_attention(q_, k_, v_, mask, H) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-5, rtol=3e-5)


def test_chunked_bwd_matches_einsum_vjp():
    """The chunked flash-style backward (statically unrolled window-block
    loop) must reproduce the plain einsum VJP's gradients exactly (same
    math, recompute instead of saved probabilities)."""
    from objectcentricocccompletion_tpu.ops.pallas_attention import (
        window_attention_xla)
    rng = np.random.RandomState(0)
    W, T, C, H = 37, 24, 32, 4    # W deliberately not a chunk multiple
    q = jnp.asarray(rng.randn(W, T, C).astype(np.float32))
    k = jnp.asarray(rng.randn(W, T, C).astype(np.float32))
    v = jnp.asarray(rng.randn(W, T, C).astype(np.float32))
    mask = jnp.asarray(rng.rand(W, T) > 0.3)
    mask = mask.at[:, 0].set(True)     # no fully-masked window
    g = jnp.asarray(rng.randn(W, T, C).astype(np.float32))

    def ref_loss(q, k, v):
        return jnp.vdot(jnp_window_attention(q, k, v, mask, H), g)

    def got_loss(q, k, v):
        return jnp.vdot(window_attention_xla(q, k, v, mask, H), g)

    ref = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    got = jax.grad(got_loss, argnums=(0, 1, 2))(q, k, v)
    for r, o in zip(ref, got):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   atol=1e-5, rtol=1e-5)


def test_chunked_bwd_small_chunk_matches():
    """Explicit multi-chunk path (chunk smaller than W) equals the plain
    VJP — exercises the concatenate tail."""
    from objectcentricocccompletion_tpu.ops.pallas_attention import (
        xla_chunked_window_attention_bwd)
    rng = np.random.RandomState(5)
    W, T, C, H = 11, 8, 16, 2
    q, k, v, g = (jnp.asarray(rng.randn(W, T, C).astype(np.float32))
                  for _ in range(4))
    mask = jnp.asarray(rng.rand(W, T) > 0.4).at[:, 0].set(True)
    _, vjp = jax.vjp(
        lambda q_, k_, v_: jnp_window_attention(q_, k_, v_, mask, H),
        q, k, v)
    ref = vjp(g)
    got = xla_chunked_window_attention_bwd(q, k, v, mask, g, H, chunk=3)
    for r, o in zip(ref, got):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   atol=1e-5, rtol=1e-5)


def test_pallas_multiblock_padded_matches_jnp(monkeypatch):
    """W not a multiple of the window block exercises the pad-and-slice
    path and the block-diagonal mask of the generalized kernel (the
    production default is wb=1 — measured fastest; BENCH_NOTES r4)."""
    from objectcentricocccompletion_tpu.ops import pallas_attention as pa
    monkeypatch.setattr(pa, "WINDOW_BLOCK", 16)
    rng = np.random.RandomState(7)
    W, T, C, H = 37, 16, 32, 4          # wb=16 -> grid 3, pad 37 -> 48
    q = jnp.asarray(rng.randn(W, T, C).astype(np.float32))
    k = jnp.asarray(rng.randn(W, T, C).astype(np.float32))
    v = jnp.asarray(rng.randn(W, T, C).astype(np.float32))
    mask = jnp.asarray(rng.rand(W, T) > 0.3).at[:, 0].set(True)
    ref = jnp_window_attention(q, k, v, mask, H)
    got = pallas_window_attention(q, k, v, mask, H, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
