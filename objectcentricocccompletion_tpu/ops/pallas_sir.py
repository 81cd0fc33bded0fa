"""Fused SIR block — Pallas TPU kernel.

The SIR encoders dominate OcOccNet's FLOPs with a chain of narrow ops per
block: rel-MLP gate, two Linear+LayerNorm+GELU layers, two masked group
maxima, and a broadcast-concat (``models/sir.py``). In XLA each stage round-
trips [G*P, C] activations through HBM; this kernel runs one GROUP (RoI) per
grid step with every intermediate held in VMEM — the only HBM traffic is the
input block and the two outputs.

Forward-only fusion with a recompute backward: ``fused_sir_block`` carries a
``jax.custom_vjp`` whose backward differentiates the jnp reference
composition (identical math, checkpoint-style recompute), so training uses
the fused forward while gradients stay exactly those of ``models/sir.py``.

All LayerNorms compute in fp32 with the LN_EPS=1e-3 epsilon used throughout
the framework.
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

LN_EPS = 1e-3
_NEG = -1e30


def _ln(x, scale, bias):
    m = jnp.mean(x, axis=-1, keepdims=True)
    v = jnp.mean((x - m) ** 2, axis=-1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + LN_EPS) * scale + bias


def _gelu(x):
    return jax.nn.gelu(x)


def _dot16(a, w):
    """bf16 multiply, fp32 accumulate — the MXU fast path."""
    return jnp.dot(a.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)


def _sir_kernel(x_ref, rel_ref, mask_ref,
                gw0_ref, gs0_ref, gb0_ref, gw1_ref, gs1_ref, gb1_ref,
                gw2_ref, gs2_ref, gb2_ref,
                w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
                point_ref, cluster_ref):
    """One group: x [1, P, C], rel [1, P, R], mask [1, P, 1] (1 = valid).

    gate = gelu(LN(gelu(LN(gelu(LN(rel@gw0))@gw1))@gw2))   (rel-MLP)
    h1 = gelu(LN((x * gate) @ w1)); g1 = maskedmax(h1)
    h2 = gelu(LN(cat(h1, g1) @ w2)); g2 = maskedmax(h2)
    outputs: point h2, cluster [g1, g2].
    """
    x = x_ref[0].astype(jnp.float32)
    rel = rel_ref[0].astype(jnp.float32)
    m = mask_ref[0].astype(jnp.float32)          # [P, 1]

    g = _gelu(_ln(_dot16(rel, gw0_ref[:]), gs0_ref[:], gb0_ref[:]))
    g = _gelu(_ln(_dot16(g, gw1_ref[:]), gs1_ref[:], gb1_ref[:]))
    g = _gelu(_ln(_dot16(g, gw2_ref[:]), gs2_ref[:], gb2_ref[:]))

    h1 = _gelu(_ln(_dot16(x * g, w1_ref[:]), s1_ref[:], b1_ref[:]))
    h1m = jnp.where(m > 0, h1, _NEG)
    g1 = jnp.max(h1m, axis=0, keepdims=True)     # [1, C1]
    any_valid = jnp.max(m, axis=0, keepdims=True)  # [1, 1]
    g1 = jnp.where(any_valid > 0, g1, 0.0)

    cat = jnp.concatenate(
        [h1, jnp.broadcast_to(g1, h1.shape)], axis=-1)
    h2 = _gelu(_ln(_dot16(cat, w2_ref[:]), s2_ref[:], b2_ref[:]))
    h2m = jnp.where(m > 0, h2, _NEG)
    g2 = jnp.where(any_valid > 0, jnp.max(h2m, axis=0, keepdims=True), 0.0)

    point_ref[0] = h2.astype(point_ref.dtype)
    # cluster output is [1, 1, 2*C1] (3-D so the trailing block dims satisfy
    # the TPU (8, 128)-or-full tiling rule)
    cluster_ref[0, 0] = jnp.concatenate([g1, g2], axis=-1)[0].astype(
        cluster_ref.dtype)


def _jnp_reference(x, rel, mask, params):
    (gw0, gs0, gb0, gw1, gs1, gb1, gw2, gs2, gb2,
     w1, s1, b1, w2, s2, b2) = params
    f32 = jnp.float32
    g = _gelu(_ln(jnp.einsum("gpr,rc->gpc", rel.astype(f32), gw0),
                  gs0, gb0))
    g = _gelu(_ln(jnp.einsum("gpc,cd->gpd", g, gw1), gs1, gb1))
    g = _gelu(_ln(jnp.einsum("gpc,cd->gpd", g, gw2), gs2, gb2))
    h1 = _gelu(_ln(jnp.einsum("gpc,cd->gpd", x.astype(f32) * g, w1),
                   s1, b1))
    mm = mask[..., None]
    h1m = jnp.where(mm, h1, _NEG)
    any_valid = jnp.any(mask, axis=-1)[:, None, None]
    g1 = jnp.max(h1m, axis=1, keepdims=True)
    g1 = jnp.where(any_valid, g1, 0.0)
    cat = jnp.concatenate([h1, jnp.broadcast_to(g1, h1.shape)], -1)
    h2 = _gelu(_ln(jnp.einsum("gpc,cd->gpd", cat, w2), s2, b2))
    g2 = jnp.where(any_valid,
                   jnp.max(jnp.where(mm, h2, _NEG), axis=1, keepdims=True),
                   0.0)
    cluster = jnp.concatenate([g1[:, 0], g2[:, 0]], -1)
    return h2, cluster


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_sir_block(x, rel, mask, params, interpret=False):
    """x [G, P, C]; rel [G, P, R]; mask [G, P] bool; params = 15-tuple of
    (gate MLP w/scale/bias x3, layer1 w/scale/bias, layer2 w/scale/bias).

    Returns (point_feats [G, P, C2], cluster [G, 2*C2])."""
    G, P, C = x.shape
    (gw0, gs0, gb0, gw1, gs1, gb1, gw2, gs2, gb2,
     w1, s1, b1, w2, s2, b2) = params
    C1 = w1.shape[1]
    mask_f = mask[..., None].astype(x.dtype)

    def spec(shape):
        nd = len(shape)
        return pl.BlockSpec((1,) + shape[1:],
                            lambda g: (g,) + (0,) * (nd - 1))

    def wspec(w):
        nd = w.ndim
        return pl.BlockSpec(w.shape, lambda g: (0,) * nd)

    point, cluster = pl.pallas_call(
        _sir_kernel,
        grid=(G,),
        in_specs=[spec(x.shape), spec(rel.shape), spec(mask_f.shape)]
        + [wspec(w) for w in (gw0, gs0, gb0, gw1, gs1, gb1, gw2, gs2, gb2,
                              w1, s1, b1, w2, s2, b2)],
        out_specs=(spec((G, P, C1)), spec((G, 1, 2 * C1))),
        out_shape=(jax.ShapeDtypeStruct((G, P, C1), x.dtype),
                   jax.ShapeDtypeStruct((G, 1, 2 * C1), x.dtype)),
        interpret=interpret,
    )(x, rel, mask_f, gw0, gs0, gb0, gw1, gs1, gb1, gw2, gs2, gb2,
      w1, s1, b1, w2, s2, b2)
    return point, cluster[:, 0]


def _fwd(x, rel, mask, params, interpret=False):
    out = fused_sir_block(x, rel, mask, params, interpret)
    return out, (x, rel, mask, params)


def _bwd(interpret, res, g):
    x, rel, mask, params = res
    # checkpoint-style: differentiate the jnp reference (identical math)
    _, vjp = jax.vjp(lambda x_, rel_, p_: _jnp_reference(x_, rel_, mask, p_),
                     x, rel, params)
    dx, drel, dparams = vjp(g)
    return dx, drel, None, dparams


fused_sir_block.defvjp(_fwd, _bwd)
