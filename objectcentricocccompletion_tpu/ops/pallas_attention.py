"""Fused masked window attention — Pallas TPU kernel.

The SST hot loop (``models/sst.py::WindowMSALayer``) runs masked MHA over
``[n_windows, capacity, C]`` tokens. The jnp formulation materializes the
``[W, H, T, T]`` logit tensor in HBM; this kernel keeps each window's
attention entirely in VMEM: one grid step per window computes QK^T, the
masked softmax, and the PV product without ever writing the logits out —
an HBM-traffic win that grows with window capacity.

Numerically identical to the jnp path (same masking and softmax);
correctness is tested in interpreter mode against
``jnp_window_attention`` (``tests/test_pallas_attention.py``).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG = -1e9


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, num_heads: int):
    """One window: refs are [1, T, C] blocks (mask [1, T, 1])."""
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    m = mask_ref[0].astype(jnp.float32)      # [T, 1]; 1 = valid key
    t, c = q.shape
    hd = c // num_heads
    scale = 1.0 / (hd ** 0.5)
    bias = (m.T - 1.0) * (-NEG)              # 0 valid / NEG invalid

    for h in range(num_heads):
        sl = slice(h * hd, (h + 1) * hd)
        logits = jnp.dot(q[:, sl] * scale, k[:, sl].T,
                         preferred_element_type=jnp.float32)
        logits = logits + bias
        lmax = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - lmax)
        denom = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-20)
        o_ref[0, :, sl] = (jnp.dot(p, v[:, sl],
                                   preferred_element_type=jnp.float32)
                           / denom).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def pallas_window_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                            mask: jax.Array, num_heads: int,
                            interpret: bool = False) -> jax.Array:
    """q/k/v: [W, T, C]; mask: [W, T] bool -> [W, T, C].

    Grid = one program per window; each window's q/k/v/mask block lives in
    VMEM for the whole computation. Differentiable: the backward is the
    einsum composition's VJP (recompute — the fused forward saves no
    probabilities), so SST trains through the fused path on TPU.
    """
    W, T, C = q.shape
    mask_f = mask[..., None].astype(q.dtype)
    kern = functools.partial(_attn_kernel, num_heads=num_heads)
    return pl.pallas_call(
        kern,
        grid=(W,),
        in_specs=[
            pl.BlockSpec((1, T, C), lambda w: (w, 0, 0)),
            pl.BlockSpec((1, T, C), lambda w: (w, 0, 0)),
            pl.BlockSpec((1, T, C), lambda w: (w, 0, 0)),
            pl.BlockSpec((1, T, 1), lambda w: (w, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, T, C), lambda w: (w, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((W, T, C), q.dtype),
        interpret=interpret,
    )(q, k, v, mask_f)


def _attn_bwd_kernel_fullstore(q_ref, k_ref, v_ref, mask_ref, g_ref,
                               dq_ref, dk_ref, dv_ref, *, num_heads: int):
    """Variant D of the backward kernel: accumulate dq/dk/dv as full
    ``[T, C]`` arrays in registers (``.at[:, sl].set`` on values) and
    issue exactly ONE whole-block store per output — no strided partial
    stores into the output refs. Written to probe the full-graph
    miscompilation (see the note at the bottom of this file): the
    earlier forms all stored per-head 16-lane slices directly into the
    output window blocks."""
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    m = mask_ref[0].astype(jnp.float32)      # [T, 1]; 1 = valid key
    t, c = q.shape
    hd = c // num_heads
    scale = 1.0 / (hd ** 0.5)
    bias = (m.T - 1.0) * (-NEG)              # [1, T]: 0 valid / NEG invalid

    dq_parts, dk_parts, dv_parts = [], [], []
    for h in range(num_heads):
        sl = slice(h * hd, (h + 1) * hd)
        logits = jnp.dot(q[:, sl] * scale, k[:, sl].T,
                         preferred_element_type=jnp.float32) + bias
        lmax = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - lmax)
        denom = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-20)
        prob = p / denom                                       # [T, T]
        gh = g[:, sl]                                          # [T, hd]
        dv = jnp.dot(prob.T, gh, preferred_element_type=jnp.float32)
        dp = jnp.dot(gh, v[:, sl].T,
                     preferred_element_type=jnp.float32)       # [T, T]
        dsum = jnp.sum(dp * prob, axis=-1, keepdims=True)
        ds = prob * (dp - dsum)
        dq = jnp.dot(ds, k[:, sl],
                     preferred_element_type=jnp.float32) * scale
        dk = jnp.dot(ds.T, q[:, sl],
                     preferred_element_type=jnp.float32) * scale
        dq_parts.append(dq)
        dk_parts.append(dk)
        dv_parts.append(dv)
    # lane-concatenate per-head grads into one [T, C] value per output so
    # each output ref receives exactly ONE whole-block store (in-kernel
    # .at[].set lowers to an unimplemented Mosaic scatter; concat does not)
    dq_ref[0] = jnp.concatenate(dq_parts, axis=-1).astype(dq_ref.dtype)
    dk_ref[0] = jnp.concatenate(dk_parts, axis=-1).astype(dk_ref.dtype)
    dv_ref[0] = jnp.concatenate(dv_parts, axis=-1).astype(dv_ref.dtype)


def pallas_window_attention_bwd_fullstore(q, k, v, mask, g, num_heads: int,
                                          interpret: bool = False,
                                          guard_windows: int = 0):
    """Backward via the full-store kernel; ``guard_windows`` appends that
    many zero windows to every operand and slices them back off — if the
    miscompiled write lands within a few windows past the output end, the
    guard absorbs it inside our own buffers."""
    if guard_windows:
        pad = [(0, guard_windows)] + [(0, 0)] * (q.ndim - 1)
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
        g = jnp.pad(g, pad)
        mask = jnp.pad(mask, [(0, guard_windows), (0, 0)])
    W, T, C = q.shape
    mask_f = mask[..., None].astype(q.dtype)      # [W, T, 1] like forward
    kern = functools.partial(_attn_bwd_kernel_fullstore,
                             num_heads=num_heads)
    spec = pl.BlockSpec((1, T, C), lambda w: (w, 0, 0))
    out = jax.ShapeDtypeStruct((W, T, C), q.dtype)
    dq, dk, dv = pl.pallas_call(
        kern,
        grid=(W,),
        in_specs=[spec, spec, spec,
                  pl.BlockSpec((1, T, 1), lambda w: (w, 0, 0)), spec],
        out_specs=[spec, spec, spec],
        out_shape=[out, out, out],
        interpret=interpret,
    )(q, k, v, mask_f, g)
    if guard_windows:
        n = W - guard_windows
        dq, dk, dv = dq[:n], dk[:n], dv[:n]
    return dq, dk, dv


def _attn_bwd_kernel(q_ref, k_ref, v_ref, mask_ref, g_ref,
                     dqkv_ref, *, num_heads: int):
    """Backward of one window, fully in VMEM (flash-attention-style
    recompute): the XLA einsum VJP this replaces materializes several
    ``[W, H, T, T]`` tensors in HBM (recomputed logits, probabilities,
    their grads) and was 43% of the full-scale SST step; here the only
    HBM traffic is q/k/v/g in and dq/dk/dv out."""
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    m = mask_ref[0].astype(jnp.float32)      # [1, T]; 1 = valid key
    t, c = q.shape
    hd = c // num_heads
    scale = 1.0 / (hd ** 0.5)
    bias = (m - 1.0) * (-NEG)                # 0 valid / NEG invalid

    for h in range(num_heads):
        sl = slice(h * hd, (h + 1) * hd)
        logits = jnp.dot(q[:, sl] * scale, k[:, sl].T,
                         preferred_element_type=jnp.float32) + bias
        lmax = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - lmax)
        denom = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-20)
        prob = p / denom                                       # [T, T]
        gh = g[:, sl]                                          # [T, hd]
        dv = jnp.dot(prob.T, gh, preferred_element_type=jnp.float32)
        dp = jnp.dot(gh, v[:, sl].T,
                     preferred_element_type=jnp.float32)       # [T, T]
        dsum = jnp.sum(dp * prob, axis=-1, keepdims=True)
        ds = prob * (dp - dsum)
        dq = jnp.dot(ds, k[:, sl],
                     preferred_element_type=jnp.float32) * scale
        dk = jnp.dot(ds.T, q[:, sl],
                     preferred_element_type=jnp.float32) * scale
        dqkv_ref[0, 0, :, sl] = dq.astype(dqkv_ref.dtype)
        dqkv_ref[1, 0, :, sl] = dk.astype(dqkv_ref.dtype)
        dqkv_ref[2, 0, :, sl] = dv.astype(dqkv_ref.dtype)


def pallas_window_attention_bwd(q, k, v, mask, g, num_heads: int,
                                interpret: bool = False):
    """dq/dk/dv of :func:`pallas_window_attention` (one program per
    window). Exactly the VJP of the forward kernel's math: the softmax
    uses the same key-mask bias and clamped denominator, so masked keys
    receive zero grad and empty windows propagate nothing."""
    W, T, C = q.shape
    mask_f = mask[:, None, :].astype(q.dtype)     # [W, 1, T] lane-major
    kern = functools.partial(_attn_bwd_kernel, num_heads=num_heads)
    spec = pl.BlockSpec((1, T, C), lambda w: (w, 0, 0))
    # ONE stacked output [3, W, T, C] rather than three separate outputs:
    # the single-output form mirrors the long-validated forward kernel
    dqkv = pl.pallas_call(
        kern,
        grid=(W,),
        in_specs=[spec, spec, spec,
                  pl.BlockSpec((1, 1, T), lambda w: (w, 0, 0)), spec],
        out_specs=pl.BlockSpec((3, 1, T, C), lambda w: (0, w, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((3, W, T, C), q.dtype),
        interpret=interpret,
    )(q, k, v, mask_f, g)
    return dqkv[0], dqkv[1], dqkv[2]


import os

# The fused backward kernel is numerically verified standalone ON CHIP at
# the production window shapes (grads match the einsum VJP to 3e-5, loss
# under value_and_grad matches), but enabling it inside the FULL SST
# training graph deterministically corrupts an UNRELATED forward value:
# loss_cls jumps 0.0012 -> 313.93 while loss_bbox / loss_dir /
# num_pos_anchors (same backbone, same head trunk) stay bit-identical —
# the signature of an out-of-bounds write into whichever HBM buffer the
# deterministic allocator places next to the kernel's outputs. Reproduced
# across three kernel forms (3 outputs; one stacked [3, W, T, C] output;
# lane-major mask block); isolated two-level repros at the same shapes
# are all correct. Filed as a backend (Mosaic/axon) miscompilation;
# default the backward to the recompute einsum VJP until the toolchain
# moves. OCOCC_PALLAS_ATTN_BWD selects a kernel form at trace time:
#   1          the original stacked-output kernel
#   fullstore  whole-block stores only (no strided per-head output slices)
#   guard      fullstore + 8 zero guard windows appended to every buffer
def _use_pallas_bwd() -> str:
    return os.environ.get("OCOCC_PALLAS_ATTN_BWD", "0")


def _pwa_fwd(q, k, v, mask, num_heads, interpret):
    out = pallas_window_attention(q, k, v, mask, num_heads, interpret)
    return out, (q, k, v, mask)


def _pwa_bwd(num_heads, interpret, res, g):
    q, k, v, mask = res
    mode = _use_pallas_bwd()
    if mode == "1":
        dq, dk, dv = pallas_window_attention_bwd(q, k, v, mask, g,
                                                 num_heads, interpret)
        return dq, dk, dv, None
    if mode in ("fullstore", "guard"):
        dq, dk, dv = pallas_window_attention_bwd_fullstore(
            q, k, v, mask, g, num_heads, interpret,
            guard_windows=8 if mode == "guard" else 0)
        return dq, dk, dv, None
    _, vjp = jax.vjp(
        lambda q_, k_, v_: jnp_window_attention(q_, k_, v_, mask,
                                                num_heads), q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


pallas_window_attention.defvjp(_pwa_fwd, _pwa_bwd)


def jnp_window_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                         mask: jax.Array, num_heads: int) -> jax.Array:
    """Reference jnp path (same math as models/sst.WindowMSALayer core)."""
    W, T, C = q.shape
    hd = C // num_heads
    qh = q.reshape(W, T, num_heads, hd) * (1.0 / hd ** 0.5)
    kh = k.reshape(W, T, num_heads, hd)
    vh = v.reshape(W, T, num_heads, hd)
    logits = jnp.einsum("wthd,wshd->whts", qh, kh)
    logits = jnp.where(mask[:, None, None, :], logits, NEG)
    p = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("whts,wshd->wthd", p, vh)
    return out.reshape(W, T, C)
