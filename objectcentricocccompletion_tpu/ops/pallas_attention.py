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
    """One block of WB windows: refs are [WB, T, C] (mask [WB, T, 1]).

    Round-4 profile: the original one-window-per-program grid was pure
    grid-step-overhead bound at production shapes (W=3200 steps of
    ~0.26 MFLOP each -> 28 ms/layer, 51% of SST inference). Batching WB
    windows per program amortizes the grid sequencing. Mosaic on this
    toolchain cannot lower 3D batched dots (vector_extract_slice check
    crash), so the block is collapsed to 2D [WB*T, C] and each head runs
    ONE [N, N] matmul with a block-diagonal window mask — WBx more FLOPs
    on MXU-friendly shapes, a win while overhead-bound."""
    q2 = q_ref[...].astype(jnp.float32).reshape(-1, q_ref.shape[-1])
    k2 = k_ref[...].astype(jnp.float32).reshape(q2.shape)
    v2 = v_ref[...].astype(jnp.float32).reshape(q2.shape)
    m = mask_ref[...].astype(jnp.float32).reshape(1, q2.shape[0])
    wb, t, c = q_ref.shape
    n = wb * t
    hd = c // num_heads
    scale = 1.0 / (hd ** 0.5)
    # valid key = same window (block diagonal) AND mask set
    row_win = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0) // t
    col_win = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1) // t
    bias = jnp.where((row_win == col_win) & (m > 0.5), 0.0, NEG)

    outs = []
    for h in range(num_heads):
        sl = slice(h * hd, (h + 1) * hd)
        logits = jnp.dot(q2[:, sl] * scale, k2[:, sl].T,
                         preferred_element_type=jnp.float32) + bias
        lmax = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - lmax)
        denom = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-20)
        outs.append(jnp.dot(p, v2[:, sl],
                            preferred_element_type=jnp.float32) / denom)
    # one whole-block store (no strided per-head output slices)
    o_ref[...] = jnp.concatenate(outs, axis=-1).reshape(
        wb, t, c).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def pallas_window_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                            mask: jax.Array, num_heads: int,
                            interpret: bool = False) -> jax.Array:
    """q/k/v: [W, T, C]; mask: [W, T] bool -> [W, T, C].

    Grid = one program per WINDOW_BLOCK windows; each block's q/k/v/mask
    lives in VMEM for the whole computation, and the ``[., H, T, T]``
    probabilities never reach HBM (the einsum formulation OOM'd the full
    SST train graph at production shapes — BENCH_NOTES round 4).
    Differentiable: the backward is the chunked recompute VJP, so SST
    trains through the fused path on TPU.
    """
    W, T, C = q.shape
    # bound the in-kernel [wb*T, wb*T] logits to ~512^2 f32 (1 MB VMEM
    # per head-step) — e.g. T=32 -> wb=16, T=144 -> wb=3
    wb = max(1, min(WINDOW_BLOCK, 512 // T, W))
    Wp = ((W + wb - 1) // wb) * wb
    if Wp != W:
        padw = [(0, Wp - W), (0, 0), (0, 0)]
        q = jnp.pad(q, padw)
        k = jnp.pad(k, padw)
        v = jnp.pad(v, padw)
        mask = jnp.pad(mask, [(0, Wp - W), (0, 0)])
    mask_f = mask[..., None].astype(q.dtype)
    kern = functools.partial(_attn_kernel, num_heads=num_heads)
    out = pl.pallas_call(
        kern,
        grid=(Wp // wb,),
        in_specs=[
            pl.BlockSpec((wb, T, C), lambda w: (w, 0, 0)),
            pl.BlockSpec((wb, T, C), lambda w: (w, 0, 0)),
            pl.BlockSpec((wb, T, C), lambda w: (w, 0, 0)),
            pl.BlockSpec((wb, T, 1), lambda w: (w, 0, 0)),
        ],
        out_specs=pl.BlockSpec((wb, T, C), lambda w: (w, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((Wp, T, C), q.dtype),
        interpret=interpret,
    )(q, k, v, mask_f)
    return out[:W] if Wp != W else out


# Windows per grid step (OCOCC_ATTN_WB). Round-4 sweep at SST production
# shapes, honest chained-dispatch latency (BENCH_NOTES): wb=1 143.4
# ms/frame, wb=4 149.7, wb=16 179.0 — the one-window program is optimal;
# the kernel is VPU-bound per window, so the block-diagonal [wb*T, wb*T]
# form's x-wb masked-softmax waste outweighs the grid sequencing it
# saves. The generalized kernel stays (it is the only form validated in
# the FULL train graph: losses match the einsum reference, unlike the
# cursed backward) with wb=1 as the default.
WINDOW_BLOCK = int(__import__("os").environ.get("OCOCC_ATTN_WB", "1"))


import os

# A fused Pallas BACKWARD kernel (flash-style, in-VMEM recompute) was
# built in round 3 and is numerically verified standalone ON CHIP at the
# production window shapes -- but enabling it inside the FULL SST training
# graph deterministically corrupts an unrelated forward value (loss_cls
# 0.0012 -> 314.31 while loss_bbox / loss_dir / num_pos_anchors, fed by
# the same trunk, stay bit-identical). Round 4 re-probed two mitigation
# forms in the full graph -- whole-block stores only, and 8 zero guard
# windows appended to every buffer -- and BOTH corrupt with bit-IDENTICAL
# values (benchmarks/repro_attn_bwd.py; BENCH_NOTES round 4), i.e. the
# corruption is invariant to the kernel's store pattern AND to the output
# buffer sizes: a backend (Mosaic/axon) miscompilation, not a plain OOB
# store. The kernels now live ONLY in benchmarks/repro_attn_bwd.py (kept
# as the toolchain repro); the production backward is the chunked XLA
# recompute below. OCOCC_PALLAS_ATTN_BWD selects the backward at trace
# time: "chunked" (default) or "0" (plain einsum VJP); the repro script
# registers its kernel forms into EXTRA_BWD_IMPLS.
EXTRA_BWD_IMPLS: dict = {}


CHUNK_BYTES = 256 << 20   # target live [chunk, H, T, T] footprint


def xla_chunked_window_attention_bwd(q, k, v, mask, g, num_heads: int,
                                     chunk: int | None = None):
    """Flash-style chunked backward at the XLA level (no Pallas).

    The einsum VJP materializes the full ``[W, H, T, T]`` probability and
    grad-logit tensors in HBM (43% of the SST step at production shapes —
    BENCH_NOTES). Recomputing each window block's attention in a
    STATICALLY UNROLLED chunk loop bounds the live set to
    ``[chunk, H, T, T]`` while keeping every product on the MXU; straight-
    line code (not ``lax.map``) so XLA reuses the chunk buffers — a
    while-loop variant measured a 5.6 GB fragmentation OOM at SST
    production shapes. Gradients are the same math as the einsum VJP
    (softmax recompute instead of saved probabilities). When the full
    tensor is already small (< CHUNK_BYTES), a single chunk means zero
    overhead vs the plain VJP.
    """
    W, T, C = q.shape
    hd = C // num_heads
    scale = 1.0 / hd ** 0.5
    if chunk is None:
        per_win = num_heads * T * T * 4
        chunk = max(min(W, CHUNK_BYTES // max(per_win, 1)), 1)

    def block(qb, kb, vb, mb, gb):
        n = qb.shape[0]
        qh = qb.reshape(n, T, num_heads, hd) * scale
        kh = kb.reshape(n, T, num_heads, hd)
        vh = vb.reshape(n, T, num_heads, hd)
        gh = gb.reshape(n, T, num_heads, hd)
        logits = jnp.einsum("wthd,wshd->whts", qh, kh)
        logits = jnp.where(mb[:, None, None, :], logits, NEG)
        p = jax.nn.softmax(logits, axis=-1)
        dv = jnp.einsum("whts,wthd->wshd", p, gh)
        dp = jnp.einsum("wthd,wshd->whts", gh, vh)
        delta = jnp.sum(p * dp, axis=-1, keepdims=True)
        ds = p * (dp - delta)
        dq = jnp.einsum("whts,wshd->wthd", ds, kh) * scale
        dk = jnp.einsum("whts,wthd->wshd", ds, qh)
        return (dq.reshape(n, T, C), dk.reshape(n, T, C),
                dv.reshape(n, T, C))

    parts = [block(q[b:b + chunk], k[b:b + chunk], v[b:b + chunk],
                   mask[b:b + chunk], g[b:b + chunk])
             for b in range(0, W, chunk)]
    if len(parts) == 1:
        return parts[0]
    return tuple(jnp.concatenate([p[i] for p in parts], 0)
                 for i in range(3))


def _use_pallas_bwd() -> str:
    return os.environ.get("OCOCC_PALLAS_ATTN_BWD", "chunked")


def _pwa_fwd(q, k, v, mask, num_heads, interpret):
    out = pallas_window_attention(q, k, v, mask, num_heads, interpret)
    return out, (q, k, v, mask)


def _pwa_bwd(num_heads, interpret, res, g):
    q, k, v, mask = res
    mode = _use_pallas_bwd()
    if mode in EXTRA_BWD_IMPLS:   # repro-registered kernel forms
        dq, dk, dv = EXTRA_BWD_IMPLS[mode](q, k, v, mask, g, num_heads,
                                           interpret)
        return dq, dk, dv, None
    if mode == "chunked":
        dq, dk, dv = xla_chunked_window_attention_bwd(q, k, v, mask, g,
                                                      num_heads)
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def window_attention_xla(q, k, v, mask, num_heads: int):
    """Pure-XLA window attention with the chunked flash-style backward —
    the non-Pallas model path (CPU tests, non-TPU backends, and the SST
    backward on TPU when the Pallas forward is disabled)."""
    return jnp_window_attention(q, k, v, mask, num_heads)


def _wa_fwd(q, k, v, mask, num_heads):
    return jnp_window_attention(q, k, v, mask, num_heads), (q, k, v, mask)


def _wa_bwd(num_heads, res, g):
    q, k, v, mask = res
    dq, dk, dv = xla_chunked_window_attention_bwd(q, k, v, mask, g,
                                                  num_heads)
    return dq, dk, dv, None


window_attention_xla.defvjp(_wa_fwd, _wa_bwd)
