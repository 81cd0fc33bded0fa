"""Reproducer / probe for the SST fused-attention-backward miscompilation.

Runs the FULL SST training step (loss dict + grads) at production shapes
once per backward mode and prints every loss component plus the global grad
norm, so a corrupted unrelated buffer (the round-3 signature: loss_cls
0.0012 -> 313.93 under the kernel) is immediately visible. Modes:

  einsum      the default recompute VJP (reference result)
  1           original stacked-output Pallas kernel (known corrupt)
  fullstore   whole-block stores only
  guard       fullstore + 8 zero guard windows

Usage: python benchmarks/repro_attn_bwd.py [mode ...]   (default: all)
Each mode is a fresh trace+compile (minutes each through the tunnel).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

# ---------------------------------------------------------------------------
# The miscompiling kernel forms, verbatim as removed from
# objectcentricocccompletion_tpu/ops/pallas_attention.py in round 4 (they are
# standalone-correct; see that file's note and BENCH_NOTES for the full-graph
# corruption evidence). They register themselves into EXTRA_BWD_IMPLS so the
# package's custom_vjp dispatches to them under OCOCC_PALLAS_ATTN_BWD.
# ---------------------------------------------------------------------------
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from objectcentricocccompletion_tpu.ops.pallas_attention import (
    EXTRA_BWD_IMPLS, NEG)

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

EXTRA_BWD_IMPLS["1"] = pallas_window_attention_bwd
EXTRA_BWD_IMPLS["fullstore"] = functools.partial(
    pallas_window_attention_bwd_fullstore, guard_windows=0)


def _guard(q, k, v, mask, g, num_heads, interpret=False):
    return pallas_window_attention_bwd_fullstore(
        q, k, v, mask, g, num_heads, interpret, guard_windows=8)


EXTRA_BWD_IMPLS["guard"] = _guard



def main():
    modes = sys.argv[1:] or ["einsum", "fullstore", "guard"]
    import jax
    import jax.numpy as jnp

    from bench_detectors import synth_frame, timed_steps
    from objectcentricocccompletion_tpu.models.sst_detector import (
        SSTDetector, SSTDetectorConfig)

    cfg0 = SSTDetectorConfig()
    cfg = cfg0.sst
    model = SSTDetector(cfg0)
    args = synth_frame(cfg.max_points, cfg.pc_range)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = model.init(jax.random.PRNGKey(0), args[0], args[1])["params"]
    params = jax.device_put(params)

    ref = None
    for mode in modes:
        if mode == "einsum":
            os.environ["OCOCC_PALLAS_ATTN_BWD"] = "0"
        else:
            os.environ["OCOCC_PALLAS_ATTN_BWD"] = mode

        def loss_fn(p, pts, msk, gb, gl, gv):
            d = model.apply({"params": p}, pts, msk, gb, gl, gv,
                            method=model.loss)
            return d["loss"], d

        step = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
        t0 = time.time()
        (total, d), grads = step(params, *args)
        jax.block_until_ready(total)
        compile_s = time.time() - t0
        gnorm = float(jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2)
                                   for g in jax.tree_util.tree_leaves(grads))))
        row = {k: float(v) for k, v in d.items()}
        row["grad_norm"] = gnorm
        print(f"[{mode}] compile {compile_s:.0f}s "
              + " ".join(f"{k}={v:.6g}" for k, v in sorted(row.items())),
              flush=True)
        if mode == "einsum":
            ref = row
        elif ref is not None:
            bad = {k: (v, ref[k]) for k, v in row.items()
                   if not np.isclose(v, ref[k], rtol=2e-2, atol=1e-4)}
            if bad:
                print(f"[{mode}] MISMATCH vs einsum: {bad}", flush=True)
            else:
                print(f"[{mode}] matches einsum — timing 10 steps...",
                      flush=True)
                _, ms = timed_steps(
                    jax.jit(jax.value_and_grad(
                        lambda p, *a: loss_fn(p, *a)[0])),
                    (params,) + args)
                print(f"[{mode}] full-scale step {ms:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
