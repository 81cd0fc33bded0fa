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
