"""Compile-and-step every detector family at PRODUCTION shapes on the real
chip (no data needed — synthetic points at the full point/voxel budgets).

Surfaces OOM / recompile surprises before a real training run and records
full-scale step times. Run one family at a time (full compiles through the
remote-compile tunnel are minutes each):

    python benchmarks/bench_detectors.py centerpoint|sst|fsd|fsd2|ococcnet
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def synth_frame(max_points, pc_range, num_real=150000, feat_dim=2, seed=0):
    import jax.numpy as jnp
    rng = np.random.RandomState(seed)
    lo, hi = np.asarray(pc_range[:3]), np.asarray(pc_range[3:])
    n = min(num_real, max_points)
    pts = rng.uniform(lo, hi, (n, 3))
    # cluster ~30% of points into car-sized blobs (realistic voxel counts)
    nb = n // 10
    centers = rng.uniform(lo + 5, hi - 5, (64, 3))
    blob = centers[rng.randint(64, size=nb)] + rng.normal(0, 1.2, (nb, 3))
    pts[:nb] = np.clip(blob, lo, hi - 1e-3)
    feats = rng.rand(n, feat_dim)
    points = np.zeros((max_points, 3 + feat_dim), np.float32)
    points[:n] = np.concatenate([pts, feats], -1)
    mask = np.arange(max_points) < n
    boxes = np.concatenate([
        centers[:32], np.abs(rng.normal([2, 4.5, 1.7], 0.1, (32, 3))),
        rng.uniform(-np.pi, np.pi, (32, 1))], -1).astype(np.float32)
    return (jnp.asarray(points), jnp.asarray(mask), jnp.asarray(boxes),
            jnp.zeros((32,), "int32"), jnp.ones((32,), bool))


def timed_steps(step, args, n=10):
    """Time ``n`` DEPENDENT executions: each iteration's params carry a
    zero-scaled contribution of the previous grads, so the runtime cannot
    overlap or drop iterations. (Independent same-input calls through the
    axon tunnel have produced phantom timings — 0.65 s steps reported as
    34.6 ms — because blocking one output buffer did not serialize the
    queue; BENCH_NOTES 'Pallas attention backward' entry.)"""
    import jax
    import jax.numpy as jnp

    params, rest = args[0], args[1:]

    @jax.jit
    def chain(p, *r):
        loss, grads = step(p, *r)
        # zero-scaled dependency: bitwise no-op on params, true data dep
        scale = (loss * 0).astype(jnp.float32)
        new_p = jax.tree_util.tree_map(
            lambda x, g: x + scale.astype(x.dtype) * g, p, grads)
        return new_p, loss

    t0 = time.time()
    p, loss = chain(params, *rest)
    jax.block_until_ready(jax.tree_util.tree_leaves(p))
    compile_s = time.time() - t0
    for _ in range(3):
        p, loss = chain(p, *rest)
    jax.block_until_ready(jax.tree_util.tree_leaves(p))
    t0 = time.perf_counter()
    for _ in range(n):
        p, loss = chain(p, *rest)
    jax.block_until_ready(jax.tree_util.tree_leaves(p))
    return compile_s, (time.perf_counter() - t0) / n * 1e3


def main():
    family = sys.argv[1] if len(sys.argv) > 1 else "fsd"
    import jax
    import jax.numpy as jnp

    cpu = jax.devices("cpu")[0]

    if family == "centerpoint":
        from objectcentricocccompletion_tpu.models.centerpoint import (
            CenterPointConfig, DynamicCenterPoint)
        cfg = CenterPointConfig()
        model = DynamicCenterPoint(cfg)
        args = synth_frame(cfg.max_points, cfg.pc_range)

        def loss_fn(p, pts, msk, gb, gl, gv):
            return model.apply({"params": p}, pts, msk, gb, gl, gv,
                               method=model.loss)["loss"]
    elif family == "sst":
        from objectcentricocccompletion_tpu.models.sst_detector import (
            SSTDetector, SSTDetectorConfig)
        import dataclasses
        # production SST compute dtype: bfloat16 (the reference trains
        # with fp16 loss_scale=32); BENCH_DTYPE=float32 for parity probes
        cfg0 = SSTDetectorConfig()
        cfg0 = dataclasses.replace(cfg0, sst=dataclasses.replace(
            cfg0.sst,
            compute_dtype=os.environ.get("BENCH_DTYPE", "bfloat16")))
        cfg = cfg0.sst
        model = SSTDetector(cfg0)
        args = synth_frame(cfg.max_points, cfg.pc_range)

        def loss_fn(p, pts, msk, gb, gl, gv):
            return model.apply({"params": p}, pts, msk, gb, gl, gv,
                               method=model.loss)["loss"]
    elif family in ("fsd", "fsd2"):
        from objectcentricocccompletion_tpu.models.fsd import (
            FSD, FSDConfig, fsd_loss)
        import dataclasses
        # FSD bf16 measured FLAT (427.4 vs 425.7 ms f32, round 4): the step
        # is gather/cluster-bound, not GEMM-bound — default stays f32;
        # BENCH_DTYPE=bfloat16 to re-probe
        cfg = dataclasses.replace(
            FSDConfig(),
            compute_dtype=os.environ.get("BENCH_DTYPE", "float32"))
        args = synth_frame(cfg.max_points, cfg.pc_range)
        if family == "fsd":
            model = FSD(cfg)

            def loss_fn(p, pts, msk, gb, gl, gv):
                out = model.apply({"params": p}, pts, msk)
                return fsd_loss(out, pts, gb, gl, gv, cfg)["loss"]
        else:
            from objectcentricocccompletion_tpu.models.fsd_two_stage import (
                TwoStageFSD, TwoStageFSDConfig, two_stage_loss)
            model = TwoStageFSD(TwoStageFSDConfig(fsd=cfg))

            def loss_fn(p, pts, msk, gb, gl, gv):
                out = model.apply({"params": p}, pts, msk)
                return two_stage_loss(out, pts, gb, gl, gv)["loss"]
    else:
        raise SystemExit(f"unknown family {family}")

    print(f"[{family}] init on CPU...", flush=True)
    with jax.default_device(cpu):
        variables = model.init(jax.random.PRNGKey(0), args[0], args[1])
    params = jax.device_put(variables["params"])
    nparam = sum(int(np.prod(x.shape))
                 for x in jax.tree_util.tree_leaves(params))
    print(f"[{family}] {nparam/1e6:.2f}M params; compiling full-scale "
          f"loss+grad...", flush=True)

    step = jax.jit(jax.value_and_grad(loss_fn))
    compile_s, step_ms = timed_steps(step, (params,) + args)
    l, _ = step(params, *args)
    print(f"[{family}] compile {compile_s:.1f}s  step {step_ms:.1f} ms  "
          f"loss {float(l):.4f}", flush=True)

    if os.environ.get("PROFILE") == "1":
        from profile_step import summarize_by_source
        log_dir = f"/tmp/trace_{family}"
        os.makedirs(log_dir, exist_ok=True)
        jax.profiler.start_trace(log_dir)
        for _ in range(5):
            out = step(params, *args)
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        jax.profiler.stop_trace()
        summarize_by_source(log_dir)


if __name__ == "__main__":
    main()
