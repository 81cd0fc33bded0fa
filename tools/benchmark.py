"""Inference-throughput benchmark CLI.

Counterpart of the reference's ``tools/analysis_tools/benchmark.py`` (model
FPS excluding data loading, warm-up then timed window). Measures the jitted
predict path of any model family on synthetic inputs at production shapes:

    python tools/benchmark.py ococcnet [--batch 4] [--samples 100]
    python tools/benchmark.py centerpoint|sst|fsd [--samples 50]
    python tools/benchmark.py ococcnet --ckpt-dir work/ckpt   # real weights

Prints per-sample latency and FPS (tracklets/s for ococcnet, frames/s for
the frame detectors).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def bench_ococcnet(args):
    import jax

    from objectcentricocccompletion_tpu.configs import OcOccNetConfig
    from objectcentricocccompletion_tpu.data.synthetic import synthetic_batch
    from objectcentricocccompletion_tpu.parallel.train import (
        create_train_state, make_eval_step, make_mesh, shard_batch)

    cfg = OcOccNetConfig(batch_size=args.batch,
                         compute_dtype=args.dtype)
    mesh = make_mesh(jax.devices())
    batch = synthetic_batch(cfg, batch_size=args.batch, seed=0)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        model, state, _, _ = create_train_state(
            cfg, jax.random.PRNGKey(0), batch, total_steps=100)
    params = state.params
    if args.ckpt_dir:
        from objectcentricocccompletion_tpu.training.surgery import (
            restore_params)
        _, params = restore_params(args.ckpt_dir)
    params = jax.device_put(params)
    step = make_eval_step(model, mesh)
    sbatch = shard_batch(batch, mesh)
    out = step(params, sbatch)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    n = max(args.samples // args.batch, 5)
    t0 = time.perf_counter()
    for _ in range(n):
        out = step(params, sbatch)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) / n
    return {"family": "ococcnet", "batch": args.batch,
            "latency_ms": round(dt * 1e3, 2),
            "fps": round(args.batch / dt, 2), "unit": "tracklets/sec"}


def bench_detector(args):
    import jax

    sys.path.insert(0, os.path.join(os.path.dirname(__file__),
                                    "..", "benchmarks"))
    from bench_detectors import synth_frame

    from objectcentricocccompletion_tpu.evalx.detector_eval import (
        make_predict_fn)

    if args.family == "centerpoint":
        from objectcentricocccompletion_tpu.models.centerpoint import (
            CenterPointConfig, DynamicCenterPoint)
        cfg = CenterPointConfig()
        model = DynamicCenterPoint(cfg)
    elif args.family == "sst":
        import dataclasses

        from objectcentricocccompletion_tpu.models.sst_detector import (
            SSTDetector, SSTDetectorConfig)
        cfg0 = SSTDetectorConfig()
        cfg0 = dataclasses.replace(cfg0, sst=dataclasses.replace(
            cfg0.sst, compute_dtype=args.dtype))
        cfg = cfg0.sst
        model = SSTDetector(cfg0)
    else:
        from objectcentricocccompletion_tpu.models.fsd import FSD, FSDConfig
        cfg = FSDConfig()
        model = FSD(cfg)
    points, mask, *_ = synth_frame(cfg.max_points, cfg.pc_range)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = model.init(jax.random.PRNGKey(0), points, mask)["params"]
    if args.ckpt_dir:
        from objectcentricocccompletion_tpu.training.surgery import (
            restore_params)
        _, params = restore_params(args.ckpt_dir)
    params = jax.device_put(params)
    import jax.numpy as jnp
    predict_fn = make_predict_fn(model, args.family)
    chain_k = 10

    @jax.jit
    def chained(params, points, mask):
        # run the predict ``chain_k`` times inside ONE dispatch with a
        # zero-scaled data dependency between iterations: through the
        # remote-dispatch tunnel each separate call pays ~0.5 s of host
        # latency that is NOT device time (BENCH_NOTES round 4), so
        # per-call wall timing wildly overstates latency
        out = predict_fn(params, points, mask)
        for _ in range(chain_k - 1):
            feedback = (jnp.sum(out[1]) * 0).astype(points.dtype)
            out = predict_fn(params, points + feedback, mask)
        return out

    out = chained(params, points, mask)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    n = max(args.samples // chain_k, 2)
    t0 = time.perf_counter()
    for _ in range(n):
        out = chained(params, points, mask)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) / (n * chain_k)
    return {"family": args.family, "batch": 1,
            "latency_ms": round(dt * 1e3, 2),
            "fps": round(1.0 / dt, 2), "unit": "frames/sec"}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("family",
                   choices=["ococcnet", "centerpoint", "sst", "fsd"])
    p.add_argument("--samples", type=int, default=100)
    p.add_argument("--batch", type=int, default=4,
                   help="tracklets per call (ococcnet only)")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--ckpt-dir", default=None)
    args = p.parse_args()
    if args.family == "ococcnet":
        res = bench_ococcnet(args)
    else:
        res = bench_detector(args)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
