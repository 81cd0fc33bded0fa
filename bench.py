"""Benchmark: OcOccNet training throughput on the local accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "tracklets/sec", "vs_baseline": N}

Baseline note: the reference publishes no throughput numbers (SURVEY.md
section 6). ``A100_EST_TRACKLETS_PER_SEC`` is an engineering estimate of the
reference torch pipeline on one A100: bs=4 tracklets/GPU and a typical
0.35-0.5 s/iter for this model family (dynamic_point_pool + 12 scatter-max
SIR blocks + 3-layer MHA + 65k-query implicit decoder, fp32 DDP) gives
~8-11 tracklets/s; we use 10. The BASELINE.json target is >= 2x this per
chip.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

A100_EST_TRACKLETS_PER_SEC = 10.0


def main():
    import jax

    from objectcentricocccompletion_tpu.configs import OcOccNetConfig
    from objectcentricocccompletion_tpu.data.synthetic import synthetic_batch
    from objectcentricocccompletion_tpu.parallel.train import (
        create_train_state, make_mesh, make_train_step, shard_batch)

    cfg = OcOccNetConfig(
        compute_dtype=os.environ.get("BENCH_DTYPE", "bfloat16"),
        # LN stats follow compute_dtype by default (cfg.ln_dtype="auto",
        # bf16 stats within 0.05% of fp32 loss and ~8% faster end-to-end);
        # BENCH_LN=float32 restores bit-level reference parity
        ln_dtype=os.environ.get("BENCH_LN", "auto"),
        batch_size=int(os.environ.get("BENCH_BATCH", "4")),
        remat_sir=os.environ.get("BENCH_REMAT", "0") == "1",
        # BENCH_ROI_BUDGET=0 -> None (strict parity); unset -> config
        # default (640)
        **({"roi_point_budget": int(os.environ["BENCH_ROI_BUDGET"]) or None}
           if os.environ.get("BENCH_ROI_BUDGET") else {}),
        # BENCH_PACKED=0 -> dense layout; unset -> config default
        **({"packed_point_budget": int(os.environ["BENCH_PACKED"]) or None}
           if os.environ.get("BENCH_PACKED") else {}),
        # BENCH_DROPOUT=0 disables all dropout (floor probe; NOT a
        # semantics-preserving option)
        **({k: 0.0 for k in ("occ_dropout", "attn_dropout", "cls_dropout",
                             "reg_dropout", "latent_dropout",
                             "fusion_dropout")}
           if os.environ.get("BENCH_DROPOUT") == "0" else {}))
    mesh = make_mesh(jax.devices())
    n_dev = mesh.devices.size
    global_batch = cfg.batch_size * n_dev

    batch = synthetic_batch(cfg, batch_size=global_batch, seed=0)
    # parameter init is tiny compute — run it on CPU to skip a multi-minute
    # accelerator compile of the init graph
    # BENCH_FLAT=1 switches to the flat two-vector optimizer — identical
    # math, measured LOSER (201 -> 129 t/s: per-param retiling copies at
    # the flat<->tree boundary; BENCH_NOTES round 4)
    flat = os.environ.get("BENCH_FLAT", "0") == "1"
    # BENCH_STACKED=1 opts into the shape-grouped stacked optimizer —
    # measured LOSER both ways (203 tree vs 193 params-stacked vs 188
    # moments-stacked; BENCH_NOTES round 5), kept as an evidence-backed
    # negative result like BENCH_FLAT
    stacked = os.environ.get("BENCH_STACKED", "0") == "1" and not flat
    cpu = jax.devices("cpu")[0]
    spec = None
    with jax.default_device(cpu):
        if stacked:
            model, state, tx, _, spec = create_train_state(
                cfg, jax.random.PRNGKey(0), batch, total_steps=1000,
                stacked_opt=True)
        else:
            model, state, tx, _ = create_train_state(
                cfg, jax.random.PRNGKey(0), batch, total_steps=1000,
                flat_opt=flat)
    rng = jax.random.PRNGKey(1)

    state = jax.device_put(state)
    # BENCH_SCAN=K runs K optimizer steps per dispatch via lax.scan
    # (parallel.train.make_train_multi_step) — amortizes the ~1 ms/step
    # host dispatch latency of the tunnel to 1/K
    scan_k = int(os.environ.get("BENCH_SCAN", "0"))
    # BENCH_DONATE=1 donates the staged batch buffers (measured flat;
    # XLA reports them unusable for aliasing — BENCH_NOTES round 4)
    if scan_k:
        if flat or stacked:
            raise SystemExit("BENCH_SCAN supports the tree optimizer only "
                             "(unset BENCH_FLAT/BENCH_STACKED)")
        from objectcentricocccompletion_tpu.parallel.train import \
            make_train_multi_step
        step = make_train_multi_step(
            model, tx, mesh,
            unroll=os.environ.get("BENCH_SCAN_UNROLL", "0") == "1")
    else:
        step = make_train_step(
            model, tx, mesh, flat_opt=flat, stacked_spec=spec,
            donate_batch=os.environ.get("BENCH_DONATE", "0") == "1")

    # Measure the production feeding pattern (what training actually does):
    # a fresh host batch is staged to device every step, overlapping the
    # previous step's compute.
    host_batches = [synthetic_batch(cfg, batch_size=global_batch, seed=s)
                    for s in range(4)]
    if scan_k:
        import numpy as np
        host_batches = [
            type(b)(*(np.stack([np.asarray(x)] * scan_k) for x in b))
            for b in host_batches]

    # warmup: first call compiles; a further batch of steps lets the
    # runtime/interconnect reach steady state before timing (measured: the
    # first ~tens of steps after compile run well below steady throughput)
    warmup = int(os.environ.get("BENCH_WARMUP", "30"))
    for i in range(max(1, warmup // (scan_k or 1))):
        batch = shard_batch(host_batches[i % len(host_batches)], mesh,
                            scan_axis=bool(scan_k))
        state, aux = step(state, batch, rng)
    jax.block_until_ready(aux["loss"])

    iters = int(os.environ.get("BENCH_ITERS", "50"))
    if scan_k:
        iters = max(1, iters // scan_k)
    t0 = time.perf_counter()
    for i in range(iters):
        batch = shard_batch(host_batches[i % len(host_batches)], mesh,
                            scan_axis=bool(scan_k))
        state, aux = step(state, batch, rng)
    jax.block_until_ready(aux["loss"])
    dt = (time.perf_counter() - t0) / (iters * (scan_k or 1))

    tracklets_per_sec = global_batch / dt
    per_chip = tracklets_per_sec / n_dev
    print(json.dumps({
        "metric": "ococcnet_train_throughput",
        "value": round(tracklets_per_sec, 3),
        "unit": "tracklets/sec",
        "vs_baseline": round(per_chip / A100_EST_TRACKLETS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
