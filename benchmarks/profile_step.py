"""Profile the OcOccNet train step: capture a jax profiler trace and print
per-op-category device time totals.

Usage:  BENCH_DTYPE=bfloat16 python benchmarks/profile_step.py
"""
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run_and_trace(log_dir):
    import jax

    from objectcentricocccompletion_tpu.configs import OcOccNetConfig
    from objectcentricocccompletion_tpu.data.synthetic import synthetic_batch
    from objectcentricocccompletion_tpu.parallel.train import (
        create_train_state, make_mesh, make_train_step, shard_batch)

    cfg = OcOccNetConfig(
        compute_dtype=os.environ.get("BENCH_DTYPE", "bfloat16"),
        ln_dtype=os.environ.get("BENCH_LN", "auto"),
        batch_size=int(os.environ.get("BENCH_BATCH", "4")),
        **({"packed_point_budget": int(os.environ["BENCH_PACKED"]) or None}
           if os.environ.get("BENCH_PACKED") else {}),
        **({"roi_point_budget": int(os.environ["BENCH_ROI_BUDGET"]) or None}
           if os.environ.get("BENCH_ROI_BUDGET") else {}))
    mesh = make_mesh(jax.devices())
    batch = synthetic_batch(cfg, batch_size=cfg.batch_size, seed=0)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        model, state, tx, _ = create_train_state(
            cfg, jax.random.PRNGKey(0), batch, total_steps=1000)
    state = jax.device_put(state)
    step = make_train_step(model, tx, mesh)
    rng = jax.random.PRNGKey(1)
    sbatch = shard_batch(batch, mesh)

    t0 = time.time()
    for _ in range(20):
        state, aux = step(state, sbatch, rng)
    jax.block_until_ready(aux["loss"])
    print(f"warmup (incl. compile): {time.time() - t0:.1f}s", flush=True)

    jax.profiler.start_trace(log_dir)
    for _ in range(10):
        state, aux = step(state, sbatch, rng)
    jax.block_until_ready(aux["loss"])
    jax.profiler.stop_trace()

    t0 = time.perf_counter()
    for _ in range(30):
        state, aux = step(state, sbatch, rng)
    jax.block_until_ready(aux["loss"])
    dt = (time.perf_counter() - t0) / 30
    print(f"steady step: {dt * 1e3:.1f} ms "
          f"({cfg.batch_size / dt:.1f} tracklets/s)", flush=True)


def summarize(log_dir, top=40):
    """Parse the trace-viewer json.gz (host+device tracks) and aggregate
    device-op durations by HLO op name prefix."""
    paths = glob.glob(os.path.join(log_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        print("no trace.json.gz found under", log_dir)
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device tracks: pid names containing "TPU" and not "Steps"
    tpu_pids = set()
    tname = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            if "TPU" in e["args"].get("name", ""):
                tpu_pids.add(e["pid"])
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tname[(e["pid"], e["tid"])] = e["args"].get("name", "")

    totals = defaultdict(float)
    count = defaultdict(int)
    total_all = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in tpu_pids:
            continue
        tn = tname.get((e["pid"], e["tid"]), "")
        if "XLA Op" in tn or "Ops" in tn or "xla" in tn.lower():
            pass
        name = e.get("name", "")
        dur = e.get("dur", 0)
        # keep only leaf op rows (have dur, on op-level threads)
        if not name or dur <= 0:
            continue
        if "Steps" in tn or "step" == name:
            continue
        key = name.split(".")[0].split("(")[0]
        totals[key] += dur
        count[key] += 1
        total_all += dur
    rows = sorted(totals.items(), key=lambda kv: -kv[1])[:top]
    print(f"\ntrace: {path}\ntotal device-op time: {total_all/1e3:.1f} ms "
          f"(10 steps, all tracks)")
    for k, v in rows:
        print(f"{v/1e3:9.2f} ms  {100*v/max(total_all,1):5.1f}%  "
              f"x{count[k]:<5d} {k[:90]}")


def summarize_by_source(log_dir, top=25):
    """Aggregate device time by the HLO op's source file:line (the trace
    events carry per-op metadata incl. model_flops / raw_bytes_accessed),
    printing achieved GFLOP/s and GB/s per line."""
    from collections import defaultdict
    paths = glob.glob(os.path.join(log_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        print("no trace.json.gz found under", log_dir)
        return
    with gzip.open(max(paths, key=os.path.getmtime), "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    tpu_pids = set()
    tnames = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name" \
                and "TPU" in e["args"].get("name", ""):
            tpu_pids.add(e["pid"])
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tnames[(e["pid"], e["tid"])] = e["args"].get("name", "")
    tot = defaultdict(float)
    fl = defaultdict(float)
    by = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in tpu_pids:
            continue
        if "Steps" in tnames.get((e["pid"], e["tid"]), ""):
            continue
        a = e.get("args") or {}
        if "device_duration_ps" not in a:
            continue
        if e.get("name", "").startswith("jit_"):
            continue
        dur = e.get("dur", 0)
        if dur <= 0:
            continue
        src = a.get("source", "") or "(no source)"
        src = src.replace(os.path.dirname(__file__) + "/../", "")
        tot[src] += dur
        fl[src] += float(a.get("model_flops", 0) or 0)
        by[src] += float(a.get("raw_bytes_accessed", 0) or 0)
        total += dur
    print(f"\ndevice time by source line (total {total/1e3:.1f} ms traced)")
    print(f"{'ms':>9s} {'%':>5s} {'GFLOP/s':>8s} {'GB/s':>7s}  source")
    for k, v in sorted(tot.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{v/1e3:9.2f} {100*v/max(total,1):5.1f} "
              f"{fl[k]/(v*1e-6)/1e9:8.1f} {by[k]/(v*1e-6)/1e9:7.1f}  {k}")


if __name__ == "__main__":
    log_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ococc_trace"
    os.makedirs(log_dir, exist_ok=True)
    run_and_trace(log_dir)
    summarize(log_dir)


def summarize_by_module(log_dir, top=30, depth=4):
    """Aggregate device time by the flax module path inside the op_name
    metadata (e.g. jit(step_fn)/.../net/occ_decoder/mlp/...), so one can
    split the aggregated Dense/LN source lines by model component."""
    import re
    paths = glob.glob(os.path.join(log_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        print("no trace.json.gz found under", log_dir)
        return
    with gzip.open(max(paths, key=os.path.getmtime), "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    tpu_pids = set()
    tnames = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name" \
                and "TPU" in e["args"].get("name", ""):
            tpu_pids.add(e["pid"])
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tnames[(e["pid"], e["tid"])] = e["args"].get("name", "")
    tot = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in tpu_pids:
            continue
        if "Steps" in tnames.get((e["pid"], e["tid"]), ""):
            continue
        a = e.get("args") or {}
        if "device_duration_ps" not in a:
            continue
        if e.get("name", "").startswith("jit_"):
            continue
        dur = e.get("dur", 0)
        if dur <= 0:
            continue
        op = a.get("long_name", "") or a.get("op_name", "") or "(none)"
        # strip the jit wrapper and transpose() markers, keep a prefix
        op = re.sub(r"^jit\([^)]*\)/", "", op)
        parts = [p for p in op.split("/") if p]
        key = "/".join(parts[:depth]) if parts else "(none)"
        tot[key] += dur
        total += dur
    print(f"\ndevice time by module path (depth {depth}, total "
          f"{total/1e3:.1f} ms traced)")
    for k, v in sorted(tot.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{v/1e3:9.2f} {100*v/max(total,1):5.1f}  {k[:110]}")
