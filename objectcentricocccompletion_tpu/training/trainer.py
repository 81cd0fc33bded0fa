"""Training driver: loop, checkpointing, metric logging.

Replaces the reference's mmcv ``EpochBasedRunner`` + hooks stack
(``apis/train.py``, ``CheckpointHook``, ``TextLoggerHook`` — SURVEY.md
section 5): a plain loop over the host data loader feeding the jitted SPMD
step, with orbax checkpoints (params + optimizer + step + config snapshot)
and JSONL metrics.
"""
from __future__ import annotations

import json
import os
import time
from dataclasses import asdict

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..configs.ococcnet_config import OcOccNetConfig
from ..data.loader import ThreadPrefetcher, TrainLoader, make_loader
from ..parallel.train import (TrainState, create_train_state, make_mesh,
                              make_train_step, shard_batch)


class CheckpointManager:
    def __init__(self, ckpt_dir: str, max_keep: int = 1):
        self.dir = os.path.abspath(ckpt_dir)
        os.makedirs(self.dir, exist_ok=True)
        self.mgr = ocp.CheckpointManager(
            self.dir, options=ocp.CheckpointManagerOptions(
                max_to_keep=max_keep, create=True))

    def save(self, step: int, state, config=None):
        payload = dict(step=np.asarray(state.step),
                       params=state.params, opt_state=state.opt_state)
        self.mgr.save(step, args=ocp.args.StandardSave(payload))
        if config is not None:
            with open(os.path.join(self.dir, "config.json"), "w") as f:
                json.dump(asdict(config), f, indent=2, default=list)

    def restore(self, state: TrainState) -> TrainState | None:
        step = self.mgr.latest_step()
        if step is None:
            return None
        tpl = dict(step=np.asarray(state.step), params=state.params,
                   opt_state=state.opt_state)
        out = self.mgr.restore(step, args=ocp.args.StandardRestore(tpl))
        return TrainState(jax.numpy.asarray(out["step"]), out["params"],
                          out["opt_state"])

    def wait(self):
        self.mgr.wait_until_finished()


class MetricLogger:
    def __init__(self, log_dir: str, interval: int = 50):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "metrics.jsonl")
        self.interval = interval
        self._f = open(self.path, "a")
        self._t0 = time.time()

    def log(self, step: int, metrics: dict):
        if step % self.interval:
            return
        rec = {"step": step, "time": round(time.time() - self._t0, 2)}
        for k, v in metrics.items():
            try:
                rec[k] = round(float(v), 6)
            except (TypeError, ValueError):
                pass
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()


def train(cfg: OcOccNetConfig, dataset, work_dir: str,
          total_steps: int | None = None, ckpt_interval: int = 1000,
          log_interval: int = 50, resume: bool = True, seed: int = 0,
          devices=None, hooks=None, tp: int = 1, fsdp: bool = False,
          sequence_parallel: bool = False, loader_workers: int = 0,
          prefetch: bool = True):
    """Full training run; returns the final TrainState.

    Parallelism: ``tp`` > 1 builds a [data, model] mesh and shards wide
    MLP kernels (tensor parallel); ``sequence_parallel`` additionally
    shards the packed point / occ-query axes over 'model';
    ``fsdp`` shards params + optimizer moments over 'data' (ZeRO-3)."""
    if tp > 1:
        from ..parallel.train import make_mesh_2d
        import jax as _jax
        devs = devices if devices is not None else _jax.devices()
        mesh = make_mesh_2d(len(devs) // tp, tp, devs)
    else:
        mesh = make_mesh(devices)
    data_size = mesh.shape.get("data", int(mesh.devices.size))
    global_batch = cfg.batch_size * data_size
    steps_per_epoch = max(len(dataset) // global_batch, 1)
    if total_steps is None:
        total_steps = steps_per_epoch * cfg.max_epochs

    loader = make_loader(dataset, global_batch, seed=seed,
                         workers=loader_workers)
    sample = next(loader)
    if prefetch:
        # background thread: sample building overlaps the device step
        loader = ThreadPrefetcher(loader, depth=2)
    # flat optimizer (training/optim.make_flat_optimizer): identical math
    # but MEASURED SLOWER on TPU (201 -> 129 t/s) — the flat<->tree
    # boundary retiles every 2D parameter between linear and (8,128)-tiled
    # layouts each step, costing far more than the per-leaf fusion
    # overhead it removes (BENCH_NOTES round 4). Kept available for
    # study; off in production.
    flat_opt = False
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        model, state, tx, schedule = create_train_state(
            cfg, jax.random.PRNGKey(seed), sample, total_steps,
            flat_opt=flat_opt)
    state = jax.device_put(state)

    ckpt = CheckpointManager(os.path.join(work_dir, "ckpt"))
    logger = MetricLogger(work_dir, log_interval)
    if resume:
        restored = ckpt.restore(state)
        if restored is not None:
            state = jax.device_put(restored)

    step_fn = make_train_step(
        model, tx, mesh, state=state if (tp > 1 or fsdp) else None,
        fsdp=fsdp, sequence_parallel=sequence_parallel, flat_opt=flat_opt)
    rng = jax.random.PRNGKey(seed + 1)
    start = int(state.step)
    t_last = time.time()
    for step in range(start, total_steps):
        if hooks is not None:
            hooks.on_step(step)
        batch = shard_batch(next(loader) if step > start else sample, mesh)
        state, aux = step_fn(state, batch, rng)
        if (step + 1) % log_interval == 0:
            aux = jax.device_get(aux)
            dt = (time.time() - t_last) / log_interval
            t_last = time.time()
            logger.log(step + 1, {
                **aux, "lr": schedule(step),
                "tracklets_per_sec": global_batch / max(dt, 1e-9)})
        if (step + 1) % ckpt_interval == 0 or step + 1 == total_steps:
            ckpt.save(step + 1, jax.device_get(state), cfg)
    ckpt.wait()
    if hasattr(loader, "close"):
        loader.close()
    return state
