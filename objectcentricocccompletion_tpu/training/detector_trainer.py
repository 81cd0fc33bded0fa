"""Training driver for the single-frame detector families (CenterPoint /
SST / FSD) — the counterpart of ``tools/train.py`` +
``apis/train.train_model`` for the reference's frame-level configs.

Detectors are single-sample modules (one padded frame per call); the train
step vmaps the loss over a small per-device frame batch and data-parallels
over the mesh, mirroring the tracklet trainer's SPMD layout.
"""
from __future__ import annotations

import time
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..parallel.train import batch_sharding, make_mesh, replicated
from .optim import make_optimizer
from .trainer import CheckpointManager, MetricLogger


class DetectorState(NamedTuple):
    step: jax.Array
    params: Any
    opt_state: Any


class FrameBatch(NamedTuple):
    points: jax.Array       # [B, N, C]
    points_mask: jax.Array  # [B, N]
    gt_boxes: jax.Array     # [B, M, 7]
    gt_labels: jax.Array    # [B, M]
    gt_valid: jax.Array     # [B, M]


def collate_frames(samples: list[dict]) -> FrameBatch:
    def stack(k):
        return jnp.asarray(np.stack([s[k] for s in samples], 0))
    return FrameBatch(stack("points"), stack("points_mask"),
                      stack("gt_boxes"), stack("gt_labels"),
                      stack("gt_valid"))


class FrameLoader:
    def __init__(self, dataset, batch_size: int, seed: int = 0,
                 num_shards: int = 1, shard_id: int = 0):
        self.ds = dataset
        self.batch_size = batch_size
        self.rng = np.random.RandomState(seed)
        self.num_shards = num_shards
        self.shard_id = shard_id
        self._order = []

    def __iter__(self):
        return self

    def __next__(self) -> FrameBatch:
        out = []
        while len(out) < self.batch_size:
            if not self._order:
                order = list(self.rng.permutation(len(self.ds)))
                self._order = order[self.shard_id::self.num_shards]
            s = self.ds.build_sample(self._order.pop(), self.rng)
            s.pop("meta", None)
            out.append(s)
        return collate_frames(out)


def make_detector_train_step(model, tx, mesh, loss_method=None):
    """model must expose ``loss(points, mask, gt_boxes, gt_labels,
    gt_valid) -> dict`` with a 'loss' entry (CenterPoint/SST do; FSD via a
    wrapper)."""
    bsh = batch_sharding(mesh)
    rsh = replicated(mesh)
    method = loss_method

    def step_fn(state: DetectorState, batch: FrameBatch, rng):
        def loss_fn(params):
            def single(pts, msk, gb, gl, gv):
                if method is not None:
                    return method(params, pts, msk, gb, gl, gv)
                return model.apply({"params": params}, pts, msk, gb, gl, gv,
                                   method=model.loss)

            losses = jax.vmap(single)(batch.points, batch.points_mask,
                                      batch.gt_boxes, batch.gt_labels,
                                      batch.gt_valid)
            mean = {k: jnp.mean(v) for k, v in losses.items()}
            return mean["loss"], mean

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (DetectorState(state.step + 1, params, opt_state),
                dict(aux, grad_norm=optax.global_norm(grads)))

    return jax.jit(
        step_fn,
        in_shardings=(rsh, jax.tree_util.tree_map(
            lambda _: bsh, FrameBatch(*range(5))), rsh),
        out_shardings=(rsh, rsh),
        donate_argnums=(0,),
    )


def train_detector(model, dataset, work_dir: str, total_steps: int,
                   batch_per_device: int = 1, base_lr: float = 1e-5,
                   ckpt_interval: int = 1000, log_interval: int = 50,
                   seed: int = 0, devices=None, resume: bool = True,
                   disable_aug_after: int | None = None):
    """``disable_aug_after`` turns the dataset's geometry/copy-paste
    augmentation off from that step on — the reference's
    ``DisableAugmentationHook`` (``core/hook/fsd_hooks.py:7-54``,
    last-epoch aug-off in every FSD config)."""
    mesh = make_mesh(devices)
    n_dev = int(mesh.devices.size)
    global_batch = batch_per_device * n_dev
    loader = FrameLoader(dataset, global_batch, seed=seed)
    batch = next(loader)

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = model.init(jax.random.PRNGKey(seed), batch.points[0],
                            batch.points_mask[0])["params"]
        tx, schedule = make_optimizer(base_lr, total_steps)
        state = DetectorState(jnp.zeros((), jnp.int32), params,
                              tx.init(params))
    state = jax.device_put(state)

    ckpt = CheckpointManager(f"{work_dir}/ckpt")
    logger = MetricLogger(work_dir, log_interval)
    if resume:
        restored = ckpt.restore(state)
        if restored is not None:
            state = jax.device_put(
                DetectorState(jnp.asarray(restored.step), restored.params,
                              restored.opt_state))

    from ..parallel.train import shard_batch
    step_fn = make_detector_train_step(model, tx, mesh)
    rng = jax.random.PRNGKey(seed + 1)
    start = int(state.step)
    t_last = time.time()
    for step in range(start, total_steps):
        if disable_aug_after is not None and step >= disable_aug_after:
            dataset.augment = False
            dataset.db_sampler = None
            disable_aug_after = None
        b = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, batch_sharding(mesh)),
            next(loader) if step > start else batch)
        state, aux = step_fn(state, b, rng)
        if (step + 1) % log_interval == 0:
            aux = jax.device_get(aux)
            dt = (time.time() - t_last) / log_interval
            t_last = time.time()
            logger.log(step + 1, {**aux,
                                  "frames_per_sec": global_batch / dt})
        if (step + 1) % ckpt_interval == 0 or step + 1 == total_steps:
            ckpt.save(step + 1, jax.device_get(state), None)
    ckpt.wait()
    return state
