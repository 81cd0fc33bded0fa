"""SPMD training step over a jax.sharding.Mesh.

Replaces the reference's launch/DDP stack (``tools/dist_train.sh``,
``MMDistributedDataParallel``, NCCL allreduce, ``reduce_mean`` avg-factor
syncs — SURVEY.md section 2.6) with single-program data parallelism: the
tracklet batch is sharded over the ``data`` mesh axis, parameters are
replicated, and XLA inserts the gradient all-reduce over ICI. Because the
loss is written against the *global* batch, every cross-replica average
factor the reference syncs by hand is correct by construction.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..configs.ococcnet_config import OcOccNetConfig
from ..models.ococcnet import OcOccNetWithLoss, TrackletBatch
from ..training.optim import make_optimizer


class TrainState(NamedTuple):
    step: jax.Array
    params: Any
    opt_state: Any


def make_mesh(devices=None, axis_name: str = "data") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard every batch array along its leading (tracklet) dim."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def create_train_state(cfg: OcOccNetConfig, rng: jax.Array,
                       sample_batch: TrackletBatch, total_steps: int):
    model = OcOccNetWithLoss(cfg)
    variables = model.init({"params": rng}, sample_batch, train=False)
    params = variables["params"]
    tx, schedule = make_optimizer(
        cfg.base_lr, total_steps, weight_decay=cfg.weight_decay,
        grad_clip=cfg.grad_clip_norm, peak_ratio=cfg.lr_mult)
    state = TrainState(jnp.zeros((), jnp.int32), params, tx.init(params))
    return model, state, tx, schedule


def make_train_step(model: OcOccNetWithLoss, tx, mesh: Mesh):
    """Returns a jitted (state, batch, rng) -> (state, metrics) step with
    params replicated and the batch sharded over the data axis."""
    bsh = batch_sharding(mesh)
    rsh = replicated(mesh)

    def step_fn(state: TrainState, batch: TrackletBatch, rng: jax.Array):
        def loss_fn(params):
            total, aux = model.apply(
                {"params": params}, batch, train=True,
                rngs={"dropout": jax.random.fold_in(rng, state.step)})
            return total, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(state.step + 1, params, opt_state)
        aux = dict(aux, grad_norm=optax.global_norm(grads))
        return new_state, aux

    return jax.jit(
        step_fn,
        in_shardings=(rsh, jax.tree_util.tree_map(lambda _: bsh,
                                                  _batch_struct()), rsh),
        out_shardings=(rsh, rsh),
        donate_argnums=(0,),
    )


def make_flat_train_step(model: OcOccNetWithLoss, tx, mesh: Mesh,
                         state: TrainState):
    """Train step over a packed single-buffer state (see ``flat.py``):
    reduces the per-call device-buffer count from O(hundreds of leaves) to a
    handful, which matters on dispatch-latency-bound interconnects. Returns
    (step_fn, packed_state, unpack_fn); math is identical to
    make_train_step."""
    from .flat import make_packer

    pack, unpack, total = make_packer(state)
    packed = jax.device_put(pack(state), replicated(mesh))
    bsh = batch_sharding(mesh)
    rsh = replicated(mesh)

    def step_fn(flat_state, batch: TrackletBatch, rng: jax.Array):
        state = unpack(flat_state)

        def loss_fn(params):
            total_, aux = model.apply(
                {"params": params}, batch, train=True,
                rngs={"dropout": jax.random.fold_in(rng, state.step)})
            return total_, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(state.step + 1, params, opt_state)
        aux = dict(aux, grad_norm=optax.global_norm(grads))
        return pack(new_state), aux

    fn = jax.jit(
        step_fn,
        in_shardings=(rsh, jax.tree_util.tree_map(lambda _: bsh,
                                                  _batch_struct()), rsh),
        out_shardings=(rsh, rsh),
        donate_argnums=(0,),
    )
    return fn, packed, unpack


def make_eval_step(model: OcOccNetWithLoss, mesh: Mesh):
    bsh = batch_sharding(mesh)
    rsh = replicated(mesh)

    def eval_fn(params, batch: TrackletBatch):
        return model.apply({"params": params}, batch, train=False,
                           method=model.predict)

    return jax.jit(eval_fn,
                   in_shardings=(rsh, jax.tree_util.tree_map(
                       lambda _: bsh, _batch_struct())),
                   out_shardings=rsh)


def _batch_struct():
    """A TrackletBatch-shaped pytree usable as a tree_map template."""
    return TrackletBatch(*range(len(TrackletBatch._fields)))


def shard_batch(batch: TrackletBatch, mesh: Mesh) -> TrackletBatch:
    bsh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, bsh), batch)
