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
from ..training.optim import (_no_decay_mask, make_flat_optimizer,
                              make_optimizer)


class FlatOptSpec(NamedTuple):
    """Layout of the parameter tree inside the two concatenated flat
    vectors the flat optimizer updates (``{"decay", "nodecay"}`` — the
    weight-decay split of :func:`~..training.optim._no_decay_mask`).
    ``entries`` holds, per tree leaf in flatten order:
    (group key, offset, size, shape, dtype)."""
    treedef: Any
    entries: tuple
    sizes: dict


def make_flat_opt_spec(params) -> FlatOptSpec:
    """Derivable from (traced) parameter shapes alone, so the step builds
    it at trace time — no extra runtime state to thread or checkpoint."""
    mask = _no_decay_mask(params)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    decay_leaves = jax.tree_util.tree_leaves(mask)
    offs = {"decay": 0, "nodecay": 0}
    entries = []
    for leaf, dec in zip(leaves, decay_leaves):
        g = "decay" if dec else "nodecay"
        size = int(np.prod(leaf.shape)) if leaf.shape else 1
        entries.append((g, offs[g], size, leaf.shape, leaf.dtype))
        offs[g] += size
    return FlatOptSpec(treedef, tuple(entries), dict(offs))


class StackedOptSpec(NamedTuple):
    """Layout of the parameter tree inside SHAPE-GROUPED stacked tensors:
    every leaf of the same (decay-group, dtype, shape) lives at one slot of
    a ``[count, *shape]`` stack. Unlike the flat two-vector layout (which
    lost to tile relayout at the flat<->tree boundary, BENCH_NOTES r4),
    stacking only adds a leading axis — the trailing dims keep their
    (8, 128) tiling, so stack/unstack are plain copies and a parameter
    sliced out of its stack fuses into its consumer. ``entries`` holds,
    per tree leaf in flatten order: (group key, slot, shape, dtype)."""
    treedef: Any
    entries: tuple
    groups: dict     # key -> (count, shape, dtype)


def make_stacked_opt_spec(params) -> StackedOptSpec:
    """Derivable from parameter shapes alone. Group key encodes the
    weight-decay split (same :func:`_no_decay_mask` semantics as the tree
    optimizer) so the stacked AdamW's per-group mask reproduces it."""
    mask = _no_decay_mask(params)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    decay_leaves = jax.tree_util.tree_leaves(mask)
    counts: dict = {}
    entries = []
    for leaf, dec in zip(leaves, decay_leaves):
        key = ("d" if dec else "n") + ":" + str(jnp.dtype(leaf.dtype)) \
            + ":" + "x".join(str(int(s)) for s in leaf.shape)
        slot = counts.get(key, 0)
        counts[key] = slot + 1
        entries.append((key, slot, tuple(leaf.shape), leaf.dtype))
    groups = {key: (counts[key], shape, dt)
              for key, _, shape, dt in entries}
    return StackedOptSpec(treedef, tuple(entries), groups)


def stack_by_spec(spec: StackedOptSpec, tree) -> dict:
    leaves = spec.treedef.flatten_up_to(tree)
    parts: dict = {k: [None] * c for k, (c, _, _) in spec.groups.items()}
    for (key, slot, _, _), leaf in zip(spec.entries, leaves):
        parts[key][slot] = leaf
    return {k: jnp.stack(v) for k, v in parts.items()}


def unstack_by_spec(spec: StackedOptSpec, stacked) -> Any:
    leaves = [stacked[key][slot] for key, slot, _, _ in spec.entries]
    return jax.tree_util.tree_unflatten(spec.treedef, leaves)


def flatten_by_spec(spec: FlatOptSpec, tree):
    leaves = spec.treedef.flatten_up_to(tree)
    groups = {"decay": [], "nodecay": []}
    dtypes = {"decay": None, "nodecay": None}
    for (g, _, _, _, dt), leaf in zip(spec.entries, leaves):
        groups[g].append(jnp.ravel(leaf))
        dtypes[g] = dt
    return {g: (jnp.concatenate(parts) if parts
                else jnp.zeros((0,), dtypes[g] or jnp.float32))
            for g, parts in groups.items()}


def unflatten_by_spec(spec: FlatOptSpec, flat):
    leaves = [flat[g][off:off + size].reshape(shape).astype(dt)
              for g, off, size, shape, dt in spec.entries]
    return jax.tree_util.tree_unflatten(spec.treedef, leaves)


class TrainState(NamedTuple):
    step: jax.Array
    params: Any
    opt_state: Any


def make_mesh(devices=None, axis_name: str = "data") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def make_mesh_2d(data: int, model: int, devices=None) -> Mesh:
    """[data, model] mesh for DP x TP (tensor-parallel large MLPs)."""
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= data * model
    grid = np.asarray(devices[:data * model]).reshape(data, model)
    return Mesh(grid, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard every batch array along its leading (tracklet) dim."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_shardings(params, mesh: Mesh, min_dim: int = 1024):
    """Tensor-parallel parameter layout: 2D kernels with a wide output dim
    shard column-wise over the 'model' axis (the OcOccNet fusion/decoder
    MLPs are 1536->2048-wide — the only tensors worth sharding at this
    model size); everything else replicates. XLA inserts the all-gathers.

    The rule depends only on leaf shape, so the same function lays out the
    optimizer moments (which mirror parameter shapes)."""
    if "model" not in mesh.axis_names:
        return jax.tree_util.tree_map(lambda _: replicated(mesh), params)
    msize = mesh.shape["model"]

    def rule(leaf):
        shape = getattr(leaf, "shape", ())
        if (len(shape) == 2 and shape[1] >= min_dim
                and shape[1] % msize == 0):
            return NamedSharding(mesh, P(None, "model"))
        return replicated(mesh)

    return jax.tree_util.tree_map(rule, params)


def param_shardings_fsdp(params, mesh, axis: str = "data",
                         min_size: int = 1 << 15):
    """FSDP (ZeRO-3) parameter layout: every large tensor — and, applied to
    the optimizer state, its Adam moments — shards ONE dimension over the
    ``axis`` (data) mesh axis; XLA all-gathers the shards just before use
    in forward/backward and reduce-scatters the gradient contributions,
    riding ICI. Replaces the reference's replicated-DDP memory model
    (every GPU holds full params + moments) for variants too large to
    replicate. Small tensors (< ``min_size`` elements) stay replicated:
    their all-gather latency costs more than the memory they hold.

    The dimension sharded is the largest one divisible by the axis size,
    so kernels [C_in, C_out] split along whichever is bigger and
    LayerNorm vectors mostly stay whole."""
    n = mesh.shape[axis]

    def rule(leaf):
        shape = getattr(leaf, "shape", ())
        size = 1
        for d in shape:
            size *= d
        if not shape or size < min_size:
            return replicated(mesh)
        for i in sorted(range(len(shape)), key=lambda i: -shape[i]):
            if shape[i] % n == 0:
                spec = [None] * len(shape)
                spec[i] = axis
                return NamedSharding(mesh, P(*spec))
        return replicated(mesh)

    return jax.tree_util.tree_map(rule, params)


def apply_ln_dtype(cfg) -> None:
    """Honor cfg.ln_dtype ("auto" = follow compute_dtype) for every
    LayerNorm built afterwards."""
    from ..models.layers import set_ln_dtype
    ln = getattr(cfg, "ln_dtype", "float32")
    if ln == "auto":
        ln = getattr(cfg, "compute_dtype", "float32")
    set_ln_dtype(ln)


def shrink_batch(batch: TrackletBatch, max_b: int = 1, max_l: int = 4,
                 max_p: int = 32, max_k: int = 8) -> TrackletBatch:
    """Slice a batch down to tiny static shapes for parameter init.

    Every parameter shape depends only on channel dims (never on
    B/L/P/K), so initializing on a sliced batch yields the identical
    parameter tree while skipping the full-size init computation — the
    eager per-op init of the packed layout otherwise materializes
    hundreds of MB per reduction on the CPU backend (minutes of wall
    clock)."""
    def cut(x, dims):
        sl = tuple(slice(0, d) for d in dims)
        return x[sl]
    return TrackletBatch(
        points=cut(batch.points, (max_b, max_l, max_p)),
        points_mask=cut(batch.points_mask, (max_b, max_l, max_p)),
        rois=cut(batch.rois, (max_b, max_l)),
        roi_scores=cut(batch.roi_scores, (max_b, max_l)),
        frame_inds=cut(batch.frame_inds, (max_b, max_l)),
        gt_boxes=cut(batch.gt_boxes, (max_b, max_l)),
        gt_valid=cut(batch.gt_valid, (max_b, max_l)),
        occ_points=cut(batch.occ_points, (max_b, max_k)),
        occ_labels=cut(batch.occ_labels, (max_b, max_k)),
        occ_mask=cut(batch.occ_mask, (max_b, max_k)),
        occ_score=cut(batch.occ_score, (max_b,)),
    )


def create_train_state(cfg: OcOccNetConfig, rng: jax.Array,
                       sample_batch: TrackletBatch, total_steps: int,
                       flat_opt: bool = False, stacked_opt: bool = False):
    apply_ln_dtype(cfg)
    model = OcOccNetWithLoss(cfg)
    variables = model.init({"params": rng}, shrink_batch(sample_batch),
                           train=False)
    params = variables["params"]
    # fixed_ae: freeze the occupancy auto-encoder subtree (the reference's
    # OnlyGrad optimizer constructor used with a pretrained AE)
    frozen = ("ae_encoder",) if getattr(cfg, "fixed_ae", False) else ()
    if (stacked_opt or flat_opt) and frozen:
        # failing loudly beats the tree-path fallthrough: callers of the
        # stacked/flat modes unpack a different return arity
        raise ValueError(
            "flat_opt/stacked_opt do not support frozen subtrees "
            "(fixed_ae=True) — use the tree optimizer")
    if stacked_opt and not frozen:
        # Adam moments live as shape-grouped stacks; params stay a TREE
        # (forward/checkpoint layout untouched). The step concats grads
        # into the stacks (bandwidth-trivial at copy speed), runs the
        # whole optax chain over ~a dozen leaves, and unstacks only the
        # updates. Holding the params themselves stacked and slicing at
        # trace time was measured SLOWER (203 -> 193 t/s: the backward
        # pad-accumulates every leaf cotangent into the group buffers).
        # Returns (model, state, tx, schedule, spec) — pass spec to
        # make_train_step(..., stacked_spec=spec).
        from ..training.optim import make_stacked_optimizer
        tx, schedule = make_stacked_optimizer(
            cfg.base_lr, total_steps, weight_decay=cfg.weight_decay,
            grad_clip=cfg.grad_clip_norm, peak_ratio=cfg.lr_mult)
        spec = make_stacked_opt_spec(params)
        state = TrainState(jnp.zeros((), jnp.int32), params,
                           tx.init(stack_by_spec(spec, params)))
        return model, state, tx, schedule, spec
    if flat_opt and not frozen:
        # optimizer over two concatenated flat vectors (see
        # make_flat_optimizer): identical math, ~4x fewer HBM-bound
        # optimizer milliseconds per step. Pair with
        # make_train_step(..., flat_opt=True).
        tx, schedule = make_flat_optimizer(
            cfg.base_lr, total_steps, weight_decay=cfg.weight_decay,
            grad_clip=cfg.grad_clip_norm, peak_ratio=cfg.lr_mult)
        spec = make_flat_opt_spec(params)
        opt_state = tx.init(flatten_by_spec(spec, params))
    else:
        tx, schedule = make_optimizer(
            cfg.base_lr, total_steps, weight_decay=cfg.weight_decay,
            grad_clip=cfg.grad_clip_norm, peak_ratio=cfg.lr_mult,
            frozen_prefixes=frozen)
        opt_state = tx.init(params)
    state = TrainState(jnp.zeros((), jnp.int32), params, opt_state)
    return model, state, tx, schedule


def _state_shardings(state, mesh: Mesh, tp_min_dim: int, fsdp: bool,
                     fsdp_min_size: int):
    """Shared TrainState sharding ladder: FSDP over 'data', TP over
    'model', else fully replicated (used by both step factories)."""
    rsh = replicated(mesh)
    if state is not None and fsdp:
        return TrainState(
            rsh, param_shardings_fsdp(state.params, mesh,
                                      min_size=fsdp_min_size),
            param_shardings_fsdp(state.opt_state, mesh,
                                 min_size=fsdp_min_size))
    if state is not None and "model" in mesh.axis_names:
        return TrainState(
            rsh, param_shardings(state.params, mesh, tp_min_dim),
            param_shardings(state.opt_state, mesh, tp_min_dim))
    return rsh


def make_train_step(model: OcOccNetWithLoss, tx, mesh: Mesh,
                    state: TrainState | None = None,
                    tp_min_dim: int = 1024, fsdp: bool = False,
                    fsdp_min_size: int = 1 << 15,
                    sequence_parallel: bool = False,
                    flat_opt: bool = False,
                    stacked_spec: StackedOptSpec | None = None,
                    donate_batch: bool = False):
    """Returns a jitted (state, batch, rng) -> (state, metrics) step: batch
    sharded over 'data'; params replicated on a 1D mesh, tensor-parallel
    over 'model' on a 2D mesh, or FSDP-sharded over 'data' with
    ``fsdp=True`` (pass ``state`` so the parameter layout can be derived —
    see param_shardings / param_shardings_fsdp). ``sequence_parallel=True``
    additionally shards the packed point axis and the occ-decoder query
    axis over 'model' (parallel/sp.py) — the activation-memory lever for
    long tracklets and big point budgets."""
    if sequence_parallel:
        assert "model" in mesh.axis_names, "SP needs a 'model' mesh axis"
    if flat_opt or stacked_spec is not None:
        # the flat/stacked layouts are replicated; sharded-state layouts
        # (TP/FSDP) need per-leaf moments — use the tree optimizer there
        assert not fsdp and "model" not in mesh.axis_names, \
            "flat_opt/stacked_opt support the replicated-params DP path " \
            "only"
    bsh = batch_sharding(mesh)
    rsh = replicated(mesh)
    state_sh = _state_shardings(state, mesh, tp_min_dim, fsdp,
                                fsdp_min_size)

    def step_fn(state: TrainState, batch: TrackletBatch, rng: jax.Array):
        # the SP globals are set only while THIS step traces, so other
        # steps built in the same process stay unconstrained
        from . import sp as _sp
        if sequence_parallel:
            _sp.set_sequence_parallel(mesh, "model")
        try:
            def loss_fn(params):
                total, aux = model.apply(
                    {"params": params}, batch, train=True,
                    rngs={"dropout": jax.random.fold_in(rng, state.step)})
                return total, aux

            (loss, aux), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
        finally:
            if sequence_parallel:
                _sp.clear_sequence_parallel()
        if stacked_spec is not None:
            # stack grads/params into the shape groups (copies at byte
            # speed), run the whole optax chain over ~a dozen stacked
            # leaves, unstack only the updates
            st_g = stack_by_spec(stacked_spec, grads)
            updates, opt_state = tx.update(
                st_g, state.opt_state,
                stack_by_spec(stacked_spec, state.params))
            params = optax.apply_updates(
                state.params, unstack_by_spec(stacked_spec, updates))
            grad_norm = optax.global_norm(st_g)
        elif flat_opt:
            # spec is a function of traced leaf shapes only — free here
            spec = make_flat_opt_spec(state.params)
            flat_g = flatten_by_spec(spec, grads)
            updates, opt_state = tx.update(flat_g, state.opt_state,
                                           flatten_by_spec(spec,
                                                           state.params))
            params = optax.apply_updates(state.params,
                                         unflatten_by_spec(spec, updates))
            grad_norm = optax.global_norm(flat_g)
        else:
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = optax.apply_updates(state.params, updates)
            grad_norm = optax.global_norm(grads)
        new_state = TrainState(state.step + 1, params, opt_state)
        aux = dict(aux, grad_norm=grad_norm)
        return new_state, aux

    return jax.jit(
        step_fn,
        in_shardings=(state_sh, jax.tree_util.tree_map(lambda _: bsh,
                                                       _batch_struct()), rsh),
        out_shardings=(state_sh, rsh),
        # donate_batch lets XLA reuse the staged batch buffers as scratch
        # (callers must re-stage a fresh batch every step, as the trainer
        # and bench do)
        donate_argnums=(0, 1) if donate_batch else (0,),
    )


def make_train_multi_step(model: OcOccNetWithLoss, tx, mesh: Mesh,
                          state: TrainState | None = None,
                          tp_min_dim: int = 1024, fsdp: bool = False,
                          fsdp_min_size: int = 1 << 15,
                          unroll: bool | int = False):
    """Multi-step training: one jitted call runs ``lax.scan`` over a
    [K, ...]-stacked batch pytree, returning the state after K optimizer
    steps and the per-step metrics stacked [K].

    Rationale: the flagship device step is ~19 ms while the host pays
    ~1 ms/step of dispatch latency (Python pytree flatten + tunnel RPC per
    call). Grouping K steps into one dispatch amortizes that to ~1/K —
    the standard JAX "training loop inside jit" pattern. The inner step
    body is identical to :func:`make_train_step`'s tree-optimizer path
    (same loss, same dropout stream: the PRNG folds in ``state.step``
    which increments through the scan, so step k of a scanned call sees
    the same mask draws as step k of k separate calls; numerics match up
    to the usual separately-compiled-program fusion noise —
    ``tests/test_multi_step.py``).

    The batch arrays carry a leading scan axis: [K, B, ...] with B sharded
    over 'data' as usual. Callers stage K micro-batches at once (the
    loader already prefetches ahead)."""
    bsh = NamedSharding(mesh, P(None, "data"))
    rsh = replicated(mesh)
    state_sh = _state_shardings(state, mesh, tp_min_dim, fsdp,
                                fsdp_min_size)

    def multi_fn(state: TrainState, batches: TrackletBatch, rng: jax.Array):
        def body(state, batch):
            def loss_fn(params):
                return model.apply(
                    {"params": params}, batch, train=True,
                    rngs={"dropout": jax.random.fold_in(rng, state.step)})

            (loss, aux), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = optax.apply_updates(state.params, updates)
            aux = dict(aux, grad_norm=optax.global_norm(grads))
            return TrainState(state.step + 1, params, opt_state), aux

        return jax.lax.scan(body, state, batches, unroll=unroll)

    return jax.jit(
        multi_fn,
        in_shardings=(state_sh, jax.tree_util.tree_map(
            lambda _: bsh, _batch_struct()), rsh),
        out_shardings=(state_sh, rsh),
        donate_argnums=(0,),
    )


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


def shard_batch(batch: TrackletBatch, mesh: Mesh,
                scan_axis: bool = False) -> TrackletBatch:
    """Stage a batch onto the mesh, sharded over 'data'. With
    ``scan_axis=True`` the arrays carry a leading [K] scan axis (see
    :func:`make_train_multi_step`) and shard over their SECOND dim."""
    bsh = (NamedSharding(mesh, P(None, "data")) if scan_axis
           else batch_sharding(mesh))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, bsh), batch)
