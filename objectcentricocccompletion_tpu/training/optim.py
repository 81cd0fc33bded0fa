"""Optimizer and LR schedule.

Mirrors the reference training recipe (``configs/_base_/schedules/cosine_2x.py``
with the ``configs/ococc/ococcnet.py`` lr override): AdamW(0.9, 0.999),
weight_decay 0.05 with no decay on norm parameters, global-norm grad clip 10,
and mmcv's one-cycle "cyclic" LR — cosine ramp base_lr -> 100x over the first
10% of steps, then cosine anneal to 100x * 1e-3 * base_lr.
"""
from __future__ import annotations

import jax.numpy as jnp
import optax


def cyclic_cosine_schedule(base_lr: float, total_steps: int,
                           peak_ratio: float = 100.0,
                           end_ratio: float = 1e-3,
                           step_ratio_up: float = 0.1):
    up_steps = max(int(total_steps * step_ratio_up), 1)
    peak = base_lr * peak_ratio
    end = peak * end_ratio

    def cos_seg(t, lo, hi):
        # cosine interpolation from lo (t=0) to hi (t=1)
        return hi + (lo - hi) * 0.5 * (1 + jnp.cos(jnp.pi * t))

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        t_up = jnp.clip(step / up_steps, 0.0, 1.0)
        t_down = jnp.clip((step - up_steps) / max(total_steps - up_steps, 1),
                          0.0, 1.0)
        return jnp.where(step < up_steps,
                         cos_seg(t_up, base_lr, peak),
                         cos_seg(t_down, peak, end))

    return schedule


def _no_decay_mask(params):
    """True where weight decay applies: skip LayerNorm scales and biases
    (reference paramwise_cfg custom_keys 'norm' decay_mult=0) and all
    biases. Net effect on every model tree in this package: decay exactly
    the 2D matmul kernels — the invariant the twin-training equivalence
    test mirrors on the torch side (mmcv's name-substring matching would
    additionally decay the occ decoder's ``ln`` scale, whose module is not
    named "norm"; we treat every norm layer uniformly)."""
    def mask_fn(path, leaf):
        names = [getattr(p, "key", str(p)) for p in path]
        in_norm = any("LayerNorm" in n or "norm" in n.lower() or n == "ln"
                      for n in names)
        is_bias = names and names[-1] == "bias"
        return not (in_norm or is_bias)

    import jax
    return jax.tree_util.tree_map_with_path(mask_fn, params)


def make_flat_optimizer(base_lr: float, total_steps: int,
                        weight_decay: float = 0.05, grad_clip: float = 10.0,
                        peak_ratio: float = 100.0):
    """The same AdamW recipe as :func:`make_optimizer`, but operating on a
    two-leaf pytree ``{"decay": vec, "nodecay": vec}`` of CONCATENATED flat
    parameters (see ``parallel.train.make_flat_opt_spec``).

    Why: per-leaf optax updates lower to ~90 small fused kernels per step
    whose launch/latency overhead holds the optimizer at ~790 GB/s while
    plain copies on the same chip stream at ~3 TB/s (profile in
    BENCH_NOTES round 4). Two big contiguous leaves turn the update into a
    handful of full-bandwidth kernels. The math is bit-for-bit optax
    (same transforms; the weight-decay mask becomes per-group); only the
    global-norm reduction order changes (flat sum vs per-leaf partial
    sums). Frozen subtrees (``fixed_ae``) are not supported — use the
    tree optimizer there."""
    schedule = cyclic_cosine_schedule(base_lr, total_steps,
                                      peak_ratio=peak_ratio)
    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(schedule, b1=0.9, b2=0.999, weight_decay=weight_decay,
                    mask={"decay": True, "nodecay": False}),
    )
    return tx, schedule


def make_stacked_optimizer(base_lr: float, total_steps: int,
                           weight_decay: float = 0.05,
                           grad_clip: float = 10.0,
                           peak_ratio: float = 100.0):
    """The same AdamW recipe over SHAPE-GROUPED stacked tensors (see
    ``parallel.train.make_stacked_opt_spec``): a dict pytree whose leaves
    are ``[count, *shape]`` stacks of same-shaped parameters. The ~90
    per-leaf optimizer kernels collapse to one per shape group (~a dozen)
    without the flat-vector layout's tile relayout. The decay mask is
    carried in the group key ("d:..."/"n:...") — identical split to
    :func:`_no_decay_mask`. Frozen subtrees are unsupported; use the tree
    optimizer there."""
    schedule = cyclic_cosine_schedule(base_lr, total_steps,
                                      peak_ratio=peak_ratio)
    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(schedule, b1=0.9, b2=0.999, weight_decay=weight_decay,
                    mask=lambda p: {k: k.startswith("d") for k in p}),
    )
    return tx, schedule


def make_optimizer(base_lr: float, total_steps: int,
                   weight_decay: float = 0.05, grad_clip: float = 10.0,
                   peak_ratio: float = 100.0,
                   frozen_prefixes: tuple = ()):
    """``frozen_prefixes``: parameter subtrees (top-level path substrings)
    that receive ZERO updates — the reference's frozen-AE training mode
    (``OnlyGradOptimizerWrapperConstructor``,
    ``apis/no_grad_optimizer_constructors.py:6-129``, used with
    ``fixed_ae=True``). Implemented as optax.multi_transform so the frozen
    subtree carries no Adam moments either, exactly like params excluded
    from the torch optimizer groups."""
    schedule = cyclic_cosine_schedule(base_lr, total_steps,
                                      peak_ratio=peak_ratio)
    train_tx = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(schedule, b1=0.9, b2=0.999, weight_decay=weight_decay,
                    mask=_no_decay_mask),
    )
    if not frozen_prefixes:
        return train_tx, schedule

    import jax

    def label_fn(params):
        def label(path, leaf):
            names = [getattr(p, "key", str(p)) for p in path]
            joined = "/".join(names)
            frozen = any(f in joined for f in frozen_prefixes)
            return "frozen" if frozen else "train"
        return jax.tree_util.tree_map_with_path(label, params)

    tx = optax.multi_transform(
        {"train": train_tx, "frozen": optax.set_to_zero()}, label_fn)
    return tx, schedule
