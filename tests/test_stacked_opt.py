"""The stacked optimizer (AdamW over shape-grouped ``[count, *shape]``
stacks, ``parallel.train.make_stacked_opt_spec`` +
``training.optim.make_stacked_optimizer``) must reproduce the per-leaf
tree optimizer exactly: same transforms, same hyperparameters, same
weight-decay split — only the leaf grouping differs. Unlike the flat
two-vector layout it never changes a parameter's trailing-dim tiling."""
import numpy as np
import jax
import jax.numpy as jnp

from objectcentricocccompletion_tpu.configs import tiny_config
from objectcentricocccompletion_tpu.data.synthetic import synthetic_batch
from objectcentricocccompletion_tpu.parallel.train import (
    create_train_state, make_mesh, make_stacked_opt_spec, make_train_step,
    shard_batch, stack_by_spec, unstack_by_spec)
from objectcentricocccompletion_tpu.training.optim import _no_decay_mask


def test_stacked_spec_roundtrip():
    cfg = tiny_config()
    batch = synthetic_batch(cfg, batch_size=2, seed=0)
    _, state, _, _ = create_train_state(
        cfg, jax.random.PRNGKey(0), batch, total_steps=100)
    spec = make_stacked_opt_spec(state.params)
    stacked = stack_by_spec(spec, state.params)
    n_leaves = len(jax.tree_util.tree_leaves(state.params))
    assert len(spec.entries) == n_leaves
    # the whole point: far fewer optimizer leaves than parameter leaves
    assert len(stacked) < n_leaves / 3
    assert sum(v.shape[0] for v in stacked.values()) == n_leaves
    back = unstack_by_spec(spec, stacked)
    for a, b in zip(jax.tree_util.tree_leaves(back),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # group keys carry the decay split of _no_decay_mask exactly
    mask_leaves = jax.tree_util.tree_leaves(_no_decay_mask(state.params))
    for (key, _, _, _), dec in zip(spec.entries, mask_leaves):
        assert key.startswith("d" if dec else "n")


def test_stacked_opt_matches_tree_optimizer():
    """Transform-level equivalence on IDENTICAL gradients (same shape as
    test_flat_opt's well-posed variant): clip is active, three updates."""
    import optax

    cfg = tiny_config()
    batch = synthetic_batch(cfg, batch_size=2, seed=1)
    _, state_t, tx_t, _ = create_train_state(
        cfg, jax.random.PRNGKey(0), batch, total_steps=100)
    _, state_s, tx_s, _, spec = create_train_state(
        cfg, jax.random.PRNGKey(0), batch, total_steps=100,
        stacked_opt=True)

    params_t = state_t.params
    # stacked mode keeps params a TREE; only the moments are stacked
    params_s = stack_by_spec(spec, state_s.params)
    for a, b in zip(jax.tree_util.tree_leaves(
            unstack_by_spec(spec, params_s)),
            jax.tree_util.tree_leaves(params_t)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    opt_t, opt_s = state_t.opt_state, state_s.opt_state

    leaves, treedef = jax.tree_util.tree_flatten(params_t)
    key = jax.random.PRNGKey(3)
    for _ in range(3):
        key, k = jax.random.split(key)
        ks = jax.random.split(k, len(leaves))
        grads = treedef.unflatten(
            [jax.random.normal(kk, l.shape, l.dtype)
             for kk, l in zip(ks, leaves)])

        up_t, opt_t = tx_t.update(grads, opt_t, params_t)
        params_t = optax.apply_updates(params_t, up_t)
        up_s, opt_s = tx_s.update(stack_by_spec(spec, grads), opt_s,
                                  params_s)
        params_s = optax.apply_updates(params_s, up_s)

    for a, b in zip(jax.tree_util.tree_leaves(
            unstack_by_spec(spec, params_s)),
            jax.tree_util.tree_leaves(params_t)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-8, rtol=1e-5)


def test_stacked_opt_step_loss_matches():
    """End-to-end: the stacked jitted train step (params held stacked,
    unstacked at trace time inside the loss so gradients arrive stacked)
    reproduces the tree step's loss/grad-norm, and a SECOND step from each
    path's own updated state exercises the full update wiring."""
    cfg = tiny_config()
    mesh = make_mesh(jax.devices()[:1])
    batch = synthetic_batch(cfg, batch_size=2, seed=1)
    model, state_t, tx_t, _ = create_train_state(
        cfg, jax.random.PRNGKey(0), batch, total_steps=100)
    _, state_s, tx_s, _, spec = create_train_state(
        cfg, jax.random.PRNGKey(0), batch, total_steps=100,
        stacked_opt=True)
    step_t = make_train_step(model, tx_t, mesh)
    step_s = make_train_step(model, tx_s, mesh, stacked_spec=spec)
    sbatch = shard_batch(batch, mesh)
    rng = jax.random.PRNGKey(1)
    state_t, aux_t = step_t(state_t, sbatch, rng)
    state_s, aux_s = step_s(state_s, sbatch, rng)
    np.testing.assert_allclose(float(aux_s["loss"]), float(aux_t["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(aux_s["grad_norm"]),
                               float(aux_t["grad_norm"]), rtol=1e-4)
    _, aux_t2 = step_t(state_t, sbatch, rng)
    _, aux_s2 = step_s(state_s, sbatch, rng)
    assert float(aux_t2["loss"]) < float(aux_t["loss"])
    np.testing.assert_allclose(float(aux_s2["loss"]), float(aux_t2["loss"]),
                               rtol=1e-4)
