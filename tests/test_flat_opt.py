"""The flat optimizer (AdamW over two concatenated decay/no-decay vectors,
``parallel.train.make_flat_opt_spec`` + ``training.optim.make_flat_optimizer``)
must reproduce the per-leaf tree optimizer exactly: same transforms, same
hyperparameters, only the reduction/concat layout differs."""
import numpy as np
import jax
import jax.numpy as jnp

from objectcentricocccompletion_tpu.configs import tiny_config
from objectcentricocccompletion_tpu.data.synthetic import synthetic_batch
from objectcentricocccompletion_tpu.parallel.train import (
    create_train_state, flatten_by_spec, make_flat_opt_spec, make_mesh,
    make_train_step, shard_batch, unflatten_by_spec)


def test_flat_spec_roundtrip():
    cfg = tiny_config()
    batch = synthetic_batch(cfg, batch_size=2, seed=0)
    _, state, _, _ = create_train_state(
        cfg, jax.random.PRNGKey(0), batch, total_steps=100)
    spec = make_flat_opt_spec(state.params)
    flat = flatten_by_spec(spec, state.params)
    assert set(flat) == {"decay", "nodecay"}
    n_leaves = len(jax.tree_util.tree_leaves(state.params))
    assert len(spec.entries) == n_leaves
    assert flat["decay"].shape[0] == spec.sizes["decay"]
    assert flat["nodecay"].shape[0] == spec.sizes["nodecay"]
    back = unflatten_by_spec(spec, flat)
    for a, b in zip(jax.tree_util.tree_leaves(back),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # biases and norm scales land in nodecay (no weight decay applied)
    assert spec.sizes["nodecay"] > 0 and spec.sizes["decay"] > 0


def test_flat_opt_matches_tree_optimizer():
    """Transform-level equivalence on IDENTICAL gradients.

    (An earlier version compared two fully-jitted train steps; that is not
    a well-posed bitwise test — the two programs fuse differently, and on
    leaves with near-zero gradients Adam's m/sqrt(v) amplifies last-bit
    forward/backward noise into O(1)-relative update differences. The
    optimizer claim is "same transforms, different layout", so feed both
    transforms the same grads and demand tight equality; gradients large
    enough that clip_by_global_norm is ACTIVE, exercising the one genuine
    difference — the global-norm reduction order.)"""
    import optax

    cfg = tiny_config()
    batch = synthetic_batch(cfg, batch_size=2, seed=1)
    _, state_t, tx_t, _ = create_train_state(
        cfg, jax.random.PRNGKey(0), batch, total_steps=100)
    _, state_f, tx_f, _ = create_train_state(
        cfg, jax.random.PRNGKey(0), batch, total_steps=100, flat_opt=True)

    spec = make_flat_opt_spec(state_t.params)
    params_t = state_t.params
    params_f = flatten_by_spec(spec, params_t)
    opt_t, opt_f = state_t.opt_state, state_f.opt_state

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
        up_f, opt_f = tx_f.update(flatten_by_spec(spec, grads), opt_f,
                                  params_f)
        params_f = optax.apply_updates(params_f, up_f)

    for a, b in zip(jax.tree_util.tree_leaves(
            unflatten_by_spec(spec, params_f)),
            jax.tree_util.tree_leaves(params_t)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-8, rtol=1e-5)


def test_flat_opt_step_loss_matches():
    """End-to-end smoke: the flat-opt jitted train step reproduces the tree
    step's loss/grad-norm (loose tolerance — separately compiled programs).
    A SECOND step runs from each path's own updated state, so the flat
    branch's full wiring (flatten grads -> tx.update -> unflatten ->
    apply_updates inside the jitted step) is exercised: a wiring bug that
    corrupts the post-update params would diverge the step-2 losses."""
    cfg = tiny_config()
    mesh = make_mesh(jax.devices()[:1])
    batch = synthetic_batch(cfg, batch_size=2, seed=1)
    model, state_t, tx_t, _ = create_train_state(
        cfg, jax.random.PRNGKey(0), batch, total_steps=100)
    _, state_f, tx_f, _ = create_train_state(
        cfg, jax.random.PRNGKey(0), batch, total_steps=100, flat_opt=True)
    step_t = make_train_step(model, tx_t, mesh)
    step_f = make_train_step(model, tx_f, mesh, flat_opt=True)
    sbatch = shard_batch(batch, mesh)
    rng = jax.random.PRNGKey(1)
    state_t, aux_t = step_t(state_t, sbatch, rng)
    state_f, aux_f = step_f(state_f, sbatch, rng)
    np.testing.assert_allclose(float(aux_f["loss"]), float(aux_t["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(aux_f["grad_norm"]),
                               float(aux_t["grad_norm"]), rtol=1e-4)
    # step 2 from each path's own updated state: losses agree to the
    # lr-scale (Adam's unit-scale first update x lr 1e-4 bounds the param
    # delta; near-zero-grad leaves may differ at last-bit, so loose rtol)
    _, aux_t2 = step_t(state_t, sbatch, rng)
    _, aux_f2 = step_f(state_f, sbatch, rng)
    assert float(aux_t2["loss"]) < float(aux_t["loss"])  # it does optimize
    np.testing.assert_allclose(float(aux_f2["loss"]), float(aux_t2["loss"]),
                               rtol=1e-4)
