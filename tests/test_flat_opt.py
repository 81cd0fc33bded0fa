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
    for i in range(3):
        state_t, aux_t = step_t(state_t, sbatch, rng)
        state_f, aux_f = step_f(state_f, sbatch, rng)
        np.testing.assert_allclose(float(aux_f["loss"]),
                                   float(aux_t["loss"]), rtol=1e-6)
        np.testing.assert_allclose(float(aux_f["grad_norm"]),
                                   float(aux_t["grad_norm"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(state_f.params),
                    jax.tree_util.tree_leaves(state_t.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-5)
