"""Sequence parallelism (parallel/sp.py): the packed point axis and the
occ-decoder query axis shard over the 'model' mesh axis via sharding
constraints; the step's math must match the unconstrained layout."""
import numpy as np
import jax

from objectcentricocccompletion_tpu.configs import tiny_config
from objectcentricocccompletion_tpu.data.synthetic import synthetic_batch
from objectcentricocccompletion_tpu.parallel.train import (
    create_train_state, make_mesh, make_mesh_2d, make_train_step,
    shard_batch)


def _packed_tiny():
    import dataclasses
    cfg = tiny_config()
    # SP targets the packed layout; quantum 2 keeps the tiny shapes valid
    return dataclasses.replace(cfg, packed_point_budget=64,
                               packed_quantum=2)


def test_sp_step_matches_replicated():
    cfg = _packed_tiny()
    batch = synthetic_batch(cfg, batch_size=8, seed=5)
    model, state_a, tx, _ = create_train_state(
        cfg, jax.random.PRNGKey(0), batch, total_steps=100)
    _, state_b, _, _ = create_train_state(
        cfg, jax.random.PRNGKey(0), batch, total_steps=100)

    mesh2d = make_mesh_2d(4, 2)
    step_sp = make_train_step(model, tx, mesh2d, state=state_a,
                              sequence_parallel=True)
    step_1d = make_train_step(model, tx, make_mesh())
    rng = jax.random.PRNGKey(1)

    out_sp, aux_sp = step_sp(state_a, shard_batch(batch, mesh2d), rng)
    out_1d, aux_1d = step_1d(state_b, shard_batch(batch, make_mesh()), rng)
    np.testing.assert_allclose(float(aux_sp["loss"]), float(aux_1d["loss"]),
                               rtol=3e-4)
    np.testing.assert_allclose(float(aux_sp["grad_norm"]),
                               float(aux_1d["grad_norm"]), rtol=3e-3)
    # a second step still runs (constraints trace correctly with the
    # updated state)
    out_sp, aux2 = step_sp(out_sp, shard_batch(batch, mesh2d), rng)
    assert np.isfinite(float(aux2["loss"]))


def test_sp_setting_does_not_leak_between_steps():
    """A non-SP step traced after building an SP step must stay
    unconstrained (the globals only live during the SP step's trace)."""
    from objectcentricocccompletion_tpu.parallel import sp
    cfg = _packed_tiny()
    batch = synthetic_batch(cfg, batch_size=8, seed=6)
    model, state, tx, _ = create_train_state(
        cfg, jax.random.PRNGKey(0), batch, total_steps=100)
    mesh2d = make_mesh_2d(4, 2)
    step_sp = make_train_step(model, tx, mesh2d, state=state,
                              sequence_parallel=True)
    assert not sp.sequence_parallel_enabled()   # set only during trace
    state, aux = step_sp(state, shard_batch(batch, mesh2d),
                         jax.random.PRNGKey(1))
    assert not sp.sequence_parallel_enabled()
    assert np.isfinite(float(aux["loss"]))
