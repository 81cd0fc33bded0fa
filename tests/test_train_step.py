"""Sharded training: the full train step must compile and run on a virtual
8-device mesh, losses must decrease on a fixed synthetic batch, and the
sharded result must match single-device execution."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from objectcentricocccompletion_tpu.configs import tiny_config
from objectcentricocccompletion_tpu.data.synthetic import synthetic_batch
from objectcentricocccompletion_tpu.parallel.train import (
    create_train_state, make_mesh, make_train_step, shard_batch)
from objectcentricocccompletion_tpu.training.optim import (
    cyclic_cosine_schedule)


def test_schedule_shape():
    sch = cyclic_cosine_schedule(1e-6, 1000)
    assert abs(float(sch(0)) - 1e-6) < 1e-12
    assert abs(float(sch(100)) - 1e-4) < 1e-8      # peak at 10%
    assert float(sch(1000)) < 1.1e-7               # annealed to 1e-7
    assert float(sch(50)) > float(sch(0))


def test_train_step_8dev_loss_decreases():
    cfg = tiny_config()
    mesh = make_mesh()
    assert mesh.devices.size == 8
    batch = synthetic_batch(cfg, batch_size=8, seed=0)
    model, state, tx, _ = create_train_state(
        cfg, jax.random.PRNGKey(0), batch, total_steps=100)
    step = make_train_step(model, tx, mesh)
    batch = shard_batch(batch, mesh)
    rng = jax.random.PRNGKey(1)

    losses = []
    for _ in range(8):
        state, aux = step(state, batch, rng)
        losses.append(float(aux["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    assert float(aux["grad_norm"]) > 0


def test_sharded_matches_single_device():
    cfg = tiny_config()
    batch = synthetic_batch(cfg, batch_size=8, seed=3)
    # donate_argnums consumes the state, so build one per mesh (same seed ->
    # identical init).
    model, state_a, tx, _ = create_train_state(
        cfg, jax.random.PRNGKey(0), batch, total_steps=100)
    _, state_b, _, _ = create_train_state(
        cfg, jax.random.PRNGKey(0), batch, total_steps=100)

    mesh8 = make_mesh(jax.devices())
    mesh1 = make_mesh(jax.devices()[:1])
    step8 = make_train_step(model, tx, mesh8)
    step1 = make_train_step(model, tx, mesh1)
    rng = jax.random.PRNGKey(1)

    _, aux8 = step8(state_a, shard_batch(batch, mesh8), rng)
    _, aux1 = step1(state_b, shard_batch(batch, mesh1), rng)
    # dropout rngs differ per-position only via fold_in(step) -> identical
    np.testing.assert_allclose(float(aux8["loss"]), float(aux1["loss"]),
                               rtol=2e-4)
    np.testing.assert_allclose(float(aux8["grad_norm"]),
                               float(aux1["grad_norm"]), rtol=2e-3)


def test_dp_tp_2d_mesh_step():
    """DP x TP: wide kernels shard over the 'model' axis on a [4, 2] mesh;
    one step must run and match the replicated result."""
    from objectcentricocccompletion_tpu.parallel.train import (
        make_mesh_2d, param_shardings)
    from jax.sharding import PartitionSpec as P
    cfg = tiny_config()
    batch = synthetic_batch(cfg, batch_size=8, seed=9)
    model, state_a, tx, _ = create_train_state(
        cfg, jax.random.PRNGKey(0), batch, total_steps=100)
    _, state_b, _, _ = create_train_state(
        cfg, jax.random.PRNGKey(0), batch, total_steps=100)

    mesh2d = make_mesh_2d(4, 2)
    # tiny config kernels are small; lower the shard threshold via the
    # public rule by checking at least the layout function behaves
    psh = param_shardings(state_a.params, mesh2d, min_dim=32)
    specs = {s.spec for s in jax.tree_util.tree_leaves(psh)}
    assert P(None, "model") in specs       # something actually shards

    step2d = make_train_step(model, tx, mesh2d, state=state_a)
    step1d = make_train_step(model, tx, make_mesh())
    rng = jax.random.PRNGKey(1)
    _, aux2 = step2d(state_a, shard_batch(batch, mesh2d), rng)
    _, aux1 = step1d(state_b, shard_batch(batch, make_mesh()), rng)
    np.testing.assert_allclose(float(aux2["loss"]), float(aux1["loss"]),
                               rtol=3e-4)


def test_multihost_mesh_single_process():
    """make_multihost_mesh on one process: model axis innermost, shapes
    multiply out, and a sharded psum over it matches the local sum."""
    import jax
    import jax.numpy as jnp
    from objectcentricocccompletion_tpu.parallel.multihost import (
        initialize, make_multihost_mesh, process_allgather, sync_hosts)

    initialize()            # no-op single process
    mesh = make_multihost_mesh(model_axis_size=2)
    assert mesh.axis_names == ("data", "model")
    assert mesh.devices.shape == (jax.device_count() // 2, 2)

    x = jnp.arange(8.0)
    from jax.sharding import NamedSharding, PartitionSpec as P
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    total = jax.jit(lambda v: jnp.sum(v))(xs)
    assert float(total) == float(jnp.sum(x))

    assert process_allgather({"a": 1}) == {"a": 1}
    sync_hosts()            # no-op single process

    import pytest
    with pytest.raises(AssertionError):
        make_multihost_mesh(model_axis_size=3)   # 8 % 3 != 0


def test_fixed_ae_freezes_ae_params():
    """fixed_ae=True (OnlyGrad optimizer analog): the AE encoder subtree
    receives ZERO updates while everything else trains."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    import numpy as np
    from objectcentricocccompletion_tpu.configs import tiny_config
    from objectcentricocccompletion_tpu.data.synthetic import synthetic_batch
    from objectcentricocccompletion_tpu.parallel.train import (
        create_train_state, make_mesh, make_train_step, shard_batch)

    cfg = dataclasses.replace(tiny_config(), fixed_ae=True)
    batch = synthetic_batch(cfg, seed=0)
    model, state, tx, _ = create_train_state(
        cfg, jax.random.PRNGKey(0), batch, total_steps=10)
    mesh = make_mesh(jax.devices()[:2])
    step = make_train_step(model, tx, mesh)
    p0 = jax.device_get(state.params)
    state2, aux = step(state, shard_batch(batch, mesh),
                       jax.random.PRNGKey(1))
    p1 = jax.device_get(state2.params)

    def subtree_delta(tree0, tree1, want):
        flat0 = jax.tree_util.tree_flatten_with_path(tree0)[0]
        flat1 = jax.tree_util.tree_leaves(tree1)
        tot = 0.0
        for (k, v0), v1 in zip(flat0, flat1):
            if ("ae_encoder" in str(k)) == want:
                tot += float(jnp.abs(v1 - v0).sum())
        return tot

    assert subtree_delta(p0, p1, want=True) == 0.0, "AE params moved"
    assert subtree_delta(p0, p1, want=False) > 0.0, "nothing trained"
    assert np.isfinite(float(aux["loss"]))


def test_shrunk_init_matches_full_init_structure():
    """create_train_state inits on a sliced batch; the parameter tree must
    be identical (shapes depend only on channel dims, never B/L/P/K)."""
    import jax
    from objectcentricocccompletion_tpu.configs import tiny_config
    from objectcentricocccompletion_tpu.models import OcOccNetWithLoss
    from objectcentricocccompletion_tpu.parallel.train import shrink_batch
    from tests.test_model import make_batch

    cfg = tiny_config()
    batch = make_batch(cfg, seed=11)
    model = OcOccNetWithLoss(cfg)
    full = model.init({"params": jax.random.PRNGKey(0)}, batch,
                      train=False)["params"]
    small = model.init({"params": jax.random.PRNGKey(0)},
                       shrink_batch(batch), train=False)["params"]
    fs = jax.tree_util.tree_map(lambda x: (x.shape, x.dtype), full)
    ss = jax.tree_util.tree_map(lambda x: (x.shape, x.dtype), small)
    assert fs == ss
    # and values match too (same rng, shape-independent initializers)
    for a, b in zip(jax.tree_util.tree_leaves(full),
                    jax.tree_util.tree_leaves(small)):
        import numpy as np
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
