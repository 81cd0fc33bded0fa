"""FSDP (ZeRO-3) parameter sharding: params and Adam moments shard over the
'data' axis, the step runs on the 8-device mesh, and the result matches the
replicated layout. Covers the scale-out path the reference lacks entirely
(its DDP replicates params on every GPU — ``mmcv`` ``MMDistributedDataParallel``)."""
import numpy as np
import jax
from jax.sharding import PartitionSpec as P

from objectcentricocccompletion_tpu.configs import tiny_config
from objectcentricocccompletion_tpu.data.synthetic import synthetic_batch
from objectcentricocccompletion_tpu.parallel.train import (
    create_train_state, make_mesh, make_train_step, param_shardings_fsdp,
    shard_batch)


def test_fsdp_layout_rules():
    cfg = tiny_config()
    batch = synthetic_batch(cfg, batch_size=8, seed=0)
    _, state, _, _ = create_train_state(
        cfg, jax.random.PRNGKey(0), batch, total_steps=100)
    mesh = make_mesh()
    psh = param_shardings_fsdp(state.params, mesh, min_size=256)
    specs = [s.spec for s in jax.tree_util.tree_leaves(psh)]
    sharded = [s for s in specs if any(a == "data" for a in s)]
    assert sharded, "no parameter sharded over data"
    # every sharded spec names exactly one sharded dim
    for s in sharded:
        assert sum(a == "data" for a in s) == 1
    # the optimizer moments follow the identical rule (leaf shapes mirror
    # the params'), so the big memory term shards too
    osh = param_shardings_fsdp(state.opt_state, mesh, min_size=256)
    ospecs = [s.spec for s in jax.tree_util.tree_leaves(osh)]
    assert any(any(a == "data" for a in s) for s in ospecs)


def test_fsdp_step_matches_replicated():
    cfg = tiny_config()
    batch = synthetic_batch(cfg, batch_size=8, seed=3)
    model, state_a, tx, _ = create_train_state(
        cfg, jax.random.PRNGKey(0), batch, total_steps=100)
    _, state_b, _, _ = create_train_state(
        cfg, jax.random.PRNGKey(0), batch, total_steps=100)

    mesh = make_mesh()
    step_f = make_train_step(model, tx, mesh, state=state_a, fsdp=True,
                             fsdp_min_size=256)
    step_r = make_train_step(model, tx, mesh)
    rng = jax.random.PRNGKey(1)

    out_f, aux_f = step_f(state_a, shard_batch(batch, mesh), rng)
    out_r, aux_r = step_r(state_b, shard_batch(batch, mesh), rng)
    np.testing.assert_allclose(float(aux_f["loss"]), float(aux_r["loss"]),
                               rtol=3e-4)
    np.testing.assert_allclose(float(aux_f["grad_norm"]),
                               float(aux_r["grad_norm"]), rtol=3e-3)
    # the output state is actually sharded (not gathered back)
    shardings = [x.sharding.spec for x in
                 jax.tree_util.tree_leaves(out_f.params)]
    assert any(any(a == "data" for a in s) for s in shardings)
    # updated params agree with the replicated step
    for a, b in zip(jax.tree_util.tree_leaves(out_f.params),
                    jax.tree_util.tree_leaves(out_r.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-5)
