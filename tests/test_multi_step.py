"""The scanned multi-step trainer (``parallel.train.make_train_multi_step``)
must reproduce K sequential ``make_train_step`` calls: same loss sequence,
same dropout stream (the PRNG folds in ``state.step``, which increments
through the scan), same final parameters — only the dispatch granularity
differs."""
import numpy as np
import jax
import jax.numpy as jnp

from objectcentricocccompletion_tpu.configs import tiny_config
from objectcentricocccompletion_tpu.data.synthetic import synthetic_batch
from objectcentricocccompletion_tpu.parallel.train import (
    create_train_state, make_mesh, make_train_multi_step, make_train_step,
    shard_batch)

K = 3


def _stack_batches(batches):
    return type(batches[0])(*(
        jnp.stack([np.asarray(b[i]) for b in batches])
        for i in range(len(batches[0]))))


def test_multi_step_matches_sequential_steps():
    cfg = tiny_config()
    mesh = make_mesh(jax.devices()[:1])
    batches = [synthetic_batch(cfg, batch_size=2, seed=s) for s in range(K)]
    model, state0, tx, _ = create_train_state(
        cfg, jax.random.PRNGKey(0), batches[0], total_steps=100)
    rng = jax.random.PRNGKey(7)

    # both steps donate their input state — give each its own copy
    state_init = jax.tree_util.tree_map(lambda x: jnp.array(np.asarray(x)),
                                        state0)
    step = make_train_step(model, tx, mesh)
    state_seq = state0
    losses_seq = []
    for b in batches:
        state_seq, aux = step(state_seq, shard_batch(b, mesh), rng)
        losses_seq.append(float(aux["loss"]))

    multi = make_train_multi_step(model, tx, mesh)
    stacked = shard_batch(_stack_batches(batches), mesh, scan_axis=True)
    state_multi, auxs = multi(state_init, stacked, rng)

    # per-step losses stacked [K]; train=True with dropout active, so the
    # streams must agree too (loose rtol: separately compiled programs)
    np.testing.assert_allclose(np.asarray(auxs["loss"]), losses_seq,
                               rtol=1e-5)
    assert int(state_multi.step) == int(state_seq.step) == K
    # atol at a fraction of the lr scale: on near-zero-grad leaves Adam's
    # m/sqrt(v) amplifies last-bit fusion differences between the two
    # separately-compiled programs into O(lr) update noise (the same
    # effect test_flat_opt documents)
    for a, b in zip(jax.tree_util.tree_leaves(state_multi.params),
                    jax.tree_util.tree_leaves(state_seq.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=5e-6)
