"""FSD++: sequence stepping with incremental memory."""
import numpy as np
import jax
import jax.numpy as jnp

from objectcentricocccompletion_tpu.models.fsdpp import (
    FSDPP, tiny_fsdpp_config)
from tests.test_fsd import make_fsd_frame


def test_fsdpp_sequence_steps():
    cfg = tiny_fsdpp_config()
    model = FSDPP(cfg)
    points, mask, *_ = make_fsd_frame(cfg.fsd, seed=0)
    feat_dim = points.shape[-1]

    from objectcentricocccompletion_tpu.models.fsdpp import SequenceState
    state0 = SequenceState(jnp.zeros((cfg.memory_size, feat_dim)),
                           jnp.zeros((cfg.memory_size,), bool))

    variables = model.init(jax.random.PRNGKey(0), state0, points, mask)
    st1, out1 = model.apply(variables, state0, points, mask)
    assert np.isfinite(np.asarray(out1["cls"])).all()
    n_mem1 = int(np.asarray(st1.memory_mask).sum())
    assert n_mem1 > 0          # first frame: everything novel

    # same frame again: nothing novel, memory stable
    st2, out2 = model.apply(variables, st1, points, mask)
    n_mem2 = int(np.asarray(st2.memory_mask).sum())
    assert n_mem2 == n_mem1

    # shifted frame: some novel points enter memory
    pts3 = np.asarray(points).copy()
    pts3[:, :2] += 3.0
    st3, _ = model.apply(variables, st2, jnp.asarray(pts3), mask)
    assert int(np.asarray(st3.memory_mask).sum()) >= n_mem2
