"""FSD++ seed subsystem (ops/seeds.py) — VERDICT r2 missing #2 / next #3.

Pins the reference semantics: score-filtered top-k seeding (result2seed /
preprocess_seed), FP-insertion and track-consistent dropout augmentation
(random_fp_insertion / random_drop_seed), and in-box capped crop
(crop_and_process_points) — ``two_stage_fsdpp.py:505-940``.
"""
import numpy as np
import jax
import jax.numpy as jnp

from objectcentricocccompletion_tpu.ops import seeds as S


def _mk_seeds(boxes, scores=None, labels=None):
    n = len(boxes)
    return S.Seeds(jnp.asarray(boxes, jnp.float32),
                   jnp.asarray(labels if labels is not None
                               else np.zeros(n), jnp.int32),
                   jnp.asarray(scores if scores is not None
                               else np.ones(n), jnp.float32),
                   jnp.ones((n,), bool))


def test_seeds_from_output_score_filter_and_cap():
    boxes = np.random.RandomState(0).randn(6, 7).astype(np.float32)
    scores = np.asarray([0.9, 0.05, 0.5, 0.3, 0.95, 0.2], np.float32)
    valid = np.asarray([True, True, True, False, True, True])
    out = S.seeds_from_output(jnp.asarray(boxes), jnp.zeros(6, jnp.int32),
                              jnp.asarray(scores), jnp.asarray(valid),
                              capacity=3, score_thr=0.1)
    got_scores = np.asarray(out.scores)[np.asarray(out.valid)]
    # top-3 above thr among valid: 0.95, 0.9, 0.5 (0.3 is invalid)
    np.testing.assert_allclose(np.sort(got_scores)[::-1], [0.95, 0.9, 0.5])


def test_seed_fp_insertion_shifts_copies():
    boxes = np.zeros((4, 7), np.float32)
    boxes[:, 3:6] = 2.0
    seeds = _mk_seeds(boxes)
    out = S.seed_fp_insertion(seeds, jax.random.PRNGKey(0), fp_rate=1.0)
    assert out.boxes.shape[0] == 8
    assert bool(np.asarray(out.valid).all())
    shift = np.asarray(out.boxes[4:, :2])
    assert (np.abs(shift) <= 10.0 + 1e-6).all()
    assert (np.abs(shift) > 1e-6).any()      # actually moved
    # sizes/labels/scores copied unchanged
    np.testing.assert_array_equal(np.asarray(out.boxes[4:, 3:6]),
                                  np.asarray(out.boxes[:4, 3:6]))


def test_seed_dropout_chain_is_track_consistent():
    """A static object (same box every frame) must be dropped in ALL
    frames or kept in ALL frames, never flip mid-window."""
    T, Sn = 5, 8
    rng = np.random.RandomState(1)
    base = np.concatenate([rng.uniform(-20, 20, (Sn, 2)),
                           np.full((Sn, 1), 0.0),
                           np.full((Sn, 3), 2.0),
                           np.zeros((Sn, 1))], -1).astype(np.float32)
    boxes = np.tile(base[None], (T, 1, 1))
    valid = np.ones((T, Sn), bool)
    keep = np.asarray(S.seed_dropout_chain(
        jnp.asarray(boxes), jnp.asarray(valid), jax.random.PRNGKey(0),
        drop_rate=0.5))
    # same decision every frame
    assert (keep == keep[0]).all()
    assert 0 < keep[0].sum() < Sn   # with 8 seeds at 0.5, virtually sure


def test_seed_dropout_step_inherits_by_iou():
    prev = np.zeros((2, 7), np.float32)
    prev[:, 3:6] = 2.0
    prev[1, 0] = 50.0
    cur = prev.copy()
    cur[:, 0] += 0.1   # still overlapping
    prev_keep = jnp.asarray([True, False])
    keep = S.seed_dropout_step(
        jnp.asarray(prev), jnp.ones(2, bool), prev_keep,
        jnp.asarray(cur), jnp.ones(2, bool), jax.random.PRNGKey(0),
        drop_rate=0.99)
    np.testing.assert_array_equal(np.asarray(keep), [True, False])


def test_crop_points_by_seeds_in_box_and_capped():
    rng = np.random.RandomState(2)
    # box A at origin (2x2x2), box B at x=30
    boxes = np.zeros((2, 7), np.float32)
    boxes[:, 3:6] = 2.0
    boxes[1, 0] = 30.0
    seeds = _mk_seeds(boxes)
    pts_in_a = rng.uniform(-0.8, 0.8, (50, 3))
    pts_in_a[:, 2] += 1.0          # bottom-center boxes: z in [0, 2]
    pts_in_b = rng.uniform(-0.8, 0.8, (10, 3))
    pts_in_b[:, 0] += 30.0
    pts_in_b[:, 2] += 1.0
    pts_out = rng.uniform(5, 10, (20, 3))
    pts = np.concatenate([pts_in_a, pts_in_b, pts_out], 0).astype(
        np.float32)
    points = np.concatenate([pts, np.zeros((80, 2), np.float32)], -1)
    mask = np.ones((80,), bool)
    keep = np.asarray(S.crop_points_by_seeds(
        jnp.asarray(points), jnp.asarray(mask), seeds,
        max_crop_points=16, extra_wlh=(0.0, 0.0, 0.0)))
    # outside points never pool
    assert not keep[60:].any()
    # box A capped at 16 (scan order: first 16 of its members)
    assert keep[:50].sum() == 16
    np.testing.assert_array_equal(np.nonzero(keep[:50])[0], np.arange(16))
    # box B keeps all 10 (under cap)
    assert keep[50:60].sum() == 10
    # invalid seeds crop nothing
    empty = S.empty_seeds(4)
    keep2 = np.asarray(S.crop_points_by_seeds(
        jnp.asarray(points), jnp.asarray(mask), empty, 16))
    assert not keep2.any()


def test_remove_ground_band():
    pts = np.zeros((5, 5), np.float32)
    pts[:, 2] = [-1.0, -0.1, 0.0, 0.15, 0.5]
    keep = np.asarray(S.remove_ground(jnp.asarray(pts),
                                      jnp.ones(5, bool), band=0.2))
    np.testing.assert_array_equal(keep, [True, False, False, False, True])


def test_fsdpp_seed_state_threads_through_steps():
    """The model's own detections become the next step's seeds; with
    use_seeds the second step's input memory contribution is restricted
    to seed crops."""
    from objectcentricocccompletion_tpu.models.fsdpp import (
        FSDPP, init_sequence_state, tiny_fsdpp_config)
    from tests.test_fsd import make_fsd_frame
    cfg = tiny_fsdpp_config(two_stage=False, use_seeds=True)
    model = FSDPP(cfg)
    points, mask, *_ = make_fsd_frame(cfg.fsd, seed=0)
    st0 = init_sequence_state(cfg, points.shape[-1])
    variables = model.init(jax.random.PRNGKey(0), st0, points, mask)
    st1, out1 = model.apply(variables, st0, points, mask)
    # seeds populated from step-1 detections (untrained scores may pass
    # or fail the threshold; just check consistency of the structure)
    assert st1.seeds.boxes.shape == (cfg.max_seeds, 7)
    assert int(np.asarray(st1.memory_mask).sum()) > 0
    assert np.asarray(st1.memory_age)[np.asarray(st1.memory_mask)].max() \
        <= cfg.max_age
    st2, out2 = model.apply(variables, st1, points, mask)
    assert np.isfinite(np.asarray(out2["cls"])).all()
    # ages increment for surviving points
    ages2 = np.asarray(st2.memory_age)[np.asarray(st2.memory_mask)]
    assert (ages2 >= 0).all() and ages2.max() <= cfg.max_age


def test_fsdpp_max_age_evicts_memory():
    from objectcentricocccompletion_tpu.models.fsdpp import (
        FSDPP, init_sequence_state, tiny_fsdpp_config)
    from tests.test_fsd import make_fsd_frame
    import dataclasses
    cfg = dataclasses.replace(tiny_fsdpp_config(two_stage=False),
                              max_age=2)
    model = FSDPP(cfg)
    points, mask, *_ = make_fsd_frame(cfg.fsd, seed=1)
    st = init_sequence_state(cfg, points.shape[-1])
    variables = model.init(jax.random.PRNGKey(0), st, points, mask)
    st, _ = model.apply(variables, st, points, mask)
    n1 = int(np.asarray(st.memory_mask).sum())
    # feed empty frames: no novel points, old ones age out after max_age
    empty_mask = jnp.zeros_like(mask)
    for _ in range(3):
        st, _ = model.apply(variables, st, points, empty_mask)
    assert int(np.asarray(st.memory_mask).sum()) == 0 < n1


def test_seed_store_roundtrip_and_loader(tmp_path):
    """SeedStore: results .bin -> per-frame padded seeds (the reference's
    tools/fsdpp/create_seed_boxes_from_bin.py flow), consumed by the
    sequential loader and train step."""
    import os
    import subprocess
    import sys

    from objectcentricocccompletion_tpu.data.seed_store import SeedStore
    from objectcentricocccompletion_tpu.evalx.waymo_bin import (WaymoObject,
                                                                write_bin)

    boxes = np.asarray([[1.0, 2.0, -1.0, 2.0, 4.5, 1.8, 0.3],
                        [10.0, -3.0, -0.5, 0.9, 0.9, 1.8, -1.0]],
                       np.float32)
    objs = [WaymoObject(tuple(boxes[0]), 0.9, 1, "a", "seg-x", 111),
            WaymoObject(tuple(boxes[1]), 0.5, 2, "b", "seg-x", 111),
            WaymoObject(tuple(boxes[0]), 0.7, 1, "c", "seg-x", 222)]
    bin_path = str(tmp_path / "res.bin")
    write_bin(objs, bin_path)

    # CLI: create_data.py fsdpp_seeds
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = str(tmp_path / "seeds.pkl")
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "create_data.py"),
         "fsdpp_seeds", "--results-bin", bin_path, "--out", out,
         "--max-seeds", "8", "--score-thr", "0.0"],
        capture_output=True, text=True,
        env=dict(os.environ, JAX_PLATFORMS="cpu"))
    assert r.returncode == 0, r.stderr[-2000:]

    store = SeedStore.load(out)
    b, lab, sc, ok = store.get("seg-x", 111)
    assert ok.sum() == 2 and b.shape == (8, 7)
    # box round-trips exactly through the waymo wire conventions
    got = b[np.argsort(-sc[:2])][0]
    np.testing.assert_allclose(got, boxes[0], atol=1e-5)
    np.testing.assert_array_equal(lab[:2], [0, 1])   # vehicle, ped labels
    b2, _, _, ok2 = store.get("seg-x", 222)
    assert ok2.sum() == 1
    assert store.get("seg-x", 999)[3].sum() == 0     # missing frame

    # loader integration: a dataset exposing frame_meta feeds seed arrays
    from objectcentricocccompletion_tpu.training.seq_trainer import \
        SequenceLoader
    from tests.test_fsd import make_fsd_frame
    from objectcentricocccompletion_tpu.models.fsd import tiny_fsd_config

    fcfg = tiny_fsd_config()

    class Frames:
        def __len__(self):
            return 2

        def sequences(self):
            return [[0, 1]]

        def frame_meta(self, i):
            return ("seg-x", [111, 222][i])

        def build_sample(self, i, rng):
            pts, msk, bx, lb, vl = make_fsd_frame(fcfg, seed=i)
            return dict(points=np.asarray(pts), points_mask=np.asarray(msk),
                        gt_boxes=np.asarray(bx), gt_labels=np.asarray(lb),
                        gt_valid=np.asarray(vl))

    loader = SequenceLoader(Frames(), window=2, seed_store=store)
    win = next(loader)
    assert win.seed_boxes.shape == (2, 8, 7)
    assert int(np.asarray(win.seed_valid).sum()) == 3
