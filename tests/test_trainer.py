"""Trainer: checkpoint save/restore round-trip and a short training run
through the CLI-level train() entry."""
import json
import os

import numpy as np
import jax
import pytest

from objectcentricocccompletion_tpu.configs import tiny_config
from objectcentricocccompletion_tpu.data.loader import (
    TrainLoader, write_synthetic_dataset)
from objectcentricocccompletion_tpu.data.tracklet_dataset import \
    TrackletDataset
from objectcentricocccompletion_tpu.parallel.train import create_train_state
from objectcentricocccompletion_tpu.training.trainer import (
    CheckpointManager, train)


def test_checkpoint_roundtrip(tmp_path):
    cfg = tiny_config()
    paths = write_synthetic_dataset(str(tmp_path / "ds"), num_tracklets=2,
                                    track_len=10)
    ds = TrackletDataset(cfg=cfg, min_tracklet_points=10, **paths)
    batch = next(TrainLoader(ds, 2))
    model, state, tx, _ = create_train_state(
        cfg, jax.random.PRNGKey(0), batch, 10)
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(5, jax.device_get(state), cfg)
    mgr.wait()

    _, fresh, _, _ = create_train_state(
        cfg, jax.random.PRNGKey(42), batch, 10)   # different init
    restored = mgr.restore(fresh)
    assert restored is not None
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert os.path.exists(str(tmp_path / "ckpt" / "config.json"))


def test_train_run_and_resume(tmp_path):
    cfg = tiny_config()
    paths = write_synthetic_dataset(str(tmp_path / "ds"), num_tracklets=3,
                                    track_len=10)
    ds = TrackletDataset(cfg=cfg, min_tracklet_points=10, **paths)
    work = str(tmp_path / "work")
    state = train(cfg, ds, work, total_steps=6, ckpt_interval=3,
                  log_interval=2, devices=jax.devices()[:2])
    assert int(state.step) == 6
    lines = [json.loads(l) for l in open(os.path.join(work,
                                                      "metrics.jsonl"))]
    assert len(lines) >= 2
    assert np.isfinite(lines[-1]["loss"])
    # resume: restores step 6 and stops immediately at total_steps=6
    state2 = train(cfg, ds, work, total_steps=6, ckpt_interval=3,
                   devices=jax.devices()[:2])
    assert int(state2.step) == 6


def test_hooks_disable_augmentation(tmp_path):
    from objectcentricocccompletion_tpu.training.hooks import (
        HookList, disable_augmentation_hook, loss_weight_warmup)
    cfg = tiny_config()
    paths = write_synthetic_dataset(str(tmp_path / "ds"), num_tracklets=2,
                                    track_len=10)
    ds = TrackletDataset(cfg=cfg, min_tracklet_points=10, **paths)
    assert ds.augment
    hooks = HookList()
    hooks.hooks.append(disable_augmentation_hook(ds, at_step=3))
    hooks.on_step(0)
    assert ds.augment
    hooks.on_step(3)
    assert not ds.augment
    # augmented-off samples are deterministic apart from sampling rngs
    s1 = ds.build_sample(0, np.random.RandomState(0))
    s2 = ds.build_sample(0, np.random.RandomState(0))
    np.testing.assert_array_equal(s1["rois"], s2["rois"])

    w = loss_weight_warmup(10)
    assert w(5) == 0.0 and w(10) == 1.0
