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


def test_ctrl_ped_trains_on_pedestrian_tracklets(tmp_path):
    """ctrl_ped path end-to-end: pedestrian-type (2) tracklets load through
    the class filter and the CTRL ped config takes real training steps."""
    import dataclasses
    import jax
    import numpy as np
    from objectcentricocccompletion_tpu.configs import tiny_config
    from objectcentricocccompletion_tpu.configs.ococcnet_config import \
        ctrl_ped_config
    from objectcentricocccompletion_tpu.data.loader import (
        TrainLoader, write_synthetic_dataset)
    from objectcentricocccompletion_tpu.data.tracklet_dataset import \
        TrackletDataset
    from objectcentricocccompletion_tpu.parallel.train import (
        create_train_state, make_mesh, make_train_step, shard_batch)

    paths = write_synthetic_dataset(str(tmp_path / "ds"), num_tracklets=2,
                                    track_len=10, seed=9, obj_type=2)
    ped = ctrl_ped_config()
    cfg = dataclasses.replace(
        tiny_config(), variant="ctrl", class_names=ped.class_names,
        cls_pos_thr=ped.cls_pos_thr, cls_neg_thr=ped.cls_neg_thr,
        corner_loss_weight=ped.corner_loss_weight)

    # the vehicle-class filter must reject these records...
    ds_veh = TrackletDataset(cfg=tiny_config(), min_tracklet_points=10,
                             class_names=("Car",), **paths)
    assert len(ds_veh) == 0
    # ...and the pedestrian class must load them
    ds = TrackletDataset(cfg=cfg, min_tracklet_points=10,
                         class_names=cfg.class_names, **paths)
    assert len(ds) == 2

    batch = next(TrainLoader(ds, batch_size=1))
    model, state, tx, _ = create_train_state(
        cfg, jax.random.PRNGKey(0), batch, total_steps=4)
    mesh = make_mesh(jax.devices()[:1])
    step = make_train_step(model, tx, mesh)
    losses = []
    for i in range(3):
        state, aux = step(state, shard_batch(batch, mesh),
                          jax.random.PRNGKey(i))
        losses.append(float(aux["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] != losses[0]
    assert float(aux["loss_rcnn_corner"]) == 0.0   # ped: corner loss off


def test_train_parallelism_options(tmp_path):
    """train() smoke with the full parallelism stack: [4, 2] DP x TP mesh,
    FSDP state sharding, and sequence parallelism on the packed layout."""
    import dataclasses
    import jax
    import numpy as np
    cfg = dataclasses.replace(tiny_config(), packed_point_budget=64,
                              packed_quantum=2)
    paths = write_synthetic_dataset(str(tmp_path / "ds"), num_tracklets=4,
                                    track_len=10)
    ds = TrackletDataset(cfg=cfg, min_tracklet_points=10, **paths)
    state = train(cfg, ds, str(tmp_path / "work"), total_steps=3,
                  ckpt_interval=3, log_interval=1, tp=2, fsdp=True,
                  sequence_parallel=True)
    assert int(state.step) == 3
    import json, os
    lines = [json.loads(l) for l in
             open(os.path.join(str(tmp_path / "work"), "metrics.jsonl"))]
    assert np.isfinite(lines[-1]["loss"])
