"""Leaderboard submission packaging + checkpoint surgery.

Covers ``evalx/submission.py`` (the reference's prebuilt
``tools/create_submission`` binary + ``tools/ctrl/remove_empty.py``) and
``training/surgery.py`` (``tools/model_converters/publish_model.py`` /
``fsd_pretrain_converter.py``).
"""
import os

import numpy as np
import pytest

from objectcentricocccompletion_tpu.evalx.submission import (
    SubmissionMeta, TASK_DETECTION_3D, create_submission, detect_object_types,
    iter_raw_objects, read_submission, remove_empty_predictions)
from objectcentricocccompletion_tpu.evalx.waymo_bin import (
    WaymoObject, write_bin)


def _make_bin(path, n=7):
    objs = []
    for i in range(n):
        objs.append(WaymoObject(
            (float(i), 2.0, 0.5, 2.0, 4.5, 1.8, 0.3 * i), 0.9 - 0.1 * i,
            1 if i % 2 == 0 else 4, f"obj{i}", "seg-a", 1000 + i))
    write_bin(objs, path)
    return objs


def test_submission_shards_roundtrip(tmp_path):
    bin_path = str(tmp_path / "res.bin")
    _make_bin(bin_path)
    meta = SubmissionMeta(unique_method_name="ococc_tpu",
                          account_name="a@b.c",
                          authors=["A. One", "B. Two"],
                          affiliation="Lab", description="desc",
                          method_link="http://x", latency_second=0.08)
    paths = create_submission(bin_path, str(tmp_path / "sub"), "model",
                              meta, num_shards=3)
    shard_paths = [p for p in paths if not p.endswith(".tar.gz")]
    assert len(shard_paths) == 3
    assert paths[-1].endswith("model.tar.gz") and os.path.exists(paths[-1])

    payload = b""
    for p in shard_paths:
        sub = read_submission(p)
        assert sub["task"] == TASK_DETECTION_3D
        assert sub["unique_method_name"] == "ococc_tpu"
        assert sub["account_name"] == "a@b.c"
        assert sub["authors"] == ["A. One", "B. Two"]
        assert sub["object_types"] == [1, 4]
        assert abs(sub["latency_second"] - 0.08) < 1e-6
        payload += sub["objects_payload"]
    with open(bin_path, "rb") as f:
        assert payload == f.read()   # sharding is byte-exact


def test_detect_object_types(tmp_path):
    bin_path = str(tmp_path / "res.bin")
    _make_bin(bin_path, n=3)
    assert detect_object_types(bin_path) == [1, 4]


def test_remove_empty_rotated_box(tmp_path):
    """Membership must follow the box's true heading, not its mirror.

    Internal yaw pi/4 -> waymo heading -3pi/4: the length axis points along
    (-s2, -s2). A point 2.5 m down that axis is inside (L=6); the SAME
    offset mirrored across the world x-axis is outside (it sits 2.5 m off
    the width axis, W=1). A heading-sign bug classifies both wrongly."""
    s2 = np.sqrt(2.0) / 2.0
    box = (0.0, 0.0, 0.0, 1.0, 6.0, 2.0, np.pi / 4)  # internal layout
    objs = [WaymoObject(box, 0.9, 1, "on_axis", "seg", 1),
            WaymoObject(box, 0.9, 1, "mirrored", "seg", 2)]
    bin_path = str(tmp_path / "rot.bin")
    write_bin(objs, bin_path)
    pts_by_ts = {1: np.array([[-2.5 * s2, -2.5 * s2, 1.0]]),   # true inside
                 2: np.array([[-2.5 * s2, +2.5 * s2, 1.0]])}   # true outside
    out = str(tmp_path / "rot_filtered.bin")
    kept, total = remove_empty_predictions(
        bin_path, out, lambda seg, ts: pts_by_ts[ts])
    assert (kept, total) == (1, 2)
    recs = list(iter_raw_objects(out))
    assert len(recs) == 1 and b"on_axis" in recs[0]


def test_remove_empty_predictions(tmp_path):
    bin_path = str(tmp_path / "res.bin")
    # two boxes at x=0 and x=10; points only inside the first
    objs = [WaymoObject((0.0, 0.0, 0.0, 2.0, 4.0, 1.5, 0.0), 0.9, 1,
                        "keep", "seg", 1),
            WaymoObject((10.0, 0.0, 0.0, 2.0, 4.0, 1.5, 0.0), 0.8, 1,
                        "drop", "seg", 1)]
    write_bin(objs, bin_path)
    pts = np.array([[0.1, 0.2, 0.5, 0.0, 0.0],
                    [0.3, -0.2, 0.7, 0.0, 0.0]], np.float32)
    out = str(tmp_path / "filtered.bin")
    kept, total = remove_empty_predictions(
        bin_path, out, lambda seg, ts: pts)
    assert (kept, total) == (1, 2)
    recs = list(iter_raw_objects(out))
    assert len(recs) == 1 and b"keep" in recs[0]


def test_transplant_subtree():
    from objectcentricocccompletion_tpu.training.surgery import transplant
    src = {"segmentor": {"conv": {"kernel": np.ones((3, 4))},
                         "norm": {"scale": np.full((4,), 2.0)}},
           "head": {"w": np.zeros((2, 2))}}
    dst = {"segmentor": {"conv": {"kernel": np.zeros((3, 4))},
                         "norm": {"scale": np.zeros((4,))},
                         "extra": {"b": np.zeros((1,))}},
           "det_head": {"w": np.zeros((5,))}}
    new, report = transplant(dst, src, src_prefix="segmentor",
                             dst_prefix="segmentor")
    assert np.all(new["segmentor"]["conv"]["kernel"] == 1.0)
    assert np.all(new["segmentor"]["norm"]["scale"] == 2.0)
    assert np.all(new["segmentor"]["extra"]["b"] == 0.0)  # untouched
    assert np.all(dst["segmentor"]["conv"]["kernel"] == 0.0)  # no mutation
    assert sorted(report["copied"]) == ["segmentor/conv/kernel",
                                        "segmentor/norm/scale"]
    assert report["missing"] == [] and report["shape_mismatch"] == []
    # head/* is outside src_prefix -> ignored entirely
    new2, report2 = transplant(dst, src)   # no prefix: head/w has no slot
    assert "head/w" in report2["missing"]


def test_transplant_shape_mismatch():
    from objectcentricocccompletion_tpu.training.surgery import transplant
    src = {"a": {"k": np.ones((2, 2))}}
    dst = {"a": {"k": np.zeros((3, 3))}}
    new, report = transplant(dst, src)
    assert report["shape_mismatch"] == [("a/k", (2, 2), (3, 3))]
    assert np.all(new["a"]["k"] == 0.0)    # strict: not copied


def test_publish_strips_optimizer(tmp_path):
    import jax.numpy as jnp

    from objectcentricocccompletion_tpu.parallel.train import TrainState
    from objectcentricocccompletion_tpu.training.surgery import (
        publish, restore_params, tree_hash)
    from objectcentricocccompletion_tpu.training.trainer import (
        CheckpointManager)

    params = {"dense": {"kernel": np.arange(6, dtype=np.float32)
                        .reshape(2, 3)}}
    state = TrainState(jnp.asarray(7, jnp.int32), params,
                       {"mu": {"dense": {"kernel": np.ones((2, 3),
                                                           np.float32)}}})
    ckpt = str(tmp_path / "ckpt")
    mgr0 = CheckpointManager(ckpt)
    mgr0.save(7, state)
    mgr0.wait()
    out = publish(ckpt, str(tmp_path / "release" / "model"))
    assert out.split("-")[-1] == tree_hash(params)[:8]
    step, restored = restore_params(out)
    assert step == 7
    np.testing.assert_array_equal(restored["dense"]["kernel"],
                                  params["dense"]["kernel"])
    # no optimizer state in the published payload
    import orbax.checkpoint as ocp
    mgr = ocp.CheckpointManager(out)
    payload = mgr.restore(mgr.latest_step(), args=ocp.args.StandardRestore())
    assert "opt_state" not in payload
    assert os.path.exists(os.path.join(out, "PUBLISH.json"))
