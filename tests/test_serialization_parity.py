"""Executed-parity for the heading/serialization chain (VERDICT r3 #3).

SURVEY.md section 7 names these the top parity traps — they decide mAPH.
Each test runs the REFERENCE torch code (via ``refstub``) and asserts this
framework's host/device equivalents match:

  * ``DeltaXYZWLHRBBoxCoder`` encode/decode
    (``core/bbox/coders/delta_xyzwhlr_bbox_coder.py``) vs ``core/coder.py``
  * ``LiDARTracklet.frame_transform`` / ``shared2ego`` /
    ``update_from_prediction`` (``lidar_tracklet.py:348-447``) vs
    ``data.tracklet_dataset.pose_transform_boxes``
  * ``lidar2waymo_box`` (``waymo_tracklet_dataset.py:459-487``) vs
    ``evalx/waymo_bin.py`` encode/read round trip
  * ``get_window_coors`` (``ops/sst/sst_ops.py:266-313``) and the
    flat<->window round trip vs ``ops/window.py``
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference"),
    reason="reference tree not available")

torch = pytest.importorskip("torch")
import jax.numpy as jnp  # noqa: E402

from refstub import load_reference  # noqa: E402


@pytest.fixture(scope="module")
def refs():
    return load_reference()


def _rand_boxes(rng, n):
    """[n, 7] plausible bottom-center LiDAR boxes."""
    ctr = rng.uniform(-40, 40, (n, 3))
    dims = rng.uniform(1.0, 6.0, (n, 3))
    yaw = rng.uniform(-np.pi, np.pi, (n, 1))
    return np.concatenate([ctr, dims, yaw], 1).astype(np.float32)


def _rand_pose(rng):
    """Random SE(3) ego pose (yaw-dominant like real driving)."""
    yaw = rng.uniform(-np.pi, np.pi)
    c, s = np.cos(yaw), np.sin(yaw)
    m = np.eye(4)
    m[:2, :2] = [[c, -s], [s, c]]
    m[:3, 3] = rng.uniform(-100, 100, 3)
    return m.astype(np.float32)


# ----------------------------------------------------------------- coder
def test_delta_coder_encode_executed(refs):
    from objectcentricocccompletion_tpu.core import coder
    rng = np.random.RandomState(0)
    src = _rand_boxes(rng, 64)
    dst = _rand_boxes(rng, 64)
    ref = refs["coder"].DeltaXYZWLHRBBoxCoder.encode(
        torch.from_numpy(src), torch.from_numpy(dst)).numpy()
    got = np.asarray(coder.encode(jnp.asarray(src), jnp.asarray(dst)))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_delta_coder_decode_executed(refs):
    from objectcentricocccompletion_tpu.core import coder
    rng = np.random.RandomState(1)
    anchors = _rand_boxes(rng, 64)
    deltas = rng.uniform(-0.5, 0.5, (64, 7)).astype(np.float32)
    ref = refs["coder"].DeltaXYZWLHRBBoxCoder.decode(
        torch.from_numpy(anchors), torch.from_numpy(deltas)).numpy()
    got = np.asarray(coder.decode(jnp.asarray(anchors),
                                  jnp.asarray(deltas)))
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-5)


def test_delta_coder_roundtrip_cross(refs):
    """Our encode fed to the REFERENCE decode reproduces the target box."""
    from objectcentricocccompletion_tpu.core import coder
    rng = np.random.RandomState(2)
    src = _rand_boxes(rng, 32)
    dst = _rand_boxes(rng, 32)
    ours = np.asarray(coder.encode(jnp.asarray(src), jnp.asarray(dst)))
    back = refs["coder"].DeltaXYZWLHRBBoxCoder.decode(
        torch.from_numpy(src), torch.from_numpy(ours)).numpy()
    np.testing.assert_allclose(back, dst, atol=1e-4)


# ------------------------------------------------------------- tracklet
def _make_ref_tracklet(refs, boxes, poses, scores=None):
    LB = refs["lidar_box3d"].LiDARInstance3DBoxes
    LT = refs["lidar_tracklet"].LiDARTracklet
    n = len(boxes)
    trk = LT("seg", "trk0", 1, in_world=False,
             box_list=[LB(torch.from_numpy(boxes[i:i + 1]), box_dim=7)
                       for i in range(n)],
             ts_list=list(range(n)),
             score_list=(list(scores) if scores is not None
                         else [0.5] * n))
    trk.pose_list = [torch.from_numpy(p.astype(np.float32))
                     for p in poses]
    trk.device = "cpu"
    return trk


def test_frame_transform_executed(refs):
    """Per-frame ego boxes -> shared (middle) frame: centers via full SE(3),
    heading via the (sin, cos) unit-vector trick."""
    from objectcentricocccompletion_tpu.data.tracklet_dataset import (
        pose_transform_boxes)
    rng = np.random.RandomState(3)
    T = 11
    boxes = _rand_boxes(rng, T)
    poses = [_rand_pose(rng) for _ in range(T)]
    mid = poses[T // 2]

    trk = _make_ref_tracklet(refs, boxes, poses)
    trk.frame_transform(torch.from_numpy(mid))
    ref = np.concatenate([b.tensor.numpy() for b in trk.box_list], 0)

    got = pose_transform_boxes(boxes, np.stack(poses), np.linalg.inv(mid))
    np.testing.assert_allclose(got[:, :3], ref[:, :3], atol=1e-4)
    np.testing.assert_allclose(got[:, 3:6], ref[:, 3:6], atol=1e-6)
    # heading equality on the circle
    dh = np.abs(np.angle(np.exp(1j * (got[:, 6] - ref[:, 6]))))
    assert dh.max() < 1e-5


def test_shared2ego_executed(refs):
    """Shared-frame boxes -> per-frame ego (the eval writeback path,
    ``evalx/evaluator.py``)."""
    from objectcentricocccompletion_tpu.data.tracklet_dataset import (
        pose_transform_boxes)
    rng = np.random.RandomState(4)
    T = 9
    shared_boxes = _rand_boxes(rng, T)
    poses = [_rand_pose(rng) for _ in range(T)]
    mid = poses[T // 2]

    LB = refs["lidar_box3d"].LiDARInstance3DBoxes
    trk = _make_ref_tracklet(refs, shared_boxes, poses)
    trk.shared_pose = torch.from_numpy(mid)
    ego = trk.shared2ego(LB(torch.from_numpy(shared_boxes), box_dim=7))
    ref = ego.tensor.numpy()

    got = np.stack([
        pose_transform_boxes(shared_boxes[j:j + 1], mid[None],
                             np.linalg.inv(poses[j]))[0]
        for j in range(T)])
    np.testing.assert_allclose(got[:, :3], ref[:, :3], atol=1e-4)
    dh = np.abs(np.angle(np.exp(1j * (got[:, 6] - ref[:, 6]))))
    assert dh.max() < 1e-5


def test_update_from_prediction_executed(refs):
    """Invalid-mask frames keep the OLD box (converted to ego); valid ones
    take the new shared-frame prediction -> ego."""
    from objectcentricocccompletion_tpu.data.tracklet_dataset import (
        pose_transform_boxes)
    rng = np.random.RandomState(5)
    T = 7
    old_shared = _rand_boxes(rng, T)
    new_shared = _rand_boxes(rng, T)
    scores = rng.uniform(0.1, 0.9, T).astype(np.float32)
    poses = [_rand_pose(rng) for _ in range(T)]
    mid = poses[T // 2]
    valid = np.array([1, 0, 1, 1, 0, 1, 1], bool)

    LB = refs["lidar_box3d"].LiDARInstance3DBoxes
    trk = _make_ref_tracklet(refs, old_shared, poses)
    trk.shared_pose = torch.from_numpy(mid)
    trk.update_from_prediction(
        LB(torch.from_numpy(new_shared), box_dim=7),
        torch.from_numpy(scores), torch.zeros(T, dtype=torch.long),
        torch.from_numpy(valid))
    ref = np.concatenate(trk.box_list, 0)

    def to_ego(shared):
        return np.stack([
            pose_transform_boxes(shared[j:j + 1], mid[None],
                                 np.linalg.inv(poses[j]))[0]
            for j in range(T)])

    got = np.where(valid[:, None], to_ego(new_shared), to_ego(old_shared))
    np.testing.assert_allclose(got[:, :3], ref[:, :3], atol=1e-4)
    dh = np.abs(np.angle(np.exp(1j * (got[:, 6] - ref[:, 6]))))
    assert dh.max() < 1e-5
    got_scores = np.where(valid, scores, 0.5)
    np.testing.assert_allclose(np.asarray(trk.score_list), got_scores)


# --------------------------------------------------------- waymo .bin
def test_lidar2waymo_box_executed(refs):
    """Reference heading/center conversion vs our proto writer, field by
    field, through a byte round trip of our own encoder."""
    from objectcentricocccompletion_tpu.evalx import waymo_bin
    ds_mod = refs["waymo_tracklet_dataset"]
    label_pb2 = refs["label_pb2"]
    ds = ds_mod.WaymoTrackletDataset.__new__(ds_mod.WaymoTrackletDataset)
    ds.k2w_cls_map = {
        "Car": label_pb2.Label.TYPE_VEHICLE,
        "Pedestrian": label_pb2.Label.TYPE_PEDESTRIAN,
        "Sign": label_pb2.Label.TYPE_SIGN,
        "Cyclist": label_pb2.Label.TYPE_CYCLIST,
    }

    rng = np.random.RandomState(6)
    boxes = _rand_boxes(rng, 40)
    # keep clear of the +-pi wrap boundary: the reference normalizes with
    # truncated-pi constants (3.141592/3.141593)
    conv = -boxes[:, 6] - 0.5 * np.pi
    wrap = np.abs(np.abs(((conv + np.pi) % (2 * np.pi)) - np.pi) - np.pi)
    boxes = boxes[wrap > 1e-3][:32]

    objs = []
    for i, b in enumerate(boxes):
        o = ds.lidar2waymo_box(torch.from_numpy(b), float(i) / 100,
                               "Car", "ctx", 1000 + i)
        objs.append(o)

    ours = [waymo_bin.WaymoObject(
        box=tuple(b), score=float(i) / 100, obj_type=1, obj_id="trk0",
        context_name="ctx", timestamp_micros=1000 + i)
        for i, b in enumerate(boxes)]
    path = "/tmp/parity_test.bin"
    waymo_bin.write_bin(ours, path)
    back = waymo_bin.read_bin(path)

    assert len(back) == len(objs)
    for mine, ref in zip(back, objs):
        b = mine["box"]
        np.testing.assert_allclose(
            [b[1], b[2], b[3]],
            [ref.object.box.center_x, ref.object.box.center_y,
             ref.object.box.center_z], atol=1e-6)
        np.testing.assert_allclose(mine["score"], ref.score, atol=1e-7)
        assert mine["timestamp"] == ref.frame_timestamp_micros
        assert mine["type"] == ref.object.type == 1
        dh = abs(np.angle(np.exp(1j * (b[7] - ref.object.box.heading))))
        assert dh < 2e-5
        np.testing.assert_allclose(
            [b[5], b[4], b[6]],
            [ref.object.box.length, ref.object.box.width,
             ref.object.box.height], atol=1e-6)


# ------------------------------------------------------------ SST windows
def test_get_window_coors_executed(refs):
    """Window keys and in-window coords match the reference formula for
    both the shifted and unshifted configurations (batch index 0)."""
    from objectcentricocccompletion_tpu.ops import window as W
    rng = np.random.RandomState(7)
    sparse_shape = (30, 24, 4)          # (x, y, z)
    window_shape = (6, 6, 4)            # z == sparse z -> 2D windows
    n = 200
    coords = np.stack([rng.randint(0, sparse_shape[0], n),
                       rng.randint(0, sparse_shape[1], n),
                       rng.randint(0, sparse_shape[2], n)], 1)
    # reference coors layout: [batch, z, y, x]
    ref_coors = torch.from_numpy(np.stack(
        [np.zeros(n, np.int64), coords[:, 2], coords[:, 1],
         coords[:, 0]], 1))
    for shifted in (False, True):
        ref_keys, ref_inwin = refs["sst_ops"].get_window_coors(
            ref_coors, sparse_shape, window_shape, do_shift=shifted)
        keys, inwin = W.window_ids(
            jnp.asarray(coords, jnp.int32),
            jnp.ones(n, bool), sparse_shape, window_shape, shifted)
        np.testing.assert_array_equal(np.asarray(keys),
                                      ref_keys.numpy())
        # reference stacks (z, y, x); ours is (x, y, z)
        np.testing.assert_array_equal(np.asarray(inwin)[:, ::-1],
                                      ref_inwin.numpy())


def test_flat2window_roundtrip_vs_reference(refs):
    """The reference flat->window->flat chain is the identity, and our
    partition groups voxels into exactly the same windows with the same
    in-window ranks (order-preserving)."""
    from objectcentricocccompletion_tpu.ops import window as W
    rng = np.random.RandomState(8)
    sparse_shape = (20, 16, 4)
    window_shape = (5, 4, 4)
    n = 120
    coords = np.unique(np.stack(
        [rng.randint(0, sparse_shape[0], n),
         rng.randint(0, sparse_shape[1], n),
         rng.randint(0, sparse_shape[2], n)], 1), axis=0)
    n = len(coords)
    feats = rng.randn(n, 8).astype(np.float32)

    ref_coors = torch.from_numpy(np.stack(
        [np.zeros(n, np.int64), coords[:, 2], coords[:, 1],
         coords[:, 0]], 1))
    keys, _ = refs["sst_ops"].get_window_coors(
        ref_coors, sparse_shape, window_shape, do_shift=False)
    keys_c = refs["sst_ops"].make_continuous_inds(keys.long())
    cap = 64
    drop_info = {0: {"max_tokens": cap, "drop_range": (0, 100000)}}
    drop_lvl = torch.zeros(n, dtype=torch.long)
    inds = refs["sst_ops"].get_flat2win_inds(
        keys_c, drop_lvl, drop_info, debug=True)
    ref_win = refs["sst_ops"].flat2window(
        torch.from_numpy(feats), drop_lvl, inds, drop_info)
    ref_flat = refs["sst_ops"].window2flat(ref_win, inds).numpy()
    np.testing.assert_allclose(ref_flat, feats)   # reference round trip

    part = W.partition(jnp.asarray(coords, jnp.int32), jnp.ones(len(coords), bool),
                       sparse_shape, window_shape, False,
                       max_windows=64, capacity=cap)
    wf, _mask = W.flat_to_window(jnp.asarray(feats), part, 64, cap)
    flat_back = W.window_to_flat(wf, part, len(coords))
    np.testing.assert_allclose(np.asarray(flat_back), feats)  # ours too

    # same grouping: reference window id <-> our window slot is a bijection
    ours_win = np.asarray(part.win_of_voxel)
    assert (ours_win >= 0).all()
    ref_ids = keys_c.numpy()
    pairs = set(zip(ref_ids.tolist(), ours_win.tolist()))
    assert len(pairs) == len(set(ref_ids.tolist())) == \
        len(set(ours_win.tolist()))
    # in-window ranks: the reference CUDA ingroup op is order-preserving;
    # ours must rank voxels by original order within each window too
    ranks = np.asarray(part.rank_in_win)
    for wid in np.unique(ours_win):
        members = np.nonzero(ours_win == wid)[0]
        assert (np.sort(ranks[members]) == np.arange(len(members))).all()
        assert (np.argsort(ranks[members]) == np.arange(len(members))).all()


def test_merge_augs_weighted_executed(refs):
    """TTA merge — the REFERENCE ``LiDARTracklet.merge_augs`` with the
    shipped ``merge='weighted'`` cfg (``ctrl_veh_24e.py:158-160``:
    score-weighted 6-dim geometry mean, median yaw, mean scores) vs our
    ``evalx.tta.merge_boxes_weighted`` on identical aug predictions."""
    from objectcentricocccompletion_tpu.evalx.tta import (
        merge_boxes_weighted)
    import jax.numpy as jnp

    rng = np.random.RandomState(11)
    A, T = 4, 9
    boxes = [_rand_boxes(rng, T) for _ in range(A)]
    scores = [(rng.rand(T) + 0.1).astype(np.float32) for _ in range(A)]
    LT = refs["lidar_tracklet"].LiDARTracklet
    trks = []
    for a in range(A):
        trk = _make_ref_tracklet(refs, boxes[a], [np.eye(4)] * T,
                                 scores=list(scores[a]))
        # merge_augs consumes numpy [1, 7] rows in box_list
        trk.box_list = [boxes[a][i:i + 1] for i in range(T)]
        trks.append(trk)
    merged = LT.merge_augs(trks, {"merge": "weighted"})
    ref_boxes = np.concatenate(merged.box_list, 0)
    ref_scores = np.asarray(merged.score_list, np.float32)

    got_b, got_s = merge_boxes_weighted(
        [jnp.asarray(b) for b in boxes], [jnp.asarray(s) for s in scores])
    np.testing.assert_allclose(np.asarray(got_b), ref_boxes, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_s), ref_scores, atol=1e-6)


def test_point_coder_executed_roundtrip(refs):
    """``BasePointBBoxCoder`` (FSD cluster head coder) — our encode fed to
    the REFERENCE decode reproduces the box, and encodes match
    elementwise."""
    import jax.numpy as jnp
    from objectcentricocccompletion_tpu.core.coder import (
        point_decode, point_encode)
    from refstub import _load

    mod = _load("core/bbox/coders/base_point_bbox_coder.py",
                "mmdet3d.core.bbox.coders.base_point_bbox_coder")
    coder = mod.BasePointBBoxCoder(code_size=8)
    rng = np.random.RandomState(7)
    boxes = _rand_boxes(rng, 40)
    base = boxes[:, :3] + rng.uniform(-1, 1, (40, 3)).astype(np.float32)

    ours_enc = np.asarray(point_encode(jnp.asarray(boxes),
                                       jnp.asarray(base)))
    ref_enc = coder.encode(torch.from_numpy(boxes),
                           torch.from_numpy(base)).numpy()
    np.testing.assert_allclose(ours_enc, ref_enc, atol=1e-5)

    back_ref = coder.decode(torch.from_numpy(ours_enc),
                            torch.from_numpy(base)).numpy()
    back_ours = np.asarray(point_decode(jnp.asarray(ref_enc),
                                        jnp.asarray(base)))
    for back in (back_ref, back_ours):
        np.testing.assert_allclose(back[:, :6], boxes[:, :6], atol=1e-4)
        dyaw = np.abs(((back[:, 6] - boxes[:, 6]) + np.pi) % (2 * np.pi)
                      - np.pi)
        assert dyaw.max() < 1e-4
