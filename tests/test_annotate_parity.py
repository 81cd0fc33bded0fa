"""Executed-parity of the W1 annotator math against the REFERENCE code.

Each test runs the reference's real torch implementation (loaded via
``refstub.load_occ_annotate``) and asserts our implementation matches:

  * ``point_cloud_to_range_image_idx`` (``tools/occ/occ_annotate.py:141-201``)
    vs ``tools_occ.range_image.project_to_range_image`` — the row/column/range
    projection every occupancy label is ray-cast through,
  * the box-local frame pair (``get_local_point_list`` ego->local,
    ``annotate_trk`` local->ego, ``occ_annotate.py:110-121,485-499``) vs
    ``tools_occ.annotate.local_frame_points`` and the jitted visibility
    transform,
  * the full multi-frame multi-sensor visibility merge
    (``occ_annotate.py:525-563``) vs ``OccAnnotator._visibility``, with the
    referee's gather/max built on the EXECUTED reference projection.

These decide the {unknown, occupied, free} labels of every training target,
so hand-derived tests are not enough.
"""
import os
import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from refstub import load_occ_annotate, load_reference  # noqa: E402

from objectcentricocccompletion_tpu.tools_occ.annotate import (  # noqa: E402
    OccAnnotator, local_frame_points, _range_image_visibility)
from objectcentricocccompletion_tpu.tools_occ.range_image import (  # noqa: E402,E501
    project_to_range_image)


@pytest.fixture(scope="module")
def ref_annot():
    return load_occ_annotate()


def _rigid(rng, yaw_scale=np.pi):
    """Random rigid extrinsic [4, 4] with a dominant yaw and a small tilt."""
    a = rng.uniform(-yaw_scale, yaw_scale)
    b, c = rng.uniform(-0.05, 0.05, 2)
    ca, sa = np.cos(a), np.sin(a)
    cb, sb = np.cos(b), np.sin(b)
    cc, sc = np.cos(c), np.sin(c)
    rz = np.array([[ca, -sa, 0], [sa, ca, 0], [0, 0, 1.0]])
    ry = np.array([[cb, 0, sb], [0, 1, 0], [-sb, 0, cb]])
    rx = np.array([[1, 0, 0], [0, cc, -sc], [0, sc, cc]])
    ex = np.eye(4)
    ex[:3, :3] = rz @ ry @ rx
    ex[:3, 3] = rng.uniform(-3, 3, 3)
    return ex


def _sensor_points(rng, extrinsic, incl, n):
    """Points in the EGO frame whose sensor-frame angles are adversarial:
    random plus azimuths near +-pi (the wrap/fmod corner) plus inclinations
    at beam midpoints (the argmin corner) and beyond both beam extremes."""
    az_corr = np.arctan2(extrinsic[1, 0], extrinsic[0, 0])
    az = rng.uniform(-np.pi, np.pi, n)
    # corner azimuths: land AFTER correction near the +-pi wrap
    for k, eps in enumerate([1e-6, -1e-6, 1e-3, -1e-3, 0.49999, -0.49999]):
        az[k] = np.pi - az_corr + eps
    az = (az + np.pi) % (2 * np.pi) - np.pi
    th = rng.uniform(incl.min() - 0.1, incl.max() + 0.1, n)
    # corner inclinations: near midpoints of adjacent beams (offset so the
    # argmin is well-defined in f64 on both sides)
    mids = (incl[:-1] + incl[1:]) / 2
    for k in range(min(8, len(mids))):
        th[n - 1 - 2 * k] = mids[k] + 1e-9
        th[n - 2 - 2 * k] = mids[k] - 1e-9
    r = rng.uniform(0.5, 80.0, n)
    ps = np.stack([r * np.cos(th) * np.cos(az), r * np.cos(th) * np.sin(az),
                   r * np.sin(th)], -1)
    return ps @ extrinsic[:3, :3].T + extrinsic[:3, 3]


def test_projection_executed(ref_annot):
    rng = np.random.default_rng(0)
    H, W = 24, 160
    frames = []
    for _ in range(3):
        ex = _rigid(rng)
        incl = np.sort(rng.uniform(-0.35, 0.04, H))
        frames.append((ex, incl, _sensor_points(rng, ex, incl, 400)))

    pts = torch.tensor(np.stack([f[2] for f in frames]), dtype=torch.float64)
    exs = torch.tensor(np.stack([f[0] for f in frames]), dtype=torch.float64)
    incls = torch.tensor(np.stack([f[1] for f in frames]),
                         dtype=torch.float64)
    ref_idx, ref_rng = ref_annot.point_cloud_to_range_image_idx(
        pts, exs, incls, (H, W))

    for b, (ex, incl, p) in enumerate(frames):
        rows, cols, ranges = project_to_range_image(p, ex, incl, W)
        np.testing.assert_array_equal(rows, ref_idx[b, :, 0].numpy())
        np.testing.assert_array_equal(cols, ref_idx[b, :, 1].numpy())
        np.testing.assert_allclose(ranges, ref_rng[b].numpy(), rtol=1e-12)


def test_local_frame_executed(ref_annot):
    """Our ego->box-local transform vs the reference's translate+rotate pair
    (``get_local_point_list`` :110-121) executed through the real
    LiDARInstance3DBoxes."""
    refs = load_reference()
    rng = np.random.default_rng(1)
    box = np.array([rng.uniform(-20, 20), rng.uniform(-20, 20),
                    rng.uniform(-2, 2), 4.6, 2.1, 1.8,
                    rng.uniform(-np.pi, np.pi)])
    pts = rng.uniform(-30, 30, (200, 3))

    b = refs["lidar_box3d"].LiDARInstance3DBoxes(
        torch.tensor(box, dtype=torch.float32)[None])
    t = torch.tensor(pts, dtype=torch.float32)
    origin = b.tensor[:, :3]
    bb = b.clone()
    local = t + (-origin)
    bb.translate(-origin[0])
    local, _ = bb.rotate(-b.tensor[0, 6], local)

    ours = local_frame_points(pts, box)
    np.testing.assert_allclose(ours, local.numpy(), atol=1e-4)

    # and the inverse used by the visibility pass (:485-499): reference
    # rotates with the explicit rot_mat_T then translates
    rz = torch.tensor(box[6])
    rs, rc = torch.sin(rz), torch.cos(rz)
    m = torch.tensor([[rc, -rs, 0], [rs, rc, 0], [0, 0, 1]],
                     dtype=torch.float32)
    back = local @ m + origin
    np.testing.assert_allclose(back.numpy(), pts, rtol=0, atol=1e-4)

    # ours goes back inside the jitted visibility kernel; check one frame
    # by ray-casting against an all-seeing range image (every center free)
    ri = np.full((4, 16), 1e6, np.float32)
    incl = np.linspace(-0.3, 0.3, 4)
    vis = np.asarray(_range_image_visibility(
        ours[:8].astype(np.float32), box[None].astype(np.float32),
        np.eye(4, dtype=np.float32)[None],
        incl[None].astype(np.float32), ri[None], 16))
    assert (vis == 2).all()


def test_visibility_merge_executed(ref_annot):
    """Full multi-frame multi-sensor merge vs a referee whose projection is
    the EXECUTED reference function and whose gather/max follows
    ``occ_annotate.py:525-563``: >= means free, max over frames per sensor,
    max over sensors, occupied voxels stay 1."""
    rng = np.random.default_rng(2)
    T = 3
    boxes = np.stack([
        np.array([rng.uniform(-15, 15), rng.uniform(-15, 15),
                  rng.uniform(-1, 1), 4.6, 2.1, 1.8,
                  rng.uniform(-np.pi, np.pi)]) for _ in range(T)])
    sensors = {"TOP": (16, 128), "FRONT": (8, 64)}

    # voxel-center cloud in the shared box-local frame (z from bottom)
    n = 240
    centers = np.stack([rng.uniform(-2.3, 2.3, n), rng.uniform(-1.05, 1.05, n),
                        rng.uniform(0, 1.8, n)], -1)

    raw = []  # per frame: dict as stored by W0 (descending inclinations)
    per_sensor = {}
    for name, (H, W) in sensors.items():
        exs = np.stack([_rigid(rng) for _ in range(T)])
        incl = np.sort(rng.uniform(-0.35, 0.04, H))
        per_sensor[name] = (exs, incl, rng.uniform(
            2.0, 90.0, (T, H, W)).astype(np.float32))
    for t in range(T):
        d = {}
        for name, (H, W) in sensors.items():
            exs, incl, ris = per_sensor[name]
            d[f"{name}_LIDAR_EXTRINSIC"] = exs[t]
            d[f"{name}_BEAM_INCLINATION"] = incl[::-1].copy()  # stored desc
            d[f"{name}_RANGE_IMAGE_MERGE_VIRTUAL"] = ris[t]
        raw.append(d)

    # ---- referee: reference projection + reference merge semantics ----
    # local -> per-frame ego with the reference's rot_mat_T (validated above)
    ego = np.stack([
        centers @ np.array([[np.cos(b[6]), -np.sin(b[6]), 0],
                            [np.sin(b[6]), np.cos(b[6]), 0],
                            [0, 0, 1.0]]) + b[:3] for b in boxes])
    ref_vis_per_sensor = []
    margins = np.full(n, np.inf)
    for name, (H, W) in sensors.items():
        exs, incl, ris = per_sensor[name]
        idx, rng_ref = ref_annot.point_cloud_to_range_image_idx(
            torch.tensor(ego, dtype=torch.float64),
            torch.tensor(exs, dtype=torch.float64),
            torch.tensor(np.broadcast_to(incl, (T, H)).copy(),
                         dtype=torch.float64), (H, W))
        idx, rng_ref = idx.numpy(), rng_ref.numpy()
        vals = ris[np.arange(T)[:, None], idx[..., 0], idx[..., 1]]
        vis = np.where(vals >= rng_ref, 2, 0).max(0)
        ref_vis_per_sensor.append(vis)
        margins = np.minimum(margins, np.abs(vals - rng_ref).min(0))
    ref_vis = np.stack(ref_vis_per_sensor).max(0)

    # ---- ours ----
    ann = OccAnnotator(get_points=None, get_raw_frame=lambda ts: raw[ts],
                       out_dir="/tmp/unused", lidar_names=tuple(sensors))
    ours = ann._visibility(centers, boxes, list(range(T)), "seg")

    # exclude points whose free/blocked decision sits within f32 noise of
    # the range threshold (ours runs f32; the referee is f64)
    solid = margins > 0.02
    assert solid.mean() > 0.9
    np.testing.assert_array_equal(ours[solid], ref_vis[solid])
