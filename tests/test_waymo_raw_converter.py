"""W0 proof: synthetic-tfrecord fixture round trip.

Hand-encodes waymo ``Frame`` protos (the field subset of the public
dataset.proto), wraps them in TFRecord framing, runs the self-contained
converter (``tools_occ/waymo_raw_converter.py``), and checks
  * tfrecord framing + proto wire parsing recover calibrations exactly,
  * the virtual range image reproduces the source ranges,
  * the produced raw pkls drive the occ annotator end-to-end
    (tfrecord -> raw pkl -> visibility classes).
"""
import os
import pickle
import struct
import zlib

import numpy as np

from objectcentricocccompletion_tpu.tools_occ import waymo_raw_converter as wc
from objectcentricocccompletion_tpu.tools_occ.range_image import (
    project_to_range_image, range_image_to_points)


# ----------------------------------------------------------- proto writer
def _vint(v):
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _key(field, wire):
    return _vint((field << 3) | wire)


def _bytes_f(field, payload):
    return _key(field, 2) + _vint(len(payload)) + payload


def _double_f(field, v):
    return _key(field, 1) + struct.pack("<d", v)


def _int_f(field, v):
    return _key(field, 0) + _vint(v)


def encode_matrix_float(arr):
    data = np.asarray(arr, "<f4").reshape(-1).tobytes()
    dims = b"".join(_vint(d) for d in arr.shape)
    shape = _bytes_f(1, dims)
    return _bytes_f(1, data) + _bytes_f(2, shape)


def encode_range_image(arr):
    return _bytes_f(2, zlib.compress(encode_matrix_float(arr)))


def encode_calibration(name, inclinations, extrinsic):
    packed = np.asarray(inclinations, "<f8").tobytes()
    ext = _bytes_f(1, np.asarray(extrinsic, "<f8").reshape(-1).tobytes())
    return (_int_f(1, name) + _bytes_f(2, packed)
            + _double_f(3, float(np.min(inclinations)))
            + _double_f(4, float(np.max(inclinations)))
            + _bytes_f(5, ext))


def encode_frame(ts, calibrations, lasers):
    """calibrations: list[(name, incl, extrinsic)];
    lasers: list[(name, ri1 [H,W,C], ri2|None)]."""
    ctx = b"".join(_bytes_f(3, encode_calibration(*c)) for c in calibrations)
    out = _bytes_f(1, ctx) + _int_f(2, ts)
    for name, ri1, ri2 in lasers:
        laser = _int_f(1, name) + _bytes_f(2, encode_range_image(ri1))
        if ri2 is not None:
            laser += _bytes_f(3, encode_range_image(ri2))
        out += _bytes_f(5, laser)
    return out


def make_range_image(H, W, points_ego, extrinsic, incl_desc):
    rows, cols, rng = project_to_range_image(points_ego, extrinsic,
                                             incl_desc, W)
    ri = np.zeros((H, W, 4), np.float32)
    for r, c, d in zip(rows, cols, rng):
        if ri[r, c, 0] == 0 or d < ri[r, c, 0]:
            ri[r, c, 0] = d
    return ri


def test_tfrecord_roundtrip(tmp_path):
    path = str(tmp_path / "f.tfrecord")
    recs = [b"hello", b"x" * 1000, b""]
    wc.write_tfrecord(path, recs)
    assert list(wc.read_tfrecord(path)) == recs


def test_frame_proto_roundtrip(tmp_path):
    H, W = 8, 64
    incl = np.linspace(-0.3, 0.2, H)
    ext = np.eye(4)
    ext[:3, 3] = [1.0, 0.5, 2.0]
    ri = np.zeros((H, W, 4), np.float32)
    ri[3, 10, 0] = 12.5
    buf = encode_frame(777, [(1, incl, ext)], [(1, ri, None)])
    frame = wc.parse_frame(buf)
    assert frame["timestamp"] == 777
    cal = frame["calibrations"][1]
    np.testing.assert_allclose(cal["inclinations"], incl)
    np.testing.assert_allclose(cal["extrinsic"], ext)
    ri1, ri2 = frame["lasers"][1]
    assert ri2 is None
    np.testing.assert_allclose(ri1, ri)


def test_range_image_point_roundtrip():
    rng = np.random.RandomState(0)
    H, W = 32, 256
    incl_desc = np.flip(np.linspace(-0.3, 0.25, H))
    ext = np.eye(4)
    pts = rng.uniform(-20, 20, (200, 3))
    pts[:, 2] = rng.uniform(-1, 3, 200)
    ri = make_range_image(H, W, pts, ext, incl_desc)
    back = range_image_to_points(ri[..., 0], ext, incl_desc)
    # every reconstructed point must project back onto the same cell with
    # the same range
    rows, cols, rngs = project_to_range_image(back, ext, incl_desc, W)
    np.testing.assert_allclose(ri[rows, cols, 0], rngs, rtol=1e-5)


def _write_fixture_tfrecord(path, n_frames=3):
    """A tiny one-lidar segment: a wall of points at x = 10 m."""
    H, W = 16, 128
    incl_desc = np.flip(np.linspace(-0.2, 0.2, H))
    ext = np.eye(4)
    yy, zz = np.meshgrid(np.linspace(-3, 3, 40), np.linspace(-0.5, 1.5, 10))
    wall = np.stack([np.full(yy.size, 10.0), yy.ravel(), zz.ravel()], -1)
    frames = []
    for i in range(n_frames):
        ri1 = make_range_image(H, W, wall, ext, incl_desc)
        # second return slightly farther — merge must keep the minimum
        ri2 = make_range_image(H, W, wall + [0.5, 0, 0], ext, incl_desc)
        frames.append(encode_frame(
            1000 + i, [(1, np.linspace(-0.2, 0.2, H), ext)],
            [(1, ri1, ri2)]))
    wc.write_tfrecord(path, frames)
    return H, W, wall


def test_convert_segment_and_annotate(tmp_path):
    """Full W0 -> W1 chain: synthetic tfrecord -> raw pkls -> annotator."""
    tf_path = str(tmp_path / "seg-0.tfrecord")
    H, W, wall = _write_fixture_tfrecord(tf_path)
    out_dir = str(tmp_path / "raw")
    n = wc.convert_segment(tf_path, out_dir, "0000")
    assert n == 3
    pkls = sorted(os.listdir(out_dir))
    assert len(pkls) == 3
    with open(os.path.join(out_dir, pkls[0]), "rb") as f:
        raw = pickle.load(f)
    assert raw["TOP_BEAM_INCLINATION"].shape == (H,)
    vri = raw["TOP_RANGE_IMAGE_MERGE_VIRTUAL"]
    assert vri.shape == (H, W)
    # the wall sits ~10 m out; both returns merged by minimum
    hit = vri[vri > 0]
    assert len(hit) > 50
    assert np.all(hit > 9.0) and np.all(hit < 11.5)

    # ---- annotator consumes the converted raw frames ----
    from objectcentricocccompletion_tpu.tools_occ.annotate import (
        OccAnnotator)
    ts_list = [1000, 1001, 1002]
    raw_frames = {}
    for ts, p in zip(ts_list, pkls):
        with open(os.path.join(out_dir, p), "rb") as f:
            raw_frames[ts] = pickle.load(f)

    # a box hanging in front of the wall with a couple of surface points:
    # rays pass through the rest of it to the wall behind -> the unoccupied
    # voxels must classify as FREE (2)
    box = np.asarray([6.0, 0.0, -0.4, 1.2, 1.2, 1.0, 0.0], np.float32)
    boxes = np.tile(box, (3, 1))
    inbox = np.asarray([[6.0, 0.0, 0.0], [6.1, 0.1, 0.1]], np.float32)

    def get_points(ts):
        return inbox

    def get_raw_frame(ts):
        return raw_frames[ts]

    ann = OccAnnotator(get_points, get_raw_frame, str(tmp_path / "occ"),
                       min_track_len=1)
    out = ann.annotate_trk("seg-0", "trk-0", boxes, ts_list)
    occ = np.load(out)["occ"]
    frac_free = (occ == 2).mean()
    assert frac_free > 0.5, f"expected mostly free, got {frac_free}"


def encode_frame_with_pose(ts, calibrations, lasers, frame_pose=None,
                           pixel_pose=None):
    """encode_frame + Frame.pose (field 3) and the TOP return-1
    range_image_pose_compressed (RangeImage field 4)."""
    ctx = b"".join(_bytes_f(3, encode_calibration(*c)) for c in calibrations)
    out = _bytes_f(1, ctx) + _int_f(2, ts)
    if frame_pose is not None:
        tr = _bytes_f(1, np.asarray(frame_pose, "<f8").reshape(-1).tobytes())
        out += _bytes_f(3, tr)
    for name, ri1, ri2 in lasers:
        ri1_msg = encode_range_image(ri1)
        if pixel_pose is not None and name == 1:
            ri1_msg += _bytes_f(4, zlib.compress(
                encode_matrix_float(pixel_pose)))
        laser = _int_f(1, name) + _bytes_f(2, ri1_msg)
        if ri2 is not None:
            laser += _bytes_f(3, encode_range_image(ri2))
        out += _bytes_f(5, laser)
    return out


def test_rolling_shutter_pose_correction_math():
    """Per-pixel pose correction: vehicle -> pixel world pose -> back
    through the frame pose (official extract_point_cloud semantics)."""
    from objectcentricocccompletion_tpu.tools_occ.range_image import \
        rollpitchyaw_to_matrices
    rng = np.random.RandomState(1)
    H, W = 16, 128
    incl_desc = np.flip(np.linspace(-0.3, 0.25, H))
    ext = np.eye(4)
    pts = rng.uniform(-15, 15, (100, 3))
    pts[:, 2] = rng.uniform(-1, 3, 100)
    ri = make_range_image(H, W, pts, ext, incl_desc)

    # constant rigid pixel pose (yaw + translation), frame pose = another
    yaw = 0.3
    pose6 = np.zeros((H, W, 6), np.float32)
    pose6[..., 2] = yaw
    pose6[..., 3:6] = [5.0, -2.0, 0.5]
    frame_pose = np.eye(4)
    frame_pose[:3, 3] = [1.0, 2.0, 0.0]

    plain = range_image_to_points(ri[..., 0], ext, incl_desc)
    corr = range_image_to_points(ri[..., 0], ext, incl_desc, pose6,
                                 frame_pose)
    R, t = rollpitchyaw_to_matrices(pose6.reshape(-1, 6)[:1])
    expect = plain @ R[0].T + t[0] - frame_pose[:3, 3]
    np.testing.assert_allclose(corr, expect, atol=1e-5)

    # all-zero pose rows stay uncorrected
    corr0 = range_image_to_points(ri[..., 0], ext, incl_desc,
                                  np.zeros((H, W, 6)), frame_pose)
    np.testing.assert_allclose(corr0, plain, atol=1e-6)


def test_frame_proto_pose_parsing_and_conversion():
    H, W = 8, 64
    incl = np.linspace(-0.3, 0.2, H)
    ext = np.eye(4)
    ri = np.zeros((H, W, 4), np.float32)
    ri[3, 10, 0] = 12.5
    pose6 = np.zeros((H, W, 6), np.float32)
    pose6[..., 2] = 0.1
    frame_pose = np.eye(4)
    frame_pose[:3, 3] = [10.0, 0.0, 0.0]
    buf = encode_frame_with_pose(5, [(1, incl, ext)], [(1, ri, None)],
                                 frame_pose, pose6)
    frame = wc.parse_frame(buf)
    np.testing.assert_allclose(frame["pose"], frame_pose)
    np.testing.assert_allclose(frame["top_pixel_pose"], pose6)
    # frame_to_raw consumes the pose without error and produces the TOP
    # virtual range image
    out = wc.frame_to_raw(frame)
    assert "TOP_RANGE_IMAGE_MERGE_VIRTUAL" in out
