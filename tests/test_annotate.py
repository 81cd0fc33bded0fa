"""Occupancy GT annotator: geometric semantics on a constructed scene.

A static box observed by a single overhead-mounted LiDAR: voxels on the
visible surface must be occupied (1), voxels between sensor and surface
free (2), voxels behind the surface unknown (0)."""
import numpy as np
import pytest

from objectcentricocccompletion_tpu.tools_occ.annotate import (
    OccAnnotator, local_frame_points, points_in_box_mask)


def make_scene():
    """Box 4x2x2 at (10, 0, 0) yaw=0; sensor at origin, 1.0 m up.

    The sensor sees the -x face of the box (facing the sensor). Points lie
    on that face; rays pass freely through space before it.
    """
    T = 12
    box = np.array([10.0, 0.0, -1.0, 4.0, 2.0, 2.0, 0.0], np.float32)
    boxes = np.tile(box, (T, 1))
    ts_list = list(range(T))

    # points on the -x face: x = 10 - 2, y in [-1, 1], z in [-1, 1]
    rng = np.random.RandomState(0)
    ny, nz = 40, 40
    y = rng.uniform(-0.99, 0.99, ny * nz)
    z = rng.uniform(-0.99, 0.99, ny * nz)
    face_pts = np.stack([np.full_like(y, 8.0 + 1e-3), y, z - 0.0], -1)
    # face z range: box z bottom=-1, h=2 -> z in [-1, 1]
    face_pts[:, 2] = rng.uniform(-0.99, 0.99, ny * nz)

    def get_points(ts):
        return face_pts

    # range image: sensor at origin, extrinsic = identity with z offset
    H, W = 64, 2650
    extrinsic = np.eye(4)
    incl = np.linspace(-0.3, 0.3, H)   # ascending after flip
    # virtual range image: every beam sees exactly the face at range ~8
    ri = np.full((H, W), 8.1, np.float32)

    def get_raw_frame(ts):
        return {
            "TOP_BEAM_INCLINATION": np.flip(incl).copy(),  # stored descending
            "TOP_LIDAR_EXTRINSIC": extrinsic,
            "TOP_RANGE_IMAGE_MERGE_VIRTUAL": ri,
        }

    return boxes, ts_list, get_points, get_raw_frame


def test_local_frame_and_inbox():
    box = np.array([5.0, 3.0, -1.0, 2.0, 4.0, 2.0, np.pi / 2], np.float32)
    p_ctr = np.array([[5.0, 3.0, 0.0]])      # gravity center
    local = local_frame_points(p_ctr, box)
    np.testing.assert_allclose(local, [[0, 0, 1.0]], atol=1e-6)
    assert points_in_box_mask(p_ctr, box)[0]
    # outside along the rotated width axis
    p_out = np.array([[5.0, 3.0 + 1.5, 0.0]])  # after 90deg, w/2=1 along y
    assert not points_in_box_mask(p_out, box)[0]


def test_annotator_see_through_marks_free(tmp_path):
    """Range image reads 100 m everywhere -> every ray passes through the
    box, so all non-occupied voxels are free (2)."""
    boxes, ts_list, get_points, get_raw_frame = make_scene()

    def far_frame(ts):
        f = dict(get_raw_frame(ts))
        f["TOP_RANGE_IMAGE_MERGE_VIRTUAL"] = np.full((64, 2650), 100.0,
                                                     np.float32)
        return f

    ann = OccAnnotator(get_points, far_frame, str(tmp_path),
                       voxel_size=0.2, lidar_names=("TOP",))
    out = ann.annotate_trk("seg-free", "trk-1", boxes, ts_list)
    occ = np.load(out)["occ"]
    assert occ.shape == (20, 10, 10)
    face = occ[0]
    assert (face == 1).mean() > 0.8, (face == 1).mean()   # observed surface
    assert (occ == 0).sum() == 0                          # nothing unknown
    assert (occ == 2).sum() > 0                           # free exists


def test_annotator_blocked_rays_mark_unknown(tmp_path):
    """Range image reads 7 m (rays stop before the box at ~8 m) -> all
    non-occupied voxels stay unknown (0)."""
    boxes, ts_list, get_points, get_raw_frame = make_scene()

    def near_frame(ts):
        f = dict(get_raw_frame(ts))
        f["TOP_RANGE_IMAGE_MERGE_VIRTUAL"] = np.full((64, 2650), 7.0,
                                                     np.float32)
        return f

    ann = OccAnnotator(get_points, near_frame, str(tmp_path),
                       voxel_size=0.2, lidar_names=("TOP",))
    out = ann.annotate_trk("seg-occl", "trk-1", boxes, ts_list)
    occ = np.load(out)["occ"]
    assert (occ == 2).sum() == 0
    assert (occ == 0).sum() > 0
    assert (occ == 1).sum() > 0


def test_annotator_skips_short_tracks(tmp_path):
    boxes, ts_list, get_points, get_raw_frame = make_scene()
    ann = OccAnnotator(get_points, get_raw_frame, str(tmp_path),
                       min_track_len=100)
    assert ann.annotate_trk("seg", "trk", boxes, ts_list) is None


def test_annotator_idempotent(tmp_path):
    boxes, ts_list, get_points, get_raw_frame = make_scene()
    ann = OccAnnotator(get_points, get_raw_frame, str(tmp_path),
                       lidar_names=("TOP",))
    p1 = ann.annotate_trk("seg", "trk", boxes, ts_list)
    m1 = np.load(p1)["occ"].copy()
    p2 = ann.annotate_trk("seg", "trk", boxes, ts_list)  # cached, no rewrite
    np.testing.assert_array_equal(m1, np.load(p2)["occ"])


def test_range_image_projection_roundtrip():
    """A point projected into a range image it built must be 'visible' at
    exactly its own range; points behind it occluded (the W0 <-> W1 seam)."""
    from objectcentricocccompletion_tpu.tools_occ.range_image import (
        build_virtual_range_image, project_to_range_image)
    rng = np.random.RandomState(0)
    extrinsic = np.eye(4)
    incl = np.linspace(-0.4, 0.4, 64)
    pts = rng.uniform(-1, 1, (500, 3))
    pts[:, 0] = rng.uniform(5, 15, 500)   # in front of sensor
    ri = build_virtual_range_image(pts, extrinsic, incl, 2650)
    rows, cols, ranges = project_to_range_image(pts, extrinsic, incl, 2650)
    vals = ri[rows, cols]
    # every cell's stored range is the min over its points -> <= point range
    assert (vals <= ranges + 1e-5).all()
    assert (vals > 0).all()
    # a point pushed 2x farther along the same ray becomes occluded
    far = pts * 2.0
    fr, fc, frange = project_to_range_image(far, extrinsic, incl, 2650)
    assert (ri[fr, fc] < frange - 1.0).mean() > 0.95


def test_annotator_mean_var_dump(tmp_path):
    """save_mean_var: npz gains mean_var [X, Y, Z, 6] with per-occupied-
    voxel mean and variance of the aggregated local points (reference
    occ_annotate.py:627-645)."""
    boxes, ts_list, get_points, get_raw_frame = make_scene()
    ann = OccAnnotator(get_points, get_raw_frame, str(tmp_path),
                       voxel_size=0.2, lidar_names=("TOP",),
                       save_mean_var=True)
    out = ann.annotate_trk("seg-mv", "trk-1", boxes, ts_list)
    data = np.load(out)
    occ, mv = data["occ"], data["mean_var"]
    assert mv.shape == occ.shape + (6,)
    occupied = occ == 1
    # every occupied voxel has a mean inside its own cell bounds
    means = mv[occupied][:, :3]
    assert (np.abs(means).max() < max(occ.shape) * 0.2 + 1e-6)
    assert (mv[occupied][:, 3:] >= 0).all()          # variances
    assert not mv[~occupied].any()                   # zeros elsewhere
    # spot-check one voxel against a direct computation
    pts = get_points(ts_list[0])
    from objectcentricocccompletion_tpu.tools_occ.annotate import (
        local_frame_points, points_in_box_mask)
    local = np.concatenate([
        local_frame_points(pts[points_in_box_mask(pts, boxes[i])],
                           boxes[i]) for i in range(len(boxes))], 0)
    size = boxes[:, 3:6].max(0)
    dims = np.maximum(np.ceil(size / 0.2).astype(int), 1)
    min_bound = np.array([-size[0] / 2, -size[1] / 2, 0.0])
    coors = np.floor((local - min_bound) / 0.2).astype(int)
    ok = ((coors >= 0) & (coors < dims)).all(1)
    coors, local = coors[ok], local[ok]
    ix = tuple(coors[0])
    sel = (coors == coors[0]).all(1)
    np.testing.assert_allclose(mv[ix][:3], local[sel].mean(0), atol=1e-5)
    np.testing.assert_allclose(mv[ix][3:], local[sel].var(0), atol=1e-5)
