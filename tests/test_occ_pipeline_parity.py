"""Executed-parity of the occ-label training pipeline against the REFERENCE.

Runs the reference's real ``LoadAnnotationsOcc`` / ``MirrorOccLabel`` /
``RandomSampleOccPoints`` (``mmdet3d/datasets/pipelines/occ_pinelines.py``,
loaded via ``refstub.load_occ_pipelines``) and asserts our
``TrackletDataset.sample_occ`` / ``_load_occ_grid`` / ``mirror_occ_label``
produce the same supervision:

  * the valid (known) voxel-center set and labels in the grid's
    gravity-centered frame (the ``num_sample_points=-1`` path is
    deterministic — it emits EVERY known center),
  * ``occ_sizes`` (grid dims x voxel, NOT the box size),
  * the confidence score chain (label_iou / compute_score known-fraction /
    degenerate-grid zeroing),
  * balanced sampling counts and support,
  * the mirror fill on even-X grids — and a pinned record of the
    reference's odd-X truncation quirk, which our true mirror does not
    reproduce (no reference config enables mirroring, so this is an
    optional-path divergence, kept deliberately and documented here).
"""
import os
import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from refstub import load_occ_pipelines  # noqa: E402

from objectcentricocccompletion_tpu.configs.ococcnet_config import (  # noqa: E402,E501
    OcOccNetConfig)
from objectcentricocccompletion_tpu.data.tracklet_dataset import (  # noqa: E402,E501
    TrackletDataset, mirror_occ_label)


@pytest.fixture(scope="module")
def ref_pipe():
    return load_occ_pipelines()


def _make_grid(rng, shape, p_unknown=0.45, p_occ=0.25):
    u = rng.random(shape)
    occ = np.zeros(shape, np.int32)
    occ[u >= p_unknown] = 2
    occ[u >= 1 - p_occ] = 1
    return occ


def _our_dataset(tmp_path, mirror=False, compute_score=False, vs=0.2):
    ds = TrackletDataset.__new__(TrackletDataset)  # bypass file loading
    ds.cfg = OcOccNetConfig()  # ae_voxel_size=0.2, num_occ_samples=512
    assert ds.cfg.ae_voxel_size == vs
    ds.occ_anno_root = str(tmp_path)
    ds.mirror_occ = mirror
    ds.oid2occ = None
    ds.occ_compute_score = compute_score
    return ds


def _ref_sample(ref_pipe, path, num, label_iou=0.77, compute_score=False,
                voxel_size=0.2):
    results = {"occ_infos": [{"label_iou": label_iou, "label_trk_length": 42,
                              "occ_label_name": path}]}
    ref_pipe.LoadAnnotationsOcc(compute_score=compute_score)(results)
    ref_pipe.RandomSampleOccPoints(
        num_sample_points=num, pos_sample_weight=0.5, voxel_size=voxel_size,
        balance_sample=True, weighted_sample=True)(results)
    return results


def test_known_center_set_executed(ref_pipe, tmp_path):
    """num_sample_points=-1 emits every known voxel center deterministically:
    our (pos_idx, neg_idx, center formula) must reproduce the exact set."""
    rng = np.random.default_rng(3)
    shape = (23, 11, 9)  # odd x: the ceil(4.6/0.2) production car grid
    occ = _make_grid(rng, shape)
    path = str(tmp_path / "t.npz")
    np.savez(path, occ=occ)

    res = _ref_sample(ref_pipe, path, num=-1)
    ref_centers = res["sample_occ_centers"][0].numpy()
    ref_labels = (res["sample_occs"][0].numpy() == 1).astype(np.int32)
    ref_sizes = res["occ_sizes"][0].numpy()

    ds = _our_dataset(tmp_path)
    parsed = ds._load_occ_grid(path)
    shape_o, known_frac, pos_idx, neg_idx, vals = parsed
    vs = ds.cfg.ae_voxel_size
    assert vs == 0.2
    sel = np.concatenate([pos_idx, neg_idx])
    coors = np.stack(np.unravel_index(sel, shape_o), -1)
    ours_centers = (coors + 0.5) * vs - np.asarray(shape_o) * vs / 2
    ours_labels = (vals == 1).astype(np.int32)

    np.testing.assert_allclose(np.asarray(shape_o) * vs, ref_sizes,
                               rtol=1e-6)
    key = lambda c, l: sorted(map(tuple, np.round(
        np.concatenate([np.asarray(c, np.float64), l[:, None]], -1), 4)))
    assert key(ours_centers, ours_labels) == key(ref_centers, ref_labels)


def test_score_chain_executed(ref_pipe, tmp_path):
    rng = np.random.default_rng(4)
    occ = _make_grid(rng, (12, 8, 6))
    path = str(tmp_path / "s.npz")
    np.savez(path, occ=occ)

    # compute_score: known fraction replaces label_iou
    res = _ref_sample(ref_pipe, path, num=64, compute_score=True)
    ref_score = float(res["occ_scores"][0])
    ds = _our_dataset(tmp_path, compute_score=True)
    _, known_frac, _, _, _ = ds._load_occ_grid(path)
    assert abs(known_frac - ref_score) < 1e-9

    # missing file: zero score, empty grid
    res = _ref_sample(ref_pipe, str(tmp_path / "missing.npz"), num=64)
    assert float(res["occ_scores"][0]) == 0.0
    assert ds._load_occ_grid(str(tmp_path / "missing.npz")) is None

    # degenerate one-class grid: balance path zeroes the score
    occ1 = np.full((6, 4, 4), 2, np.int32)  # all free, no occupied
    path1 = str(tmp_path / "free.npz")
    np.savez(path1, occ=occ1)
    res = _ref_sample(ref_pipe, path1, num=64)
    assert float(res["occ_scores"][0]) == 0.0
    ds2 = _our_dataset(tmp_path)
    pts, labels, score = ds2.sample_occ("", "free", np.random.RandomState(0))
    assert score == 0.0 and (labels == 0).all()


def test_balanced_draw_executed(ref_pipe, tmp_path):
    """The balance_sample path: half the draws positive, support restricted
    to known voxels — matched between the executed reference and ours."""
    rng = np.random.default_rng(5)
    occ = _make_grid(rng, (23, 11, 9))
    path = str(tmp_path / "b.npz")
    np.savez(path, occ=occ)
    K = 512

    res = _ref_sample(ref_pipe, path, num=K)
    ref_centers = res["sample_occ_centers"][0].numpy()
    ref_labels = (res["sample_occs"][0].numpy() == 1).astype(np.int32)
    assert ref_centers.shape == (K, 3)
    assert ref_labels.sum() == K // 2  # pos_sample_weight=0.5

    ds = _our_dataset(tmp_path)
    assert ds.cfg.num_occ_samples == K
    pts, labels, score = ds.sample_occ("", "b", np.random.RandomState(1))
    assert pts.shape == (K, 3) and labels.sum() == K // 2
    assert score == 1.0  # label_iou default for GT annos

    # support: every draw must come from the same known-center set
    parsed = ds._load_occ_grid(path)
    shape_o = parsed[0]
    sel = np.concatenate([parsed[2], parsed[3]])
    coors = np.stack(np.unravel_index(sel, shape_o), -1)
    valid = set(map(tuple, np.round(
        (coors + 0.5) * 0.2 - np.asarray(shape_o) * 0.2 / 2, 4)))
    for arr in (ref_centers, pts):
        assert set(map(tuple, np.round(
            np.asarray(arr, np.float64), 4))) <= valid


def test_mirror_even_executed_and_odd_quirk(ref_pipe):
    rng = np.random.default_rng(6)
    # even X: exact match with the executed reference
    occ = _make_grid(rng, (10, 6, 4))
    res = {"occ_label_list": [torch.from_numpy(occ.copy())]}
    ref_pipe.MirrorOccLabel()(res)
    ref_m = res["occ_label_list"][0].numpy()
    np.testing.assert_array_equal(mirror_occ_label(occ), ref_m)

    # odd X: the reference's ((x + 0.5 - XS//2) * -1 + XS//2).long()
    # truncation maps x -> XS-2-x (and XS-1 -> 0), an off-center mirror;
    # ours is the true mirror x -> XS-1-x. Pin the reference behavior so
    # any future change is caught, and document the deliberate divergence.
    XS = 9
    occ = _make_grid(rng, (XS, 4, 3))
    res = {"occ_label_list": [torch.from_numpy(occ.copy())]}
    ref_pipe.MirrorOccLabel()(res)
    ref_m = res["occ_label_list"][0].numpy()
    x = np.arange(XS)
    ref_map = np.where(x == XS - 1, 0, XS - 2 - x)
    expect = np.where(occ == 0, occ[ref_map], occ)
    np.testing.assert_array_equal(ref_m, expect)
    ours = mirror_occ_label(occ)
    np.testing.assert_array_equal(ours, np.where(occ == 0, occ[::-1], occ))
