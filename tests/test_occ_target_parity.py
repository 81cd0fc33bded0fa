"""Executed-parity of OcOccNet's training-target generation vs the REFERENCE
``OccBBoxHead._get_target_single`` (``ococc_bbox_head.py:1165-1309``), run on
a bare instance of the real class (loaded via ``refstub.load_bbox_heads``).

This pins SURVEY hard-part #5 — the canonical-yaw/pi-2 conventions — with a
live oracle instead of hand-derived goldens:

  * ``gt_occ_to_roi_frame``: GT-grid gravity-center occ samples -> ego (via
    the GT box, +h/2 bottom->gravity) -> each RoI's gravity-centered local
    frame (no extra pi/2 — the reference comment's "already rotated" path),
  * soft IoU labels (clip((iou - neg)/(pos - neg), 0, 1)),
  * canonical box-regression targets: the -(roi_ry + pi/2) rotation,
    opposite-heading flip into (-pi/2, pi/2], and the
    ``DeltaXYZWLHRBBoxCoder`` encode against the zeroed RoI anchor.
"""
import os
import sys
import types

import numpy as np
import pytest
import torch

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax.numpy as jnp  # noqa: E402

from refstub import load_bbox_heads, load_reference  # noqa: E402

from objectcentricocccompletion_tpu.core import boxes as box_ops  # noqa: E402
from objectcentricocccompletion_tpu.core import coder  # noqa: E402
from objectcentricocccompletion_tpu.models.ococcnet import (  # noqa: E402
    gt_occ_to_roi_frame)


class _Cfg(dict):
    def __getattr__(self, k):
        return self[k]


@pytest.fixture(scope="module")
def dummy_head():
    heads = load_bbox_heads()
    refs = load_reference()
    H = heads["ococc_bbox_head"].OccBBoxHead
    h = H.__new__(H)  # bare instance: target gen uses no learned state
    h.num_classes = 1
    h.bbox_coder = refs["coder"].DeltaXYZWLHRBBoxCoder(code_size=7)
    return h


def _rand_boxes(rng, n):
    b = np.zeros((n, 7), np.float32)
    b[:, :3] = rng.uniform(-10, 10, (n, 3))
    b[:, 3:6] = rng.uniform(1.5, 5.0, (n, 3))
    b[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return b


def _run_reference(dummy_head, rois, gts, ious, occ_xyz, occ_lab):
    cfg = _Cfg(cls_pos_thr=0.8, cls_neg_thr=0.2)
    occ_label = torch.from_numpy(
        np.concatenate([occ_xyz, occ_lab[:, None]], -1))
    return dummy_head._get_target_single(
        torch.from_numpy(rois), torch.from_numpy(gts),
        torch.from_numpy(ious), torch.zeros(len(gts), dtype=torch.long),
        occ_label, torch.tensor(0.9), cfg)


def test_occ_sample_transform_executed(dummy_head):
    rng = np.random.default_rng(20)
    L, K = 6, 32
    rois = _rand_boxes(rng, L)
    gts = _rand_boxes(rng, L)
    ious = rng.uniform(0, 1, L).astype(np.float32)
    occ_xyz = rng.uniform(-2.5, 2.5, (K, 3)).astype(np.float32)
    occ_lab = rng.integers(0, 2, K).astype(np.float32)

    out = _run_reference(dummy_head, rois, gts, ious, occ_xyz, occ_lab)
    ref_xyz = out[6].numpy()                       # [L, K, 3]
    ref_occ = out[7].numpy()[..., 0]               # [L, K]

    ours = np.asarray(gt_occ_to_roi_frame(
        jnp.asarray(occ_xyz)[None], jnp.asarray(gts)[None],
        jnp.asarray(rois)[None]))[0]               # [L, K, 3]
    np.testing.assert_allclose(ours, ref_xyz, rtol=0, atol=2e-4)
    np.testing.assert_array_equal(
        np.broadcast_to(occ_lab, (L, K)), ref_occ)


def test_soft_labels_executed(dummy_head):
    rng = np.random.default_rng(21)
    L = 64
    rois = _rand_boxes(rng, L)
    gts = _rand_boxes(rng, L)
    # cover both thresholds and the interval
    ious = np.concatenate([np.linspace(0, 1, L - 2),
                           [0.2, 0.8]]).astype(np.float32)
    occ_xyz = rng.uniform(-2, 2, (8, 3)).astype(np.float32)
    occ_lab = np.zeros(8, np.float32)

    out = _run_reference(dummy_head, rois, gts, ious, occ_xyz, occ_lab)
    ref_label = out[0].numpy()
    ours = np.clip((ious - 0.2) / (0.8 - 0.2), 0.0, 1.0)
    np.testing.assert_allclose(ours, ref_label, atol=1e-6)


def test_canonical_box_targets_executed(dummy_head):
    """encode_roi_targets vs the reference canonical chain: center rotated
    by -(roi_ry + pi/2) into the delta coder (whose x-normalizer is the
    anchor diagonal), heading flipped into (-pi/2, pi/2]."""
    rng = np.random.default_rng(22)
    L = 48
    rois = _rand_boxes(rng, L)
    gts = rois.copy()
    gts[:, :3] += rng.uniform(-0.8, 0.8, (L, 3)).astype(np.float32)
    gts[:, 3:6] *= rng.uniform(0.9, 1.1, (L, 3)).astype(np.float32)
    gts[:, 6] += rng.uniform(-0.4, 0.4, L).astype(np.float32)
    # include exact opposite headings (the flip branch)
    gts[:4, 6] = rois[:4, 6] + np.pi + rng.uniform(-0.3, 0.3, 4)
    gts = gts.astype(np.float32)
    ious = rng.uniform(0, 1, L).astype(np.float32)
    occ_xyz = rng.uniform(-2, 2, (8, 3)).astype(np.float32)
    occ_lab = np.zeros(8, np.float32)

    out = _run_reference(dummy_head, rois, gts, ious, occ_xyz, occ_lab)
    ref_targets = out[1].numpy()                   # [L, 7]

    ours = np.asarray(coder.encode_roi_targets(
        jnp.asarray(rois), jnp.asarray(gts)))
    np.testing.assert_allclose(ours, ref_targets, rtol=0, atol=2e-4)


def test_decode_from_rois_executed(dummy_head):
    """Our decode_from_rois vs the reference's (``fsd_bbox_head.py:1075``,
    the eval writeback path): the anchor keeps the RoI yaw in the delta
    decode, then centers rotate by +(roi_ry + pi/2)."""
    rng = np.random.default_rng(23)
    L = 40
    rois = _rand_boxes(rng, L)
    deltas = rng.uniform(-0.3, 0.3, (L, 7)).astype(np.float32)

    rois_with_id = np.concatenate(
        [np.zeros((L, 1), np.float32), rois], -1)
    ref = dummy_head.decode_from_rois(
        torch.from_numpy(rois_with_id), torch.from_numpy(deltas)).numpy()

    ours = np.asarray(coder.decode_from_rois(
        jnp.asarray(rois), jnp.asarray(deltas)))
    np.testing.assert_allclose(ours[:, :3], ref[:, :3], rtol=0, atol=2e-4)
    np.testing.assert_allclose(ours[:, 3:6], ref[:, 3:6], rtol=0, atol=1e-4)
    dh = np.abs(np.angle(np.exp(1j * (ours[:, 6] - ref[:, 6]))))
    assert dh.max() < 1e-5


def test_encode_decode_roundtrip_after_reparam():
    """decode_from_rois still inverts encode_roi_targets (up to the
    canonical pi flip) after adopting the reference parametrization."""
    rng = np.random.default_rng(24)
    L = 64
    rois = _rand_boxes(rng, L)
    gts = rois.copy()
    gts[:, :3] += rng.uniform(-0.5, 0.5, (L, 3)).astype(np.float32)
    gts[:, 6] += rng.uniform(-0.4, 0.4, L).astype(np.float32)
    t = coder.encode_roi_targets(jnp.asarray(rois), jnp.asarray(gts))
    back = np.asarray(coder.decode_from_rois(jnp.asarray(rois), t))
    np.testing.assert_allclose(back[:, :6], gts[:, :6], atol=1e-4)
    dh = np.abs(np.angle(np.exp(1j * (back[:, 6] - gts[:, 6]))))
    assert (np.minimum(dh, np.abs(dh - np.pi)) < 1e-4).all()
