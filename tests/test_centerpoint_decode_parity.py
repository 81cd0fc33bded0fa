"""Executed-parity of CenterPoint peak decoding vs the REFERENCE
``CenterPointBBoxCoder.decode`` (``core/bbox/coders/centerpoint_bbox_coders
.py:115-215``), loaded through the stub kit.

The heatmap-target side is already pinned to executed gaussian oracles
(tests/test_reference_parity.py); this pins the OTHER direction — peak
selection and the pixel -> ego box transform (reg offset add, stride/voxel
scaling, exp dims, atan2(sin, cos) heading, score threshold + post-center
range) — on isolated peaks, where our 3x3 max-pool pre-NMS (a TPU-native
static-shape stand-in for the reference's post-decode circle/rotate NMS) is
the identity.
"""
import os
import sys

import numpy as np
import torch

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax.numpy as jnp  # noqa: E402

from refstub import _load, load_reference  # noqa: E402

from objectcentricocccompletion_tpu.models import centerpoint_head  # noqa: E402


def _load_coder():
    load_reference()
    mod = _load("core/bbox/coders/centerpoint_bbox_coders.py",
                "mmdet3d.core.bbox.coders.centerpoint_bbox_coders")
    return mod.CenterPointBBoxCoder


def test_decode_executed():
    CPC = _load_coder()
    rng = np.random.default_rng(30)
    H = W = 32
    ncls = 3
    voxel_size = (0.32, 0.32)
    pc_range = (-74.88, -74.88, -2.0, 74.88, 74.88, 4.0)
    stride = 8
    K = 12

    # isolated peaks: logits very negative everywhere, K sharp peaks at
    # cells spaced >= 2 apart so the 3x3 max-pool keeps each
    logits = np.full((H, W, ncls), -12.0, np.float32)
    cells = rng.choice(H * W // 16, K, replace=False)
    peaks = []
    for j, c in enumerate(cells):
        iy, ix = (c // (W // 4)) * 4, (c % (W // 4)) * 4
        cl = int(rng.integers(0, ncls))
        logits[iy, ix, cl] = float(rng.uniform(1.0, 4.0))
        peaks.append((iy, ix, cl))

    reg = rng.uniform(0, 1, (H, W, 2)).astype(np.float32)
    hei = rng.uniform(-1, 1, (H, W, 1)).astype(np.float32)
    dim = rng.uniform(-0.5, 1.5, (H, W, 3)).astype(np.float32)
    rot = rng.uniform(-1, 1, (H, W, 2)).astype(np.float32)
    vel = rng.uniform(-2, 2, (H, W, 2)).astype(np.float32)

    # ---- reference: torch layout [B, C, H, W]; sigmoid/exp pre-applied
    def t(x):
        return torch.from_numpy(x).permute(2, 0, 1)[None]

    coder = CPC(pc_range=list(pc_range), out_size_factor=stride,
                voxel_size=list(voxel_size),
                post_center_range=[-80, -80, -10, 80, 80, 10],
                max_num=K, score_threshold=None, code_size=9)
    ref = coder.decode(torch.sigmoid(t(logits)), t(rot[..., 0:1]),
                       t(rot[..., 1:2]), t(hei), torch.exp(t(dim)),
                       t(vel), reg=t(reg))[0]
    ref_boxes = ref["bboxes"].numpy()          # [K, 9]
    ref_scores = ref["scores"].numpy()
    ref_labels = ref["labels"].numpy()

    # ---- ours
    preds = dict(heatmap=jnp.asarray(logits), reg=jnp.asarray(reg),
                 height=jnp.asarray(hei), dim=jnp.asarray(dim),
                 rot=jnp.asarray(rot), vel=jnp.asarray(vel))
    boxes, scores, cls, valid = centerpoint_head.decode(
        preds, voxel_size, pc_range, stride, max_out=K,
        score_threshold=0.0)
    boxes, scores, cls = map(np.asarray, (boxes, scores, cls))

    order_ref = np.argsort(-ref_scores)
    order_ours = np.argsort(-scores)
    np.testing.assert_allclose(scores[order_ours], ref_scores[order_ref],
                               atol=1e-5)
    np.testing.assert_array_equal(cls[order_ours], ref_labels[order_ref])
    ob, rb = boxes[order_ours], ref_boxes[order_ref]
    # x, y: identical pixel->ego transform
    np.testing.assert_allclose(ob[:, :2], rb[:, :2], atol=1e-4)
    # z: ours converts gravity -> bottom center (z_ref - h/2)
    np.testing.assert_allclose(ob[:, 2], rb[:, 2] - rb[:, 5] / 2, atol=1e-4)
    np.testing.assert_allclose(ob[:, 3:6], rb[:, 3:6], atol=1e-4)
    dh = np.abs(np.angle(np.exp(1j * (ob[:, 6] - rb[:, 6]))))
    assert dh.max() < 1e-5
    np.testing.assert_allclose(ob[:, 7:9], rb[:, 7:9], atol=1e-5)
