"""Frame-level detector training: CenterPoint trains end-to-end through
the generalized trainer (loader -> vmapped loss -> SPMD step -> checkpoint).
"""
import json
import os

import numpy as np
import jax
import pytest

from objectcentricocccompletion_tpu.models.centerpoint import (
    DynamicCenterPoint, tiny_centerpoint_config)
from objectcentricocccompletion_tpu.training.detector_trainer import (
    FrameLoader, train_detector)


class SyntheticFrames:
    """Minimal dataset with the FrameDataset sample interface."""

    def __init__(self, cfg, n=6, max_gt=8):
        self.cfg = cfg
        self.n = n
        self.max_gt = max_gt

    def __len__(self):
        return self.n

    def build_sample(self, index, rng):
        from tests.test_centerpoint import make_frame
        points, mask, boxes, labels, valid = make_frame(
            self.cfg, seed=index, num_boxes=3)
        gt_boxes = np.zeros((self.max_gt, 7), np.float32)
        gt_labels = np.zeros((self.max_gt,), np.int32)
        gt_boxes[:3] = np.asarray(boxes)
        gt_valid = np.arange(self.max_gt) < 3
        return dict(points=np.asarray(points), points_mask=np.asarray(mask),
                    gt_boxes=gt_boxes, gt_labels=gt_labels,
                    gt_valid=gt_valid)


def test_centerpoint_trains(tmp_path):
    cfg = tiny_centerpoint_config()
    model = DynamicCenterPoint(cfg)
    ds = SyntheticFrames(cfg)
    work = str(tmp_path / "cp")
    state = train_detector(model, ds, work, total_steps=6,
                           batch_per_device=1, base_lr=1e-4,
                           ckpt_interval=6, log_interval=2,
                           devices=jax.devices()[:2])
    assert int(state.step) == 6
    rows = [json.loads(l) for l in open(os.path.join(work, "metrics.jsonl"))]
    assert len(rows) >= 2
    assert np.isfinite(rows[-1]["loss"])
    assert os.path.isdir(os.path.join(work, "ckpt"))
    # resume is a no-op at total_steps
    state2 = train_detector(model, ds, work, total_steps=6,
                            batch_per_device=1,
                            devices=jax.devices()[:2])
    assert int(state2.step) == 6
