"""Indoor frame datasets: ScanNet + SUN RGB-D (mmdet3d info-pkl format).

Counterpart of the reference's ``ScanNetDataset`` / ``SUNRGBDDataset``
(``mmdet3d/datasets/scannet_dataset.py:18-150``,
``sunrgbd_dataset.py:14-170``): reads the standard converted infos pkl —
each info carries ``pts_path`` (float32 .bin, xyz + rgb columns) and
``annos`` with ``gt_boxes_upright_depth`` (gravity-centered; ScanNet
axis-aligned [cx, cy, cz, dx, dy, dz] + an ``axis_align_matrix`` applied
to the points, SUN RGB-D rotated 7-dof) and ``class`` labels — and
produces the same static padded sample dict as the outdoor FrameDataset,
with boxes in this framework's bottom-center layout (yaw 0 for ScanNet).
"""
from __future__ import annotations

import os
import pickle

import numpy as np

SCANNET_CLASSES = (
    "cabinet", "bed", "chair", "sofa", "table", "door", "window",
    "bookshelf", "picture", "counter", "desk", "curtain", "refrigerator",
    "showercurtrain", "toilet", "sink", "bathtub", "garbagebin")

SUNRGBD_CLASSES = (
    "bed", "table", "sofa", "chair", "toilet", "desk", "dresser",
    "night_stand", "bookshelf", "bathtub")


class ScanNetDataset:
    CLASSES = SCANNET_CLASSES
    ALIGN_POINTS = True

    def __init__(self, info_path: str, data_root: str, classes=None,
                 max_points: int = 40000, max_gt: int = 64,
                 load_dim: int = 6):
        self.classes = list(classes if classes is not None else self.CLASSES)
        self.data_root = data_root
        self.max_points = max_points
        self.max_gt = max_gt
        self.load_dim = load_dim
        with open(info_path, "rb") as f:
            self.infos = pickle.load(f)

    def __len__(self):
        return len(self.infos)

    def load_points(self, info: dict) -> np.ndarray:
        path = os.path.join(self.data_root, info["pts_path"])
        pts = np.fromfile(path, np.float32).reshape(-1, self.load_dim)
        if self.ALIGN_POINTS:
            m = np.asarray(info.get(
                "annos", {}).get("axis_align_matrix", np.eye(4)),
                np.float64)
            pts = pts.copy()
            pts[:, :3] = pts[:, :3] @ m[:3, :3].T + m[:3, 3]
        return pts

    def parse_annotations(self, info: dict):
        annos = info.get("annos", {})
        if not annos or int(annos.get("gt_num", 0)) == 0:
            return np.zeros((0, 7), np.float32), np.zeros((0,), np.int32)
        raw = np.asarray(annos["gt_boxes_upright_depth"], np.float32)
        labels = np.asarray(annos["class"], np.int64).astype(np.int32)
        boxes = np.zeros((len(raw), 7), np.float32)
        boxes[:, :6] = raw[:, :6]
        if raw.shape[1] >= 7:
            boxes[:, 6] = raw[:, 6]
        # gravity-centered -> bottom-center z
        boxes[:, 2] -= boxes[:, 5] / 2.0
        keep = labels < len(self.classes)
        return boxes[keep], labels[keep]

    def build_sample(self, index: int, rng) -> dict:
        info = self.infos[index]
        pts = self.load_points(info)
        if len(pts) > self.max_points:
            sel = rng.choice(len(pts), self.max_points, replace=False)
            pts = pts[sel]
        points = np.zeros((self.max_points, pts.shape[1]), np.float32)
        points[:len(pts)] = pts
        mask = np.arange(self.max_points) < len(pts)

        boxes, labels = self.parse_annotations(info)
        m = min(len(boxes), self.max_gt)
        gt_boxes = np.zeros((self.max_gt, 7), np.float32)
        gt_labels = np.zeros((self.max_gt,), np.int32)
        gt_boxes[:m] = boxes[:m]
        gt_labels[:m] = labels[:m]
        gt_valid = np.arange(self.max_gt) < m
        sid = info.get("point_cloud", {}).get("lidar_idx", index)
        return dict(points=points, points_mask=mask, gt_boxes=gt_boxes,
                    gt_labels=gt_labels, gt_valid=gt_valid,
                    meta=dict(scene=str(sid)))


class SUNRGBDDataset(ScanNetDataset):
    """SUN RGB-D shares the infos layout; boxes carry a yaw and points are
    already in the depth frame (no axis alignment)."""
    CLASSES = SUNRGBD_CLASSES
    ALIGN_POINTS = False
