"""Virtual range-image construction (W0 core math).

Rebuild of the raw-frame extraction the annotator consumes
(``tools/data_converter/waymo_converter.py:549-676``, which calls
waymo_open_dataset's ``build_range_image_from_point_cloud``): project ego-
frame points into a sensor's (row, col) grid — row by nearest beam
inclination, col by azimuth with the extrinsic correction — and keep the
minimum range per cell, merging both LiDAR returns into one "virtual" range
image free of rolling-shutter artifacts.

Pure numpy so it is testable without tensorflow/waymo deps; the tfrecord
CLI wrapper lives in ``waymo_raw_converter.py``.
"""
from __future__ import annotations

import numpy as np


def project_to_range_image(points_ego: np.ndarray, extrinsic: np.ndarray,
                           inclinations: np.ndarray, width: int
                           ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Ego points -> (rows, cols, ranges) in a [H, width] sensor grid.

    ``inclinations`` must be ascending (flip Waymo's stored order first).
    Mirrors ``point_cloud_to_range_image_idx``
    (``tools/occ/occ_annotate.py:141-201``).
    """
    inv = np.linalg.inv(extrinsic)
    pts = points_ego @ inv[:3, :3].T + inv[:3, 3]
    xy = np.linalg.norm(pts[:, :2], axis=-1)
    incl = np.arctan2(pts[:, 2], xy)
    rows = np.argmin(np.abs(incl[:, None] - inclinations[None, :]), axis=-1)

    az_corr = np.arctan2(extrinsic[1, 0], extrinsic[0, 0])
    az = np.arctan2(pts[:, 1], pts[:, 0]) + az_corr
    az = np.where(az > np.pi, az - 2 * np.pi, az)
    az = np.where(az < -np.pi, az + 2 * np.pi, az)
    cols = np.round(width - 0.5 - (az + np.pi) / (2 * np.pi) * width)
    cols = np.mod(cols, width).astype(np.int64)
    ranges = np.linalg.norm(pts, axis=-1)
    return rows.astype(np.int64), cols, ranges


def range_image_to_points(ri_range: np.ndarray, extrinsic: np.ndarray,
                          inclinations: np.ndarray) -> np.ndarray:
    """Inverse of :func:`project_to_range_image`: a [H, W] range image ->
    ego-frame xyz points (cells with range <= 0 are dropped).

    ``inclinations`` [H] must be aligned with the image rows (Waymo stores
    row 0 = highest beam, i.e. descending).
    """
    H, W = ri_range.shape
    az_corr = np.arctan2(extrinsic[1, 0], extrinsic[0, 0])
    cols = np.arange(W)
    az = (W - 0.5 - cols) / W * 2.0 * np.pi - np.pi - az_corr
    az = np.where(az > np.pi, az - 2 * np.pi, az)
    az = np.where(az < -np.pi, az + 2 * np.pi, az)
    ci = np.cos(inclinations)[:, None]
    si = np.sin(inclinations)[:, None]
    dirs = np.stack([ci * np.cos(az)[None, :], ci * np.sin(az)[None, :],
                     np.broadcast_to(si, (H, W))], -1)      # [H, W, 3]
    valid = ri_range > 0
    pts_sensor = dirs[valid] * ri_range[valid][:, None]
    return pts_sensor @ extrinsic[:3, :3].T + extrinsic[:3, 3]


def build_virtual_range_image(points_ego: np.ndarray, extrinsic: np.ndarray,
                              inclinations: np.ndarray, width: int,
                              fill: float = 0.0) -> np.ndarray:
    """Scatter-min of point ranges into [H, width]; empty cells = ``fill``.

    Merging the points of both returns gives the
    ``*_RANGE_IMAGE_MERGE_VIRTUAL`` map the annotator ray-casts against.
    """
    H = len(inclinations)
    rows, cols, ranges = project_to_range_image(points_ego, extrinsic,
                                                inclinations, width)
    ri = np.full((H, width), np.inf)
    np.minimum.at(ri, (rows, cols), ranges)
    ri[~np.isfinite(ri)] = fill
    return ri.astype(np.float32)
