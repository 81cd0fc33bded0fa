"""Test-time occupancy IoU evaluation.

Rebuild of ``TrackletRoIHeadOCC.test_occ`` (``tracklet_roi_head_occ.py:268-486``)
and the aggregation in ``WaymoTrackletDatasetWithOcc.evaluate``
(``waymo_tracklet_dataset.py:629-674``):

Per GT-matched frame: decode occupancy at every *known* GT voxel center
(occupied or free), with queries transformed GT-box-frame -> predicted-RoI
frame; predictions outside the predicted box count as free
(``ignore_outside_occ``); IoU of predicted-occupied vs GT-occupied.

Aggregates: overall IoU (global sum), mIoU over tracklets, mIoU over boxes,
and GT-volume-binned box IoU (<30 / 30-150 / >=150 m^3).

The dynamic "all known voxels" query count becomes a static padded buffer
(``max_queries``) with a mask, decoded in one jit per tracklet chunk.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from ..models.ococcnet import gt_occ_to_roi_frame


def occ_iou_per_frame(decode_fn, shape_latent, rois, gt_boxes, gt_valid,
                      occ_points, occ_labels, occ_mask,
                      pos_thresh: float = 0.5):
    """Compute per-frame occupancy intersection/union for one tracklet.

    decode_fn(latent [L, D], queries [L, K, 3]) -> logits [L, K].
    occ_points: [K, 3] known voxel centers (GT frame); occ_labels: [K]
    {1 occupied, 0 free}; occ_mask: [K] valid (padding).
    Returns (inter [L], union [L]) as int32, zero where gt invalid.
    """
    queries = gt_occ_to_roi_frame(occ_points[None], gt_boxes[None],
                                  rois[None])[0]  # [L, K, 3]
    gt_occ = (occ_labels == 1) & occ_mask

    # decode in frame chunks: one shot at L=128 frames x 16k queries
    # materializes [L, K, 1024] decoder activations (8.6 GB f32 — measured
    # HBM OOM at the 256-frame eval bucket); lax.map bounds the live set
    # to one chunk
    L = queries.shape[0]
    chunk = max(min(16, L), 1)
    pad = (-L) % chunk
    q_p = jnp.pad(queries, ((0, pad), (0, 0), (0, 0)))
    lat_p = jnp.pad(shape_latent, ((0, pad), (0, 0)))
    rois_p = jnp.pad(rois, ((0, pad), (0, 0)))
    gtv_p = jnp.pad(gt_valid, ((0, pad),))

    def one_chunk(args):
        lat, q, r, gv = args
        logits = decode_fn(lat, q)
        pred = jax.nn.sigmoid(logits) > pos_thresh
        half = 0.5 * r[:, None, 3:6]
        pred = pred & jnp.all(jnp.abs(q) <= half, axis=-1)  # outside=free
        valid = occ_mask[None] & gv[:, None]
        inter = jnp.sum((pred & gt_occ[None]) & valid, axis=-1)
        union = jnp.sum((pred | gt_occ[None]) & valid, axis=-1)
        return inter, union

    n_chunks = (L + pad) // chunk
    inter, union = jax.lax.map(
        one_chunk,
        (lat_p.reshape(n_chunks, chunk, -1),
         q_p.reshape(n_chunks, chunk, *queries.shape[1:]),
         rois_p.reshape(n_chunks, chunk, -1),
         gtv_p.reshape(n_chunks, chunk)))
    return inter.reshape(-1)[:L], union.reshape(-1)[:L]


@dataclass
class OccIoUAccumulator:
    total_inter: float = 0.0
    total_union: float = 0.0
    track_ious: list = field(default_factory=list)
    box_ious: list = field(default_factory=list)
    box_volumes: list = field(default_factory=list)

    def add_tracklet(self, inter: np.ndarray, union: np.ndarray,
                     gt_volumes: np.ndarray, valid: np.ndarray):
        inter = np.asarray(inter)[np.asarray(valid)]
        union = np.asarray(union)[np.asarray(valid)]
        gt_volumes = np.asarray(gt_volumes)[np.asarray(valid)]
        keep = union > 0
        if not keep.any():
            return
        inter, union, gt_volumes = inter[keep], union[keep], gt_volumes[keep]
        self.total_inter += inter.sum()
        self.total_union += union.sum()
        self.track_ious.append(inter.sum() / union.sum())
        self.box_ious.extend((inter / union).tolist())
        self.box_volumes.extend(gt_volumes.tolist())

    def summary(self, prefix: str = "occ") -> dict:
        ious = np.asarray(self.box_ious)
        vols = np.asarray(self.box_volumes)
        out = {
            f"{prefix}/overall_iou": (self.total_inter / self.total_union
                                      if self.total_union else 0.0),
            f"{prefix}/miou_track": float(np.mean(self.track_ious))
            if self.track_ious else 0.0,
            f"{prefix}/miou_box": float(ious.mean()) if len(ious) else 0.0,
        }
        for name, m in [("small", vols < 30),
                        ("medium", (vols >= 30) & (vols < 150)),
                        ("large", vols >= 150)]:
            if len(ious) and m.any():
                out[f"{prefix}/{name}_box_iou"] = float(ious[m].mean())
        return out


def dense_voxel_centers(size, voxel_size: float) -> np.ndarray:
    """Voxel centers of a size-fitted grid in the gravity-centered box frame
    — host-side mirror of the reference ``generate_dense_voxel_centers``
    (``ops/occ/occ_ops.py:5-50``): dims = ceil(size/vs), center of cell
    ``c`` at ``c*vs - size/2 + vs/2`` (reference-executed parity in
    ``tests/test_reference_parity.py``)."""
    size = np.asarray(size, np.float64)
    dims = np.maximum(np.ceil(size / voxel_size), 1).astype(int)
    coors = np.stack(np.meshgrid(*[np.arange(d) for d in dims],
                                 indexing="ij"), -1).reshape(-1, 3)
    return (coors * voxel_size - size / 2
            + voxel_size / 2).astype(np.float32)


def load_full_occ_queries(occ_path: str, voxel_size: float,
                          max_queries: int):
    """All known voxel centers + labels from an occ npz, padded to
    ``max_queries`` (test-time ``RandomSampleOccPoints(num_sample_points=-1,
    use_unknown=False)``). Returns (points [K,3], labels [K], mask [K])."""
    occ = np.load(occ_path)["occ"]
    dims = np.asarray(occ.shape)
    size = dims * voxel_size
    flat = occ.reshape(-1)
    idx = np.nonzero(flat != 0)[0]
    if len(idx) > max_queries:
        idx = idx[np.linspace(0, len(idx) - 1, max_queries).astype(int)]
    coors = np.stack(np.unravel_index(idx, occ.shape), -1)
    centers = (coors + 0.5) * voxel_size - size / 2
    k = len(idx)
    pts = np.zeros((max_queries, 3), np.float32)
    lab = np.zeros((max_queries,), np.int32)
    msk = np.zeros((max_queries,), bool)
    pts[:k] = centers
    lab[:k] = (flat[idx] == 1).astype(np.int32)
    msk[:k] = True
    return pts, lab, msk


# ------------------------------------------------------------------ baseline
def _rot_z_np(pts: np.ndarray, yaw: float) -> np.ndarray:
    c, s = np.cos(yaw), np.sin(yaw)
    x = pts[..., 0] * c - pts[..., 1] * s
    y = pts[..., 0] * s + pts[..., 1] * c
    return np.stack([x, y, pts[..., 2]], -1)


def occ_baseline_tracklet(points: np.ndarray, points_mask: np.ndarray,
                          rois: np.ndarray, gt_boxes: np.ndarray,
                          gt_valid: np.ndarray, occ_points: np.ndarray,
                          occ_labels: np.ndarray, occ_mask: np.ndarray,
                          voxel_size: float
                          ) -> tuple[np.ndarray, np.ndarray]:
    """Point-aggregation occupancy baseline — the paper's comparison
    baseline, ``TrackletRoIHeadOCC.test_occ_baseline``
    (``tracklet_roi_head_occ.py:116-266``).

    For frame ``i``: every observed in-box point from frames ``0..i`` (each
    in its OWN frame's box-local coords) marks its voxel of the
    ``ceil(roi_size/voxel_size)`` grid occupied; the "prediction" for a GT
    sample is that voxel's bit (0 when the sample falls outside the grid);
    inter/union against GT-occupied over the known-sample mask. No pi/2
    compensation here: this framework uses one box-local convention
    everywhere (``core/boxes.py``), where the reference rotates the
    extractor's pooled coords by pi/2 first (``:177-180``).

    points: [L, P, C>=3] shared-frame points; rois/gt_boxes: [L, 7]
    (bottom-center); occ_points: [K, 3] gravity-centered GT-box frame.
    Returns (inter [L], union [L]) int64, zero where gt invalid.
    """
    L = rois.shape[0]
    local_pts = []
    for j in range(L):
        p = points[j][points_mask[j].astype(bool)][:, :3]
        ctr = rois[j, :3] + np.array([0, 0, rois[j, 5] / 2])
        local = _rot_z_np(p - ctr, -rois[j, 6])
        inb = (np.abs(local) <= rois[j, 3:6] / 2).all(-1)
        local_pts.append(local[inb])

    lab = (occ_labels == 1) & occ_mask.astype(bool)
    inter = np.zeros(L, np.int64)
    union = np.zeros(L, np.int64)
    for i in range(L):
        if not gt_valid[i]:
            continue
        agg = (np.concatenate(local_pts[:i + 1], 0) if local_pts[:i + 1]
               else np.zeros((0, 3), np.float32))
        size = rois[i, 3:6]
        dims = np.maximum(np.ceil(size / voxel_size), 1).astype(int)
        grid = np.zeros(dims, bool)
        coors = np.floor((agg + size / 2) / voxel_size).astype(int)
        ok = ((coors >= 0) & (coors < dims)).all(-1)
        coors = coors[ok]
        grid[coors[:, 0], coors[:, 1], coors[:, 2]] = True

        # GT-box frame -> ego -> roi_i frame (gravity-centered both ends)
        gt_ctr = gt_boxes[i, :3] + np.array([0, 0, gt_boxes[i, 5] / 2])
        ego = _rot_z_np(occ_points, gt_boxes[i, 6]) + gt_ctr
        q = _rot_z_np(ego - (rois[i, :3]
                             + np.array([0, 0, rois[i, 5] / 2])),
                      -rois[i, 6])
        qc = np.floor((q + size / 2) / voxel_size).astype(int)
        in_gt = ((qc >= 0) & (qc < dims)).all(-1)
        pred = np.zeros(len(occ_points), bool)
        pred[in_gt] = grid[qc[in_gt, 0], qc[in_gt, 1], qc[in_gt, 2]]

        inter[i] = int((pred & lab).sum())
        union[i] = int((pred | lab).sum())
    return inter, union
