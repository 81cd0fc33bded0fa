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

    def summary(self) -> dict:
        ious = np.asarray(self.box_ious)
        vols = np.asarray(self.box_volumes)
        out = {
            "occ/overall_iou": (self.total_inter / self.total_union
                                if self.total_union else 0.0),
            "occ/miou_track": float(np.mean(self.track_ious))
            if self.track_ious else 0.0,
            "occ/miou_box": float(ious.mean()) if len(ious) else 0.0,
        }
        for name, m in [("small", vols < 30),
                        ("medium", (vols >= 30) & (vols < 150)),
                        ("large", vols >= 150)]:
            if len(ious) and m.any():
                out[f"occ/{name}_box_iou"] = float(ious[m].mean())
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
