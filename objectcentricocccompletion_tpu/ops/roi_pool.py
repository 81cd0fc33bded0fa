"""Dense tracklet RoI point pooling.

TPU-native replacement for the reference's ``dynamic_point_pool_mixed`` CUDA
kernel + ``TrackletPointRoIExtractor``
(``roi_extractors/dynamic_point_roi_extractor.py:149-302``,
``ops/dynamic_point_pool_op.py``).

Key structural insight: in the OcOccNet configuration (``combined=False``),
the pooling group key is ``batch * max_frames + frame`` for BOTH points and
RoIs (``dynamic_point_roi_extractor.py:191-193``), i.e. every point can only
pool into the single RoI of its own frame. With per-frame point caps already
applied on the host (``LoadTrackletPoints max_points=1024``), the ragged
gather/scatter collapses into a dense masked layout ``[B, L, P]`` — no
indices, no sorting, no atomics; XLA fuses the geometry math with the
downstream MLPs.

Per-point geometry info mirrors the CUDA kernel's 13 floats (verified against
the debug asserts at ``dynamic_point_roi_extractor.py:222-234``), expressed in
this framework's canonical local frame (see ``core/boxes.py``):
  * ``local_xyz``        — box-local, gravity-centered coords (3)
  * ``boundary_offset``  — positive-inside distances to the 6 original box
                           faces; opposite faces sum to the box size (6)
  * ``is_in_margin``     — 1.0 when only inside the ``extra_wlh``-enlarged
                           box, 0.0 when inside the original box (1)
  * ``rel_xyz``          — global xyz minus the RoI bottom-center (3, used by
                           the RoI encoder's ``f_cluster``)

Known divergence — point-cap truncation order. When a cap binds
(``roi_point_budget`` here, ``max_inbox_point``/``max_all_pts`` in the CUDA
kernel), the SUBSET of surviving points can differ: this module keeps
valid-first STABLE order within each frame (``ococcnet.py`` compaction via
``argsort(~mask, stable=True)``; the packed layout drops latest-frame points
first on global overflow), while ``dynamic_point_pool`` keeps the first
``max_inbox_point`` points in its CUDA block-execution order
(``ops/dynamic_point_pool_op.py:29-35``) — which for a single launch is also
input order per RoI, but the global ``max_all_pts`` buffer fills in block
order across RoIs, so the dropped set under global overflow differs. This is
untestable against the CUDA kernel in this environment and immaterial in
practice: the SIR encoders are permutation-invariant masked reductions, the
caps rarely bind (1024-point frame cap upstream), and both sides keep a
uniformly-representative subset. All parity tests run below the caps.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import boxes as box_ops


class RoiPoolInfo(NamedTuple):
    mask: jax.Array            # [B, L, P] pooled-point validity
    local_xyz: jax.Array       # [B, L, P, 3]
    boundary_offset: jax.Array  # [B, L, P, 6]
    is_in_margin: jax.Array    # [B, L, P]
    rel_xyz: jax.Array         # [B, L, P, 3]


def roi_pool(points_xyz: jax.Array, points_mask: jax.Array,
             rois: jax.Array, extra_wlh=(0.5, 0.5, 0.5)) -> RoiPoolInfo:
    """Pool per-frame points into their frame's RoI.

    Args:
      points_xyz: [B, L, P, 3] shared-frame coordinates.
      points_mask: [B, L, P] input validity.
      rois: [B, L, 7] per-frame boxes (bottom-center, w/l/h, yaw).
      extra_wlh: total enlargement of each size for pooling.
    """
    local = box_ops.box_local_coords(points_xyz, rois)  # [B, L, P, 3]
    half = 0.5 * rois[..., None, 3:6]
    half_ext = half + 0.5 * jnp.asarray(extra_wlh, points_xyz.dtype)
    inside_ext = jnp.all(jnp.abs(local) <= half_ext, axis=-1)
    inside_orig = jnp.all(jnp.abs(local) <= half, axis=-1)
    mask = points_mask & inside_ext

    # Distances to the 6 original faces: (+x, +y, +z, -x, -y, -z).
    off_pos = half - local
    off_neg = local + half
    boundary = jnp.concatenate([off_pos, off_neg], axis=-1)

    in_margin = (inside_ext & ~inside_orig).astype(points_xyz.dtype)
    rel = points_xyz - rois[..., None, 0:3]
    return RoiPoolInfo(mask, local, boundary, in_margin, rel)


def quantize_to_voxel_centers(local_xyz: jax.Array, roi_sizes: jax.Array,
                              voxel_size: float) -> jax.Array:
    """Snap box-local points to the centers of a size-fitted voxel grid.

    Port of ``occ_ops.quantize_points(..., to_center=True)``
    (``ops/occ/occ_ops.py:53-93``): the grid spans ``[-size/2, size/2]`` with
    cells of ``voxel_size``; returns the center of each point's cell.
    ``roi_sizes`` broadcasts over the leading dims of ``local_xyz``.
    """
    min_bound = -0.5 * roi_sizes[..., None, :]
    coors = jnp.floor((local_xyz - min_bound) / voxel_size)
    return coors * voxel_size + min_bound + 0.5 * voxel_size


def quantize_to_voxel_centers_aligned(local_xyz: jax.Array,
                                      roi_sizes: jax.Array,
                                      voxel_size: float) -> jax.Array:
    """Same as :func:`quantize_to_voxel_centers` with ``roi_sizes`` already
    expanded per point (packed layout: both ``[B, N, 3]``)."""
    min_bound = -0.5 * roi_sizes
    coors = jnp.floor((local_xyz - min_bound) / voxel_size)
    return coors * voxel_size + min_bound + 0.5 * voxel_size
