"""PointNet++ family primitives — pure jnp.

TPU-native replacements for the reference's CUDA extensions
``ball_query_ext / knn_ext / group_points_ext / interpolate_ext /
furthest_point_sample_ext / gather_points_ext``
(``mmdet3d/ops/{ball_query,knn,group_points,interpolate,
furthest_point_sample,gather_points}/src`` — SURVEY.md §2.5). These back the
PointNet++-style models and ``furthest_point_sample`` is imported by the
tracklet detector (``models/detectors/tracklet_detector_occ.py:20-25``).

All functions take masked fixed-size point buffers and are jit/vmap-safe.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_BIG = 1e10


def square_distance(a: jax.Array, b: jax.Array) -> jax.Array:
    """[N, 3] x [M, 3] -> [N, M] squared euclidean distances."""
    return jnp.sum((a[:, None, :] - b[None, :, :]) ** 2, -1)


def knn(query: jax.Array, points: jax.Array, points_mask: jax.Array,
        k: int) -> tuple[jax.Array, jax.Array]:
    """k nearest neighbors of each query. Returns (idx [Q, k], dist [Q, k]);
    missing neighbors (all points invalid) point at index 0 with dist inf."""
    d = square_distance(query, points)
    d = jnp.where(points_mask[None, :], d, _BIG)
    neg_d, idx = jax.lax.top_k(-d, k)
    return idx, -neg_d


def ball_query(query: jax.Array, points: jax.Array, points_mask: jax.Array,
               radius: float, k: int) -> tuple[jax.Array, jax.Array]:
    """Up to ``k`` points within ``radius`` of each query (CUDA
    ``ball_query`` semantics: pad with the first found index).

    Returns (idx [Q, k], valid [Q, k])."""
    idx, dist = knn(query, points, points_mask, k)
    ok = dist <= radius * radius
    idx = jnp.where(ok, idx, idx[:, 0:1])   # pad with the nearest index
    return idx, ok


def furthest_point_sample(points: jax.Array, mask: jax.Array,
                          num_samples: int) -> jax.Array:
    """Iterative farthest point sampling. Returns [num_samples] indices
    (repeats the first valid point if fewer valid points than samples)."""
    n = points.shape[0]
    start = jnp.argmax(mask)  # first valid point

    def body(carry, _):
        dist, last = carry
        d = jnp.sum((points - points[last]) ** 2, -1)
        dist = jnp.minimum(dist, jnp.where(mask, d, -_BIG))
        nxt = jnp.argmax(dist)
        return (dist, nxt), nxt

    init_dist = jnp.where(mask, _BIG, -_BIG)
    (_, _), rest = jax.lax.scan(body, (init_dist, start),
                                None, length=num_samples - 1)
    return jnp.concatenate([start[None], rest]).astype(jnp.int32)


def gather_points(points: jax.Array, idx: jax.Array) -> jax.Array:
    """[N, C] gathered at [..., K] -> [..., K, C] (gather_points_ext)."""
    return points[idx]


def group_points(points: jax.Array, idx: jax.Array,
                 centers: jax.Array | None = None) -> jax.Array:
    """[N, C] features grouped as [Q, k, C]; xyz channels optionally
    centered on the query (group_points_ext + grouping with relative
    coords)."""
    g = points[idx]  # [Q, k, C]
    if centers is not None:
        g = g.at[..., :3].add(-centers[:, None, :3])
    return g


def three_interpolate(query: jax.Array, points: jax.Array,
                      points_mask: jax.Array, feats: jax.Array) -> jax.Array:
    """Inverse-distance-weighted 3-NN feature interpolation
    (interpolate_ext: three_nn + three_interpolate)."""
    idx, dist = knn(query, points, points_mask, 3)
    w = 1.0 / jnp.clip(dist, 1e-8, None)
    w = w / jnp.sum(w, -1, keepdims=True)
    return jnp.sum(feats[idx] * w[..., None], axis=1)


def assign_score_withk(scores: jax.Array, point_feats: jax.Array,
                       center_feats: jax.Array, knn_idx: jax.Array,
                       aggregate: str = "sum") -> jax.Array:
    """PAConv score-weighted kernel assembly (assign_score_withk_ext,
    ``ops/paconv/src``): for each query and each of its k neighbors, mix M
    weight-bank outputs by learned scores and aggregate over neighbors.

    scores      [Q, k, M]   per-neighbor mixing weights over M kernels
    point_feats [N, M, C]   weight-bank outputs for every support point
    center_feats[N, M, C]   weight-bank outputs for the centers
    knn_idx     [Q, k]      neighbor indices (idx 0 column = the center)

    Returns [Q, k, C] mixed features: score-weighted sum over the kernel
    axis of (neighbor - center) bank outputs, reduced over k if
    ``aggregate`` is "sum"/"max"/"avg" -> [Q, C].
    """
    centers = knn_idx[:, :1]                       # PAConv convention
    diff = point_feats[knn_idx] - center_feats[centers]   # [Q, k, M, C]
    mixed = jnp.einsum("qkm,qkmc->qkc", scores, diff)
    if aggregate == "sum":
        return jnp.sum(mixed, axis=1)
    if aggregate == "avg":
        return jnp.mean(mixed, axis=1)
    if aggregate == "max":
        return jnp.max(mixed, axis=1)
    return mixed
