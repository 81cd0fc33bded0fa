"""Masked dense reductions — the TPU-native replacement for torch_scatter.

The reference routes every per-voxel / per-RoI reduction through
``scatter_v2`` (``ops/sst/sst_ops.py:150-181``): torch.unique + segment
max/mean over ragged groups. On TPU we lay the same data out densely as
``[..., group, item, channel]`` with a validity mask, so the reductions are
plain masked maxes/means that XLA fuses onto the VPU, and the "broadcast back
to points" step is free (no gather).

``segment_*`` variants are also provided for genuinely ragged cases (sparse
voxelization for the detectors) on top of ``jax.ops.segment_*``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG = -1e30


def _expand(mask: jax.Array, x: jax.Array) -> jax.Array:
    """Broadcast a [..., items] mask against x [..., items, channels]."""
    return mask[..., None] if mask.ndim == x.ndim - 1 else mask


def masked_max(x: jax.Array, mask: jax.Array, axis: int) -> jax.Array:
    """Max over ``axis`` counting only ``mask``-true items; 0 if group empty.

    Matches the reference's empty-group handling: empty RoIs get zero
    features (``fsd_bbox_head.py:252-273``).
    """
    m = _expand(mask, x)
    out = jnp.max(jnp.where(m, x, _NEG), axis=axis)
    any_valid = jnp.any(m, axis=axis)
    return jnp.where(any_valid, out, 0.0)


def masked_mean(x: jax.Array, mask: jax.Array, axis: int) -> jax.Array:
    m = _expand(mask, x)
    s = jnp.sum(jnp.where(m, x, 0.0), axis=axis)
    n = jnp.sum(m, axis=axis)
    return s / jnp.clip(n, 1, None)


def masked_sum(x: jax.Array, mask: jax.Array, axis: int) -> jax.Array:
    return jnp.sum(jnp.where(_expand(mask, x), x, 0.0), axis=axis)


def segment_max(x, segment_ids, num_segments):
    out = jax.ops.segment_max(x, segment_ids, num_segments=num_segments)
    # segment_max yields -inf for empty segments; normalize to 0 like the
    # reference's empty-roi alignment.
    return jnp.where(jnp.isfinite(out), out, 0.0)


def segment_mean(x, segment_ids, num_segments):
    s = jax.ops.segment_sum(x, segment_ids, num_segments=num_segments)
    n = jax.ops.segment_sum(jnp.ones_like(x[..., :1]), segment_ids,
                            num_segments=num_segments)
    return s / jnp.clip(n, 1, None)


def segment_sum(x, segment_ids, num_segments):
    return jax.ops.segment_sum(x, segment_ids, num_segments=num_segments)
