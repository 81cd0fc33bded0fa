"""Online test-time tuning of the shape latent.

Rebuild of ``OccAutoEncoder.online_tuning_forward`` + ``sample_observation``
(``occ_ae_head.py:65-201, 346-391``): at inference, the per-RoI latent is
optimized by Adam against the *observed* occupancy (voxel centers containing
pooled points = occupied, the rest of the grid = free), sharpening the
decoded shape around the evidence.

The reference runs a torch autograd loop per tracklet; here the whole
optimization is one jitted ``lax.fori_loop`` of Adam steps over all RoIs at
once, with observation targets built from the dense masked pooling layout.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ..ops import roi_pool as rp


def observation_targets(local_xyz: jax.Array, pool_mask: jax.Array,
                        roi_sizes: jax.Array, voxel_size: float,
                        queries: jax.Array) -> jax.Array:
    """Binary observed-occupancy labels for ``queries`` [L, K, 3]: 1 where
    the query's voxel cell contains at least one pooled point.

    local_xyz/pool_mask: [L, P(, 3)] box-local pooled points;
    roi_sizes: [L, 3]. Matches ``sample_observation``'s voxel-grid label
    construction without materializing per-RoI dense grids: a query is
    occupied iff some point snaps to the same voxel center.
    """
    pt_centers = rp.quantize_to_voxel_centers(local_xyz, roi_sizes,
                                              voxel_size)  # [L, P, 3]
    q_centers = rp.quantize_to_voxel_centers(queries, roi_sizes, voxel_size)
    same = jnp.all(
        jnp.abs(q_centers[:, :, None, :] - pt_centers[:, None, :, :])
        < voxel_size * 0.5, axis=-1)                       # [L, K, P]
    return jnp.any(same & pool_mask[:, None, :], axis=-1).astype(jnp.float32)


def tune_latent(decode_fn, latent: jax.Array, queries: jax.Array,
                labels: jax.Array, mask: jax.Array, num_iters: int = 10,
                lr: float = 0.01) -> jax.Array:
    """Adam-optimize ``latent`` [L, D] so decode_fn(latent, queries) fits
    the observed ``labels`` [L, K] (BCE), ``mask`` selecting valid samples.
    decode_fn must be differentiable in its first argument."""
    tx = optax.adam(lr)

    def loss_fn(lat):
        logits = decode_fn(lat, queries)
        bce = (jnp.maximum(logits, 0) - logits * labels
               + jnp.log1p(jnp.exp(-jnp.abs(logits))))
        return jnp.sum(bce * mask) / jnp.clip(jnp.sum(mask), 1.0, None)

    def body(_, carry):
        lat, opt = carry
        g = jax.grad(loss_fn)(lat)
        upd, opt = tx.update(g, opt, lat)
        return optax.apply_updates(lat, upd), opt

    lat, _ = jax.lax.fori_loop(0, num_iters, body, (latent, tx.init(latent)))
    return lat
