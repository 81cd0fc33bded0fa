"""Implicit occupancy field decoder.

Rebuild of ``OccDecoder`` (``models/occ/occ_base.py:58-153``): a conditional
MLP ``[latent ; nerf_posenc(query)] -> 512 -> 1024 -> 1024 -> 1 logit`` with
LayerNorm on the latent first (``use_ln=True``).

TPU optimization: the first Dense sees a [latent(1536) ; posenc(60)] concat
where the latent half is constant across the K query points of an RoI. We
split the first weight matrix so the 1536-wide product runs once per RoI and
only the 60-wide product runs per query — a ~25x FLOP cut on the first layer
with bit-identical math (W [a;b] = W_a a + W_b b).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import (LN_EPS, BarrierDropout, Mlp, activation, make_ln,
                     nerf_position_encoding)


class OccDecoder(nn.Module):
    mlp_dims: Sequence[int] = (512, 1024, 1024)
    num_freqs: int = 10
    act: str = "gelu"
    dropout: float = 0.1
    pos_thresh: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, latent: jax.Array, queries: jax.Array, *,
                 train: bool = False) -> jax.Array:
        """latent: [..., D]; queries: [..., K, 3] box-local query points.
        Returns occupancy logits [..., K]."""
        latent = make_ln("ln", epsilon=1e-5)(latent)
        pos = nerf_position_encoding(queries, self.num_freqs)

        c0 = self.mlp_dims[0]
        lat0 = nn.Dense(c0, use_bias=False, name="in_latent",
                        dtype=self.dtype)(latent.astype(self.dtype))
        pos0 = nn.Dense(c0, use_bias=False, name="in_pos",
                        dtype=self.dtype)(pos.astype(self.dtype))
        x = lat0[..., None, :] + pos0
        x = make_ln("in_norm")(x).astype(self.dtype)
        x = activation(self.act)(x)
        if self.dropout > 0:
            x = BarrierDropout(self.dropout)(x, deterministic=not train)

        x = Mlp(tuple(self.mlp_dims[1:]) + (1,), is_head=True, act=self.act,
                dropout=self.dropout, dtype=self.dtype,
                name="mlp")(x, train=train)
        return x[..., 0].astype(jnp.float32)

    def classify(self, logits: jax.Array) -> jax.Array:
        return (jax.nn.sigmoid(logits) > self.pos_thresh).astype(jnp.int32)
