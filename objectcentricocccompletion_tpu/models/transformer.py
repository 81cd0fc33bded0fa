"""Causal temporal transformer over tracklet frames.

Rebuild of the reference ``SimpleEncoderLayer``/``TransformerEncoder``
(``models/occ/layers.py:35-99``) + the fixed-length forward of
``OccBBoxHead.transformer_forward_fixed_length``
(``ococc_bbox_head.py:849-908``).

The reference sorts RoIs by (batch, frame), runs torch MHA on [L, B, D] and
unsorts. Here frames are already laid out densely as ``[B, L, D]`` so the
reorder/inverse machinery disappears; attention is three einsums on the MXU
with an additive causal mask.

Post-norm layer, matching torch: q = k = src + pos, v = src;
src += attn; LN; src += FFN; LN. Attention-weight dropout = ``attn_dropout``;
the residual/FFN dropouts are 0 in the reference config.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import LN_EPS, BarrierDropout, activation, make_ln


class CausalSelfAttention(nn.Module):
    num_heads: int
    attn_dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q_in, k_in, v_in, mask, *, train: bool = False):
        """q_in/k_in/v_in: [B, L, D]; mask: [L, L] additive (0 / -inf)."""
        d = v_in.shape[-1]
        h = self.num_heads
        hd = d // h
        scale = 1.0 / jnp.sqrt(hd)

        def split(x, name):
            y = nn.Dense(d, name=name, dtype=self.dtype)(
                x.astype(self.dtype))
            return y.reshape(y.shape[:-1] + (h, hd))

        q = split(q_in, "q") * scale
        k = split(k_in, "k")
        v = split(v_in, "v")
        # softmax in fp32 for stability
        logits = jnp.einsum("blhd,bmhd->bhlm", q, k).astype(jnp.float32) \
            + mask.astype(jnp.float32)
        w = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        if self.attn_dropout > 0:
            w = BarrierDropout(self.attn_dropout)(w, deterministic=not train)
        out = jnp.einsum("bhlm,bmhd->blhd", w, v)
        return nn.Dense(d, name="out", dtype=self.dtype)(
            out.reshape(out.shape[:-2] + (d,)))


class TemporalEncoderLayer(nn.Module):
    num_heads: int = 4
    ffn_dim: int = 512
    attn_dropout: float = 0.1
    act: str = "gelu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, src, pos, mask, *, train: bool = False):
        qk = src + pos
        attn = CausalSelfAttention(self.num_heads, self.attn_dropout,
                                   dtype=self.dtype,
                                   name="self_attn")(qk, qk, src, mask,
                                                     train=train)
        src = make_ln("norm1", epsilon=1e-5)(src + attn)
        ffn = nn.Dense(self.ffn_dim, name="linear1",
                       dtype=self.dtype)(src.astype(self.dtype))
        ffn = activation(self.act)(ffn)
        ffn = nn.Dense(src.shape[-1], name="linear2", dtype=self.dtype)(ffn)
        return make_ln("norm2", epsilon=1e-5)(src + ffn)


class TemporalEncoder(nn.Module):
    num_layers: int = 3
    num_heads: int = 4
    ffn_dim: int = 512
    attn_dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, src: jax.Array, pos: jax.Array,
                 causal: bool = True, window: int = -1, *,
                 train: bool = False) -> jax.Array:
        """src, pos: [B, L, D]. ``window`` > 0 additionally restricts
        attention to the last ``window`` frames (test-time
        ``attn_window_size``, ``ococc_bbox_head.py:1021-1030``)."""
        L = src.shape[1]
        i = jnp.arange(L)[:, None]
        j = jnp.arange(L)[None, :]
        allowed = jnp.ones((L, L), bool)
        if causal:
            allowed &= j <= i
        if window > 0:
            allowed &= j > i - window
        mask = jnp.where(allowed, 0.0, -jnp.inf).astype(src.dtype)
        for n in range(self.num_layers):
            src = TemporalEncoderLayer(
                self.num_heads, self.ffn_dim, self.attn_dropout,
                dtype=self.dtype,
                name=f"layer_{n}")(src, pos, mask, train=train)
        return src
