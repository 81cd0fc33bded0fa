"""Shared flax building blocks.

``Mlp`` mirrors the reference ``build_mlp`` (``ops/sst/sst_ops.py:333-360``):
hidden layers are ``Linear(bias=False) -> LayerNorm(eps) -> act -> dropout``;
with ``is_head=True`` the final layer is a plain biased Linear.

``LN_COMPUTE_DTYPE`` selects the LayerNorm computation dtype globally:
fp32 (default, reference parity) or the activations' bf16 — the step
profile attributes a large share of device time to the LN statistic
reductions' fp32 converts + doubled HBM traffic, so bf16 LN is the main
bandwidth knob (set via ``set_ln_dtype`` before building models).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

LN_EPS = 1e-3
_LN_DTYPE = [jnp.float32]


def set_ln_dtype(dtype) -> None:
    _LN_DTYPE[0] = jnp.dtype(dtype)


def ln_dtype():
    return _LN_DTYPE[0]


class OnePassLayerNorm(nn.Module):
    """LayerNorm with single-pass statistics: E[x] and E[x^2] are two
    reductions over ONE read of x (XLA emits them as a multi-output
    fusion), versus the mean-then-centered-variance form whose second
    moment re-reads x. Parameter names match nn.LayerNorm."""
    epsilon: float = LN_EPS

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        # statistics accumulate in fp32 (the E[x^2] - E[x]^2 cancellation
        # is unsafe in bf16); the tensor itself is read once in its own
        # dtype — the upcast fuses into the reduction
        xf = x.astype(jnp.float32)
        m1 = jnp.mean(xf, axis=-1, keepdims=True)
        m2 = jnp.mean(xf * xf, axis=-1, keepdims=True)
        var = jnp.maximum(m2 - m1 * m1, 0.0)
        y = (xf - m1) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(x.dtype)


_ONE_PASS_LN = [True]


def set_one_pass_ln(on: bool) -> None:
    _ONE_PASS_LN[0] = bool(on)


def make_ln(name: str, epsilon: float = LN_EPS):
    """LayerNorm factory honoring the stats-dtype flag. Explicit names keep
    the parameter tree identical across modes (every variant's params
    mirror nn.LayerNorm's), so a CPU-offloaded init building one path
    feeds any other on the chip directly."""
    if _ONE_PASS_LN[0]:
        return OnePassLayerNorm(epsilon=epsilon, name=name)
    return nn.LayerNorm(epsilon=epsilon, dtype=ln_dtype(), name=name)


def activation(name: str):
    return {"relu": nn.relu, "gelu": nn.gelu, "leakyrelu": nn.leaky_relu}[name]


class Mlp(nn.Module):
    hidden_dims: Sequence[int]
    is_head: bool = False
    act: str = "gelu"
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32   # compute dtype; params stay fp32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        act = activation(self.act)
        n = len(self.hidden_dims)
        x = x.astype(self.dtype)
        for i, c in enumerate(self.hidden_dims):
            if i == n - 1 and self.is_head:
                x = nn.Dense(c, use_bias=True, dtype=self.dtype)(x)
            else:
                x = nn.Dense(c, use_bias=False, dtype=self.dtype)(x)
                x = make_ln(f"LayerNorm_{i}")(x).astype(self.dtype)
                x = act(x)
                if self.dropout > 0:
                    x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class VfeLayer(nn.Module):
    """``DynamicVFELayerV2`` (``models/voxel_encoders/utils.py:147-190``):
    dropout -> Linear(bias=False) -> LayerNorm -> act."""
    out_channels: int
    act: str = "gelu"
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(self.out_channels, use_bias=False,
                     dtype=self.dtype)(x.astype(self.dtype))
        x = make_ln("LayerNorm_0")(x)
        return activation(self.act)(x).astype(self.dtype)


def sinusoidal_position_encoding(positions: jax.Array, d_model: int
                                 ) -> jax.Array:
    """Frame-index encoding, reference ``PositionalEncoding``
    (``models/occ/layers.py:8-32``): [sin(p*div), cos(p*div)] concatenated
    halves (not interleaved)."""
    div = jnp.exp(
        jnp.arange(0, d_model, 2, dtype=jnp.float32)
        * (-jnp.log(10000.0) / d_model)
    )
    ang = positions[..., None].astype(jnp.float32) * div
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


def nerf_position_encoding(xyz: jax.Array, num_freqs: int = 10,
                           bound=(-8.0, -8.0, -4.0, 8.0, 8.0, 4.0)
                           ) -> jax.Array:
    """Query-point encoding, reference ``PosEncode``
    (``models/occ/occ_base.py:26-55``): normalize to [-1, 1] by ``bound``,
    multiply by 2^k, emit sin(pi x) then cos(pi x) over (freq, xyz) flattened
    to 2*num_freqs*3 channels."""
    lo = jnp.asarray(bound[:3], xyz.dtype)
    hi = jnp.asarray(bound[3:], xyz.dtype)
    x = (xyz - lo) / (hi - lo) * 2.0 - 1.0
    freqs = 2.0 ** jnp.arange(num_freqs, dtype=xyz.dtype)
    ang = jnp.pi * x[..., None, :] * freqs[:, None]  # [..., F, 3]
    out = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-2)
    return out.reshape(out.shape[:-2] + (2 * num_freqs * 3,))
