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


_INV_SQRT2 = 0.7071067811865476
_INV_SQRT2PI = 0.3989422804014327


@jax.custom_vjp
def _gelu_exact(x):
    # torch nn.GELU() is the exact erf form; flax's default is the tanh
    # approximation, which diverges by up to ~3e-3 near |x|~2
    return x * 0.5 * (1.0 + jax.lax.erf(x * _INV_SQRT2))


def _gelu_fwd(x):
    # the CDF is materialized behind a barrier so the erf chain is computed
    # once instead of being re-fused (and recomputed) into every consuming
    # GEMM's data-grad and weight-grad kernels — same lesson as
    # BarrierDropout; naive erf gelu measured 202 -> 142 t/s on the
    # flagship step
    cdf = 0.5 * (1.0 + jax.lax.erf(x * _INV_SQRT2))
    cdf = jax.lax.optimization_barrier(cdf)
    return x * cdf, (x, cdf)


def _gelu_bwd(res, g):
    x, cdf = res
    pdf = _INV_SQRT2PI * jnp.exp(-0.5 * x * x)
    return (g * (cdf + x * pdf),)


_gelu_exact.defvjp(_gelu_fwd, _gelu_bwd)

@jax.custom_vjp
def _gelu_exact_fd(x):
    return x * 0.5 * (1.0 + jax.lax.erf(x * _INV_SQRT2))


def _gelu_fd_fwd(x):
    # variant: compute the full derivative factor in forward; bwd is a
    # single fused multiply (trades an extra activation store for zero
    # transcendentals in the backward pass)
    cdf = 0.5 * (1.0 + jax.lax.erf(x * _INV_SQRT2))
    pdf = _INV_SQRT2PI * jnp.exp(-0.5 * x * x)
    cdf, d = jax.lax.optimization_barrier((cdf, cdf + x * pdf))
    return x * cdf, (d,)


def _gelu_fd_bwd(res, g):
    return (g * res[0],)


_gelu_exact_fd.defvjp(_gelu_fd_fwd, _gelu_fd_bwd)


@jax.custom_vjp
def _gelu_tanh_cvjp(x):
    return nn.gelu(x, approximate=True)


def _gelu_tanh_fwd(x):
    y = nn.gelu(x, approximate=True)
    return y, (x,)


def _gelu_tanh_bwd(res, g):
    (x,) = res
    _, d = jax.jvp(lambda v: nn.gelu(v, approximate=True), (x,), (g,))
    return (d,)


_gelu_tanh_cvjp.defvjp(_gelu_tanh_fwd, _gelu_tanh_bwd)

def _gelu_auto(x):
    """Dtype-adaptive GELU.

    fp32 (parity, weight transplants, reference-checkpoint eval): the exact
    erf form matching torch nn.GELU(), with the barrier'd-CDF custom_vjp.

    bf16 (production compute): the tanh approximation. Measured
    justification: on identical bf16 inputs, BOTH forms deviate from
    f32-exact-then-rounded by up to 1.6e-2 (bf16 arithmetic noise inside
    either transcendental chain), dwarfing the 4.7e-4 erf-vs-tanh
    analytic difference — the approximation adds no error class bf16
    doesn't already impose, and the erf chain measured 2.65 ms/step
    (202 -> 166 t/s) on the flagship bench where tanh fuses for free.
    """
    if x.dtype == jnp.float32 or x.dtype == jnp.float64:
        return _gelu_exact(x)
    return nn.gelu(x, approximate=True)


_GELU_IMPLS = {
    "auto": _gelu_auto,
    "exact": _gelu_exact,
    "exact_fd": _gelu_exact_fd,
    "exact_plain": lambda x: nn.gelu(x, approximate=False),
    "tanh": lambda x: nn.gelu(x, approximate=True),
    "tanh_cvjp": _gelu_tanh_cvjp,
}


def activation(name: str):
    import os
    if name == "gelu":
        return _GELU_IMPLS[os.environ.get("OCOCC_GELU", "auto")]
    return {"relu": nn.relu, "leakyrelu": nn.leaky_relu}[name]


def _hash_bits(key: jax.Array, shape: tuple[int, ...]) -> jax.Array:
    """Counter-hash u32 draws: murmur3 finalizer over an iota, keyed by the
    PRNG key words (~8 VPU ops/element vs threefry's ~40). Full avalanche,
    i.i.d.-grade for dropout masks; one fusion iota -> mask, no u32
    intermediate tensors."""
    kd = key if jnp.issubdtype(key.dtype, jnp.integer) \
        else jax.random.key_data(key)   # typed key (e.g. rbg)
    k = kd.reshape(-1).astype(jnp.uint32)
    n = 1
    for d in shape:
        n *= d
    h = jax.lax.iota(jnp.uint32, n) * jnp.uint32(2654435761) + k[0]
    h ^= h >> 16
    h *= jnp.uint32(0x85EBCA6B)
    h ^= h >> 13
    h ^= k[-1]
    h *= jnp.uint32(0xC2B2AE35)
    h ^= h >> 16
    return h.reshape(shape)


class BarrierDropout(nn.Module):
    """Fast dropout: barrier-pinned counter-hash mask.

    Naive ``nn.Dropout`` measured 14 ms of the 32.5 ms OcOccNet train step
    (43%): XLA fuses the ~20-op/element threefry chain into the consuming
    GEMM kernels as an operand computation and REcomputes it in both the
    data-grad and weight-grad fusions. Two fixes, both load-bearing:

    * the scaled keep-mask is materialized once behind an
      ``optimization_barrier`` so the GEMMs stay clean MXU kernels
      (123 -> 175 t/s on the flagship bench);
    * the draws come from a keyed murmur3-finalizer counter hash
      (``_hash_bits``) instead of threefry — one fusion from iota to
      bf16 mask, no u32 intermediates.

    Same sampling semantics as ``nn.Dropout``: i.i.d. Bernoulli keep with
    probability ``1 - rate`` (u32 threshold, resolution 2^-32), kept
    values scaled by ``1/(1-rate)``; a different-but-equivalent PRNG
    stream. A standalone Pallas hardware-PRNG kernel measured SLOWER
    end-to-end (152.8 vs 179.8 t/s): as its own dispatch it pays full
    extra activation passes in fwd and bwd that the fused mask-multiply
    does not (BENCH_NOTES).
    """
    rate: float

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool) -> jax.Array:
        if deterministic or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        key = self.make_rng("dropout")
        bits = _hash_bits(key, x.shape)
        thresh = jnp.uint32(min(int(round(keep * 4294967296.0)), 0xFFFFFFFF))
        scaled = jnp.where(bits < thresh, 1.0 / keep, 0.0).astype(x.dtype)
        scaled = jax.lax.optimization_barrier(scaled)
        return x * scaled


class Mlp(nn.Module):
    hidden_dims: Sequence[int]
    is_head: bool = False
    act: str = "gelu"
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32   # compute dtype; params stay fp32
    # LN eps: the occ/SIR configs pin 1e-3; reference modules whose
    # norm_cfg omits eps (the FSD cluster/seg heads) run torch's 1e-5 —
    # pass it explicitly there (caught by the executed detector
    # transplants, round 5)
    ln_eps: float = LN_EPS

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
                x = make_ln(f"LayerNorm_{i}", self.ln_eps)(x).astype(
                    self.dtype)
                x = act(x)
                if self.dropout > 0:
                    x = BarrierDropout(self.dropout)(x, deterministic=not train)
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
            x = BarrierDropout(self.dropout)(x, deterministic=not train)
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
