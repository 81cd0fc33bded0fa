"""Fused LayerNorm — Pallas TPU kernel with a hand-written backward.

The OcOccNet step profile pins its largest bucket (~18 ms of a 52 ms step)
on the LayerNorm statistic/backward reduce fusions: XLA materializes each
[rows, C] activation several times per LN (mean pass, variance pass,
normalize pass; then in the backward the dscale/dbias reductions and the
dx combination each re-read the saved input). This kernel makes each pass
read every operand exactly once:

* forward: one read of x -> y, plus per-row (mean, rstd) saved for the
  backward (tiny);
* backward: one read of (x, dy) -> dx, with dscale/dbias accumulated in a
  grid-invariant VMEM block across the sequential row-block grid.

Statistics are computed in fp32 regardless of the activation dtype (better
than the bf16-stats fallback AND cheaper than XLA's fp32 upcast, because
the fp32 values never touch HBM). Matches ``nn.LayerNorm`` semantics with
``epsilon = LN_EPS`` and the standard scale/bias parameterization.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LN_EPS = 1e-3
_TARGET_BLOCK_ELEMS = 128 * 1024     # rows-per-step sizing
_VMEM_LIMIT = 64 * 1024 * 1024


def _rows_per_step(n_rows: int, c: int) -> int:
    r = max(8, _TARGET_BLOCK_ELEMS // max(c, 1))
    r = (r // 8) * 8
    return min(r, max(8, ((n_rows + 7) // 8) * 8))


def _pad_rows(x2, r):
    n = x2.shape[0]
    pad = (-n) % r
    if pad == 0:
        return x2
    return jnp.pad(x2, ((0, pad), (0, 0)))


def _fwd_kernel(eps, x_ref, s_ref, b_ref, y_ref, mu_ref, rs_ref):
    x = x_ref[...].astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    y = (x - mu) * rstd * s_ref[...] + b_ref[...]
    y_ref[...] = y.astype(y_ref.dtype)
    mu_ref[...] = mu
    rs_ref[...] = rstd


def _bwd_kernel(x_ref, s_ref, mu_ref, rs_ref, dy_ref,
                dx_ref, ds_ref, db_ref):
    x = x_ref[...].astype(jnp.float32)
    dy = dy_ref[...].astype(jnp.float32)
    xhat = (x - mu_ref[...]) * rs_ref[...]
    dxhat = dy * s_ref[...]
    dx = rs_ref[...] * (
        dxhat
        - jnp.mean(dxhat, axis=-1, keepdims=True)
        - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True))
    dx_ref[...] = dx.astype(dx_ref.dtype)
    ds = jnp.sum(dy * xhat, axis=0, keepdims=True)
    db = jnp.sum(dy, axis=0, keepdims=True)
    is_first = pl.program_id(0) == 0

    @pl.when(is_first)
    def _():
        ds_ref[...] = ds
        db_ref[...] = db

    @pl.when(jnp.logical_not(is_first))
    def _():
        ds_ref[...] = ds_ref[...] + ds
        db_ref[...] = db_ref[...] + db


def _row_spec(r, c):
    return pl.BlockSpec((r, c), lambda i: (i, 0))


def _stat_spec(r):
    return pl.BlockSpec((r, 1), lambda i: (i, 0))


def _const_spec(c):
    return pl.BlockSpec((1, c), lambda i: (0, 0))


def _fwd_call(x2, scale, bias, eps, interpret):
    n, c = x2.shape
    r = _rows_per_step(n, c)
    xp = _pad_rows(x2, r)
    npad = xp.shape[0]
    s2 = scale.reshape(1, c).astype(jnp.float32)
    b2 = bias.reshape(1, c).astype(jnp.float32)
    kernel = functools.partial(_fwd_kernel, eps)
    y, mu, rstd = pl.pallas_call(
        kernel,
        grid=(npad // r,),
        in_specs=[_row_spec(r, c), _const_spec(c), _const_spec(c)],
        out_specs=(_row_spec(r, c), _stat_spec(r), _stat_spec(r)),
        out_shape=(jax.ShapeDtypeStruct((npad, c), x2.dtype),
                   jax.ShapeDtypeStruct((npad, 1), jnp.float32),
                   jax.ShapeDtypeStruct((npad, 1), jnp.float32)),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(xp, s2, b2)
    return y[:n], mu[:n], rstd[:n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_layernorm(x, scale, bias, eps=LN_EPS, interpret=False):
    """LayerNorm over the last axis; x [..., C]; scale/bias [C].

    Output dtype == input dtype; statistics fp32 in VMEM."""
    shape = x.shape
    x2 = x.reshape(-1, shape[-1])
    y, _, _ = _fwd_call(x2, scale, bias, eps, interpret)
    return y.reshape(shape)


def _fln_fwd(x, scale, bias, eps, interpret):
    shape = x.shape
    x2 = x.reshape(-1, shape[-1])
    y, mu, rstd = _fwd_call(x2, scale, bias, eps, interpret)
    return y.reshape(shape), (x2, scale, mu, rstd, shape)


def _fln_bwd(eps, interpret, res, dy):
    x2, scale, mu, rstd, shape = res
    n, c = x2.shape
    dy2 = dy.reshape(n, c)
    r = _rows_per_step(n, c)
    xp = _pad_rows(x2, r)
    dyp = _pad_rows(dy2, r)   # zero rows contribute nothing to ds/db
    mup = _pad_rows(mu, r)
    rsp = _pad_rows(rstd, r)
    npad = xp.shape[0]
    s2 = scale.reshape(1, c).astype(jnp.float32)
    dx, ds, db = pl.pallas_call(
        _bwd_kernel,
        grid=(npad // r,),
        in_specs=[_row_spec(r, c), _const_spec(c), _stat_spec(r),
                  _stat_spec(r), _row_spec(r, c)],
        out_specs=(_row_spec(r, c), _const_spec(c), _const_spec(c)),
        out_shape=(jax.ShapeDtypeStruct((npad, c), dy2.dtype),
                   jax.ShapeDtypeStruct((1, c), jnp.float32),
                   jax.ShapeDtypeStruct((1, c), jnp.float32)),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(xp, s2, mup, rsp, dyp)
    return (dx[:n].reshape(shape), ds[0].astype(scale.dtype),
            db[0].astype(scale.dtype))


fused_layernorm.defvjp(_fln_fwd, _fln_bwd)
