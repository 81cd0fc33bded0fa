"""Fused SIR encoder — Pallas TPU kernels.

The two SIR encoders dominate OcOccNet's step time. In the einsum path each
of the 12 blocks round-trips several [G*P, C] activations through HBM (gate
multiply, VFE outputs, broadcast-concat, masked maxima, LayerNorm statistic
passes); the step profile attributes ~44% of device time to those
multiply/convert-reduce fusions.

This module fuses the ENTIRE encoder stack (all ``num_blocks`` SIR blocks,
``models/sir.py::SIREncoder``) into one kernel that processes a BLOCK of
``GB`` groups (RoIs) per grid step with the whole chain resident in VMEM:

* **Forward** reads xyz/feats/f_rel/mask for the group block once and
  writes only the concatenated per-block cluster features
  ``[G, num_blocks * 2*C1]`` — OcOccNet discards the per-point outputs, so
  the HBM write per group drops from ~``P*C*num_blocks`` floats to ~1.5k.
* **Backward** is a second Pallas kernel (flash-attention-style recompute):
  it re-runs the forward chain in VMEM, then walks the blocks in reverse
  with a hand-written backward (``_block_bwd``). Parameter gradients
  accumulate in grid-invariant output blocks (TPU grids execute
  sequentially), flushed to HBM once at the end.

Matmuls run bf16 x bf16 -> fp32 on the MXU; LayerNorm statistics are fp32
with the framework-wide ``LN_EPS`` (matching ``models/layers.py``). The
reverse sweep keeps every recomputed activation live (no cross-block
reuse in Mosaic's stack allocator), so the backward runs with a raised
``vmem_limit_bytes`` and a smaller group block.

Reference semantics: ``SIRLayer`` hot loop
(``/root/reference/mmdet3d/models/voxel_encoders/voxel_encoder.py:686-830``)
and the RoI/AE encoder wirings
(``ococc_bbox_head.py:237-316``, ``occ_ae_head.py:203-264``).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LN_EPS = 1e-3
_NEG = -1e30
PARAMS_PER_BLOCK = 15
FWD_GROUP_BLOCK = 1      # >1 hangs the remote Mosaic compiler in this env
BWD_GROUP_BLOCK = 1
_VMEM_LIMIT = 120 * 1024 * 1024


def _ln(x, scale, bias):
    x = x.astype(jnp.float32)
    m = jnp.mean(x, axis=-1, keepdims=True)
    v = jnp.mean((x - m) ** 2, axis=-1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + LN_EPS) * scale + bias


def _gelu(x):
    return jax.nn.gelu(x)


_GELU_C = 0.7978845608028654        # sqrt(2/pi)
_GELU_A = 0.044715


def _gelu_grad(x):
    """d/dx of the tanh-approximate gelu (jax.nn.gelu default)."""
    x2 = x * x
    u = _GELU_C * (x + _GELU_A * x * x2)
    t = jnp.tanh(u)
    return 0.5 * (1.0 + t) + 0.5 * x * (1.0 - t * t) * _GELU_C * (
        1.0 + 3.0 * _GELU_A * x2)


def _dot16(a, w):
    """bf16 multiply, fp32 accumulate — the MXU fast path.

    a may be [..., P, C]; contraction is over the last axis of ``a`` with
    the first of ``w``."""
    a16 = a.astype(jnp.bfloat16)
    w16 = w.astype(jnp.bfloat16)
    if a.ndim == 2:
        return jnp.dot(a16, w16, preferred_element_type=jnp.float32)
    lead = a.shape[:-1]
    out = jnp.dot(a16.reshape(-1, a.shape[-1]), w16,
                  preferred_element_type=jnp.float32)
    return out.reshape(lead + (w.shape[-1],))


def _dotT16(a, b):
    """a^T @ b over the leading (group, point) axes: [..., P, C1] x
    [..., P, C2] -> [C1, C2] fp32 (summed across groups)."""
    a2 = a.reshape(-1, a.shape[-1]).astype(jnp.bfloat16)
    b2 = b.reshape(-1, b.shape[-1]).astype(jnp.bfloat16)
    return jnp.dot(a2.T, b2, preferred_element_type=jnp.float32)


def _ln_bwd(x, scale, dy):
    """Backward of ``_ln`` recomputing stats from the pre-LN input.

    x, dy: [..., P, C]. Returns (dx, dscale [C], dbias [C]); the parameter
    grads are summed over every leading axis."""
    x = x.astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    s = jax.lax.rsqrt(var + LN_EPS)
    xhat = (x - mu) * s
    sum_axes = tuple(range(x.ndim - 1))
    dscale = jnp.sum(dy * xhat, axis=sum_axes)
    dbias = jnp.sum(dy, axis=sum_axes)
    dxhat = dy * scale
    dx = s * (dxhat
              - jnp.mean(dxhat, axis=-1, keepdims=True)
              - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True))
    return dx, dscale, dbias


def _masked_max(h, m, any_valid):
    """h [..., P, C]; m [..., P, 1]; any_valid [..., 1, 1] ->
    [..., 1, C] (0 for empty groups)."""
    g = jnp.max(jnp.where(m > 0, h, _NEG), axis=-2, keepdims=True)
    return jnp.where(any_valid > 0, g, 0.0)


def _max_bwd(h, m, any_valid, gmax, dg):
    """Backward of the masked max: split the cotangent equally among tied
    argmax rows (matches ``jnp.max``'s VJP); zero when the group is empty."""
    eq = (h == gmax) & (m > 0)
    cnt = jnp.clip(jnp.sum(eq.astype(jnp.float32), axis=-2, keepdims=True),
                   1.0, None)
    return jnp.where(any_valid > 0,
                     eq.astype(jnp.float32) * (dg / cnt), 0.0)


def _block_math(xin, rel, m, any_valid, params):
    """One SIR block on VMEM-resident values.

    xin [GB, P, Cin]; rel [GB, P, R]; m [GB, P, 1] float (1 = valid);
    any_valid [GB, 1, 1]. Returns (h2 [GB, P, C1], cluster [GB, 2*C1]).

    gate = gelu(LN(gelu(LN(gelu(LN(rel@gw0))@gw1))@gw2))   (rel-MLP)
    h1 = gelu(LN((xin * gate) @ w1)); g1 = maskedmax(h1)
    h2 = gelu(LN(cat(h1, g1) @ w2)); g2 = maskedmax(h2)
    """
    (gw0, gs0, gb0, gw1, gs1, gb1, gw2, gs2, gb2,
     w1, s1, b1, w2, s2, b2) = params
    g = _gelu(_ln(_dot16(rel, gw0), gs0, gb0))
    g = _gelu(_ln(_dot16(g, gw1), gs1, gb1))
    g = _gelu(_ln(_dot16(g, gw2), gs2, gb2))

    h1 = _gelu(_ln(_dot16(xin.astype(jnp.float32) * g, w1), s1, b1))
    g1 = _masked_max(h1, m, any_valid)
    cat = jnp.concatenate([h1, jnp.broadcast_to(g1, h1.shape)], axis=-1)
    h2 = _gelu(_ln(_dot16(cat, w2), s2, b2))
    g2 = _masked_max(h2, m, any_valid)
    return h2, jnp.concatenate([g1[..., 0, :], g2[..., 0, :]], axis=-1)


def _block_bwd(xin, rel, m, any_valid, params, dh2_out, dclu):
    """Hand-written backward of ``_block_math`` for one group block.

    Recomputes the forward in VMEM (flash-style), then backprops. xin
    [GB, P, Cin]; rel [GB, P, R]; dh2_out [GB, P, C1] cotangent on the
    point output; dclu [GB, 2*C1] cotangent on the cluster output. Returns
    (dxin, drel, dparams 15-tuple; param grads summed over the block)."""
    (gw0, gs0, gb0, gw1, gs1, gb1, gw2, gs2, gb2,
     w1, s1, b1, w2, s2, b2) = params
    xin = xin.astype(jnp.float32)
    rel = rel.astype(jnp.float32)
    C1 = w1.shape[1]

    # ---- recompute forward ----
    a0 = _dot16(rel, gw0)
    z0 = _gelu(_ln(a0, gs0, gb0))
    a1 = _dot16(z0, gw1)
    z1 = _gelu(_ln(a1, gs1, gb1))
    a2 = _dot16(z1, gw2)
    l2 = _ln(a2, gs2, gb2)
    gate = _gelu(l2)
    xg = xin * gate
    bb1 = _dot16(xg, w1)
    n1 = _ln(bb1, s1, b1)
    h1 = _gelu(n1)
    g1 = _masked_max(h1, m, any_valid)
    cat = jnp.concatenate([h1, jnp.broadcast_to(g1, h1.shape)], axis=-1)
    bb2 = _dot16(cat, w2)
    n2 = _ln(bb2, s2, b2)
    h2 = _gelu(n2)
    g2 = _masked_max(h2, m, any_valid)

    dg1c = dclu[..., None, :C1]                 # [GB, 1, C1]
    dg2c = dclu[..., None, C1:]

    # ---- backward ----
    dh2 = dh2_out.astype(jnp.float32) + _max_bwd(h2, m, any_valid, g2, dg2c)
    dn2 = dh2 * _gelu_grad(n2)
    db2, ds2, dbias2 = _ln_bwd(bb2, s2, dn2)
    dcat = _dot16(db2, w2.T)
    dw2 = _dotT16(cat, db2)
    dh1 = dcat[..., :C1]
    dg1 = dg1c + jnp.sum(dcat[..., C1:], axis=-2, keepdims=True) * (
        any_valid > 0)
    dh1 = dh1 + _max_bwd(h1, m, any_valid, g1, dg1)
    dn1 = dh1 * _gelu_grad(n1)
    db1, ds1, dbias1 = _ln_bwd(bb1, s1, dn1)
    dxg = _dot16(db1, w1.T)
    dw1 = _dotT16(xg, db1)
    dxin = dxg * gate
    dgate = dxg * xin
    dl2 = dgate * _gelu_grad(l2)
    da2, dgs2, dgb2 = _ln_bwd(a2, gs2, dl2)
    dz1 = _dot16(da2, gw2.T)
    dgw2 = _dotT16(z1, da2)
    dl1 = dz1 * _gelu_grad(_ln(a1, gs1, gb1))
    da1, dgs1, dgb1 = _ln_bwd(a1, gs1, dl1)
    dz0 = _dot16(da1, gw1.T)
    dgw1 = _dotT16(z0, da1)
    dl0 = dz0 * _gelu_grad(_ln(a0, gs0, gb0))
    da0, dgs0, dgb0 = _ln_bwd(a0, gs0, dl0)
    drel = _dot16(da0, gw0.T)
    dgw0 = _dotT16(rel, da0)

    return dxin, drel, (dgw0, dgs0, dgb0, dgw1, dgs1, dgb1,
                        dgw2, dgs2, dgb2, dw1, ds1, dbias1,
                        dw2, ds2, dbias2)


def _chain(xyz, feats, rel, m, any_valid, blocks, geo_input, shortcut):
    """Full encoder chain on VMEM values ([GB, P, C] layout). Returns
    (clusters [GB, NB*2*C1], h_chain per-block point-feature inputs)."""
    h = feats.astype(jnp.float32)
    clusters = []
    h_chain = [h]
    for params in blocks:
        parts = [xyz.astype(jnp.float32), h]
        if geo_input:
            parts.append(rel.astype(jnp.float32))
        xin = jnp.concatenate(parts, axis=-1)
        h2, clu = _block_math(xin, rel, m, any_valid, params)
        if shortcut and not geo_input and h.shape == h2.shape:
            h2 = h2 + h
        h = h2
        h_chain.append(h)
        clusters.append(clu)
    return jnp.concatenate(clusters, axis=-1), h_chain


def _fwd_kernel(nb, geo_input, shortcut,
                xyz_ref, feats_ref, rel_ref, mask_ref, *rest):
    param_refs, (out_ref,) = rest[:-1], rest[-1:]
    xyz = xyz_ref[...]
    feats = feats_ref[...]
    rel = rel_ref[...]
    m = mask_ref[...].astype(jnp.float32)            # [GB, P, 1]
    any_valid = jnp.max(m, axis=-2, keepdims=True)   # [GB, 1, 1]
    blocks = [tuple(r[...] for r in param_refs[i * PARAMS_PER_BLOCK:
                                               (i + 1) * PARAMS_PER_BLOCK])
              for i in range(nb)]
    clusters, _ = _chain(xyz, feats, rel, m, any_valid, blocks,
                         geo_input, shortcut)
    # out is [G, 1, W] (3-D so the (1, W) trailing block dims satisfy the
    # TPU tiling rule)
    out_ref[:, 0, :] = clusters.astype(out_ref.dtype)


def _bwd_kernel(nb, geo_input, shortcut,
                xyz_ref, feats_ref, rel_ref, mask_ref, *rest):
    param_refs = rest[:nb * PARAMS_PER_BLOCK]
    dclu_ref = rest[nb * PARAMS_PER_BLOCK]
    out_refs = rest[nb * PARAMS_PER_BLOCK + 1:]
    dxyz_ref, dfeats_ref, drel_ref = out_refs[:3]
    dparam_refs = out_refs[3:]

    xyz = xyz_ref[...]
    feats = feats_ref[...]
    rel = rel_ref[...]
    m = mask_ref[...].astype(jnp.float32)
    any_valid = jnp.max(m, axis=-2, keepdims=True)
    blocks = [tuple(r[...] for r in param_refs[i * PARAMS_PER_BLOCK:
                                               (i + 1) * PARAMS_PER_BLOCK])
              for i in range(nb)]
    dclu = dclu_ref[:, 0, :].astype(jnp.float32)     # [GB, NB*2*C1]

    # recompute forward, keeping only the block inputs
    _, h_chain = _chain(xyz, feats, rel, m, any_valid, blocks,
                        geo_input, shortcut)

    # reverse sweep: hand-written per-block backward (recompute in VMEM)
    xyz32 = xyz.astype(jnp.float32)
    rel32 = rel.astype(jnp.float32)
    clu_w = 2 * blocks[0][9].shape[1]                # 2 * C1
    dh = None
    dxyz = jnp.zeros_like(xyz32)
    drel = jnp.zeros_like(rel32)
    dparams_all = [None] * nb
    for i in reversed(range(nb)):
        h_in = h_chain[i]
        had_shortcut = (shortcut and not geo_input
                        and h_chain[i + 1].shape == h_in.shape)
        parts = [xyz32, h_in.astype(jnp.float32)]
        if geo_input:
            parts.append(rel32)
        xin = jnp.concatenate(parts, axis=-1)

        dclu_i = dclu[:, i * clu_w:(i + 1) * clu_w]
        dh2 = dh if dh is not None else jnp.zeros_like(h_chain[i + 1])
        dxin, drel_i, dp_i = _block_bwd(xin, rel32, m, any_valid,
                                        blocks[i], dh2, dclu_i)
        ci = h_in.shape[-1]
        dh_in = dxin[..., 3:3 + ci]
        if had_shortcut and dh is not None:
            dh_in = dh_in + dh                        # residual pass-through
        dh = dh_in
        dxyz = dxyz + dxin[..., :3]
        drel = drel + drel_i
        if geo_input:
            drel = drel + dxin[..., 3 + ci:]
        dparams_all[i] = dp_i

    dxyz_ref[...] = dxyz.astype(dxyz_ref.dtype)
    dfeats_ref[...] = dh.astype(dfeats_ref.dtype)
    drel_ref[...] = drel.astype(drel_ref.dtype)

    flat_dp = [t for dp in dparams_all for t in dp]
    is_first = pl.program_id(0) == 0

    @pl.when(is_first)
    def _():
        for r, v in zip(dparam_refs, flat_dp):
            r[...] = v.astype(r.dtype)

    @pl.when(jnp.logical_not(is_first))
    def _():
        for r, v in zip(dparam_refs, flat_dp):
            r[...] = r[...] + v.astype(r.dtype)


def _group_spec(shape, gb):
    nd = len(shape)
    return pl.BlockSpec((gb,) + shape[1:], lambda g: (g,) + (0,) * (nd - 1))


def _whole_spec(arr):
    nd = arr.ndim
    return pl.BlockSpec(arr.shape, lambda g: (0,) * nd)


def _pad_groups(x, gb):
    g = x.shape[0]
    pad = (-g) % gb
    if pad == 0:
        return x
    return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def fused_sir_encoder(xyz, feats, rel, mask, blocks_params,
                      geo_input=False, shortcut=True, interpret=False):
    """Fused SIR encoder stack.

    xyz [G, P, 3] (already divided by xyz_normalizer); feats [G, P, F]
    initial point features; rel [G, P, R] (already divided by
    rel_dist_scaler); mask [G, P] bool; blocks_params = tuple per block of
    the 15-tuple (gate w/scale/bias x3, vfe1 w/scale/bias, vfe2
    w/scale/bias).

    Returns cluster features [G, num_blocks * 2*C1] in ``feats.dtype``.
    Differentiable in xyz/feats/rel/params (mask gets no gradient).
    """
    nb = len(blocks_params)
    G = xyz.shape[0]
    gb = min(FWD_GROUP_BLOCK, G)
    C1 = blocks_params[0][9].shape[1]
    mask_f = _pad_groups(mask[..., None].astype(xyz.dtype), gb)
    xyz_p, feats_p, rel_p = (_pad_groups(t, gb) for t in (xyz, feats, rel))
    gp = xyz_p.shape[0]
    flat_params = [t for bp in blocks_params for t in bp]

    kernel = functools.partial(_fwd_kernel, nb, geo_input, shortcut)
    out = pl.pallas_call(
        kernel,
        grid=(gp // gb,),
        in_specs=[_group_spec(xyz_p.shape, gb), _group_spec(feats_p.shape,
                                                            gb),
                  _group_spec(rel_p.shape, gb), _group_spec(mask_f.shape,
                                                            gb)]
        + [_whole_spec(w) for w in flat_params],
        out_specs=_group_spec((gp, 1, nb * 2 * C1), gb),
        out_shape=jax.ShapeDtypeStruct((gp, 1, nb * 2 * C1), feats.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(xyz_p, feats_p, rel_p, mask_f, *flat_params)
    return out[:G, 0]


def _fse_fwd(xyz, feats, rel, mask, blocks_params,
             geo_input, shortcut, interpret):
    out = fused_sir_encoder(xyz, feats, rel, mask, blocks_params,
                            geo_input, shortcut, interpret)
    return out, (xyz, feats, rel, mask, blocks_params)


def _fse_bwd(geo_input, shortcut, interpret, res, dclu):
    xyz, feats, rel, mask, blocks_params = res
    nb = len(blocks_params)
    G = xyz.shape[0]
    gb = min(BWD_GROUP_BLOCK, G)
    mask_f = _pad_groups(mask[..., None].astype(xyz.dtype), gb)
    xyz_p, feats_p, rel_p = (_pad_groups(t, gb) for t in (xyz, feats, rel))
    dclu3 = _pad_groups(dclu[:, None, :], gb)         # [Gp, 1, W]
    gp = xyz_p.shape[0]
    flat_params = [t for bp in blocks_params for t in bp]

    kernel = functools.partial(_bwd_kernel, nb, geo_input, shortcut)
    out_shapes = (
        [jax.ShapeDtypeStruct(xyz_p.shape, jnp.float32),
         jax.ShapeDtypeStruct(feats_p.shape, jnp.float32),
         jax.ShapeDtypeStruct(rel_p.shape, jnp.float32)]
        + [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in flat_params])
    out_specs = (
        [_group_spec(xyz_p.shape, gb), _group_spec(feats_p.shape, gb),
         _group_spec(rel_p.shape, gb)]
        + [_whole_spec(w) for w in flat_params])

    outs = pl.pallas_call(
        kernel,
        grid=(gp // gb,),
        in_specs=[_group_spec(xyz_p.shape, gb),
                  _group_spec(feats_p.shape, gb),
                  _group_spec(rel_p.shape, gb),
                  _group_spec(mask_f.shape, gb)]
        + [_whole_spec(w) for w in flat_params]
        + [_group_spec(dclu3.shape, gb)],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        # the unrolled reverse sweep's scoped stack exceeds the 16 MB
        # default; v5e/v5p cores carry 128 MB of VMEM
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(xyz_p, feats_p, rel_p, mask_f, *flat_params, dclu3)

    dxyz, dfeats, drel = (o[:G] for o in outs[:3])
    flat_dp = outs[3:]
    dparams = tuple(
        tuple(flat_dp[i * PARAMS_PER_BLOCK + j].astype(
            blocks_params[i][j].dtype)
              for j in range(PARAMS_PER_BLOCK))
        for i in range(nb))
    return (dxyz.astype(xyz.dtype), dfeats.astype(feats.dtype),
            drel.astype(rel.dtype), None, dparams)


fused_sir_encoder.defvjp(_fse_fwd, _fse_bwd)


def reference_sir_encoder(xyz, feats, rel, mask, blocks_params,
                          geo_input=False, shortcut=True):
    """Pure-jnp composition of the identical math (for tests)."""
    m = mask[..., None].astype(jnp.float32)
    any_valid = jnp.any(mask, axis=-1)[:, None, None].astype(jnp.float32)
    clu, _ = _chain(xyz, feats, rel, m, any_valid, blocks_params,
                    geo_input, shortcut)
    return clu.astype(feats.dtype)
