"""SST (Single-Stride Sparse Transformer, W3) — windowed sparse attention.

Rebuild of the reference ``SSTInputLayerV2`` + ``SSTv2`` +
``BasicShiftBlockV2``/``WindowAttention``
(``models/middle_encoders/sst_input_layer_v2.py``,
``models/backbones/sst_v2.py``, ``models/sst/sst_basic_block_v2.py``),
configured after ``configs/sst_refactor/sst_waymoD5_1x_3class_8heads_v2.py``:
pillars (window 12x12), 6 blocks x 2 encoder layers (regular + shifted
windows), d_model 128, 8 heads, ffn 256, sine positional embedding of
in-window coordinates, post-norm residual layers, final scatter to a BEV
canvas.

TPU form: both window partitions are computed once (sort-based, static
shapes; ``ops/window.py``); each attention layer is a dense masked MHA over
``[n_windows, capacity, C]`` — batched matmuls on the MXU with a key-padding
mask instead of the reference's per-drop-level torch MHA calls.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import voxelize as vx
from ..ops import window as win
from .vfe import DynamicVFE


@dataclasses.dataclass(frozen=True)
class SSTConfig:
    voxel_size: Sequence[float] = (0.32, 0.32, 6.0)
    pc_range: Sequence[float] = (-74.88, -74.88, -2.0, 74.88, 74.88, 4.0)
    window_shape: Sequence[int] = (12, 12, 1)
    max_voxels: int = 20000
    max_points: int = 160000
    max_windows: int = 3200
    d_model: int = 128
    num_heads: int = 8
    ffn_dim: int = 256
    num_blocks: int = 6
    vfe_channels: Sequence[int] = (64, 128)
    pos_temperature: float = 10000.0
    # fused VMEM attention kernel (ops/pallas_attention.py) — validated on
    # hardware and in the full train graph; its value at production shapes
    # is MEMORY (the einsum forward OOMs the train graph — BENCH_NOTES
    # round 4); automatically bypassed off-TPU
    use_pallas_attention: bool = True
    # computation dtype for the transformer/VFE/attention path; parameters
    # and LayerNorm statistics stay float32. The reference trains SST in
    # fp16 with loss scale 32 (configs/sst/*.py:85 `fp16 = dict(
    # loss_scale=32.0)`); bfloat16 needs no loss scaling.
    compute_dtype: str = "float32"

    # two-level drop-level batching (sst_input_layer_v2.drop_voxel):
    # windows with <= small_capacity tokens attend at the small budget —
    # T^2 attention cost stops charging sparse windows for the full 144
    # tokens. 0 (or >= capacity) disables (single bucket).
    small_capacity: int = 32
    # budgets per level (None: small = max_windows, large = max_windows/4;
    # sparse windows dominate real scans)
    max_small_windows: int | None = None
    max_large_windows: int | None = None

    @property
    def small_windows_budget(self) -> int:
        return (self.max_small_windows if self.max_small_windows is not None
                else self.max_windows)

    @property
    def large_windows_budget(self) -> int:
        return (self.max_large_windows if self.max_large_windows is not None
                else max(self.max_windows // 4, 1))

    @property
    def grid_shape(self):
        import numpy as np
        return tuple(np.round(
            (np.asarray(self.pc_range[3:]) - np.asarray(self.pc_range[:3]))
            / np.asarray(self.voxel_size)).astype(int))

    @property
    def capacity(self):
        w = self.window_shape
        return int(w[0] * w[1] * w[2])


def tiny_sst_config() -> SSTConfig:
    return SSTConfig(voxel_size=(0.8, 0.8, 6.0),
                     pc_range=(-9.6, -9.6, -2, 9.6, 9.6, 4),
                     window_shape=(4, 4, 1), max_voxels=512, max_points=2048,
                     max_windows=64, d_model=32, num_heads=4, ffn_dim=64,
                     num_blocks=2, vfe_channels=(16, 32))


def window_pos_embed(coors_in_win: jax.Array, window_shape, d_model: int,
                     temperature: float) -> jax.Array:
    """Sine embedding of in-window (x, y) offsets
    (``sst_input_layer_v2.get_pos_embed`` :239-305, 2D path)."""
    wx, wy, _ = window_shape
    x = coors_in_win[:, 0].astype(jnp.float32) - wx / 2
    y = coors_in_win[:, 1].astype(jnp.float32) - wy / 2
    pos_length = d_model // 2
    i = jnp.arange(pos_length, dtype=jnp.float32)
    inv_freq = temperature ** (2 * (i // 2) / pos_length)

    def embed(v):
        e = v[:, None] / inv_freq[None, :]
        return jnp.stack([jnp.sin(e[:, ::2]), jnp.cos(e[:, 1::2])],
                         -1).reshape(v.shape[0], -1)

    return jnp.concatenate([embed(x), embed(y)], -1)


class WindowMSALayer(nn.Module):
    """Post-norm encoder layer over windowed tokens (BasicShiftBlockV2's
    EncoderLayer): q = k = x + pos, masked MHA, FFN, LayerNorms.

    ``use_pallas`` routes the attention core through the fused VMEM kernel
    (``ops/pallas_attention.py``) instead of the einsum path."""
    num_heads: int
    ffn_dim: int
    use_pallas: bool = False
    dtype: str | None = None
    # FFN activation: the production SSTv2 runs GELU — EncoderLayer's own
    # default is relu (sst_basic_block_v2.py:80) but SSTv2's ctor default
    # activation="gelu" (sst_v2.py:38) is what the shipped configs
    # (sst_refactor/*.py, which set no activation key) actually pass down.
    # Caught by the full-stack transplant test (round 5).
    act: str = "gelu"

    @nn.compact
    def __call__(self, tokens, pos, mask):
        """tokens/pos: [W, T, C]; mask: [W, T] True = valid."""
        dt = jnp.dtype(self.dtype) if self.dtype else tokens.dtype
        tokens = tokens.astype(dt)
        d = tokens.shape[-1]
        h = self.num_heads
        hd = d // h
        qk = tokens + pos.astype(dt)

        q_f = nn.Dense(d, dtype=dt, name="q")(qk)
        k_f = nn.Dense(d, dtype=dt, name="k")(qk)
        v_f = nn.Dense(d, dtype=dt, name="v")(tokens)
        # the fused kernel runs on TPU only; other backends (CPU tests)
        # take the einsum path automatically
        # honor a jax.default_device(cpu) context (CPU-offloaded init)
        _dd = jax.config.jax_default_device
        if (self.use_pallas and jax.default_backend() == "tpu"
                and (_dd is None or _dd.platform == "tpu")):
            from ..ops.pallas_attention import pallas_window_attention
            out = pallas_window_attention(q_f, k_f, v_f, mask, h)
        else:
            # same math as the inline einsum, but with the chunked
            # flash-style backward (no [W, H, T, T] HBM materialization)
            from ..ops.pallas_attention import window_attention_xla
            out = window_attention_xla(q_f, k_f, v_f, mask, h)
        out = nn.Dense(d, dtype=dt, name="out")(out.astype(dt))
        # the reference EncoderLayer norms are plain torch nn.LayerNorm
        # (sst_basic_block_v2.py:98-99) -> eps 1e-5, unlike the
        # VFE/occ norms whose configs pin eps=1e-3
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(tokens + out)
        f = nn.Dense(self.ffn_dim, dtype=dt, name="ffn1")(x.astype(dt))
        if self.act == "gelu":
            from .layers import _gelu_exact
            f = _gelu_exact(f)
        else:
            f = nn.relu(f)
        f = nn.Dense(d, dtype=dt, name="ffn2")(f)
        x = nn.LayerNorm(epsilon=1e-5, name="norm2")(x + f)
        return jnp.where(mask[..., None], x, 0.0)


class SST(nn.Module):
    cfg: SSTConfig

    def setup(self):
        c = self.cfg
        dt = c.compute_dtype
        self.vfe = DynamicVFE(feat_channels=c.vfe_channels,
                              voxel_size=c.voxel_size, pc_range=c.pc_range,
                              dtype=dt)
        self.input_proj = nn.Dense(c.d_model, dtype=jnp.dtype(dt))
        self.layers = [
            WindowMSALayer(c.num_heads, c.ffn_dim,
                           use_pallas=c.use_pallas_attention, dtype=dt,
                           name=f"block{i}_shift{s}")
            for i in range(c.num_blocks) for s in (0, 1)]

    def __call__(self, points: jax.Array, mask: jax.Array) -> jax.Array:
        """points [N, 3+F]; mask [N] -> BEV canvas [gx, gy, d_model]."""
        c = self.cfg
        gs = c.grid_shape
        vres = vx.voxelize(points, mask, c.voxel_size, c.pc_range,
                           c.max_voxels)
        vfeat, _ = self.vfe(points, vres, c.max_voxels)
        x = self.input_proj(vfeat)
        x = jnp.where(vres.voxel_valid[:, None], x, 0.0)

        two_level = 0 < c.small_capacity < c.capacity
        parts, pos = [], []
        for s in (False, True):
            p = win.partition(vres.coords, vres.voxel_valid, gs,
                              c.window_shape, s, c.max_windows, c.capacity)
            pe = window_pos_embed(p.coors_in_win, c.window_shape, c.d_model,
                                  c.pos_temperature)
            if two_level:
                ps, pl = win.split_by_occupancy(
                    p, c.max_windows, c.small_capacity,
                    c.small_windows_budget, c.large_windows_budget)
                levels = ((ps, c.small_windows_budget, c.small_capacity),
                          (pl, c.large_windows_budget, c.capacity))
            else:
                levels = ((p, c.max_windows, c.capacity),)
            parts.append(levels)
            pos.append([win.flat_to_window(pe, lp, mw, cap)[0]
                        for lp, mw, cap in levels])

        for i, layer in enumerate(self.layers):
            s = i % 2
            out_x = x
            for li, (lp, mw, cap) in enumerate(parts[s]):
                tokens, tmask = win.flat_to_window(x, lp, mw, cap)
                tokens = layer(tokens, pos[s][li], tmask)
                out = win.window_to_flat(tokens, lp, c.max_voxels)
                kept = (lp.win_of_voxel >= 0)[:, None]
                out_x = jnp.where(kept, out, out_x)
            # voxels dropped by every level keep their previous feature
            x = out_x

        # recover BEV canvas (sst_v2.recover_bev)
        canvas = jnp.zeros((gs[0], gs[1], c.d_model), x.dtype)
        cx = jnp.where(vres.voxel_valid, vres.coords[:, 0], gs[0])
        cy = jnp.where(vres.voxel_valid, vres.coords[:, 1], 0)
        canvas = canvas.at[cx, cy].set(
            jnp.where(vres.voxel_valid[:, None], x, 0.0), mode="drop")
        return canvas
