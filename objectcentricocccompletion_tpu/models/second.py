"""SECOND 2D BEV backbone + SECONDFPN neck.

Rebuild of the reference ``SECOND``/``SECONDFPN`` (stock mmdet3d, configured
in ``configs/centerpoint/cp_voxel_full_6e_car_occ.py:46-63``): two conv
stages (5 layers each, stride 1 then 2), FPN upsampling both to a common
stride and concatenating. Dense 2D convs map directly onto the MXU; GroupNorm
stands in for BN (batch-size-free, mask-safe).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax


def _norm():
    """GroupNorm at torch semantics for batchless [H, W, C] maps: flax's
    GroupNorm treats the LEADING axis as batch, which on a single-sample
    BEV map would compute per-row statistics — caught by the executed
    CenterHead transplant (round 5). A leading singleton batch axis
    restores per-sample (H, W, C/G) statistics; parameter names are
    unchanged."""
    gn = nn.GroupNorm(num_groups=16, epsilon=1e-3)
    return lambda x: gn(x[None])[0] if x.ndim == 3 else gn(x)


class SECOND(nn.Module):
    out_channels: Sequence[int] = (128, 256)
    layer_nums: Sequence[int] = (5, 5)
    layer_strides: Sequence[int] = (1, 2)

    @nn.compact
    def __call__(self, x: jax.Array) -> list[jax.Array]:
        """x: [H, W, C] single-sample BEV. Returns per-stage maps."""
        outs = []
        # explicit symmetric padding = torch Conv2d(padding=1): for the
        # stride-2 stage flax's SAME pads right-heavy (0, 1), shifting
        # every downstream window half an output cell off the reference's
        # geometry — identical only at stride 1
        pad = ((1, 1), (1, 1))
        for i, (c, n, s) in enumerate(zip(self.out_channels, self.layer_nums,
                                          self.layer_strides)):
            x = nn.Conv(c, (3, 3), strides=(s, s), use_bias=False,
                        padding=pad, name=f"stage{i}_conv0")(x)
            x = _norm()(x)
            x = nn.relu(x)
            for j in range(n):
                x = nn.Conv(c, (3, 3), use_bias=False, padding=pad,
                            name=f"stage{i}_conv{j + 1}")(x)
                x = _norm()(x)
                x = nn.relu(x)
            outs.append(x)
        return outs


class SECONDFPN(nn.Module):
    out_channels: Sequence[int] = (256, 256)
    upsample_strides: Sequence[int] = (1, 2)

    @nn.compact
    def __call__(self, feats: list[jax.Array]) -> jax.Array:
        ups = []
        for i, (x, c, s) in enumerate(zip(feats, self.out_channels,
                                          self.upsample_strides)):
            if s > 1:
                x = nn.ConvTranspose(c, (s, s), strides=(s, s),
                                     use_bias=False, name=f"deblock{i}")(x)
            else:
                # the shipped W2 config sets use_conv_for_no_stride=True:
                # the stride-1 deblock is a 1x1 conv
                # (second_fpn.py:53-59, cp_voxel_full_6e_car_occ.py:62)
                x = nn.Conv(c, (1, 1), use_bias=False,
                            name=f"deblock{i}")(x)
            x = _norm()(x)
            ups.append(nn.relu(x))
        import jax.numpy as jnp
        return jnp.concatenate(ups, -1)
