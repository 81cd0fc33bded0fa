"""FSD++ (W7): incremental multi-frame fully-sparse detection.

Rebuild of ``TwoStageFSDPP`` + the incremental machinery
(``models/detectors/two_stage_fsdpp.py:37``,
``models/detectors/incremental_ops.py``,
``datasets/build_dataloader_sequential.py`` /
``apis/seq_training_apis.py`` — SURVEY.md W7): frames of a sequence are
processed in order; each step keeps a rolling memory of past points and
selects only the *novel* points of the current frame (voxel-diff), then runs
the FSD pipeline on memory + novel points.

Like the reference's ``TwoStageFSDPP``, the wrapped detector is the
TWO-STAGE FSD (group-correction RoI refinement) by default
(``two_stage_fsdpp.py:37`` subclasses ``TwoStageFSD``); ``two_stage=False``
falls back to single-stage FSD for ablation.

The recurrent memory is a fixed-size point buffer (ring semantics via
priority: newest points first), so the whole sequence step is one jitted
function — the reference's stateful python sequence loop becomes a scan-able
transition.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.incremental import incremental_points_mask
from .fsd import FSD, FSDConfig, tiny_fsd_config


@dataclasses.dataclass(frozen=True)
class FSDPPConfig:
    fsd: FSDConfig = dataclasses.field(default_factory=FSDConfig)
    memory_size: int = 320000
    inc_voxel_size: tuple = (0.4, 0.4, 0.4)
    # group-correction second stage (TwoStageFSDPP); False = single-stage
    two_stage: bool = True
    roi_points: int = 256


def tiny_fsdpp_config(two_stage: bool = True) -> FSDPPConfig:
    return FSDPPConfig(fsd=tiny_fsd_config(), memory_size=8192,
                       inc_voxel_size=(0.8, 0.8, 0.8), two_stage=two_stage,
                       roi_points=64)


class SequenceState(NamedTuple):
    memory: jax.Array        # [M, 3+F] past points
    memory_mask: jax.Array   # [M]


class FSDPP(nn.Module):
    cfg: FSDPPConfig

    def setup(self):
        if self.cfg.two_stage:
            from .fsd_two_stage import TwoStageFSD, TwoStageFSDConfig
            self.fsd = TwoStageFSD(TwoStageFSDConfig(
                fsd=self.cfg.fsd, roi_points=self.cfg.roi_points))
        else:
            self.fsd = FSD(self.cfg.fsd)

    def init_state(self, feat_dim: int) -> SequenceState:
        m = self.cfg.memory_size
        return SequenceState(jnp.zeros((m, feat_dim)),
                             jnp.zeros((m,), bool))

    def __call__(self, state: SequenceState, points: jax.Array,
                 mask: jax.Array):
        """One sequence step: select novel points, detect on memory+novel,
        update memory. Returns (new_state, fsd_outputs)."""
        c = self.cfg
        novel = incremental_points_mask(
            state.memory, state.memory_mask, points, mask,
            c.inc_voxel_size, c.fsd.pc_range)

        # merged cloud: memory points + current frame (novel flagged)
        merged = jnp.concatenate([points, state.memory], 0)
        merged_mask = jnp.concatenate([mask, state.memory_mask], 0)
        out = self.fsd(merged, merged_mask)

        # memory update: keep newest novel points first, then old memory
        order = jnp.argsort(~novel)   # novel points to the front
        new_pts = points[order]
        new_ok = novel[order]
        cat_pts = jnp.concatenate([new_pts, state.memory], 0)
        cat_ok = jnp.concatenate([new_ok, state.memory_mask], 0)
        keep = jnp.argsort(~cat_ok)[:c.memory_size]
        new_state = SequenceState(cat_pts[keep], cat_ok[keep])
        return new_state, out
