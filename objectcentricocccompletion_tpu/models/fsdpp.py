"""FSD++ (W7): incremental multi-frame fully-sparse detection.

Rebuild of ``TwoStageFSDPP`` + the incremental machinery
(``models/detectors/two_stage_fsdpp.py:37``,
``models/detectors/incremental_ops.py``,
``datasets/build_dataloader_sequential.py`` /
``apis/seq_training_apis.py`` — SURVEY.md W7): frames of a sequence are
processed in order; each step selects only the *novel* points of the
current frame (voxel-diff) and combines them with the previous frames'
points CROPPED around the previous detections' **seed boxes**
(``crop_and_process_points``, ``two_stage_fsdpp.py:637-680``) — the
background is carried only through fresh deltas, objects through their
seed crops. Seeds are score-filtered previous detections
(``result2seed``/``preprocess_seed`` :817-858, ops/seeds.py); training
augments them with random FP insertion and track-consistent dropout
(:860-940).

Like the reference's ``TwoStageFSDPP``, the wrapped detector is the
TWO-STAGE FSD (group-correction RoI refinement) by default
(``two_stage_fsdpp.py:37`` subclasses ``TwoStageFSD``); ``two_stage=False``
falls back to single-stage FSD for ablation.

The recurrent memory is a fixed-size point buffer with per-point AGE;
``max_age > 0`` evicts points older than the window the reference keeps
(``get_previous_delta_points_by_max_age_*``, :505-592). The whole sequence
step is one jitted function — the reference's stateful python sequence loop
becomes a scan-able transition.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import seeds as seed_ops
from ..ops.incremental import incremental_points_mask
from ..ops.seeds import Seeds, empty_seeds
from .fsd import FSD, FSDConfig, tiny_fsd_config


@dataclasses.dataclass(frozen=True)
class FSDPPConfig:
    fsd: FSDConfig = dataclasses.field(default_factory=FSDConfig)
    memory_size: int = 320000
    inc_voxel_size: tuple = (0.4, 0.4, 0.4)
    # group-correction second stage (TwoStageFSDPP); False = single-stage
    two_stage: bool = True
    roi_points: int = 256
    # ---- seed subsystem (two_stage_fsdpp.py:817-940, 637-680) ----
    # when True, the memory contribution to each step's input cloud is
    # cropped to the previous detections' seed boxes; when False the full
    # memory participates (the round-2 behavior, reference's
    # disable_incremental-style ablation)
    use_seeds: bool = True
    max_seeds: int = 128                   # seed capacity per frame
    seed_score_thr: float = 0.1            # pre_score_thr
    max_crop_points: int = 256             # max_crop_points per seed box
    crop_extra_wlh: tuple = (1.0, 1.0, 1.0)
    ground_band: float | None = None       # remove_ground |z| band
    # memory age: 0 = unlimited (ring by capacity only); k > 0 evicts
    # points older than k steps (the reference's max_age delta window)
    max_age: int = 0
    # training-time seed augmentation (noise_cfg fp_rate / drop_rate)
    seed_fp_rate: float = 0.1
    seed_drop_rate: float = 0.1


def tiny_fsdpp_config(two_stage: bool = True,
                      use_seeds: bool = True) -> FSDPPConfig:
    return FSDPPConfig(fsd=tiny_fsd_config(), memory_size=8192,
                       inc_voxel_size=(0.8, 0.8, 0.8), two_stage=two_stage,
                       roi_points=64, use_seeds=use_seeds, max_seeds=16,
                       max_crop_points=64, max_age=4)


class SequenceState(NamedTuple):
    memory: jax.Array        # [M, 3+F] past points
    memory_mask: jax.Array   # [M]
    memory_age: jax.Array    # [M] int32 steps since insertion
    seeds: Seeds             # previous-step detections


def init_sequence_state(cfg: FSDPPConfig, feat_dim: int) -> SequenceState:
    m = cfg.memory_size
    return SequenceState(jnp.zeros((m, feat_dim)),
                         jnp.zeros((m,), bool),
                         jnp.zeros((m,), jnp.int32),
                         empty_seeds(cfg.max_seeds))


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
        return init_sequence_state(self.cfg, feat_dim)

    def __call__(self, state: SequenceState, points: jax.Array,
                 mask: jax.Array, seeds: Seeds | None = None):
        """One sequence step. ``seeds`` overrides the carried seeds (the
        training path feeds window-preprocessed/augmented seeds from the
        seed store; at test the model consumes its own previous
        detections). Returns (new_state, fsd_outputs)."""
        c = self.cfg
        novel = incremental_points_mask(
            state.memory, state.memory_mask, points, mask,
            c.inc_voxel_size, c.fsd.pc_range)

        seeds_in = seeds if seeds is not None else state.seeds
        if c.use_seeds:
            # previous points enter only through their seed crops
            # (crop_and_process_points); the current frame only through
            # its novel deltas. With no valid seeds yet (sequence start)
            # the crop is empty and the first frame = all-novel points.
            mem_keep = seed_ops.crop_points_by_seeds(
                state.memory, state.memory_mask, seeds_in,
                c.max_crop_points, c.crop_extra_wlh, c.ground_band)
            cur_keep = mask & novel
        else:
            mem_keep = state.memory_mask
            cur_keep = mask

        merged = jnp.concatenate([points, state.memory], 0)
        merged_mask = jnp.concatenate([cur_keep, mem_keep], 0)
        out = self.fsd(merged, merged_mask)
        out = dict(out, input_mask=merged_mask)

        # ---- memory update: novel current points enter at age 0 ----
        age = state.memory_age + 1
        mem_ok = state.memory_mask
        if c.max_age > 0:
            mem_ok = mem_ok & (age <= c.max_age)
        order = jnp.argsort(~novel)   # novel points to the front
        new_pts = points[order]
        new_ok = novel[order]
        cat_pts = jnp.concatenate([new_pts, state.memory], 0)
        cat_ok = jnp.concatenate([new_ok, mem_ok], 0)
        cat_age = jnp.concatenate([jnp.zeros_like(new_ok, jnp.int32),
                                   age], 0)
        keep = jnp.argsort(~cat_ok)[:c.memory_size]

        # ---- seed update from this step's detections (result2seed) ----
        if c.two_stage:
            boxes = out["refined_boxes"]
            scores = jax.nn.sigmoid(out["cls2"])
            valid = out["roi_nonempty"]
        else:
            boxes = out["boxes"]
            own = jnp.take_along_axis(
                out["cls"], out["cluster_class"][:, None], axis=1)[:, 0]
            scores = jax.nn.sigmoid(own)
            valid = out["cluster_valid"]
        new_seeds = seed_ops.seeds_from_output(
            boxes, out["cluster_class"], scores, valid, c.max_seeds,
            c.seed_score_thr)

        new_state = SequenceState(cat_pts[keep], cat_ok[keep],
                                  cat_age[keep], new_seeds)
        return new_state, out
