"""OcOccNet configuration — dataclass mirror of the reference's
``configs/ococc/ococcnet.py`` public surface (hyperparameters preserved
value-for-value; structural knobs that exist only to patch torch quirks are
dropped).
"""
from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple


@dataclasses.dataclass(frozen=True)
class OcOccNetConfig:
    # model family: "ococc" = full OcOccNet (occ AE + temporal transformer +
    # implicit decoder); "ctrl" = the CTRL baseline (W6,
    # configs/ctrl/ctrl_veh_24e.py — RoI SIR encoder + cls/reg heads only,
    # no occupancy branch, no temporal transformer)
    variant: str = "ococc"

    # compute dtype for the MLP/attention stacks ("float32" or "bfloat16");
    # params, softmax, and losses stay fp32
    compute_dtype: str = "float32"

    # LayerNorm statistics dtype: "auto" follows compute_dtype (bf16 stats
    # measured within 0.05% of fp32 final loss over synthetic training and
    # ~8% faster end-to-end — the LN reductions are the profile's largest
    # fusion bucket); set "float32" for bit-level reference parity
    ln_dtype: str = "auto"

    # rematerialize the SIR encoders (jax.checkpoint): the backward
    # recomputes the 12-block chain instead of reloading ~60 saved
    # activations from HBM — trades MXU FLOPs for the bandwidth the step
    # profile pins on the reduce fusions
    remat_sir: bool = False

    # static shapes
    batch_size: int = 4                 # tracklets per device (samples_per_gpu)
    reg_len: int = 32                   # frames per tracklet at train
    max_points_per_frame: int = 1024    # LoadTrackletPoints max_points
    num_occ_samples: int = 512          # RandomSampleOccPoints num_sample_points
    max_frame_ind: int = 200            # random_shift_frame_inds range

    # RoI pooling (TrackletPointRoIExtractor)
    extra_wlh: Tuple[float, float, float] = (0.5, 0.5, 0.5)
    # per-RoI pooled-point cap (the reference's max_inbox_point, a config
    # knob there too): valid points compact to the front and the SIR
    # encoders run at this smaller static budget — measured 77 -> 89
    # tracklets/s. Frames with more in-box points than the budget truncate
    # (same subsampling the reference's 1024-point frame cap already
    # applies, one notch stronger); below the budget the outputs are
    # bit-identical (tested). None = full per-frame budget for strict
    # parity.
    roi_point_budget: int | None = 640

    # global packed-point budget PER TRACKLET (the reference's max_all_pts
    # design, ops/dynamic_point_pool_op.py:29-35): valid pooled points of
    # all reg_len frames compact into one [budget] buffer with frame
    # segment ids (ops/packed.py), so the SIR encoders' matmul/LayerNorm
    # cost scales with actual point occupancy instead of the dense
    # [L, P] worst case. Overflow drops points of the latest frames first
    # (the CUDA pool's block-layout truncation). Over budget, the
    # waterfill caps dense frames evenly (sparse frames keep everything)
    # — strictly more points kept than a uniform per-frame cap at the
    # same compute (BENCH_NOTES). When set, takes precedence over
    # roi_point_budget. None = dense layout. Default 8192 = 256/frame
    # average at reg_len 32.
    packed_point_budget: int | None = 8192

    # block alignment quantum for the packed layout: each frame's points
    # start at a quantum-aligned slot, so segment reductions run as a
    # dense per-block masked max (single pass) + a tiny combine over
    # budget/quantum block maxima, instead of an O(L) compare per element.
    # Costs up to quantum-1 wasted slots per frame. 0 = tight packing.
    packed_quantum: int = 128

    # SIR RoI encoder (OccBBoxHead blocks)
    num_blocks: int = 6
    feat_channels: Tuple[int, int] = (128, 128)
    rel_mlp_hidden: Tuple[int, int] = (16, 32)
    xyz_normalizer: Tuple[float, float, float] = (20.0, 20.0, 4.0)

    # Occupancy auto-encoder (OccAutoEncoder)
    ae_voxel_size: float = 0.2
    ae_xyz_normalizer: Tuple[float, float, float] = (1.0, 1.0, 1.0)

    # Occupancy decoder (OccDecoder)
    occ_mlp: Tuple[int, int, int] = (512, 1024, 1024)
    pos_encode_freqs: int = 10
    occ_dropout: float = 0.1
    occ_pos_thresh: float = 0.5

    # temporal transformer
    # test-time sliding attention window over frames
    # (test_cfg attn_window_size, ococc_bbox_head.py:1021-1030); -1 = full
    test_attn_window: int = -1
    d_model: int = 1536                 # roi_feature_channels
    attn_num_heads: int = 4
    attn_ffn_dim: int = 512
    attn_dropout: float = 0.1
    num_enc_layers: int = 3
    roi_pos_enc_mlp: Tuple[int, int] = (512, 512)

    # fusion + heads
    latent_mlp: Tuple[int, int] = (2048, 2048)
    fusion_mlp: Tuple[int, int] = (2048, 2048)
    cls_mlp: Tuple[int, int] = (512, 512)
    reg_mlp: Tuple[int, int] = (512, 512)
    cls_dropout: float = 0.1
    reg_dropout: float = 0.1
    latent_dropout: float = 0.1
    fusion_dropout: float = 0.1
    fused_mode: str = "concat"
    rcnn_trans: bool = False            # conv_fused reads cluster feats
    act: str = "gelu"

    # losses / targets (train_cfg)
    cls_pos_thr: float = 0.8
    cls_neg_thr: float = 0.2
    occ_label_thresh: float = 0.4
    rcnn_code_weights: Sequence[float] = (2.0, 2.0, 1.0, 1.0, 1.0, 1.0, 1.0)
    loss_bbox_weight: float = 2.0
    loss_cls_weight: float = 1.0
    loss_occ_weight: float = 1.0
    # corner loss (FullySparseBboxHead with_corner_loss — on for the CTRL
    # vehicle config `configs/ctrl/ctrl_veh_24e.py:110`, off for ped/cyc and
    # unused by ococcnet)
    corner_loss_weight: float = 0.0

    # freeze the occupancy auto-encoder during training (the reference's
    # fixed_ae mode trained through OnlyGradOptimizerWrapperConstructor,
    # `apis/no_grad_optimizer_constructors.py:6`; the shipped ococcnet
    # config trains the AE jointly, fixed_ae=False)
    fixed_ae: bool = False

    # object classes (single-class tracklet refinement; the reference ships
    # vehicle/pedestrian/cyclist CTRL variants)
    class_names: Tuple[str, ...] = ("Car",)

    # optional whole-tracklet sparse-UNet point feature extractor (the
    # reference CTRL's TrackletSegmentor, tracklet_detector.py:24-190):
    # per-point UNet features append to the raw point features before RoI
    # pooling. None = off; "tiny"/"full" select the preset
    # TrackletSegmentorConfig.
    use_segmentor: str | None = None

    # optimization (cosine_2x schedule, ococcnet optimizer block)
    base_lr: float = 1e-6
    lr_mult: float = 100.0              # cyclic target_ratio upper
    weight_decay: float = 0.05
    grad_clip_norm: float = 10.0
    max_epochs: int = 24

    # point feature layout: [x y z | intensity elong yaw/pi w/10 l/10 h/10
    #                        det_score] + roi_score appended in the head
    num_point_feats: int = 7

    @property
    def points_dim(self) -> int:
        return 3 + self.num_point_feats


def ctrl_veh_config() -> OcOccNetConfig:
    """CTRL vehicle baseline (``configs/ctrl/ctrl_veh_24e.py``)."""
    return OcOccNetConfig(variant="ctrl", class_names=("Car",),
                          corner_loss_weight=1.0)


def ctrl_ped_config() -> OcOccNetConfig:
    """CTRL pedestrian (``configs/ctrl/ctrl_ped_24e.py``): cls thresholds
    0.65/0.15, no corner loss."""
    return OcOccNetConfig(variant="ctrl", class_names=("Pedestrian",),
                          cls_pos_thr=0.65, cls_neg_thr=0.15,
                          corner_loss_weight=0.0, max_epochs=24)


def ctrl_cyc_config() -> OcOccNetConfig:
    """CTRL cyclist (``configs/ctrl/ctrl_cyc_12e.py``): cls thresholds
    0.65/0.15, no corner loss, 12 epochs."""
    return OcOccNetConfig(variant="ctrl", class_names=("Cyclist",),
                          cls_pos_thr=0.65, cls_neg_thr=0.15,
                          corner_loss_weight=0.0, max_epochs=12)


def tiny_config() -> OcOccNetConfig:
    """Small shapes for tests. Uses the dense point layout as the test
    baseline (the packed layout's parity against it is pinned by the
    dedicated tests in tests/test_packed.py)."""
    return OcOccNetConfig(
        batch_size=2, reg_len=8, max_points_per_frame=64, num_occ_samples=32,
        num_blocks=2, feat_channels=(32, 32), rel_mlp_hidden=(8, 16),
        occ_mlp=(32, 32, 32), d_model=2 * 2 * 32, attn_ffn_dim=64,
        latent_mlp=(64,), fusion_mlp=(64,), cls_mlp=(32,), reg_mlp=(32,),
        roi_pos_enc_mlp=(32,), num_enc_layers=1,
        packed_point_budget=None,
    )
