"""Import reference torch modules from /root/reference under sys.modules stubs.

The reference (mmdetection3d fork) depends on mmcv/mmdet/torch_scatter/
spconv/waymo_open_dataset, none of which are installed here.  But its core
*model math* modules are plain torch once a handful of framework symbols are
stubbed.  This kit fabricates exactly those symbols so that the real
reference files can be imported and EXECUTED, giving the parity tests a
live oracle instead of hand-derived expectations.

Loadable oracles (see ``load_reference()``):
  - ``mmdet3d/core/bbox/structures/{utils,base_box3d,lidar_box3d,
    lidar_tracklet}.py`` — box math, LiDARTracklet pose-graph transforms
  - ``mmdet3d/core/bbox/coders/delta_xyzwhlr_bbox_coder.py``
  - ``mmdet3d/ops/sst/sst_ops.py`` — scatter_v2 (with a pure-torch
    torch_scatter fallback), build_mlp, window index math
  - ``mmdet3d/ops/occ/occ_ops.py`` — dense voxel centers / quantization
  - ``mmdet3d/models/occ/occ_base.py`` — OccDecoder, PosEncode
  - ``mmdet3d/models/occ/layers.py`` — SimpleEncoderLayer, PositionalEncoding
  - ``mmdet3d/models/voxel_encoders/utils.py`` — DynamicVFELayerV2
  - ``mmdet3d/datasets/waymo_tracklet_dataset.py`` — lidar2waymo_box

This file contains NO reference code; it only re-implements the trivial
framework glue (registries, decorators, norm-layer factory, torch_scatter
segment reductions) the reference imports.
"""
from __future__ import annotations

import importlib.util
import sys
import types

import torch
from torch import nn

REF = "/root/reference/mmdet3d"


# ---------------------------------------------------------------------------
# trivial framework glue
# ---------------------------------------------------------------------------
class _Registry:
    """No-op mm{cv,det} registry: ``@R.register_module()`` keeps the class."""

    def register_module(self, *args, **kwargs):
        if args and callable(args[0]):
            return args[0]

        def deco(obj):
            return obj

        return deco


def _identity_decorator(*args, **kwargs):
    """mmcv force_fp32 / auto_fp16: support bare and factory usage."""
    if args and callable(args[0]) and not kwargs:
        return args[0]

    def deco(fn):
        return fn

    return deco


def _build_norm_layer(cfg, num_features, postfix=""):
    kind = cfg.get("type", "LN")
    eps = cfg.get("eps", 1e-5)
    if kind == "LN":
        layer = nn.LayerNorm(num_features, eps=eps)
    elif kind in ("BN1d", "naiveSyncBN1d", "SyncBN"):
        layer = nn.BatchNorm1d(
            num_features, eps=eps, momentum=cfg.get("momentum", 0.1))
    elif kind in ("BN2d", "BN", "naiveSyncBN2d"):
        layer = nn.BatchNorm2d(
            num_features, eps=eps, momentum=cfg.get("momentum", 0.1))
    elif kind == "GN":
        layer = nn.GroupNorm(cfg.get("num_groups", 16), num_features,
                             eps=eps)
    else:
        raise NotImplementedError(f"stub build_norm_layer: {kind}")
    return f"norm{postfix}", layer


def _build_conv_layer(cfg, in_channels, out_channels, **kwargs):
    """mmcv build_conv_layer for the Conv1d/Conv2d cases the reference
    detector heads use."""
    cfg = dict(cfg or {"type": "Conv2d"})
    kind = cfg.pop("type")
    cfg.update(kwargs)
    if kind == "Conv2d":
        return nn.Conv2d(in_channels, out_channels, **cfg)
    if kind == "Conv1d":
        return nn.Conv1d(in_channels, out_channels, **cfg)
    raise NotImplementedError(f"stub build_conv_layer: {kind}")


class _ConvModule(nn.Module):
    """mmcv ConvModule (conv -> norm -> ReLU, bias='auto')."""

    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=0, bias="auto", conv_cfg=None, norm_cfg=None,
                 **kwargs):
        super().__init__()
        with_norm = norm_cfg is not None
        if bias == "auto":
            bias = not with_norm
        self.conv = _build_conv_layer(
            conv_cfg or {"type": "Conv2d"}, in_channels, out_channels,
            kernel_size=kernel_size, stride=stride, padding=padding,
            bias=bias)
        self.norm = (_build_norm_layer(norm_cfg, out_channels)[1]
                     if with_norm else None)
        self.activate = nn.ReLU(inplace=True)

    def forward(self, x):
        x = self.conv(x)
        if self.norm is not None:
            x = self.norm(x)
        return self.activate(x)


# pure-torch torch_scatter: segment reductions over int segment ids.
# Every segment id is assumed populated (true for unique-inverse callers).
def _scatter(src, index, dim=0, reduce="sum", dim_size=None):
    assert dim == 0
    n = int(index.max().item()) + 1 if dim_size is None else dim_size
    idx = index
    if src.dim() > 1:
        idx = index.reshape((-1,) + (1,) * (src.dim() - 1)).expand_as(src)
    if reduce == "mean":
        out = torch.zeros((n,) + src.shape[1:], dtype=src.dtype)
        out = out.scatter_reduce(0, idx, src, reduce="mean",
                                 include_self=False)
        return out
    out = torch.zeros((n,) + src.shape[1:], dtype=src.dtype)
    out = out.scatter_reduce(0, idx, src, reduce=reduce, include_self=False)
    return out


def _scatter_max(src, index, dim=0, dim_size=None):
    assert dim == 0
    n = int(index.max().item()) + 1 if dim_size is None else dim_size
    idx = index
    if src.dim() > 1:
        idx = index.reshape((-1,) + (1,) * (src.dim() - 1)).expand_as(src)
    out = torch.full((n,) + src.shape[1:], float("-inf"), dtype=src.dtype)
    out = out.scatter_reduce(0, idx, src, reduce="amax", include_self=True)
    # argmax: smallest source row index attaining the max per (segment, ch)
    is_max = src == out.gather(0, idx)
    rows = torch.arange(len(src))
    if src.dim() > 1:
        rows = rows.reshape((-1,) + (1,) * (src.dim() - 1)).expand_as(src)
    cand = torch.where(is_max, rows, torch.full_like(rows, len(src)))
    arg = torch.full((n,) + src.shape[1:], len(src), dtype=torch.long)
    arg = arg.scatter_reduce(0, idx, cand, reduce="amin", include_self=True)
    return out, arg


# mmdet loss semantics (the pip mmdet package's CrossEntropyLoss/L1Loss —
# not reference code): elementwise loss * weight, then reduce by avg_factor
def _weight_reduce_loss(loss, weight, reduction, avg_factor):
    if weight is not None:
        loss = loss * weight
    if avg_factor is None:
        if reduction == "mean":
            return loss.mean()
        if reduction == "sum":
            return loss.sum()
        return loss
    if reduction == "mean":
        return loss.sum() / avg_factor
    assert reduction == "none", "mmdet: avg_factor only valid with mean"
    return loss


class MMDetBCELoss(nn.Module):
    """mmdet ``CrossEntropyLoss(use_sigmoid=True)`` forward semantics."""

    def __init__(self, reduction="mean", loss_weight=1.0):
        super().__init__()
        self.reduction = reduction
        self.loss_weight = loss_weight

    def forward(self, pred, target, weight=None, avg_factor=None):
        loss = torch.nn.functional.binary_cross_entropy_with_logits(
            pred, target.float(), reduction="none")
        return self.loss_weight * _weight_reduce_loss(
            loss, weight, self.reduction, avg_factor)


class MMDetL1Loss(nn.Module):
    """mmdet ``L1Loss`` forward semantics."""

    def __init__(self, reduction="mean", loss_weight=1.0):
        super().__init__()
        self.reduction = reduction
        self.loss_weight = loss_weight

    def forward(self, pred, target, weight=None, avg_factor=None):
        loss = (pred - target).abs()
        return self.loss_weight * _weight_reduce_loss(
            loss, weight, self.reduction, avg_factor)


# fake waymo protos: attribute bags matching the fields lidar2waymo_box sets
class _FakeBox:
    def __init__(self):
        self.center_x = self.center_y = self.center_z = 0.0
        self.length = self.width = self.height = self.heading = 0.0

    def CopyFrom(self, other):
        self.__dict__.update(other.__dict__)


class _FakeLabel:
    Box = _FakeBox
    TYPE_UNKNOWN, TYPE_VEHICLE, TYPE_PEDESTRIAN, TYPE_SIGN, TYPE_CYCLIST = \
        range(5)

    def __init__(self):
        self.box = _FakeBox()
        self.id = ""
        self.type = 0


class _FakeObject:
    def __init__(self):
        self.object = _FakeLabel()
        self.score = 0.0
        self.context_name = ""
        self.frame_timestamp_micros = 0


# ---------------------------------------------------------------------------
# module tree construction
# ---------------------------------------------------------------------------
def _mod(name, **attrs):
    m = sys.modules.get(name)
    if m is None:
        m = types.ModuleType(name)
        sys.modules[name] = m
    for k, v in attrs.items():
        setattr(m, k, v)
    return m


def _pkg(name, **attrs):
    m = _mod(name, **attrs)
    if not hasattr(m, "__path__"):
        m.__path__ = []  # namespace package; never exec the real __init__
    return m


def _load(relpath, modname):
    spec = importlib.util.spec_from_file_location(modname, f"{REF}/{relpath}")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[modname] = mod
    spec.loader.exec_module(mod)
    return mod


_loaded: dict | None = None


def load_reference():
    """Install stubs and load the reference oracle modules (memoized).

    Returns a dict of live modules keyed by short name.
    """
    global _loaded
    if _loaded is not None:
        return _loaded

    # --- external stubs -------------------------------------------------
    class _BaseModule(nn.Module):
        """mmcv BaseModule: nn.Module accepting/holding init_cfg."""

        def __init__(self, init_cfg=None):
            super().__init__()
            self.init_cfg = init_cfg

        def init_weights(self):
            pass

    _mod("torch_scatter", scatter=_scatter, scatter_max=_scatter_max)
    _pkg("mmcv", load=None, dump=None)
    _mod("mmcv.cnn", build_norm_layer=_build_norm_layer)
    _mod("mmcv.runner", BaseModule=_BaseModule,
         force_fp32=_identity_decorator, auto_fp16=_identity_decorator)
    _mod("mmcv.utils", print_log=lambda *a, **k: None)
    _mod("ipdb", set_trace=lambda *a, **k: None)

    def _ingroup_forward(group_inds, out_inds):
        # pure-torch, order-preserving rank within each group — the CUDA
        # ``ingroup_indices`` kernel's contract (mutates out_inds in place)
        for g in torch.unique(group_inds):
            m = group_inds == g
            out_inds[m] = torch.arange(int(m.sum()),
                                       dtype=out_inds.dtype)

    _mod("ingroup_indices", forward=_ingroup_forward)
    _pkg("waymo_open_dataset", label_pb2=None)
    _mod("waymo_open_dataset.label_pb2", Label=_FakeLabel)
    _pkg("waymo_open_dataset.protos")
    _mod("waymo_open_dataset.protos.metrics_pb2", Object=_FakeObject,
         Objects=list)
    sys.modules["waymo_open_dataset"].label_pb2 = \
        sys.modules["waymo_open_dataset.label_pb2"]
    sys.modules["waymo_open_dataset.protos"].metrics_pb2 = \
        sys.modules["waymo_open_dataset.protos.metrics_pb2"]

    class _BaseBBoxCoder:
        def __init__(self, *a, **k):
            pass

    def _multi_apply(func, *args, **kwargs):
        # mmdet.core.multi_apply: map func over zipped args, kwargs bound
        import functools
        pfunc = functools.partial(func, **kwargs) if kwargs else func
        return tuple(map(list, zip(*map(pfunc, *args))))

    _pkg("mmdet")
    _pkg("mmdet.core",
         build_bbox_coder=lambda cfg: None,
         multi_apply=_multi_apply,
         reduce_mean=lambda t: t)
    _pkg("mmdet.core.bbox", BaseBBoxCoder=_BaseBBoxCoder)
    _mod("mmdet.core.bbox.builder", BBOX_CODERS=_Registry())
    _pkg("mmdet.models", HEADS=_Registry())
    _pkg("mmdet.datasets", DATASETS=_Registry())

    # --- mmdet3d namespace packages (real __init__ never executed) ------
    for p in ("mmdet3d", "mmdet3d.core", "mmdet3d.core.bbox",
              "mmdet3d.core.bbox.structures", "mmdet3d.core.bbox.coders",
              "mmdet3d.core.points", "mmdet3d.ops", "mmdet3d.ops.iou3d",
              "mmdet3d.ops.roiaware_pool3d", "mmdet3d.ops.spconv",
              "mmdet3d.ops.norm", "mmdet3d.ops.sst", "mmdet3d.ops.occ",
              "mmdet3d.models", "mmdet3d.models.builder",
              "mmdet3d.models.occ", "mmdet3d.models.voxel_encoders",
              "mmdet3d.datasets", "mmdet3d.datasets.pipelines",
              "mmdet3d.datasets.utils"):
        _pkg(p)

    class _BasePoints:
        pass

    _mod("mmdet3d.core.points", BasePoints=_BasePoints)
    _mod("mmdet3d.ops.iou3d", iou3d_cuda=None)
    _mod("mmdet3d.ops.iou3d.iou3d_utils", nms_gpu=None, nms_normal_gpu=None,
         boxes_iou_bev=None)
    _mod("mmdet3d.ops.roiaware_pool3d", points_in_boxes_gpu=None)
    _mod("mmdet3d.ops.norm", AllReduce=None)
    _mod("mmdet3d.models.builder",
         build_loss=lambda cfg: None, build_roi_extractor=lambda cfg: None)
    sys.modules["mmdet3d.models"].builder = \
        sys.modules["mmdet3d.models.builder"]

    # --- real reference files, dependency order -------------------------
    out = {}
    out["box_utils"] = _load(
        "core/bbox/structures/utils.py",
        "mmdet3d.core.bbox.structures.utils")
    out["base_box3d"] = _load(
        "core/bbox/structures/base_box3d.py",
        "mmdet3d.core.bbox.structures.base_box3d")
    out["lidar_box3d"] = _load(
        "core/bbox/structures/lidar_box3d.py",
        "mmdet3d.core.bbox.structures.lidar_box3d")
    s = sys.modules["mmdet3d.core.bbox.structures"]
    s.LiDARInstance3DBoxes = out["lidar_box3d"].LiDARInstance3DBoxes
    s.rotation_3d_in_axis = out["box_utils"].rotation_3d_in_axis
    s.xywhr2xyxyr = out["box_utils"].xywhr2xyxyr
    s.limit_period = out["box_utils"].limit_period

    out["lidar_tracklet"] = _load(
        "core/bbox/structures/lidar_tracklet.py",
        "mmdet3d.core.bbox.structures.lidar_tracklet")
    sys.modules["mmdet3d.core"].LiDARTracklet = \
        out["lidar_tracklet"].LiDARTracklet
    sys.modules["mmdet3d.core.bbox"].get_box_type = \
        lambda s: (out["lidar_box3d"].LiDARInstance3DBoxes, 0)

    out["coder"] = _load(
        "core/bbox/coders/delta_xyzwhlr_bbox_coder.py",
        "mmdet3d.core.bbox.coders.delta_xyzwhlr_bbox_coder")

    out["sst_ops"] = _load("ops/sst/sst_ops.py", "mmdet3d.ops.sst.sst_ops")
    ops = sys.modules["mmdet3d.ops"]
    ops.scatter_v2 = out["sst_ops"].scatter_v2
    ops.build_mlp = out["sst_ops"].build_mlp
    ops.get_activation_layer = out["sst_ops"].get_activation_layer
    ops.flat2window_v2 = out["sst_ops"].flat2window_v2
    ops.window2flat_v2 = out["sst_ops"].window2flat_v2

    _pkg("mmdet3d.models.sst")
    out["sst_basic_block"] = _load(
        "models/sst/sst_basic_block_v2.py",
        "mmdet3d.models.sst.sst_basic_block_v2")

    out["occ_ops"] = _load("ops/occ/occ_ops.py", "mmdet3d.ops.occ.occ_ops")
    sys.modules["mmdet3d.ops.occ"].occ_ops = out["occ_ops"]

    out["occ_base"] = _load(
        "models/occ/occ_base.py", "mmdet3d.models.occ.occ_base")
    out["occ_layers"] = _load(
        "models/occ/layers.py", "mmdet3d.models.occ.layers")
    out["vfe_utils"] = _load(
        "models/voxel_encoders/utils.py",
        "mmdet3d.models.voxel_encoders.utils")

    _mod("mmdet3d.datasets.pipelines", Compose=object)
    _mod("mmdet3d.datasets.utils",
         extract_result_dict=None, get_loading_pipeline=None)
    out["waymo_tracklet_dataset"] = _load(
        "datasets/waymo_tracklet_dataset.py",
        "mmdet3d.datasets.waymo_tracklet_dataset")
    out["label_pb2"] = sys.modules["waymo_open_dataset.label_pb2"]

    _loaded = out
    return out


_occ_annotate = None
_occ_pipelines = None


def load_occ_pipelines():
    """Load the reference occ training pipelines
    (``mmdet3d/datasets/pipelines/occ_pinelines.py``) — LoadAnnotationsOcc,
    MirrorOccLabel, RandomSampleOccPoints are pure torch/numpy."""
    global _occ_pipelines
    if _occ_pipelines is not None:
        return _occ_pipelines
    refs = load_reference()

    class _Plain:
        def __init__(self, *a, **k):
            pass

    _mod("mmcv.parallel", DataContainer=_Plain)
    _mod("mmdet.datasets.builder", PIPELINES=_Registry())
    _mod("mmdet.datasets.pipelines", LoadAnnotations=_Plain,
         LoadImageFromFile=_Plain, to_tensor=torch.as_tensor)
    _mod("mmdet3d.datasets.pipelines", LoadPointsFromFile=_Plain)
    _mod("mmdet3d.datasets.pipelines.formating",
         DefaultFormatBundle3D=_Plain)
    _mod("mmdet3d.datasets.pipelines.transforms_3d", ObjectNameFilter=_Plain,
         ObjectRangeFilter=_Plain, RandomFlip3D=_Plain)
    _mod("mmdet3d.core.points", get_points_type=lambda t: _Plain)
    sys.modules["mmdet3d.core"].LiDARInstance3DBoxes = \
        refs["lidar_box3d"].LiDARInstance3DBoxes
    _occ_pipelines = _load("datasets/pipelines/occ_pinelines.py",
                           "mmdet3d.datasets.pipelines.occ_pinelines")
    return _occ_pipelines


_trk_pipelines = None
_bbox_heads = None
_voxel_encoder = None


def load_voxel_encoder():
    """Load the reference voxel encoders (``voxel_encoder.py`` —
    SIRLayer/DynamicVFE): pure torch once DynamicScatter/spconv are
    stubbed (SIRLayer nulls its scatter objects right after init)."""
    global _voxel_encoder
    if _voxel_encoder is not None:
        return _voxel_encoder
    load_reference()
    ops = sys.modules["mmdet3d.ops"]

    class _DynamicScatter:
        def __init__(self, *a, **k):
            pass

    ops.DynamicScatter = _DynamicScatter
    ops.make_sparse_convmodule = None
    ops.spconv = sys.modules["mmdet3d.ops.spconv"]
    _mod("mmdet3d.models.builder", VOXEL_ENCODERS=_Registry())
    _voxel_encoder = _load("models/voxel_encoders/voxel_encoder.py",
                           "mmdet3d.models.voxel_encoders.voxel_encoder")
    # registry-free voxel-encoder builder so SIR/OccBBoxHead block lists
    # construct the REAL SIRLayer from their kwargs dicts
    ve = _voxel_encoder

    def _build_voxel_encoder(cfg):
        cfg = dict(cfg)
        kind = cfg.pop("type")
        return getattr(ve, kind)(**cfg)

    sys.modules["mmdet3d.models.builder"].build_voxel_encoder = \
        _build_voxel_encoder
    return _voxel_encoder


_sir_backbone = None


def load_sir_backbone():
    """Load the reference ``SIR`` backbone (``models/backbones/sir.py``) —
    the AE encoder's block stack — on top of the voxel-encoder stubs."""
    global _sir_backbone
    if _sir_backbone is not None:
        return _sir_backbone
    load_voxel_encoder()
    sys.modules["mmdet.models"].BACKBONES = _Registry()
    _pkg("mmdet3d.models.backbones")
    _sir_backbone = _load("models/backbones/sir.py",
                          "mmdet3d.models.backbones.sir")
    return _sir_backbone


def load_bbox_heads():
    """Load the reference RoI bbox heads (``fsd_bbox_head.py`` +
    ``ococc_bbox_head.py``) — their target-generation methods
    (canonical box targets, GT-frame -> RoI-frame occ transform,
    soft labels) are pure torch and executable on a bare instance."""
    global _bbox_heads
    if _bbox_heads is not None:
        return _bbox_heads
    load_reference()
    b = sys.modules["mmdet3d.models.builder"]
    b.build_head = lambda cfg: None
    b.build_backbone = lambda cfg: None
    _pkg("mmdet3d.models.roi_heads")
    _pkg("mmdet3d.models.roi_heads.bbox_heads")
    fsd_head = _load(
        "models/roi_heads/bbox_heads/fsd_bbox_head.py",
        "mmdet3d.models.roi_heads.bbox_heads.fsd_bbox_head")
    sys.modules["mmdet3d.models.roi_heads.bbox_heads"].FullySparseBboxHead \
        = fsd_head.FullySparseBboxHead
    occ_head = _load(
        "models/roi_heads/bbox_heads/ococc_bbox_head.py",
        "mmdet3d.models.roi_heads.bbox_heads.ococc_bbox_head")
    _bbox_heads = {"fsd_bbox_head": fsd_head, "ococc_bbox_head": occ_head}
    return _bbox_heads


_occ_ae_head = None


def load_occ_ae_head():
    """Load the reference ``OccAutoEncoder`` (``occ_ae_head.py``) with a
    builder that constructs the REAL SIR backbone / SIRLayer blocks, and
    point the ococc head's builders at the real classes so a full
    ``OccBBoxHead`` can be constructed and executed."""
    global _occ_ae_head
    if _occ_ae_head is not None:
        return _occ_ae_head
    refs = load_reference()
    heads = load_bbox_heads()
    sirmod = load_sir_backbone()

    b = sys.modules["mmdet3d.models.builder"]

    def _build_backbone(cfg):
        cfg = dict(cfg)
        assert cfg.pop("type") == "SIR"
        return sirmod.SIR(**cfg)

    b.build_backbone = _build_backbone
    b.build_loss = lambda cfg: None
    _occ_ae_head = _load(
        "models/roi_heads/bbox_heads/occ_ae_head.py",
        "mmdet3d.models.roi_heads.bbox_heads.occ_ae_head")

    def _build_head(cfg):
        cfg = dict(cfg)
        assert cfg.pop("type") == "OccAutoEncoder"
        return _occ_ae_head.OccAutoEncoder(**cfg)

    b.build_head = _build_head
    # the ococc head binds these at import time — repoint to real builders
    om = heads["ococc_bbox_head"]
    om.build_bbox_coder = \
        lambda cfg: refs["coder"].DeltaXYZWLHRBBoxCoder(code_size=7)
    om.builder = b
    return _occ_ae_head


def load_tracklet_pipelines():
    """Load the reference tracklet training pipelines
    (``mmdet3d/datasets/pipelines/tracklet_pipelines.py``) with the REAL
    LiDARPoints class so points.flip/rotate/scale execute for real."""
    global _trk_pipelines
    if _trk_pipelines is not None:
        return _trk_pipelines
    load_occ_pipelines()  # installs the shared pipeline stubs
    _load("core/points/base_points.py", "mmdet3d.core.points.base_points")
    lp = _load("core/points/lidar_points.py",
               "mmdet3d.core.points.lidar_points")
    bp = sys.modules["mmdet3d.core.points.base_points"]
    _mod("mmdet3d.core.points", LiDARPoints=lp.LiDARPoints,
         BasePoints=bp.BasePoints,
         get_points_type=lambda t: lp.LiDARPoints)
    _trk_pipelines = _load("datasets/pipelines/tracklet_pipelines.py",
                           "mmdet3d.datasets.pipelines.tracklet_pipelines")
    return _trk_pipelines


def load_occ_annotate():
    """Load the reference annotator (``tools/occ/occ_annotate.py``) on top of
    the stub tree — its ``point_cloud_to_range_image_idx`` and the
    LiDARInstance3DBoxes transforms it uses are pure torch and executable."""
    global _occ_annotate
    if _occ_annotate is not None:
        return _occ_annotate
    load_reference()
    # occ_annotate imports data-prep helpers it only uses at segment level
    _pkg("tools")
    _pkg("tools.ctrl")
    _mod("tools.ctrl.utils", get_pc_from_time_stamp=None, read_bin=None,
         generate_tracklets=None)
    spec = importlib.util.spec_from_file_location(
        "ref_occ_annotate", "/root/reference/tools/occ/occ_annotate.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_occ_annotate"] = mod
    argv = sys.argv
    sys.argv = [argv[0]]  # the file runs argparse at module scope
    try:
        spec.loader.exec_module(mod)
    finally:
        sys.argv = argv
    _occ_annotate = mod
    return mod


_sst_pipeline = None


def load_sst_pipeline():
    """Load the REAL SST window pipeline: ``SSTInputLayerV2`` (window
    partition, drop levels, flat<->window index precompute, pos embed, key
    masks) + the full ``SSTv2`` backbone with ``recover_bev``."""
    global _sst_pipeline
    if _sst_pipeline is not None:
        return _sst_pipeline
    refs = load_reference()
    sys.modules["mmcv.cnn"].build_conv_layer = _build_conv_layer
    ops = sys.modules["mmdet3d.ops"]
    so = refs["sst_ops"]
    ops.get_inner_win_inds = so.get_inner_win_inds
    ops.make_continuous_inds = so.make_continuous_inds
    ops.get_flat2win_inds_v2 = so.get_flat2win_inds_v2
    ops.get_window_coors = so.get_window_coors
    b = sys.modules["mmdet3d.models.builder"]
    b.MIDDLE_ENCODERS = _Registry()
    sys.modules["mmdet.models"].BACKBONES = _Registry()
    _pkg("mmdet3d.models.middle_encoders")
    _pkg("mmdet3d.models.backbones")
    inp = _load("models/middle_encoders/sst_input_layer_v2.py",
                "mmdet3d.models.middle_encoders.sst_input_layer_v2")
    bk = _load("models/backbones/sst_v2.py",
               "mmdet3d.models.backbones.sst_v2")
    _sst_pipeline = {"input_layer": inp, "sst_v2": bk}
    return _sst_pipeline


_center_head = None


def load_center_head():
    """Load the reference ``CenterHead``/``SeparateHead``
    (``dense_heads/centerpoint_head.py``). The transplant tests construct
    it with norm_cfg=dict(type='GN', ...) — the documented TPU-side norm
    substitution (SyncBN -> GroupNorm) — so both sides compute the same
    function; conv geometry/bias/init are the reference's."""
    global _center_head
    if _center_head is not None:
        return _center_head
    load_reference()
    mm = sys.modules["mmcv.cnn"]
    mm.build_conv_layer = _build_conv_layer
    mm.ConvModule = _ConvModule
    core = sys.modules["mmdet3d.core"]
    for name in ("circle_nms", "draw_heatmap_gaussian", "gaussian_radius"):
        setattr(core, name, None)
    core.xywhr2xyxyr = sys.modules[
        "mmdet3d.core.bbox.structures.utils"].xywhr2xyxyr
    _pkg("mmdet3d.models.utils",
         clip_sigmoid=lambda x, eps=1e-4: torch.clamp(
             x.sigmoid(), min=eps, max=1 - eps))
    b = sys.modules["mmdet3d.models.builder"]
    b.HEADS = _Registry()
    _pkg("mmdet3d.models.dense_heads")
    mod = _load("models/dense_heads/centerpoint_head.py",
                "mmdet3d.models.dense_heads.centerpoint_head")

    def _build_sep_head(cfg):
        cfg = dict(cfg)
        assert cfg.pop("type") == "SeparateHead"
        cfg.pop("num_cls", None)
        return mod.SeparateHead(**cfg)

    b.build_head = _build_sep_head
    _center_head = mod
    return mod


_seg_head = None


def load_seg_head():
    """Load the reference ``VoteSegHead`` (``decode_heads/
    segmentation_head.py``). Pass norm_cfg=dict(type='LN', ...) at
    construction for exact parity with our LN-by-design heads."""
    global _seg_head
    if _seg_head is not None:
        return _seg_head
    load_reference()
    mm = sys.modules["mmcv.cnn"]
    mm.normal_init = lambda m, mean=0, std=1, bias=0: None
    _pkg("mmseg")
    _pkg("mmseg.models")
    _mod("mmseg.models.builder", build_loss=lambda cfg: None)
    _pkg("mmdet.models.builder", build_loss=lambda cfg: None)
    _pkg("mmdet3d.models.decode_heads")
    _load("models/decode_heads/decode_head.py",
          "mmdet3d.models.decode_heads.decode_head")
    _seg_head = _load("models/decode_heads/segmentation_head.py",
                      "mmdet3d.models.decode_heads.segmentation_head")
    return _seg_head


_cluster_head = None


def load_cluster_head():
    """Load the reference ``SparseClusterHead(V2)`` + ``FSDSeparateHead``
    (``dense_heads/sparse_cluster_head{,_v2}.py``) — LN-normed MLP heads,
    exactly transplantable."""
    global _cluster_head
    if _cluster_head is not None:
        return _cluster_head
    refs = load_reference()
    core = sys.modules["mmdet3d.core"]

    class _Plain:
        def __init__(self, *a, **k):
            pass

    core.AssignResult = _Plain
    core.PseudoSampler = _Plain
    core.box3d_multiclass_nms = None
    core.bbox_overlaps_3d = None
    core.xywhr2xyxyr = refs["box_utils"].xywhr2xyxyr
    core.LiDARInstance3DBoxes = refs["lidar_box3d"].LiDARInstance3DBoxes
    b = sys.modules["mmdet3d.models.builder"]
    b.build_loss = lambda cfg: None
    _pkg("mmdet3d.models.dense_heads")
    base = _load("models/dense_heads/sparse_cluster_head.py",
                 "mmdet3d.models.dense_heads.sparse_cluster_head")
    v2 = _load("models/dense_heads/sparse_cluster_head_v2.py",
               "mmdet3d.models.dense_heads.sparse_cluster_head_v2")

    def _build_fsd_sep_head(cfg):
        cfg = dict(cfg)
        assert cfg.pop("type") == "FSDSeparateHead"
        return v2.FSDSeparateHead(**cfg)

    b.build_head = _build_fsd_sep_head
    v2.builder = b
    _cluster_head = {"base": base, "v2": v2}
    return _cluster_head


_anchor_gen = None


def load_anchor_generator():
    """Load the reference ``AlignedAnchor3DRangeGenerator``
    (``core/anchor/anchor_3d_generator.py``) — pure torch behind an
    ANCHOR_GENERATORS registry stub and ``mmcv.is_list_of``."""
    global _anchor_gen
    if _anchor_gen is not None:
        return _anchor_gen
    load_reference()
    import mmcv as _m
    _m.is_list_of = lambda seq, t: isinstance(seq, (list, tuple)) and all(
        isinstance(s, t) for s in seq)
    _mod("mmdet.core.anchor", ANCHOR_GENERATORS=_Registry())
    _anchor_gen = _load("core/anchor/anchor_3d_generator.py",
                        "mmdet3d.core.anchor.anchor_3d_generator")
    return _anchor_gen


_second = None


def load_second():
    """Load the reference ``SECOND`` backbone + ``SECONDFPN`` neck
    (``models/backbones/second.py``, ``models/necks/second_fpn.py``) —
    plain torch convs behind conv/upsample-layer builder stubs."""
    global _second
    if _second is not None:
        return _second
    load_reference()
    cnn = sys.modules["mmcv.cnn"]

    def _build_conv_layer(cfg, in_channels, out_channels, kernel_size,
                          stride=1, padding=0, bias=True):
        if cfg:
            bias = cfg.get("bias", bias)
        return nn.Conv2d(in_channels, out_channels, kernel_size,
                         stride=stride, padding=padding, bias=bias)

    def _build_upsample_layer(cfg, in_channels, out_channels, kernel_size,
                              stride=1):
        return nn.ConvTranspose2d(in_channels, out_channels, kernel_size,
                                  stride=stride,
                                  bias=cfg.get("bias", True) if cfg else True)

    cnn.build_conv_layer = _build_conv_layer
    cnn.build_upsample_layer = _build_upsample_layer
    m = sys.modules["mmdet.models"]
    if not hasattr(m, "BACKBONES"):
        m.BACKBONES = _Registry()
    if not hasattr(m, "NECKS"):
        m.NECKS = _Registry()
    bb = _load("models/backbones/second.py",
               "mmdet3d.models.backbones.second")
    fpn = _load("models/necks/second_fpn.py",
                "mmdet3d.models.necks.second_fpn")
    _second = {"second": bb, "second_fpn": fpn}
    return _second
