"""Detector-side weight-transplant forward parity vs EXECUTED reference
modules (round-5 VERDICT missing #3).

Four oracles, loaded via ``refstub``:

  1. the FULL SST pipeline — the real ``SSTInputLayerV2`` (window
     partition, index precompute, pos embed, key masks) feeding the real
     multi-block ``SSTv2`` backbone through ``recover_bev``
     (``sst_input_layer_v2.py:41-331``, ``sst_v2.py:115-196``) — vs our
     ``ops/window.py`` partitions + ``WindowMSALayer`` stack + BEV scatter.
     This executes the reference's own index machinery end-to-end, so it
     pins our window grouping, shift semantics, pos-embed formula,
     per-layer shift alternation, residual chaining, and canvas layout.
  2. ``VoteSegHead`` (``segmentation_head.py:16``) vs our fused FSD seg
     head (one Linear producing [logits ; votes] == the reference's
     separate conv_seg + voting Linears).
  3. ``SparseClusterHeadV2``/``FSDSeparateHead``
     (``sparse_cluster_head_v2.py:18-158``) vs our ``SparseClusterHead``.
  4. ``CenterHead``/``SeparateHead`` (``centerpoint_head.py:18-329``) vs
     our CenterPoint head.

Norm substitutions: the cluster head is LN in the reference config — exact
transplant. The seg head's naiveSyncBN1d and CenterHead's BN2d are GN/LN on
our side BY DESIGN (SURVEY §2.6: SyncBN -> GN/LN); the oracles are
constructed with the SAME norm family via the stub norm factory, so the
rest of the module (conv geometry, bias placement, head splits, init
biases, activations) is pinned exactly. Product fixes forced by these
tests: SST FFN gelu (sst_v2.py:38 ctor default, not EncoderLayer's relu)
and FSD seg-head relu (act_cfg, fsd_waymoD1_1x_car.py:68).
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference"),
    reason="reference tree not available")

torch = pytest.importorskip("torch")
import jax.numpy as jnp  # noqa: E402

import refstub  # noqa: E402
from test_transplant_parity import _lin, _ln, _t2j  # noqa: E402


def _encoder_layer_params(lyr):
    D = lyr.norm1.weight.shape[0]
    attn = lyr.win_attn.self_attn
    wq, wk, wv = attn.in_proj_weight.chunk(3, dim=0)
    bq, bk, bv = attn.in_proj_bias.chunk(3, dim=0)
    return {
        "q": {"kernel": _t2j(wq).T, "bias": _t2j(bq)},
        "k": {"kernel": _t2j(wk).T, "bias": _t2j(bk)},
        "v": {"kernel": _t2j(wv).T, "bias": _t2j(bv)},
        "out": _lin(attn.out_proj),
        "ffn1": _lin(lyr.linear1), "ffn2": _lin(lyr.linear2),
        "norm1": _ln(lyr.norm1), "norm2": _ln(lyr.norm2),
    }


def test_sstv2_full_pipeline_transplant():
    """Real SSTInputLayerV2 + 3-block SSTv2 + recover_bev vs our window
    partition + 6-layer WindowMSALayer stack + canvas scatter, weights
    transplanted, same voxels."""
    from objectcentricocccompletion_tpu.models.sst import (WindowMSALayer,
                                                           window_pos_embed)
    from objectcentricocccompletion_tpu.ops import window as win

    mods = refstub.load_sst_pipeline()
    # the input layer sizes its pos embed from the voxel feats, so the
    # linear0 projection must be dim-preserving here (in_channel == d_model
    # — the shipped config has no linear0 at all: VFE emits d_model)
    C_IN, C, H, FFN, NBLK = 32, 32, 4, 64, 3
    SX, SY = 16, 12
    WS = (4, 4, 1)
    CAP = WS[0] * WS[1]

    rng = np.random.default_rng(31)
    cells = rng.choice(SX * SY, size=70, replace=False)
    xs, ys = (cells % SX).astype(np.int64), (cells // SX).astype(np.int64)
    coors = np.stack([np.zeros_like(xs), np.zeros_like(xs), ys, xs],
                     -1)  # [b, z, y, x]
    V = len(coors)
    feats = rng.standard_normal((V, C_IN)).astype(np.float32)

    torch.manual_seed(5)
    inp = mods["input_layer"].SSTInputLayerV2(
        drop_info={0: {"max_tokens": CAP, "drop_range": (0, 100000)}},
        window_shape=(WS[0], WS[1]), sparse_shape=(SX, SY, 1),
        shuffle_voxels=False, debug=True, normalize_pos=False,
        pos_temperature=10000).eval()
    sst = mods["sst_v2"].SSTv2(
        d_model=[C] * NBLK, nhead=[H] * NBLK, num_blocks=NBLK,
        dim_feedforward=[FFN] * NBLK, dropout=0.0, activation="gelu",
        output_shape=(SY, SX), num_attached_conv=0, in_channel=C_IN,
        to_bev=True, debug=True).eval()

    with torch.no_grad():
        vi = inp(torch.from_numpy(feats), torch.from_numpy(coors), 1)
        ref_bev = sst(vi)[0].numpy()[0]        # [C, SY, SX]
    # the no-drop drop_info must keep every voxel
    assert len(vi["voxel_feats"]) == V

    # ---- ours: same voxels through our window ops + transplanted stack
    coords_xyz = jnp.asarray(np.stack(
        [xs, ys, np.zeros_like(xs)], -1).astype(np.int32))
    valid = jnp.ones((V,), bool)

    lin0 = _lin(sst.linear0)
    x = jnp.asarray(feats) @ lin0["kernel"] + lin0["bias"]

    layer_params = []
    for blk in sst.block_list:
        for lyr in blk.encoder_list:
            layer_params.append(_encoder_layer_params(lyr))

    m = WindowMSALayer(num_heads=H, ffn_dim=FFN, act="gelu")
    parts, pos_w = [], []
    for s in (False, True):
        p = win.partition(coords_xyz, valid, (SX, SY, 1), WS, s, V, CAP)
        pe = window_pos_embed(p.coors_in_win, WS, C, 10000.0)
        parts.append(p)
        pos_w.append(win.flat_to_window(pe, p, V, CAP)[0])

    for i, lp in enumerate(layer_params):
        s = i % 2
        tokens, tmask = win.flat_to_window(x, parts[s], V, CAP)
        tokens = m.apply({"params": lp}, tokens, pos_w[s], tmask)
        x = win.window_to_flat(tokens, parts[s], V)

    canvas = jnp.zeros((SX, SY, C), x.dtype)
    canvas = canvas.at[coords_xyz[:, 0], coords_xyz[:, 1]].set(x)
    ours = np.asarray(canvas).transpose(2, 1, 0)   # -> [C, SY, SX]

    np.testing.assert_allclose(ours, ref_bev, atol=2e-4, rtol=1e-4)


def test_vote_seg_head_transplant():
    """VoteSegHead (use_sigmoid FocalLoss path: num_classes stays C) with
    LN-substituted norms vs our fused [logits ; votes] head: transplant =
    concatenate conv_seg and voting weights into the single head Linear."""
    from objectcentricocccompletion_tpu.models.layers import Mlp
    seg = refstub.load_seg_head()
    torch.manual_seed(7)
    C_IN, HID, NCLS, N = 24, (32, 32), 3, 50
    head = seg.VoteSegHead(
        in_channel=C_IN, num_classes=NCLS, hidden_dims=list(HID),
        dropout_ratio=0.0, conv_cfg=dict(type="Conv1d"),
        norm_cfg=dict(type="LN", eps=1e-3), act_cfg=dict(type="ReLU"),
        loss_decode=dict(type="FocalLoss", use_sigmoid=True, gamma=3.0,
                         alpha=0.8, loss_weight=1.0),
        loss_vote=dict(type="L1Loss"), logit_scale=1).eval()

    x = torch.randn(N, C_IN)
    with torch.no_grad():
        logits, votes = head(x)
    assert logits.shape == (N, NCLS) and votes.shape == (N, NCLS * 3)

    params = {}
    for i, blk in enumerate(head.pre_seg_conv):
        params[f"Dense_{i}"] = {"kernel": _t2j(blk[0].weight).T}
        params[f"LayerNorm_{i}"] = _ln(blk[1])
    wseg, bseg = _t2j(head.conv_seg.weight), _t2j(head.conv_seg.bias)
    wvote, bvote = _t2j(head.voting.weight), _t2j(head.voting.bias)
    nh = len(HID)
    params[f"Dense_{nh}"] = {
        "kernel": jnp.concatenate([wseg.T, wvote.T], axis=1),
        "bias": jnp.concatenate([bseg, bvote]),
    }

    m = Mlp(tuple(HID) + (NCLS + NCLS * 3,), is_head=True, act="relu")
    got = np.asarray(m.apply({"params": params}, jnp.asarray(x.numpy())))
    np.testing.assert_allclose(got[:, :NCLS], logits.numpy(),
                               atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(got[:, NCLS:], votes.numpy(),
                               atol=2e-5, rtol=1e-5)


def test_sparse_cluster_head_v2_transplant():
    """SparseClusterHeadV2 (shared MLP + per-task FSDSeparateHead with
    center/dim/rot/score LN-MLP branches) vs our SparseClusterHead — the
    reference config norms are LN, so this is an EXACT transplant."""
    from objectcentricocccompletion_tpu.models.fsd import SparseClusterHead
    import types as _types
    mods = refstub.load_cluster_head()
    coder_stub = lambda cfg: _types.SimpleNamespace(code_size=8)  # noqa: E731
    mods["base"].build_bbox_coder = coder_stub
    mods["v2"].build_bbox_coder = coder_stub
    torch.manual_seed(9)
    C_IN, SHARED, HIDDEN, NTASK, N = 48, (64,), 32, 2, 30
    head = mods["v2"].SparseClusterHeadV2(
        num_classes=NTASK,
        bbox_coder=dict(type="BasePointBBoxCoder"),
        loss_cls=dict(type="FocalLoss"), loss_center=dict(type="L1Loss"),
        loss_size=dict(type="L1Loss"), loss_rot=dict(type="L1Loss"),
        in_channel=C_IN, shared_mlp_dims=list(SHARED),
        tasks=[dict(class_names=["Car"]), dict(class_names=["Ped"])],
        class_names=["Car", "Ped"],
        common_attrs=dict(center=(3, 2, HIDDEN), dim=(3, 2, HIDDEN),
                          rot=(2, 2, HIDDEN)),
        num_cls_layer=2, cls_hidden_dim=HIDDEN,
        separate_head=dict(type="FSDSeparateHead",
                           norm_cfg=dict(type="LN"), act="relu"),
        norm_cfg=dict(type="LN"), act="relu", as_rpn=True).eval()

    x = torch.randn(N, C_IN)
    with torch.no_grad():
        ref = head(x)

    def _mlp(torch_mlp):
        p = {}
        for i, mmod in enumerate(torch_mlp):
            if isinstance(mmod, torch.nn.Linear):
                p[f"Dense_{i}"] = _lin(mmod)
            else:
                p[f"Dense_{i}"] = {"kernel": _t2j(mmod[0].weight).T}
                p[f"LayerNorm_{i}"] = _ln(mmod[1])
        return p

    params = {"shared": _mlp(head.shared_mlp)}
    for t, th in enumerate(head.task_heads):
        params[f"task{t}_score"] = _mlp(th.score)
        params[f"task{t}_center"] = _mlp(th.center)
        params[f"task{t}_dim"] = _mlp(th.dim)
        params[f"task{t}_rot"] = _mlp(th.rot)

    m = SparseClusterHead(num_tasks=NTASK, shared_mlp=SHARED,
                          hidden=HIDDEN, layers=2, act="relu")
    cls_logits, reg = m.apply({"params": params}, jnp.asarray(x.numpy()))
    cls_logits, reg = np.asarray(cls_logits), np.asarray(reg)

    # reference forward returns per-task LISTS: cls_logits [N, 1] each,
    # reg_preds [N, 8] each (cat(center, dim, rot))
    ref_cls = np.concatenate([t.numpy() for t in ref["cls_logits"]], -1)
    ref_reg = np.stack([t.numpy() for t in ref["reg_preds"]], 1)
    np.testing.assert_allclose(cls_logits, ref_cls, atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(reg.reshape(N, NTASK, 8), ref_reg,
                               atol=2e-5, rtol=1e-5)


def test_center_head_transplant():
    """CenterHead/SeparateHead (shared 3x3 ConvModule + per-branch
    [ConvModule x (n-1) + biased final conv], final_kernel=3, heatmap
    init_bias -2.19) vs our CenterPoint head, both normed with
    GroupNorm(16, eps 1e-3) — the documented SyncBN->GN substitution."""
    from objectcentricocccompletion_tpu.models.centerpoint_head import (
        CenterHead)
    mod = refstub.load_center_head()
    torch.manual_seed(11)
    C_IN, SHARE, HW = 32, 64, (10, 12)
    gn = dict(type="GN", num_groups=16, eps=1e-3)
    head = mod.CenterHead(
        in_channels=C_IN,
        tasks=[dict(num_class=1, class_names=["car"])],
        common_heads=dict(reg=(2, 2), height=(1, 2), dim=(3, 2),
                          rot=(2, 2), vel=(2, 2)),
        share_conv_channel=SHARE,
        bbox_coder=dict(type="CenterPointBBoxCoder"),
        separate_head=dict(type="SeparateHead", init_bias=-2.19,
                           final_kernel=3, norm_cfg=gn),
        norm_cfg=gn,
        loss_cls=dict(type="GaussianFocalLoss"),
        loss_bbox=dict(type="L1Loss")).eval()
    for th in head.task_heads:
        th.init_weights()      # heatmap final bias -> init_bias

    x = torch.randn(1, C_IN, *HW)
    with torch.no_grad():
        ref = head([x])[0][0]      # task-0 dict of [1, c, H, W]

    def _convmod(cm):
        # ConvModule: conv (no bias) + GN
        return ({"kernel": _t2j(cm.conv.weight).transpose(2, 3, 1, 0)},
                {"scale": _t2j(cm.norm.weight), "bias": _t2j(cm.norm.bias)})

    th = head.task_heads[0]
    sk, sn = _convmod(head.shared_conv)
    params = {"shared": sk, "GroupNorm_0": sn}
    heads_spec = dict(heatmap=(1, 2), reg=(2, 2), height=(1, 2),
                      dim=(3, 2), rot=(2, 2), vel=(2, 2))
    gn_i = 1
    for name in heads_spec:
        seq = getattr(th, name)
        for i in range(len(seq) - 1):
            k, n = _convmod(seq[i])
            params[f"{name}_conv{i}"] = k
            params[f"GroupNorm_{gn_i}"] = n
            gn_i += 1
        params[f"{name}_out"] = {
            "kernel": _t2j(seq[-1].weight).transpose(2, 3, 1, 0),
            "bias": _t2j(seq[-1].bias)}

    m = CenterHead(num_classes=1, share_channels=SHARE)
    got = m.apply({"params": {"task0": params}},
                  jnp.asarray(x.numpy()[0].transpose(1, 2, 0)))

    for name in heads_spec:
        ours = np.asarray(got[name]).transpose(2, 0, 1)   # -> [c, H, W]
        np.testing.assert_allclose(
            ours, ref[name].numpy()[0], atol=5e-5, rtol=1e-4,
            err_msg=f"branch {name}")


# --------------------------------------------------------- anchor generator
def test_anchor_generator_executed_parity():
    """``AlignedAnchor3DRangeGenerator`` (align_corner=False: centers at
    voxel centers, the stored z is the range-z AS-IS — the delta coder
    then reads it as the anchor's bottom) vs our ``generate_anchors`` on
    the shipped Waymo car range (``sst_base.py:19-30``). Caught a real
    divergence: we used to store z_center - h/2, sinking the car anchor
    prior 0.885 m below the reference's."""
    from objectcentricocccompletion_tpu.models import anchor_head as ah

    agmod = refstub.load_anchor_generator()
    # rectangular range + grid: 8 x-cells over [-74.88, 74.88], 4 y-cells
    # over [-37.44, 37.44] — catches any x/y cell-count or stride swap
    rng6 = [-74.88, -37.44, -0.0345, 74.88, 37.44, -0.0345]
    sizes = [[2.08, 4.73, 1.77]]
    rots = [0, 1.5707963]
    gen = agmod.AlignedAnchor3DRangeGenerator(
        ranges=[rng6], sizes=sizes, rotations=rots, reshape_out=False)
    NX, NY = 8, 4
    with torch.no_grad():
        ref = gen.anchors_single_range(
            [1, NY, NX], rng6, 1, sizes=sizes, rotations=rots,
            device="cpu").numpy()          # [1, NY(y), NX(x), S, R, 7]

    acfg = ah.AnchorConfig(sizes=tuple(map(tuple, sizes)),
                           z_centers=(-0.0345,), rotations=tuple(rots))
    ours = np.asarray(ah.generate_anchors(
        (NX, NY), (-74.88, -37.44, -3.0, 74.88, 37.44, 3.0), acfg))
    S, R = len(sizes), len(rots)
    ours = ours.reshape(NX, NY, S, R, 7).transpose(1, 0, 2, 3, 4)
    np.testing.assert_allclose(ours, ref[0], atol=1e-4)


# ----------------------------------------------------- SECOND / SECONDFPN
def test_second_fpn_conv_geometry_transplant(monkeypatch):
    """Conv-geometry transplant of the CenterPoint BEV tower — reference
    ``SECOND`` + ``SECONDFPN`` (``backbones/second.py``,
    ``necks/second_fpn.py``, shipped W2 config with
    ``use_conv_for_no_stride=True``) vs ours, with the norms bypassed on
    both sides (our GN deliberately replaces the reference's BN — a
    documented batch-free redesign, so only the conv geometry is
    comparable). Pins the stride-2 padding alignment (the reference's own
    'pad-conv2d' comment, second.py:36-37 — flax SAME pads right-heavy
    and shifts every downstream window), the stride-1 1x1 deblock, and
    the deconv tap orientation. Rectangular input guards axis order."""
    import objectcentricocccompletion_tpu.models.second as sec

    mods = refstub.load_second()
    torch.manual_seed(31)
    C_IN, OUT, NUMS, STRIDES = 8, [8, 16], [2, 2], [1, 2]
    ref_bb = mods["second"].SECOND(
        in_channels=C_IN, out_channels=OUT, layer_nums=NUMS,
        layer_strides=STRIDES).eval()
    ref_fpn = mods["second_fpn"].SECONDFPN(
        in_channels=OUT, out_channels=[16, 16], upsample_strides=[1, 2],
        use_conv_for_no_stride=True).eval()
    for m in list(ref_bb.modules()) + list(ref_fpn.modules()):
        for name, child in m.named_children():
            if isinstance(child, torch.nn.BatchNorm2d):
                setattr(m, name, torch.nn.Identity())

    H, W = 12, 8
    x = torch.randn(1, C_IN, H, W)
    with torch.no_grad():
        feats = ref_bb(x)
        ref = ref_fpn(feats)[0][0].numpy()      # [C, H, W]

    monkeypatch.setattr(sec, "_norm", lambda: (lambda t: t))

    def conv_w(mod):
        return {"kernel": _t2j(mod.weight).transpose(2, 3, 1, 0)}

    bb_params = {}
    for i, block in enumerate(ref_bb.blocks):
        convs = [m for m in block if isinstance(m, torch.nn.Conv2d)]
        for j, cv in enumerate(convs):
            bb_params[f"stage{i}_conv{j}"] = conv_w(cv)
    fpn_params = {}
    for i, db in enumerate(ref_fpn.deblocks):
        lead = db[0]
        if isinstance(lead, torch.nn.ConvTranspose2d):
            # torch deconv weight [in, out, kh, kw] -> flax [kh, kw, in,
            # out], SPATIALLY FLIPPED: flax ConvTranspose
            # (transpose_kernel=False) scatters tap (i, j) where torch
            # scatters (kh-1-i, kw-1-j)
            w = _t2j(lead.weight).transpose(2, 3, 0, 1)[::-1, ::-1]
            fpn_params[f"deblock{i}"] = {"kernel": w}
        else:
            fpn_params[f"deblock{i}"] = conv_w(lead)

    our_bb = sec.SECOND(out_channels=tuple(OUT), layer_nums=tuple(NUMS),
                        layer_strides=tuple(STRIDES))
    our_fpn = sec.SECONDFPN(out_channels=(16, 16), upsample_strides=(1, 2))
    xin = jnp.asarray(x[0].numpy().transpose(1, 2, 0))       # [H, W, C]
    feats_j = our_bb.apply({"params": bb_params}, xin)
    got = np.asarray(our_fpn.apply({"params": fpn_params}, feats_j))
    np.testing.assert_allclose(got.transpose(2, 0, 1), ref,
                               atol=2e-4, rtol=1e-4)
