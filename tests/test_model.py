"""OcOccNet forward/loss smoke + invariant tests (tiny config)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from objectcentricocccompletion_tpu.configs import tiny_config
from objectcentricocccompletion_tpu.models import (
    OcOccNet, OcOccNetWithLoss, TrackletBatch)
from objectcentricocccompletion_tpu.models.ococcnet import gt_occ_to_roi_frame
from objectcentricocccompletion_tpu.core import boxes as B


def make_batch(cfg, seed=0, all_points_valid=True):
    rng = np.random.RandomState(seed)
    Bb, L, P, K = cfg.batch_size, cfg.reg_len, cfg.max_points_per_frame, \
        cfg.num_occ_samples
    ctr = rng.uniform(-3, 3, (Bb, L, 3))
    size = rng.uniform(1.5, 4.0, (Bb, L, 3))
    yaw = rng.uniform(-np.pi, np.pi, (Bb, L, 1))
    rois = np.concatenate([ctr, size, yaw], -1).astype(np.float32)
    pts = np.repeat(ctr[:, :, None], P, 2) + rng.uniform(-1, 1, (Bb, L, P, 3))
    feats = rng.rand(Bb, L, P, cfg.num_point_feats).astype(np.float32)
    points = np.concatenate([pts, feats], -1).astype(np.float32)
    mask = np.ones((Bb, L, P), bool) if all_points_valid else \
        rng.rand(Bb, L, P) > 0.3
    gt = rois + rng.uniform(-0.1, 0.1, rois.shape).astype(np.float32)
    return TrackletBatch(
        points=jnp.asarray(points),
        points_mask=jnp.asarray(mask),
        rois=jnp.asarray(rois),
        roi_scores=jnp.asarray(rng.rand(Bb, L).astype(np.float32)),
        frame_inds=jnp.asarray(np.tile(np.arange(L), (Bb, 1))),
        gt_boxes=jnp.asarray(gt),
        gt_valid=jnp.asarray(np.ones((Bb, L), bool)),
        occ_points=jnp.asarray(
            rng.uniform(-1.5, 1.5, (Bb, K, 3)).astype(np.float32)),
        occ_labels=jnp.asarray(rng.randint(0, 2, (Bb, K))),
        occ_mask=jnp.asarray(np.ones((Bb, K), bool)),
        occ_score=jnp.asarray(np.full((Bb,), 0.9, np.float32)),
    )


@pytest.fixture(scope="module")
def cfg():
    return tiny_config()


@pytest.fixture(scope="module")
def variables_and_batch(cfg):
    batch = make_batch(cfg)
    model = OcOccNetWithLoss(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, batch, train=False)
    return model, variables, batch


def test_forward_shapes(cfg, variables_and_batch):
    model, variables, batch = variables_and_batch
    total, aux = model.apply(variables, batch, train=False)
    assert np.isfinite(float(total))
    assert aux["loss_rcnn_cls"].shape == ()
    assert float(aux["num_pos_rois"]) == cfg.batch_size * cfg.reg_len


def test_grads_finite(cfg, variables_and_batch):
    model, variables, batch = variables_and_batch

    def loss_fn(params):
        total, _ = model.apply(
            {"params": params}, batch, train=True,
            rngs={"dropout": jax.random.PRNGKey(1)})
        return total

    g = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.isfinite(x).all()) for x in leaves)
    # every parameter must receive gradient somewhere (no dead branches)
    norms = [float(jnp.abs(x).sum()) for x in leaves]
    assert sum(1 for n in norms if n == 0.0) < len(norms) * 0.1


def test_empty_roi_features_zero(cfg):
    """Frames with no pooled points must emit zero features and be masked
    out of the losses (reference fsd_bbox_head.align_roi_feature_and_rois)."""
    batch = make_batch(cfg)
    # Move frame 0 of sample 0's points far away -> pooling mask empty.
    pts = np.asarray(batch.points).copy()
    pts[0, 0, :, :3] += 1000.0
    batch = batch._replace(points=jnp.asarray(pts))
    model = OcOccNet(cfg)
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                           train=False)
    out = model.apply(variables, batch, train=False)
    assert not bool(out["nonempty"][0, 0])
    assert bool(out["nonempty"][0, 1])


def test_masked_points_do_not_leak(cfg):
    """Invalid points must not affect the outputs."""
    batch = make_batch(cfg, all_points_valid=False)
    model = OcOccNet(cfg)
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                           train=False)
    out1 = model.apply(variables, batch, train=False)
    pts = np.asarray(batch.points).copy()
    m = np.asarray(batch.points_mask)
    pts[~m] = 12345.0  # poison invalid points
    out2 = model.apply(variables, batch._replace(points=jnp.asarray(pts)),
                       train=False)
    np.testing.assert_allclose(np.asarray(out1["cls_logit"]),
                               np.asarray(out2["cls_logit"]), atol=1e-4)


def test_causal_temporal_dependence(cfg):
    """Future frames must not influence earlier frames' outputs
    (causal mask, reference get_future_mask)."""
    batch = make_batch(cfg)
    model = OcOccNet(cfg)
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                           train=False)
    out1 = model.apply(variables, batch, train=False)
    # perturb the LAST frame's points
    pts = np.asarray(batch.points).copy()
    pts[:, -1, :, 3:] += 1.0
    out2 = model.apply(variables, batch._replace(points=jnp.asarray(pts)),
                       train=False)
    L = cfg.reg_len
    a = np.asarray(out1["cls_logit"])[:, : L - 1]
    b = np.asarray(out2["cls_logit"])[:, : L - 1]
    np.testing.assert_allclose(a, b, atol=1e-4)
    assert not np.allclose(np.asarray(out1["cls_logit"])[:, -1],
                           np.asarray(out2["cls_logit"])[:, -1], atol=1e-6)


def test_gt_occ_transform_identity():
    """When roi == gt box, the transform must be the identity."""
    rng = np.random.RandomState(0)
    gt = np.concatenate([rng.uniform(-3, 3, (2, 4, 3)),
                         rng.uniform(1, 4, (2, 4, 3)),
                         rng.uniform(-np.pi, np.pi, (2, 4, 1))],
                        -1).astype(np.float32)
    occ = rng.uniform(-1, 1, (2, 16, 3)).astype(np.float32)
    out = gt_occ_to_roi_frame(jnp.asarray(occ), jnp.asarray(gt),
                              jnp.asarray(gt))
    np.testing.assert_allclose(
        np.asarray(out), np.broadcast_to(occ[:, None], (2, 4, 16, 3)),
        atol=1e-4)


def test_ctrl_variant():
    """CTRL baseline (variant='ctrl'): box losses only, no occupancy or
    temporal parameters, gradients flow."""
    import dataclasses
    cfg = dataclasses.replace(tiny_config(), variant="ctrl")
    batch = make_batch(cfg)
    model = OcOccNetWithLoss(cfg)
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                           train=False)
    total, aux = model.apply(variables, batch, train=False)
    assert np.isfinite(float(total))
    assert "loss_rcnn_occ" not in aux
    names = str(jax.tree_util.tree_structure(variables["params"]))
    assert "ae_encoder" not in names and "occ_decoder" not in names
    assert "temporal" not in names

    def loss_fn(params):
        t, _ = model.apply({"params": params}, batch, train=True,
                           rngs={"dropout": jax.random.PRNGKey(1)})
        return t

    g = jax.grad(loss_fn)(variables["params"])
    assert all(bool(jnp.isfinite(x).all())
               for x in jax.tree_util.tree_leaves(g))


def test_bfloat16_compute():
    """bf16 activations: loss close to fp32, grads finite (params fp32)."""
    import dataclasses
    cfg32 = tiny_config()
    cfg16 = dataclasses.replace(cfg32, compute_dtype="bfloat16")
    batch = make_batch(cfg32, seed=6)
    m32 = OcOccNetWithLoss(cfg32)
    m16 = OcOccNetWithLoss(cfg16)
    v = m32.init({"params": jax.random.PRNGKey(0)}, batch, train=False)
    t32, _ = m32.apply(v, batch, train=False)
    t16, _ = m16.apply(v, batch, train=False)   # same param structure
    assert abs(float(t32) - float(t16)) / abs(float(t32)) < 0.05

    def loss_fn(params):
        t, _ = m16.apply({"params": params}, batch, train=True,
                         rngs={"dropout": jax.random.PRNGKey(1)})
        return t

    g = jax.grad(loss_fn)(v["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.isfinite(x).all()) for x in leaves)
    assert all(x.dtype == jnp.float32 for x in leaves)  # fp32 grads/params


def test_attn_window_limits_history():
    """test_attn_window=1: each frame attends only to itself, so
    perturbing frame 0 must not change later frames at eval time."""
    import dataclasses
    cfg = dataclasses.replace(tiny_config(), test_attn_window=1)
    batch = make_batch(cfg, seed=8)
    model = OcOccNet(cfg)
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                           train=False)
    out1 = model.apply(variables, batch, train=False)
    pts = np.asarray(batch.points).copy()
    pts[:, 0, :, 3:] += 1.0   # perturb FIRST frame
    out2 = model.apply(variables, batch._replace(points=jnp.asarray(pts)),
                       train=False)
    np.testing.assert_allclose(np.asarray(out1["cls_logit"])[:, 1:],
                               np.asarray(out2["cls_logit"])[:, 1:],
                               atol=1e-4)


def test_occ_score_gates_occ_loss():
    """A low-confidence occ annotation (label_iou below occ_label_thresh)
    must contribute ZERO occ loss (ococc_bbox_head.py:707-710 gate)."""
    from objectcentricocccompletion_tpu.configs import tiny_config
    from objectcentricocccompletion_tpu.models import OcOccNetWithLoss
    cfg = tiny_config()
    assert cfg.occ_label_thresh == 0.4
    batch = make_batch(cfg, seed=5)
    model = OcOccNetWithLoss(cfg)
    v = model.init({"params": jax.random.PRNGKey(0)}, batch, train=False)

    lo = batch._replace(occ_score=jnp.full_like(batch.occ_score, 0.2))
    hi = batch._replace(occ_score=jnp.full_like(batch.occ_score, 0.9))
    _, aux_lo = model.apply(v, lo, train=False)
    _, aux_hi = model.apply(v, hi, train=False)
    assert float(aux_lo["loss_rcnn_occ"]) == 0.0
    assert float(aux_hi["loss_rcnn_occ"]) > 0.0
    # box losses unaffected by the occ gate
    np.testing.assert_allclose(float(aux_lo["loss_rcnn_bbox"]),
                               float(aux_hi["loss_rcnn_bbox"]), rtol=1e-6)


def test_ctrl_class_variant_configs():
    from objectcentricocccompletion_tpu.configs.ococcnet_config import (
        ctrl_cyc_config, ctrl_ped_config, ctrl_veh_config)
    veh, ped, cyc = ctrl_veh_config(), ctrl_ped_config(), ctrl_cyc_config()
    for c in (veh, ped, cyc):
        assert c.variant == "ctrl"
    assert veh.corner_loss_weight == 1.0 and ped.corner_loss_weight == 0.0
    assert (ped.cls_pos_thr, ped.cls_neg_thr) == (0.65, 0.15)
    assert cyc.max_epochs == 12
    assert ped.class_names == ("Pedestrian",)


def test_ctrl_corner_loss():
    """CTRL vehicle variant adds the corner loss; it shrinks when
    predictions match GT better."""
    import dataclasses
    from objectcentricocccompletion_tpu.configs import tiny_config
    from objectcentricocccompletion_tpu.models import OcOccNetWithLoss
    cfg = dataclasses.replace(tiny_config(), variant="ctrl",
                              corner_loss_weight=1.0)
    batch = make_batch(cfg, seed=6)
    model = OcOccNetWithLoss(cfg)
    v = model.init({"params": jax.random.PRNGKey(0)}, batch, train=False)
    total, aux = model.apply(v, batch, train=False)
    assert "loss_rcnn_corner" in aux
    assert float(aux["loss_rcnn_corner"]) > 0.0
    assert np.isfinite(float(total))

    g = jax.grad(lambda p: model.apply({"params": p}, batch,
                                       train=False)[0])(v["params"])
    assert all(bool(jnp.isfinite(x).all())
               for x in jax.tree_util.tree_leaves(g))


def test_roi_point_budget_compaction():
    """roi_point_budget: when every RoI has fewer valid pooled points than
    the budget, the compacted model output is IDENTICAL (points are
    permutation-invariant under the masked reductions)."""
    import dataclasses
    from objectcentricocccompletion_tpu.configs import tiny_config
    from objectcentricocccompletion_tpu.models import OcOccNetWithLoss

    cfg = tiny_config()
    batch = make_batch(cfg, seed=11, all_points_valid=False)
    # mask out the tail so every frame has < 32 valid points
    pm = np.asarray(batch.points_mask).copy()
    pm[..., 32:] = False
    batch = batch._replace(points_mask=jnp.asarray(pm))

    model = OcOccNetWithLoss(cfg)
    v = model.init({"params": jax.random.PRNGKey(0)}, batch, train=False)
    total0, aux0 = model.apply(v, batch, train=False)

    cfg2 = dataclasses.replace(cfg, roi_point_budget=32)
    model2 = OcOccNetWithLoss(cfg2)
    total1, aux1 = model2.apply(v, batch, train=False)
    np.testing.assert_allclose(float(total1), float(total0), rtol=1e-5)
    np.testing.assert_allclose(float(aux1["loss_rcnn_occ"]),
                               float(aux0["loss_rcnn_occ"]), rtol=1e-5)


class TestBarrierDropout:
    """BarrierDropout must match nn.Dropout semantics: i.i.d. Bernoulli
    keep mask at rate `1-p`, kept entries scaled by 1/(1-p), zeros
    elsewhere; identity when deterministic."""

    def _apply(self, rate, shape, det, seed=0):
        from objectcentricocccompletion_tpu.models.layers import \
            BarrierDropout
        m = BarrierDropout(rate)
        x = jnp.ones(shape, jnp.float32)
        return np.asarray(m.apply(
            {}, x, deterministic=det,
            rngs={"dropout": jax.random.PRNGKey(seed)}))

    def test_deterministic_identity(self):
        y = self._apply(0.5, (8, 16), det=True)
        np.testing.assert_array_equal(y, np.ones((8, 16), np.float32))

    def test_values_are_zero_or_scaled(self):
        rate = 0.1
        y = self._apply(rate, (64, 1024), det=False)
        keep = 1.0 - rate
        ok = (y == 0.0) | np.isclose(y, 1.0 / keep)
        assert ok.all()

    def test_keep_fraction_matches_rate(self):
        rate = 0.1
        y = self._apply(rate, (256, 1024), det=False)
        frac = (y != 0).mean()
        # 262144 draws, sigma ~ 0.0006 -> 6-sigma window
        assert abs(frac - 0.9) < 0.004, frac

    def test_odd_last_dim(self):
        y = self._apply(0.3, (32, 33), det=False)
        assert y.shape == (32, 33)
        ok = (y == 0.0) | np.isclose(y, 1.0 / 0.7)
        assert ok.all()

    def test_halves_are_independent(self):
        # the low/high 16-bit halves land in columns [0, C/2) and
        # [C/2, C); their keep decisions must be uncorrelated
        rate = 0.5
        y = self._apply(rate, (512, 64), det=False)
        lo = (y[:, :32] != 0).astype(np.float32)
        hi = (y[:, 32:] != 0).astype(np.float32)
        corr = np.corrcoef(lo.ravel(), hi.ravel())[0, 1]
        assert abs(corr) < 0.02, corr

    def test_grad_is_mask_scaled(self):
        from objectcentricocccompletion_tpu.models.layers import \
            BarrierDropout
        m = BarrierDropout(0.2)
        x = jnp.ones((16, 64), jnp.float32)
        rngs = {"dropout": jax.random.PRNGKey(3)}

        def f(x):
            return jnp.sum(m.apply({}, x, deterministic=False, rngs=rngs))

        g = np.asarray(jax.grad(f)(x))
        y = np.asarray(m.apply({}, x, deterministic=False, rngs=rngs))
        np.testing.assert_allclose(g, y, rtol=1e-6)
