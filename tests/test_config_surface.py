"""Config-surface regression net: every model family must construct and
abstract-evaluate (shape-level forward) from its config — the counterpart of
the reference's ``tests/test_runtime/test_config.py:19-73`` which builds
every config in configs/. jax.eval_shape keeps this fast (no compiles)."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from objectcentricocccompletion_tpu.configs import OcOccNetConfig, tiny_config
from objectcentricocccompletion_tpu.models import (OcOccNetWithLoss,
                                                  TrackletBatch)


def _abstract_batch(cfg):
    B, L, P, K = cfg.batch_size, cfg.reg_len, cfg.max_points_per_frame, \
        cfg.num_occ_samples
    f32, i32 = jnp.float32, jnp.int32
    s = jax.ShapeDtypeStruct
    return TrackletBatch(
        points=s((B, L, P, cfg.points_dim), f32),
        points_mask=s((B, L, P), jnp.bool_),
        rois=s((B, L, 7), f32), roi_scores=s((B, L), f32),
        frame_inds=s((B, L), i32), gt_boxes=s((B, L, 7), f32),
        gt_valid=s((B, L), jnp.bool_), occ_points=s((B, K, 3), f32),
        occ_labels=s((B, K), i32), occ_mask=s((B, K), jnp.bool_),
        occ_score=s((B,), f32))


@pytest.mark.parametrize("variant", ["ococc", "ctrl"])
def test_ococcnet_full_config_abstract(variant):
    """The FULL-SIZE OcOccNet config must trace (shapes/dtypes consistent)
    without running any compute."""
    cfg = dataclasses.replace(OcOccNetConfig(), variant=variant)
    model = OcOccNetWithLoss(cfg)
    batch = _abstract_batch(cfg)
    var_shapes = jax.eval_shape(
        lambda b: model.init({"params": jax.random.PRNGKey(0)}, b,
                             train=False), batch)
    n_params = sum(int(np.prod(x.shape)) for x in
                   jax.tree_util.tree_leaves(var_shapes))
    assert n_params > (1e6 if variant == "ctrl" else 1e7)

    def fwd(params, b):
        return model.apply(params, b, train=False)

    out = jax.eval_shape(fwd, var_shapes, batch)
    assert out[0].shape == ()


def test_sst_full_config_abstract():
    from objectcentricocccompletion_tpu.models.sst_detector import (
        SSTDetector, SSTDetectorConfig)
    cfg = SSTDetectorConfig()
    model = SSTDetector(cfg)
    s = jax.ShapeDtypeStruct
    pts = s((cfg.sst.max_points, 5), jnp.float32)
    msk = s((cfg.sst.max_points,), jnp.bool_)
    var_shapes = jax.eval_shape(
        lambda p, m: model.init(jax.random.PRNGKey(0), p, m), pts, msk)
    out = jax.eval_shape(lambda v, p, m: model.apply(v, p, m), var_shapes,
                         pts, msk)
    A = out["cls"].shape[0]
    assert out["reg"].shape == (A, 7)


def test_centerpoint_full_config_abstract():
    from objectcentricocccompletion_tpu.models.centerpoint import (
        CenterPointConfig, DynamicCenterPoint)
    cfg = CenterPointConfig()
    model = DynamicCenterPoint(cfg)
    s = jax.ShapeDtypeStruct
    pts = s((cfg.max_points, 5), jnp.float32)
    msk = s((cfg.max_points,), jnp.bool_)
    var_shapes = jax.eval_shape(
        lambda p, m: model.init(jax.random.PRNGKey(0), p, m), pts, msk)
    out = jax.eval_shape(lambda v, p, m: model.apply(v, p, m), var_shapes,
                         pts, msk)
    hw = cfg.grid_shape[0] // cfg.out_size_factor
    assert out["heatmap"].shape == (hw, hw, cfg.num_classes)


def test_fsd_full_config_abstract():
    from objectcentricocccompletion_tpu.models.fsd import FSD, FSDConfig
    cfg = FSDConfig()
    model = FSD(cfg)
    s = jax.ShapeDtypeStruct
    pts = s((cfg.max_points, 5), jnp.float32)
    msk = s((cfg.max_points,), jnp.bool_)
    var_shapes = jax.eval_shape(
        lambda p, m: model.init(jax.random.PRNGKey(0), p, m), pts, msk)
    out = jax.eval_shape(lambda v, p, m: model.apply(v, p, m), var_shapes,
                         pts, msk)
    assert out["boxes"].shape == (cfg.max_clusters, 7)
