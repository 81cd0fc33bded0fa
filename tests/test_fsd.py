"""FSD: clustering correctness, forward, loss, gradients."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from objectcentricocccompletion_tpu.ops import cluster as cl
from objectcentricocccompletion_tpu.models.fsd import (
    FSD, fsd_loss, tiny_fsd_config)


def test_connected_components():
    # two L-shaped clusters + one singleton on a 2D-ish grid
    coords = np.array([
        [0, 0, 0], [1, 0, 0], [1, 1, 0],      # cluster A
        [5, 5, 0], [5, 6, 0], [6, 6, 0], [7, 6, 0],  # cluster B
        [9, 0, 0],                            # singleton
    ], np.int32)
    pad = np.zeros((8, 3), np.int32)
    coords = np.concatenate([coords, pad], 0)
    valid = np.arange(16) < 8
    labels = cl.connected_components(jnp.asarray(coords), jnp.asarray(valid),
                                     (12, 12, 2))
    labels, num = cl.compact_labels(labels, 8)
    labels = np.asarray(labels)
    assert int(num) == 3
    assert labels[0] == labels[1] == labels[2]
    assert labels[3] == labels[4] == labels[5] == labels[6]
    assert labels[7] not in (labels[0], labels[3])
    assert (labels[8:] == -1).all()


def test_compact_labels_budget():
    labels = jnp.asarray([100, 100, 7, 7, 3, -1], jnp.int32)
    out, num = cl.compact_labels(labels, 8)
    out = np.asarray(out)
    assert int(num) == 3
    assert out[0] == out[1] and out[2] == out[3]
    assert out[5] == -1


def make_fsd_frame(cfg, seed=0, num_boxes=2, max_gt=8):
    rng = np.random.RandomState(seed)
    lo, hi = np.asarray(cfg.pc_range[:3]), np.asarray(cfg.pc_range[3:])
    ctr = rng.uniform(lo + 3, hi - 3, (num_boxes, 3))
    ctr[:, 2] = -0.5
    size = np.abs(rng.normal([2.0, 4.5, 1.7], 0.1, (num_boxes, 3)))
    yaw = rng.uniform(-np.pi, np.pi, (num_boxes, 1))
    boxes = np.concatenate([ctr, size, yaw], -1).astype(np.float32)
    pts = [rng.uniform(lo, hi, (800, 3))]
    for b in boxes:
        local = (rng.rand(300, 3) - 0.5) * b[3:6] * 0.9
        c, sn = np.cos(b[6]), np.sin(b[6])
        pts.append(np.stack([
            local[:, 0] * c - local[:, 1] * sn + b[0],
            local[:, 0] * sn + local[:, 1] * c + b[1],
            local[:, 2] + b[2] + b[5] / 2], -1))
    pts = np.concatenate(pts, 0)
    points = np.concatenate([pts, rng.rand(len(pts), 2)], -1).astype(
        np.float32)
    pad = cfg.max_points - len(points)
    points = np.pad(points, ((0, pad), (0, 0)))
    mask = np.arange(cfg.max_points) < len(pts)
    gt_boxes = np.pad(boxes, ((0, max_gt - num_boxes), (0, 0)))
    gt_valid = np.arange(max_gt) < num_boxes
    return (jnp.asarray(points), jnp.asarray(mask), jnp.asarray(gt_boxes),
            jnp.zeros((max_gt,), jnp.int32), jnp.asarray(gt_valid))


def test_fsd_forward_and_loss():
    cfg = tiny_fsd_config()
    points, mask, boxes, labels, valid = make_fsd_frame(cfg)
    model = FSD(cfg)
    variables = model.init(jax.random.PRNGKey(0), points, mask)
    out = model.apply(variables, points, mask)
    assert out["cls"].shape == (cfg.max_clusters, cfg.num_classes)
    assert out["boxes"].shape == (cfg.max_clusters, 7)
    losses = fsd_loss(out, points, boxes, labels, valid)
    assert np.isfinite(float(losses["loss"]))
    assert float(losses["num_fg_points"]) > 100

    def loss_fn(params):
        o = model.apply({"params": params}, points, mask)
        return fsd_loss(o, points, boxes, labels, valid)["loss"]

    g = jax.grad(loss_fn)(variables["params"])
    assert all(bool(jnp.isfinite(x).all())
               for x in jax.tree_util.tree_leaves(g))


def test_two_stage_fsd_forward():
    from objectcentricocccompletion_tpu.models.fsd_two_stage import (
        TwoStageFSD, tiny_two_stage_config)
    cfg = tiny_two_stage_config()
    points, mask, boxes, labels, valid = make_fsd_frame(cfg.fsd, seed=1)
    model = TwoStageFSD(cfg)
    variables = model.init(jax.random.PRNGKey(0), points, mask)
    out = model.apply(variables, points, mask)
    R = cfg.fsd.max_clusters
    assert out["refined_boxes"].shape == (R, 7)
    assert out["cls2"].shape == (R,)
    assert np.isfinite(np.asarray(out["refined_boxes"])).all()
    # at least one nonempty refined proposal on a populated scene
    assert int(np.asarray(out["roi_nonempty"]).sum()) >= 1


def test_fsdv2_virtual_voxels():
    import dataclasses
    cfg = dataclasses.replace(tiny_fsd_config(), use_clustering=False)
    points, mask, boxes, labels, valid = make_fsd_frame(cfg, seed=2)
    model = FSD(cfg)
    variables = model.init(jax.random.PRNGKey(0), points, mask)
    out = model.apply(variables, points, mask)
    losses = fsd_loss(out, points, boxes, labels, valid)
    assert np.isfinite(float(losses["loss"]))
    # virtual voxels produce at least as many instances as CC clustering
    cfg_cc = tiny_fsd_config()
    out_cc = FSD(cfg_cc).apply(
        FSD(cfg_cc).init(jax.random.PRNGKey(0), points, mask), points, mask)
    assert (int(np.asarray(out["cluster_valid"]).sum())
            >= int(np.asarray(out_cc["cluster_valid"]).sum()))


def test_two_stage_loss_and_grads():
    from objectcentricocccompletion_tpu.models.fsd_two_stage import (
        TwoStageFSD, tiny_two_stage_config, two_stage_loss)
    cfg = tiny_two_stage_config()
    points, mask, boxes, labels, valid = make_fsd_frame(cfg.fsd, seed=3)
    model = TwoStageFSD(cfg)
    variables = model.init(jax.random.PRNGKey(0), points, mask)
    out = model.apply(variables, points, mask)
    losses = two_stage_loss(out, points, boxes, labels, valid)
    assert np.isfinite(float(losses["loss"]))
    assert "loss_cls2" in losses and "loss_reg2" in losses

    def loss_fn(params):
        o = model.apply({"params": params}, points, mask)
        return two_stage_loss(o, points, boxes, labels, valid)["loss"]

    g = jax.grad(loss_fn)(variables["params"])
    assert all(bool(jnp.isfinite(x).all())
               for x in jax.tree_util.tree_leaves(g))
    # stage-2 head params receive gradient
    flat = jax.tree_util.tree_flatten_with_path(g)[0]
    s2 = [np.abs(np.asarray(v)).sum() for k, v in flat
          if "conv_cls" in str(k) or "conv_reg" in str(k)]
    assert sum(s2) > 0
