"""CenterPoint: target rendering, loss, forward, decode round-trip."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from objectcentricocccompletion_tpu.models import centerpoint_head as cph
from objectcentricocccompletion_tpu.models.centerpoint import (
    DynamicCenterPoint, tiny_centerpoint_config)


def make_frame(cfg, seed=0, num_boxes=3):
    rng = np.random.RandomState(seed)
    lo = np.asarray(cfg.pc_range[:3])
    hi = np.asarray(cfg.pc_range[3:])
    ctr = rng.uniform(lo + 1.5, hi - 1.5, (num_boxes, 3))
    size = np.abs(rng.normal([2.0, 3.0, 1.5], 0.2, (num_boxes, 3)))
    yaw = rng.uniform(-np.pi, np.pi, (num_boxes, 1))
    boxes = np.concatenate([ctr, size, yaw], -1).astype(np.float32)
    # points on box surfaces + background clutter
    pts = []
    for b in boxes:
        n = 200
        local = (rng.rand(n, 3) - 0.5) * b[3:6]
        c, s = np.cos(b[6]), np.sin(b[6])
        x = local[:, 0] * c - local[:, 1] * s + b[0]
        y = local[:, 0] * s + local[:, 1] * c + b[1]
        z = local[:, 2] + b[2] + b[5] / 2
        pts.append(np.stack([x, y, z], -1))
    pts.append(rng.uniform(lo, hi, (1000, 3)))
    pts = np.concatenate(pts, 0)
    feats = rng.rand(len(pts), 2)
    points = np.concatenate([pts, feats], -1).astype(np.float32)
    pad = cfg.max_points - len(points)
    points = np.pad(points, ((0, pad), (0, 0)))
    mask = np.arange(cfg.max_points) < len(pts)
    return (jnp.asarray(points), jnp.asarray(mask), jnp.asarray(boxes),
            jnp.zeros((num_boxes,), jnp.int32),
            jnp.ones((num_boxes,), bool))


def test_gaussian_radius_positive():
    r = cph.gaussian_radius(jnp.asarray([10.0, 3.0]), jnp.asarray([5.0, 2.0]))
    assert (np.asarray(r) > 0).all()


def test_targets_heatmap_peaks():
    cfg = tiny_centerpoint_config()
    _, _, boxes, labels, valid = make_frame(cfg)
    H = W = cfg.grid_shape[0] // cfg.out_size_factor
    hm, anno, centers, mask = cph.make_targets(
        boxes, labels, valid, (H, W), 1, cfg.voxel_size, cfg.pc_range,
        cfg.out_size_factor)
    hm = np.asarray(hm)
    centers = np.asarray(centers)
    assert np.asarray(mask).all()
    for m in range(3):
        assert hm[centers[m, 0], centers[m, 1], 0] > 0.99
    # dims targets are log-sizes
    np.testing.assert_allclose(np.exp(np.asarray(anno)[:, 3:6]),
                               np.asarray(boxes)[:, 3:6], rtol=1e-4)


def test_decode_recovers_targets():
    """Build prediction maps directly from targets; decode must return the
    GT boxes."""
    cfg = tiny_centerpoint_config()
    _, _, boxes, labels, valid = make_frame(cfg, seed=1)
    H = W = cfg.grid_shape[0] // cfg.out_size_factor
    hm, anno, centers, mask = cph.make_targets(
        boxes, labels, valid, (H, W), 1, cfg.voxel_size, cfg.pc_range,
        cfg.out_size_factor)
    anno = np.asarray(anno)
    centers = np.asarray(centers)
    logit = np.full((H, W, 1), -10.0, np.float32)
    reg = np.zeros((H, W, 2), np.float32)
    height = np.zeros((H, W, 1), np.float32)
    dim = np.zeros((H, W, 3), np.float32)
    rot = np.zeros((H, W, 2), np.float32)
    vel = np.zeros((H, W, 2), np.float32)
    for m in range(3):
        cy, cx = centers[m]
        logit[cy, cx, 0] = 10.0
        reg[cy, cx] = anno[m, :2]
        height[cy, cx, 0] = anno[m, 2]
        dim[cy, cx] = anno[m, 3:6]
        rot[cy, cx] = anno[m, 6:8]
    preds = dict(heatmap=jnp.asarray(logit), reg=jnp.asarray(reg),
                 height=jnp.asarray(height), dim=jnp.asarray(dim),
                 rot=jnp.asarray(rot), vel=jnp.asarray(vel))
    out_boxes, scores, cls, ok = cph.decode(
        preds, cfg.voxel_size, cfg.pc_range, cfg.out_size_factor, 16)
    got = np.asarray(out_boxes)[np.asarray(ok)][:, :7]
    want = np.asarray(boxes)
    # match by nearest center
    for w in want:
        d = np.linalg.norm(got[:, :2] - w[:2], axis=1)
        i = d.argmin()
        np.testing.assert_allclose(got[i, :3], w[:3], atol=1e-2)
        np.testing.assert_allclose(got[i, 3:6], w[3:6], rtol=1e-3)
        # rot wraps at pi
        dr = abs((got[i, 6] - w[6] + np.pi) % (2 * np.pi) - np.pi)
        assert dr < 1e-3


def test_centerpoint_forward_and_loss():
    cfg = tiny_centerpoint_config()
    points, mask, boxes, labels, valid = make_frame(cfg, seed=2)
    model = DynamicCenterPoint(cfg)
    variables = model.init(jax.random.PRNGKey(0), points, mask)
    losses = model.apply(variables, points, mask, boxes, labels, valid,
                         method=model.loss)
    assert np.isfinite(float(losses["loss"]))

    def loss_fn(params):
        return model.apply({"params": params}, points, mask, boxes, labels,
                           valid, method=model.loss)["loss"]

    g = jax.grad(loss_fn)(variables["params"])
    assert all(bool(jnp.isfinite(x).all())
               for x in jax.tree_util.tree_leaves(g))
