"""Serving export (serving/export.py): the AOT-serialized eval step
round-trips through bytes and reproduces the live model's predictions
without re-tracing the model code."""
import numpy as np
import jax

from objectcentricocccompletion_tpu.configs import tiny_config
from objectcentricocccompletion_tpu.data.synthetic import synthetic_batch
from objectcentricocccompletion_tpu.models.ococcnet import OcOccNetWithLoss
from objectcentricocccompletion_tpu.serving import load_bundle, save_bundle


def test_export_roundtrip(tmp_path):
    cfg = tiny_config()
    batch = synthetic_batch(cfg, batch_size=2, seed=0)
    model = OcOccNetWithLoss(cfg)
    params = model.init({"params": jax.random.PRNGKey(0)}, batch,
                        train=False)["params"]

    live = model.apply({"params": params}, batch,
                       method=model.predict)

    bundle_dir = save_bundle(str(tmp_path / "bundle"), cfg, params, batch)
    bundle = load_bundle(bundle_dir)
    served = bundle.run(batch)

    assert set(bundle.meta["batch_shapes"]) == set(batch._fields)
    np.testing.assert_allclose(np.asarray(served["boxes"]),
                               np.asarray(live["boxes"]), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(served["scores"]),
                               np.asarray(live["scores"]), rtol=1e-5,
                               atol=1e-5)


def test_export_serves_other_checkpoints(tmp_path):
    """One exported program serves any same-shape checkpoint: run() takes
    the saved params, while the underlying export keeps params as an
    argument (not baked constants)."""
    cfg = tiny_config()
    batch = synthetic_batch(cfg, batch_size=2, seed=1)
    model = OcOccNetWithLoss(cfg)
    p0 = model.init({"params": jax.random.PRNGKey(0)}, batch,
                    train=False)["params"]
    p1 = model.init({"params": jax.random.PRNGKey(7)}, batch,
                    train=False)["params"]

    bundle_dir = save_bundle(str(tmp_path / "b"), cfg, p0, batch)
    bundle = load_bundle(bundle_dir)
    out1 = bundle.run(batch)
    live1 = model.apply({"params": p1}, batch,
                        method=model.predict)
    # saved-params output differs from the OTHER checkpoint's live output
    assert not np.allclose(np.asarray(out1["scores"]),
                           np.asarray(live1["scores"]))
