"""Serving export: AOT-compile the inference step to a self-contained
artifact.

The reference deploys by shipping the python codebase + torch checkpoint
and re-tracing at load (``tools/test.py`` + mmcv config machinery). The
TPU-native deployment unit is a **serialized StableHLO export** of the
jitted eval step (``jax.export``): the artifact pins the exact program —
shapes, dtypes, shardings — and loads without the model code, its config
system, or flax; version skew between training and serving cannot change
the math. Parameters ride along as a flat npz; a bundle directory is:

    bundle/
      eval_step.hlo     serialized jax.export artifact
      params.npz        flat {path: array} parameters
      meta.json         config + shape contract (documentation only)

``load_bundle`` returns a callable ``(batch) -> predictions`` backed by
the deserialized program; it runs on any backend the export targeted
(export on the training machine with ``platforms=('tpu', 'cpu')`` to
serve on either).
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Callable

import jax
import numpy as np

from ..configs.ococcnet_config import OcOccNetConfig
from ..models.ococcnet import OcOccNetWithLoss, TrackletBatch


def _flatten_params(params) -> dict:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(getattr(p, "key", str(p)) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


@dataclasses.dataclass
class ServingBundle:
    run: Callable          # (TrackletBatch) -> predictions dict
    meta: dict


def export_eval_step(cfg: OcOccNetConfig, params,
                     sample_batch: TrackletBatch,
                     platforms: tuple = None) -> tuple[bytes, dict]:
    """Serialize the jitted eval step (params baked in as constants are
    NOT used — params stay an argument so one program serves any
    checkpoint with the same shapes)."""
    from jax import export as jexport

    model = OcOccNetWithLoss(cfg)

    # the export boundary uses only plain containers (dict params + one
    # positional array per batch field) — custom pytree nodes like the
    # TrackletBatch NamedTuple have no registered serializer
    def eval_fn(p, *fields):
        return model.apply({"params": p}, TrackletBatch(*fields),
                           method=model.predict)

    fn = jax.jit(eval_fn)
    kw = {"platforms": platforms} if platforms else {}
    plain = jax.tree_util.tree_map(lambda x: x, dict(params))
    exp = jexport.export(fn, **kw)(plain, *sample_batch)
    meta = {
        "config": {k: v for k, v in dataclasses.asdict(cfg).items()
                   if isinstance(v, (int, float, str, bool, list, tuple,
                                     type(None)))},
        "batch_shapes": {f: list(getattr(sample_batch, f).shape)
                         for f in TrackletBatch._fields},
        "platforms": list(exp.platforms),
    }
    return exp.serialize(), meta


def save_bundle(out_dir: str, cfg: OcOccNetConfig, params,
                sample_batch: TrackletBatch,
                platforms: tuple = None) -> str:
    os.makedirs(out_dir, exist_ok=True)
    ser, meta = export_eval_step(cfg, params, sample_batch, platforms)
    with open(os.path.join(out_dir, "eval_step.hlo"), "wb") as f:
        f.write(ser)
    np.savez(os.path.join(out_dir, "params.npz"),
             **_flatten_params(params))
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    return out_dir


def load_bundle(bundle_dir: str) -> ServingBundle:
    """Load a bundle WITHOUT the model code: only the serialized program
    and the parameter arrays."""
    from jax import export as jexport

    with open(os.path.join(bundle_dir, "eval_step.hlo"), "rb") as f:
        exp = jexport.deserialize(f.read())
    with open(os.path.join(bundle_dir, "meta.json")) as f:
        meta = json.load(f)
    npz = np.load(os.path.join(bundle_dir, "params.npz"))
    flat = {k: npz[k] for k in npz.files}

    # the export's first positional argument is the param pytree; rebuild
    # its leaf ORDER from the flat dict keys (tree_flatten_with_path and
    # the npz both use the same '/'-joined paths, so sorting is stable)
    # rebuild the nested params dict from the '/'-joined npz keys
    nested: dict = {}
    for key, arr in flat.items():
        parts = key.split("/")
        d = nested
        for p0 in parts[:-1]:
            d = d.setdefault(p0, {})
        d[parts[-1]] = arr

    def run_with_saved(batch):
        # batch: TrackletBatch or any same-order iterable of arrays
        return exp.call(nested, *batch)

    return ServingBundle(run=run_with_saved, meta=meta)
