"""Checkpoint surgery: publish (strip optimizer state) and subtree
transplantation between parameter trees.

Counterpart of the reference's ``tools/model_converters/``:

* ``publish_model.py`` — deletes the optimizer state from a training
  checkpoint and renames the artifact with a content hash, producing the
  release artifact users download;
* ``fsd_pretrain_converter.py`` — key-renames a pretrained segmentation
  checkpoint so its weights initialize the segmentor subtree of an FSD
  detector (the reference trains the ``VoteSegmentor`` first, then warm
  starts FSD from it);
* ``convert_votenet_checkpoints.py`` — same idea for VoteNet's renamed
  backbone keys.

Orbax checkpoints here are ``StandardSave`` dicts
(``{step, params, opt_state}`` — ``training/trainer.py:34-40``); a
published checkpoint is the same layout with ``opt_state`` dropped so
``restore_params`` can read either kind.
"""
from __future__ import annotations

import hashlib
import json
import os
import shutil

import numpy as np


def _flatten(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten(v, prefix + (k,))
    else:
        yield prefix, tree


def _set_path(tree, path, value):
    node = tree
    for k in path[:-1]:
        node = node[k]
    node[path[-1]] = value


def restore_params(ckpt_dir: str):
    """Raw (template-free) restore of the latest checkpoint's params.

    Works on both training checkpoints ({step, params, opt_state}) and
    published ones ({step, params})."""
    import orbax.checkpoint as ocp
    mgr = ocp.CheckpointManager(os.path.abspath(ckpt_dir))
    step = mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
    payload = mgr.restore(step, args=ocp.args.StandardRestore())
    return int(np.asarray(payload["step"])), payload["params"]


def tree_hash(params) -> str:
    """Content hash of a parameter tree (path-ordered sha256 over raw
    bytes), the analog of publish_model.py's artifact hash."""
    h = hashlib.sha256()
    for path, leaf in sorted(_flatten(params), key=lambda kv: kv[0]):
        h.update("/".join(path).encode())
        arr = np.asarray(leaf)
        h.update(str(arr.dtype).encode() + str(arr.shape).encode())
        h.update(arr.tobytes())
    return h.hexdigest()


def publish(ckpt_dir: str, out_dir: str, keep_step: bool = True) -> str:
    """Write a params-only checkpoint to ``{out_dir}-{hash8}`` (plus the
    config snapshot if present) and return its path."""
    import orbax.checkpoint as ocp
    step, params = restore_params(ckpt_dir)
    digest = tree_hash(params)[:8]
    out = f"{out_dir.rstrip('/')}-{digest}"
    mgr = ocp.CheckpointManager(
        os.path.abspath(out),
        options=ocp.CheckpointManagerOptions(create=True))
    payload = dict(step=np.asarray(step if keep_step else 0), params=params)
    mgr.save(step if keep_step else 0, args=ocp.args.StandardSave(payload))
    mgr.wait_until_finished()
    cfg_src = os.path.join(ckpt_dir, "config.json")
    if os.path.exists(cfg_src):
        shutil.copy(cfg_src, os.path.join(out, "config.json"))
    with open(os.path.join(out, "PUBLISH.json"), "w") as f:
        json.dump({"sha256": tree_hash(params), "source_step": step}, f)
    return out


def transplant(dst_params, src_params, src_prefix: str = "",
               dst_prefix: str = "", strict_shapes: bool = True):
    """Copy every leaf of ``src_params`` under ``src_prefix`` into
    ``dst_params`` at the same path with ``dst_prefix`` substituted
    (fsd_pretrain_converter semantics: rename the pretrained segmentor's
    keys into the detector's tree).

    Paths are '/'-joined module names. Returns (new_params, report) where
    report lists ``copied``, ``missing`` (src leaves with no dst slot) and
    ``shape_mismatch``. ``dst_params`` is not mutated."""
    import jax

    dst = jax.tree_util.tree_map(lambda x: x, dst_params)  # deep-ish copy
    dst_flat = {"/".join(p): l for p, l in _flatten(dst)}
    copied, missing, mismatch = [], [], []
    for path, leaf in _flatten(src_params):
        joined = "/".join(path)
        if src_prefix and not joined.startswith(src_prefix):
            continue
        target = dst_prefix + joined[len(src_prefix):]
        if target not in dst_flat:
            missing.append(joined)
            continue
        cur = dst_flat[target]
        if tuple(np.shape(cur)) != tuple(np.shape(leaf)):
            mismatch.append((joined, tuple(np.shape(leaf)),
                             tuple(np.shape(cur))))
            if strict_shapes:
                continue
        _set_path(dst, tuple(target.split("/")), np.asarray(leaf))
        copied.append(target)
    return dst, {"copied": copied, "missing": missing,
                 "shape_mismatch": mismatch}
