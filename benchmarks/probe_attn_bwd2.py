"""Corruption probe v2: compute the SST anchor loss twice in one graph —
directly, and from ``optimization_barrier``-pinned head outputs — plus
return the logits. If the barriered loss matches the einsum reference while
the direct one explodes, the miscompilation is in the fusion that feeds the
loss reductions, not in the attention kernel's own outputs.

Usage: python benchmarks/probe_attn_bwd2.py [mode]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def run(mode, model, args, params):
    import jax

    from objectcentricocccompletion_tpu.models import anchor_head as ah

    os.environ["OCOCC_PALLAS_ATTN_BWD"] = mode

    def losses(cls, reg, dirc, hw, gb, gl, gv):
        anchors = ah.generate_anchors(hw, model.cfg.sst.pc_range,
                                      model.cfg.anchors)
        return ah.anchor_head_loss(cls, reg, dirc, anchors, gb, gl, gv,
                                   model.cfg.anchors, model.cfg.num_classes)

    def loss_fn(p, pts, msk, gb, gl, gv):
        out = model.apply({"params": p}, pts, msk)
        d = losses(out["cls"], out["reg"], out["dir"], out["bev_hw"],
                   gb, gl, gv)
        cls_b, reg_b, dir_b = jax.lax.optimization_barrier(
            (out["cls"], out["reg"], out["dir"]))
        db = losses(cls_b, reg_b, dir_b, out["bev_hw"], gb, gl, gv)
        return d["loss"], (d, db)

    step = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
    (total, (d, db)), grads = step(params, *args)
    jax.block_until_ready(total)
    gn = float(jax.numpy.sqrt(sum(
        jax.numpy.sum(g.astype(jax.numpy.float32) ** 2)
        for g in jax.tree_util.tree_leaves(grads))))
    return ({k: float(v) for k, v in d.items()},
            {k: float(v) for k, v in db.items()}, gn)


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "fullstore"
    import jax

    from bench_detectors import synth_frame
    from objectcentricocccompletion_tpu.models.sst_detector import (
        SSTDetector, SSTDetectorConfig)

    cfg0 = SSTDetectorConfig()
    model = SSTDetector(cfg0)
    args = synth_frame(cfg0.sst.max_points, cfg0.sst.pc_range)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = model.init(jax.random.PRNGKey(0), args[0], args[1])["params"]
    params = jax.device_put(params)

    for m in ("0", mode):
        d, db, gn = run(m, model, args, params)
        name = "einsum" if m == "0" else m
        print(f"[{name}] direct  :",
              {k: round(v, 6) for k, v in sorted(d.items())}, flush=True)
        print(f"[{name}] barrier :",
              {k: round(v, 6) for k, v in sorted(db.items())},
              f"grad_norm={gn:.4f}", flush=True)


if __name__ == "__main__":
    main()
