"""Localize the SST fused-attention-backward corruption.

Round-3 evidence: with ANY Pallas backward kernel form in the graph,
loss_cls jumps 0.0012 -> 313.934 — the exact same value across five kernel
forms and with zero guard windows appended, while loss_bbox / loss_dir /
num_pos_anchors stay bit-identical. That constancy argues against the
original out-of-bounds-store theory; this probe returns the raw cls logits
under value_and_grad in both modes and diffs them to see WHERE the forward
value diverges (tile-shaped stomp vs global recompute difference).

Usage: python benchmarks/probe_attn_bwd_corruption.py [mode]  (default
fullstore), compared against a fresh einsum run in the same process.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def run(mode, model, args, params):
    import jax

    from objectcentricocccompletion_tpu.models import anchor_head as ah

    os.environ["OCOCC_PALLAS_ATTN_BWD"] = mode

    def loss_fn(p, pts, msk, gb, gl, gv):
        out = model.apply({"params": p}, pts, msk)
        anchors = ah.generate_anchors(out["bev_hw"], model.cfg.sst.pc_range,
                                      model.cfg.anchors)
        d = ah.anchor_head_loss(out["cls"], out["reg"], out["dir"], anchors,
                                gb, gl, gv, model.cfg.anchors,
                                model.cfg.num_classes)
        return d["loss"], (d, out["cls"], out["reg"])

    step = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
    (total, (d, cls, reg)), grads = step(params, *args)
    jax.block_until_ready(total)
    return ({k: float(v) for k, v in d.items()}, np.asarray(cls),
            np.asarray(reg))


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

    d0, cls0, reg0 = run("0", model, args, params)
    d1, cls1, reg1 = run(mode, model, args, params)
    print("einsum:", {k: round(v, 6) for k, v in sorted(d0.items())},
          flush=True)
    print(f"{mode}:", {k: round(v, 6) for k, v in sorted(d1.items())},
          flush=True)

    for name, a, b in [("cls", cls0, cls1), ("reg", reg0, reg1)]:
        diff = a.astype(np.float32) - b.astype(np.float32)
        bad = np.nonzero(diff)
        n = bad[0].size
        print(f"[{name}] shape {a.shape}; {n} mismatched elements "
              f"({100.0 * n / diff.size:.3f}%)", flush=True)
        if n:
            idx = np.stack(bad, -1)
            print(f"  first 8 idx: {idx[:8].tolist()}")
            print(f"  last 8 idx:  {idx[-8:].tolist()}")
            print(f"  einsum vals: {a[bad][:8].tolist()}")
            print(f"  kernel vals: {b[bad][:8].tolist()}")
            # bounding box of the corrupted region per axis
            for ax in range(idx.shape[1]):
                lo, hi = int(idx[:, ax].min()), int(idx[:, ax].max())
                uniq = np.unique(idx[:, ax]).size
                print(f"  axis {ax}: range [{lo}, {hi}] ({uniq} distinct)")


if __name__ == "__main__":
    main()
