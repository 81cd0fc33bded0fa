"""SST bfloat16 vs float32 TRAINING-TRAJECTORY comparison (tiny config,
synthetic frames, CPU) — the evidence behind shipping bf16 as the SST
default (the reference's fp16 recipe analog, ``configs/_base_/models/
sst_base.py`` + fp16 training in the SST lineage).

Tiny-shape forward closeness is pinned by
``tests/test_sst.py::test_sst_bf16_compute_close_to_f32``; at production
scale the random-init loss differs (perturbation amplification through 12
post-norm layers, BENCH_NOTES r4).  What that leaves open is whether the
two dtypes TRAIN to the same place.  This script trains the same tiny
SSTDetector from the same init on the same batch stream in both dtypes
to convergence, then evaluates both on a held-out synthetic val set:

    python benchmarks/bench_sst_bf16_trajectory.py [--steps 600]

Prints a table of loss trajectories and final KITTI AP per dtype.
"""
import argparse
import dataclasses
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--lr", type=float, default=1e-4)
    args = ap.parse_args()

    from objectcentricocccompletion_tpu.data.frame_dataset import (
        FrameDataset, write_synthetic_frames)
    from objectcentricocccompletion_tpu.evalx.detector_eval import \
        evaluate_detector
    from objectcentricocccompletion_tpu.models.sst_detector import (
        SSTDetector, tiny_sst_detector_config)
    from objectcentricocccompletion_tpu.training.detector_trainer import \
        train_detector

    base = tiny_sst_detector_config()
    # tiny SST covers +-9.6 m; keep every synthetic box inside the grid
    kw = dict(num_points=1600, num_boxes=6, xy_range=9.0,
              classes=("Car",))
    tmp = tempfile.mkdtemp(prefix="sst_traj_")
    train_root = os.path.join(tmp, "train")
    val_root = os.path.join(tmp, "val")
    write_synthetic_frames(train_root, num_frames=24, seed=11, **kw)
    write_synthetic_frames(val_root, num_frames=8, seed=99, **kw)
    ds_kw = dict(max_points=base.sst.max_points, max_gt=base.max_gt)
    ds_train = FrameDataset(os.path.join(train_root, "infos.pkl"),
                            train_root, **ds_kw)
    ds_val = FrameDataset(os.path.join(val_root, "infos.pkl"), val_root,
                          **ds_kw)

    results = {}
    for dtype in ("float32", "bfloat16"):
        cfg = dataclasses.replace(base, sst=dataclasses.replace(
            base.sst, compute_dtype=dtype))
        model = SSTDetector(cfg)
        wd = os.path.join(tmp, f"run_{dtype}")
        # same seed -> identical f32 init (params stay f32 under bf16
        # compute) and the identical batch stream
        state = train_detector(model, ds_train, wd,
                               total_steps=args.steps, base_lr=args.lr,
                               log_interval=20, ckpt_interval=10 ** 9,
                               seed=0, resume=False)
        curve = [json.loads(ln) for ln in
                 open(os.path.join(wd, "metrics.jsonl"))]
        # official 0.7 Car IoU is out of reach for the 0.8 m-voxel tiny
        # grid (localization floor ~half a voxel); 0.5 discriminates
        ev = {thr: evaluate_detector(
            model, "sst", state.params, ds_val, classes=("Car",),
            score_thresh=0.3, iou_thresh={"Car": thr})["Car_3d_easy"]
            for thr in (0.7, 0.5, 0.25)}
        results[dtype] = dict(curve=curve, ap=ev)
        print(f"[{dtype}] final loss "
              f"{curve[-1]['loss']:.4f}  AP@{{0.7,0.5,0.25}} {ev}")

    print("\nstep    f32 loss   bf16 loss   rel diff")
    f32c = {r["step"]: r["loss"] for r in results["float32"]["curve"]}
    b16c = {r["step"]: r["loss"] for r in results["bfloat16"]["curve"]}
    for s in sorted(f32c):
        a, b = f32c[s], b16c.get(s, float("nan"))
        print(f"{s:5d}   {a:8.4f}   {b:8.4f}   "
              f"{abs(a - b) / max(abs(a), 1e-9):8.4f}")
    out = {d: dict(final_loss=results[d]["curve"][-1]["loss"],
                   ap=results[d]["ap"]) for d in results}
    print("\n" + json.dumps(out, default=float))


if __name__ == "__main__":
    main()
