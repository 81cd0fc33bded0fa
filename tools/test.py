#!/usr/bin/env python
"""Evaluation CLI — equivalent of the reference ``tools/test.py`` +
``tools/dist_test.sh``: restores a checkpoint, runs inference over the val
tracklets, writes the Waymo ``.bin`` and prints occupancy IoU metrics."""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("model", choices=["ococcnet"])
    p.add_argument("--proposals", required=True)
    p.add_argument("--gt-candidates", required=True)
    p.add_argument("--poses", required=True)
    p.add_argument("--occ-root", default=None)
    p.add_argument("--ckpt-dir", required=True)
    p.add_argument("--out-dir", default="work_dirs/eval")
    p.add_argument("--max-tracklets", type=int, default=None)
    p.add_argument("--no-occ", action="store_true")
    p.add_argument("--tiny", action="store_true",
                   help="tiny config for smoke runs")
    args = p.parse_args()

    import jax
    from objectcentricocccompletion_tpu.configs import (OcOccNetConfig,
                                                        tiny_config)
    from objectcentricocccompletion_tpu.data.loader import TrainLoader
    from objectcentricocccompletion_tpu.data.tracklet_dataset import \
        TrackletDataset
    from objectcentricocccompletion_tpu.evalx.evaluator import Evaluator
    from objectcentricocccompletion_tpu.models import OcOccNetWithLoss
    from objectcentricocccompletion_tpu.parallel.train import \
        create_train_state
    from objectcentricocccompletion_tpu.training.trainer import \
        CheckpointManager

    cfg = tiny_config() if args.tiny else OcOccNetConfig()
    ds = TrackletDataset(
        proposals_file=args.proposals,
        gt_candidates_file=args.gt_candidates,
        pose_file=args.poses, occ_anno_root=args.occ_root, cfg=cfg,
        training=False, min_tracklet_length=1)
    print(f"dataset: {len(ds)} tracklets")

    ds_init = TrackletDataset(
        proposals_file=args.proposals,
        gt_candidates_file=args.gt_candidates,
        pose_file=args.poses, occ_anno_root=args.occ_root, cfg=cfg)
    sample = next(TrainLoader(ds_init, 1))
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        model, state, _, _ = create_train_state(
            cfg, jax.random.PRNGKey(0), sample, 10)
    restored = CheckpointManager(args.ckpt_dir).restore(state)
    if restored is None:
        raise SystemExit(f"no checkpoint found in {args.ckpt_dir}")
    params = jax.device_put(restored.params)

    ev = Evaluator(model, params, ds, cfg)
    metrics = ev.run(args.out_dir, max_tracklets=args.max_tracklets,
                     eval_occ=not args.no_occ)
    print(json.dumps(metrics, indent=2, default=float))


if __name__ == "__main__":
    main()
