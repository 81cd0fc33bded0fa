#!/usr/bin/env python
"""Training CLI — equivalent of the reference ``tools/train.py`` +
``tools/dist_train.sh`` (single-program SPMD replaces per-GPU process
launch; run once per host, chips come from jax.devices()).

Usage:
  python tools/train.py ococcnet \
      --proposals data/.../fsd_base_1f_vehicle_training.pkl \
      --gt-candidates data/.../..._gt_candidates.pkl \
      --poses data/waymo/kitti_format/poses.pkl \
      --occ-root data/waymo/waymo_occ_gt/training \
      --work-dir work_dirs/ococcnet
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("model", choices=["ococcnet"],
                   help="model family to train")
    p.add_argument("--proposals", required=True)
    p.add_argument("--gt-candidates", required=True)
    p.add_argument("--poses", required=True)
    p.add_argument("--occ-root", default=None)
    p.add_argument("--work-dir", default="work_dirs/run")
    p.add_argument("--total-steps", type=int, default=None)
    p.add_argument("--ckpt-interval", type=int, default=1000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--tiny", action="store_true",
                   help="tiny config for smoke runs")
    args = p.parse_args()

    from objectcentricocccompletion_tpu.configs import (OcOccNetConfig,
                                                        tiny_config)
    from objectcentricocccompletion_tpu.data.tracklet_dataset import \
        TrackletDataset
    from objectcentricocccompletion_tpu.training.trainer import train

    cfg = tiny_config() if args.tiny else OcOccNetConfig()
    ds = TrackletDataset(
        proposals_file=args.proposals,
        gt_candidates_file=args.gt_candidates,
        pose_file=args.poses, occ_anno_root=args.occ_root, cfg=cfg)
    print(f"dataset: {len(ds)} tracklets")
    train(cfg, ds, args.work_dir, total_steps=args.total_steps,
          ckpt_interval=args.ckpt_interval, seed=args.seed,
          resume=not args.no_resume)


if __name__ == "__main__":
    main()
