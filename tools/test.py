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
    p.add_argument("model", choices=["ococcnet", "ctrl", "centerpoint",
                                     "sst", "fsd", "fsd2", "fsdpp",
                                     "votenet"])
    p.add_argument("--ctrl-class", choices=["veh", "ped", "cyc"],
                   default="veh",
                   help="CTRL variant class (configs/ctrl/"
                        "ctrl_{veh,ped,cyc}_*.py)")
    # tracklet-family inputs (ococcnet)
    p.add_argument("--proposals")
    p.add_argument("--gt-candidates")
    p.add_argument("--poses")
    p.add_argument("--occ-root", default=None)
    # frame-family inputs (centerpoint / sst / fsd)
    p.add_argument("--infos", help="frame infos pkl")
    p.add_argument("--dataset", choices=["waymo", "argo2", "nuscenes",
                                         "lyft", "scannet", "sunrgbd"],
                   default="waymo",
                   help="frame dataset family (infos format)")
    p.add_argument("--data-root", help="frame data root")
    p.add_argument("--max-frames", type=int, default=None)
    p.add_argument("--score-thresh", type=float, default=0.1)
    p.add_argument("--metric", choices=["kitti", "waymo"], default="kitti",
                   help="detector metric protocol (waymo = native C++ "
                        "mAP/mAPH via .bin files)")
    p.add_argument("--ckpt-dir", required=True)
    p.add_argument("--out-dir", default="work_dirs/eval")
    p.add_argument("--max-tracklets", type=int, default=None)
    p.add_argument("--no-occ", action="store_true")
    p.add_argument("--occ-baseline", action="store_true",
                   help="also score the point-aggregation occupancy "
                        "baseline (test_occ_baseline) next to the model")
    p.add_argument("--tta", action="store_true",
                   help="double-flip test-time augmentation "
                        "(MultiScaleFlipAug3D eval mode)")
    p.add_argument("--tune-steps", type=int, default=0,
                   help="online test-time latent tuning iterations")
    p.add_argument("--num-sweeps", type=int, default=0,
                   help="concatenate N previous frames per sample at eval "
                        "(the reference's 3f multi-sweep configs)")
    p.add_argument("--tiny", action="store_true",
                   help="tiny config for smoke runs")
    p.add_argument("--eval-layout", choices=["dense", "packed"],
                   default="dense",
                   help="point layout for the eval forward. The param "
                        "tree is layout-independent, so a packed-trained "
                        "checkpoint evaluates under either; 'dense' keeps "
                        "MORE points per frame (up to the per-frame cap "
                        "instead of the packed waterfill) and compiles "
                        "far faster at long eval buckets")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (smoke runs)")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    if args.model not in ("ococcnet", "ctrl"):
        _eval_detector(args)
        return
    import dataclasses

    from objectcentricocccompletion_tpu.configs import (
        OcOccNetConfig, ctrl_cyc_config, ctrl_ped_config, ctrl_veh_config,
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

    if args.model == "ctrl":
        # CTRL tracklet refinement (W6): same tracklet data/eval path as
        # ococcnet with the per-class ctrl config (no occupancy branch) —
        # reference `tools/dist_test.sh configs/ctrl/ctrl_veh_24e.py`
        full = {"veh": ctrl_veh_config, "ped": ctrl_ped_config,
                "cyc": ctrl_cyc_config}[args.ctrl_class]()
        cfg = (dataclasses.replace(
            tiny_config(), variant="ctrl", class_names=full.class_names,
            cls_pos_thr=full.cls_pos_thr, cls_neg_thr=full.cls_neg_thr,
            corner_loss_weight=full.corner_loss_weight)
            if args.tiny else full)
        args.no_occ = True   # no occupancy decoder in the CTRL variant
    else:
        cfg = tiny_config() if args.tiny else OcOccNetConfig()
    if args.eval_layout == "dense":
        cfg = dataclasses.replace(cfg, packed_point_budget=None)
    ds = TrackletDataset(
        proposals_file=args.proposals,
        gt_candidates_file=args.gt_candidates,
        pose_file=args.poses, occ_anno_root=args.occ_root, cfg=cfg,
        class_names=cfg.class_names,
        training=False, min_tracklet_length=1)
    print(f"dataset: {len(ds)} tracklets")

    ds_init = TrackletDataset(
        proposals_file=args.proposals,
        gt_candidates_file=args.gt_candidates,
        pose_file=args.poses, occ_anno_root=args.occ_root, cfg=cfg,
        class_names=cfg.class_names)
    sample = next(TrainLoader(ds_init, 1))
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        model, state, _, _ = create_train_state(
            cfg, jax.random.PRNGKey(0), sample, 10)
    restored = CheckpointManager(args.ckpt_dir).restore(state)
    if restored is None:
        raise SystemExit(f"no checkpoint found in {args.ckpt_dir}")
    params = jax.device_put(restored.params)

    ev = Evaluator(model, params, ds, cfg, tta=args.tta,
                   online_tuning_iters=args.tune_steps)
    metrics = ev.run(args.out_dir, max_tracklets=args.max_tracklets,
                     eval_occ=not args.no_occ,
                     eval_occ_baseline=args.occ_baseline)
    print(json.dumps(metrics, indent=2, default=float))


def _eval_detector(args):
    """Frame-detector eval: restore checkpoint, predict over val frames,
    print KITTI AP (difficulty from image-plane annos)."""
    import json

    import jax
    import numpy as np
    from objectcentricocccompletion_tpu.data.frame_dataset import \
        FrameDataset
    from objectcentricocccompletion_tpu.evalx.detector_eval import \
        evaluate_detector
    from objectcentricocccompletion_tpu.training.detector_trainer import (
        DetectorState, FrameLoader)
    from objectcentricocccompletion_tpu.training.trainer import \
        CheckpointManager

    if not args.infos or not args.data_root:
        raise SystemExit(
            f"{args.model} evaluation needs --infos and --data-root")
    frame_kw = dict(max_points=4096, max_gt=32) if args.tiny else {}
    if args.dataset == "nuscenes":
        from objectcentricocccompletion_tpu.data.nuscenes_dataset import \
            NuScenesDataset
        ds = NuScenesDataset(args.infos, args.data_root, **frame_kw)
    elif args.dataset == "lyft":
        from objectcentricocccompletion_tpu.data.nuscenes_dataset import \
            LyftDataset
        ds = LyftDataset(args.infos, args.data_root, **frame_kw)
    elif args.dataset in ("scannet", "sunrgbd"):
        from objectcentricocccompletion_tpu.data.indoor_dataset import (
            ScanNetDataset, SUNRGBDDataset)
        cls_ds = ScanNetDataset if args.dataset == "scannet" \
            else SUNRGBDDataset
        ds = cls_ds(args.infos, args.data_root, **frame_kw)
    elif args.dataset == "argo2":
        from objectcentricocccompletion_tpu.data.argo2_dataset import \
            Argo2Dataset
        # argo2 reads the sensor directory layout; --data-root is the
        # dataset root, --infos selects the split name
        ds = Argo2Dataset(args.data_root, args.infos or "train",
                          **frame_kw)
    else:
        ds = FrameDataset(args.infos, args.data_root,
                          num_sweeps=args.num_sweeps, **frame_kw)
    print(f"dataset: {len(ds)} frames")

    if args.model == "votenet":
        from objectcentricocccompletion_tpu.models.votenet import (
            VoteNet, VoteNetConfig, tiny_votenet_config)
        ncls = len(getattr(ds, "classes", range(18)))
        model = VoteNet(tiny_votenet_config(min(ncls, 4)) if args.tiny
                        else VoteNetConfig(
                            num_classes=ncls,
                            with_yaw=args.dataset == "sunrgbd"))
    elif args.model == "centerpoint":
        from objectcentricocccompletion_tpu.models.centerpoint import (
            CenterPointConfig, DynamicCenterPoint, tiny_centerpoint_config)
        model = DynamicCenterPoint(
            tiny_centerpoint_config() if args.tiny else CenterPointConfig())
    elif args.model == "sst":
        from objectcentricocccompletion_tpu.models.sst_detector import (
            SSTDetector, SSTDetectorConfig, tiny_sst_detector_config)
        model = SSTDetector(tiny_sst_detector_config() if args.tiny
                            else SSTDetectorConfig())
    elif args.model == "fsd2":
        from objectcentricocccompletion_tpu.models.fsd_two_stage import (
            TwoStageFSD, TwoStageFSDConfig, tiny_two_stage_config)
        model = TwoStageFSD(tiny_two_stage_config() if args.tiny
                            else TwoStageFSDConfig())
    elif args.model == "fsdpp":
        from objectcentricocccompletion_tpu.models.fsdpp import (
            FSDPP, FSDPPConfig, tiny_fsdpp_config)
        model = FSDPP(tiny_fsdpp_config() if args.tiny else FSDPPConfig())
    else:
        from objectcentricocccompletion_tpu.models.fsd import (
            FSD, FSDConfig, tiny_fsd_config)
        model = FSD(tiny_fsd_config() if args.tiny else FSDConfig())

    sample = next(FrameLoader(ds, 1))
    import jax.numpy as jnp
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        if args.model == "fsdpp":
            from objectcentricocccompletion_tpu.models.fsdpp import \
                init_sequence_state
            mem0 = init_sequence_state(model.cfg, sample.points.shape[-1])
            params = model.init(jax.random.PRNGKey(0), mem0,
                                sample.points[0],
                                sample.points_mask[0])["params"]
        else:
            params = model.init(jax.random.PRNGKey(0), sample.points[0],
                                sample.points_mask[0])["params"]
        # opt_state isn't used for eval, but the restore template must have
        # the training optimizer's tree structure
        from objectcentricocccompletion_tpu.training.optim import \
            make_optimizer
        tx, _ = make_optimizer(1e-5, 1000)
        state = DetectorState(jnp.zeros((), jnp.int32), params,
                              tx.init(params))
    restored = CheckpointManager(args.ckpt_dir).restore(state)
    if restored is None:
        raise SystemExit(f"no checkpoint found in {args.ckpt_dir}")
    params = jax.device_put(restored.params)

    if args.model == "fsdpp":
        from objectcentricocccompletion_tpu.evalx.detector_eval import \
            evaluate_detector_sequential
        metrics = evaluate_detector_sequential(
            model, params, ds, score_thresh=args.score_thresh,
            max_frames=args.max_frames, metric=args.metric,
            out_dir=args.out_dir)
    elif args.metric == "waymo":
        from objectcentricocccompletion_tpu.evalx.detector_eval import \
            evaluate_detector_waymo
        metrics = evaluate_detector_waymo(
            model, args.model, params, ds, args.out_dir,
            score_thresh=args.score_thresh, max_frames=args.max_frames)
    else:
        # per-dataset class names drive the KITTI-protocol AP keys
        classes = tuple(getattr(ds, "classes", ("Car",)))
        metrics = evaluate_detector(model, args.model, params, ds,
                                    classes=classes,
                                    score_thresh=args.score_thresh,
                                    max_frames=args.max_frames)
    print(json.dumps(metrics, indent=2, default=float))


if __name__ == "__main__":
    main()
