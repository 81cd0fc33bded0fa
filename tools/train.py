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
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("model",
                   choices=["ococcnet", "ctrl", "centerpoint", "sst",
                            "fsd", "fsd2", "fsdpp", "votenet"],
                   help="model family to train")
    # tracklet-family inputs (ococcnet / ctrl)
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
    p.add_argument("--occ-pred-root", default=None,
                   help="merge predicted occupancy points (W8)")
    p.add_argument("--work-dir", default="work_dirs/run")
    p.add_argument("--total-steps", type=int, default=None)
    p.add_argument("--ckpt-interval", type=int, default=1000)
    p.add_argument("--log-interval", type=int, default=50,
                   help="metrics.jsonl cadence (steps)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--tiny", action="store_true",
                   help="tiny config for smoke runs")
    p.add_argument("--seq-window", type=int, default=2,
                   help="frames per window (fsdpp)")
    p.add_argument("--ctrl-class", choices=["veh", "ped", "cyc"],
                   default="veh",
                   help="CTRL class variant (ctrl_veh_24e / ctrl_ped_24e / "
                        "ctrl_cyc_12e)")
    p.add_argument("--fixed-ae", action="store_true",
                   help="freeze the occupancy auto-encoder (OnlyGrad "
                        "optimizer mode)")
    p.add_argument("--num-sweeps", type=int, default=0,
                   help="concatenate N previous frames into each sample "
                        "(the reference's 3f multi-sweep configs; adds a "
                        "time-lag point channel)")
    p.add_argument("--augment", action="store_true",
                   help="frame geometry augmentation (the reference train "
                        "pipeline: RandomFlip3D + GlobalRotScaleTrans + "
                        "range filters)")
    p.add_argument("--disable-aug-after", type=int, default=None,
                   help="turn augmentation off from this step on (the "
                        "DisableAugmentationHook analog)")
    p.add_argument("--gt-sample", type=int, default=0,
                   help="GT copy-paste augmentation: target objects per "
                        "class per frame (0 = off)")
    p.add_argument("--gt-db-cache", default=None,
                   help="pickle cache for the GT copy-paste database")
    p.add_argument("--gt-db-min-points", type=int, default=8,
                   help="min interior points for a GT crop to enter the "
                        "sampling database")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (smoke runs)")
    p.add_argument("--dtype", default=None,
                   help="compute-dtype override for the detector families "
                        "(e.g. bfloat16 — the reference's fp16 analog)")
    # parallelism (ococcnet/ctrl): DP is implicit over all devices
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel size: [data, model] mesh, wide "
                        "MLP kernels shard over 'model'")
    p.add_argument("--fsdp", action="store_true",
                   help="shard params + optimizer moments over the data "
                        "axis (ZeRO-3)")
    p.add_argument("--loader-workers", type=int, default=0,
                   help="sample-building worker processes (spawn); 0 = "
                        "in-process build with a background prefetch "
                        "thread")
    p.add_argument("--sequence-parallel", action="store_true",
                   help="shard the packed point / occ-query axes over "
                        "'model' (requires --tp > 1 and the packed "
                        "layout)")
    # multi-host launch (one process per host; replaces dist_train.sh)
    p.add_argument("--coordinator", default=None,
                   help="coordinator host:port for multi-host runs")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    args = p.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from objectcentricocccompletion_tpu.parallel.multihost import initialize
    initialize(coordinator_address=args.coordinator,
               num_processes=args.num_processes, process_id=args.process_id)

    if args.model in ("ococcnet", "ctrl"):
        from objectcentricocccompletion_tpu.configs import (
            OcOccNetConfig, tiny_config)
        from objectcentricocccompletion_tpu.data.tracklet_dataset import \
            TrackletDataset
        from objectcentricocccompletion_tpu.training.trainer import train

        cfg = tiny_config() if args.tiny else OcOccNetConfig()
        if args.model == "ctrl":
            from objectcentricocccompletion_tpu.configs.ococcnet_config \
                import ctrl_cyc_config, ctrl_ped_config, ctrl_veh_config
            base = {"veh": ctrl_veh_config, "ped": ctrl_ped_config,
                    "cyc": ctrl_cyc_config}[args.ctrl_class]()
            if args.tiny:
                cfg = dataclasses.replace(
                    cfg, variant="ctrl", class_names=base.class_names,
                    cls_pos_thr=base.cls_pos_thr,
                    cls_neg_thr=base.cls_neg_thr,
                    corner_loss_weight=base.corner_loss_weight)
            else:
                cfg = base
        if args.fixed_ae:
            cfg = dataclasses.replace(cfg, fixed_ae=True)
        ds = TrackletDataset(
            proposals_file=args.proposals,
            gt_candidates_file=args.gt_candidates,
            pose_file=args.poses, occ_anno_root=args.occ_root, cfg=cfg,
            class_names=cfg.class_names)
        print(f"dataset: {len(ds)} tracklets")
        train(cfg, ds, args.work_dir, total_steps=args.total_steps,
              ckpt_interval=args.ckpt_interval,
              log_interval=args.log_interval, seed=args.seed,
              resume=not args.no_resume, tp=args.tp, fsdp=args.fsdp,
              sequence_parallel=args.sequence_parallel,
              loader_workers=args.loader_workers)
        return

    # frame-level detector families
    from objectcentricocccompletion_tpu.data.frame_dataset import \
        FrameDataset
    from objectcentricocccompletion_tpu.training.detector_trainer import \
        train_detector

    if not args.infos or not args.data_root:
        raise SystemExit(
            f"{args.model} training needs --infos and --data-root")
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
                          occ_pred_root=args.occ_pred_root,
                          augment=args.augment,
                          num_sweeps=args.num_sweeps, **frame_kw)
    print(f"dataset: {len(ds)} frames")
    if args.gt_sample > 0:
        from objectcentricocccompletion_tpu.data.dbsampler import (
            DBSampler, GTDatabase)
        db = GTDatabase.build_or_load(
            ds, cache_path=args.gt_db_cache,
            min_points=args.gt_db_min_points, max_frames=2000)
        ds.db_sampler = DBSampler(
            db, {lab: args.gt_sample for lab in db.entries}, seed=args.seed)
        print(f"gt database: {len(db)} crops, "
              f"classes {sorted(db.entries)}")
    if args.model == "fsdpp":
        from objectcentricocccompletion_tpu.models.fsdpp import (
            FSDPP, FSDPPConfig, tiny_fsdpp_config)
        from objectcentricocccompletion_tpu.training.seq_trainer import \
            train_fsdpp
        model = FSDPP(tiny_fsdpp_config() if args.tiny else FSDPPConfig())
        train_fsdpp(model, ds, args.work_dir,
                    total_steps=args.total_steps or 1000,
                    window=args.seq_window,
                    ckpt_interval=args.ckpt_interval, seed=args.seed,
                    resume=not args.no_resume)
        return
    if args.model == "votenet":
        from objectcentricocccompletion_tpu.models.votenet import (
            VoteNet, VoteNetConfig, tiny_votenet_config)
        ncls = len(getattr(ds, "classes", range(18)))
        vc = (tiny_votenet_config(min(ncls, 4)) if args.tiny
              else VoteNetConfig(num_classes=ncls,
                                 with_yaw=args.dataset == "sunrgbd"))
        model = VoteNet(vc)
    elif args.model == "centerpoint":
        from objectcentricocccompletion_tpu.models.centerpoint import (
            CenterPointConfig, DynamicCenterPoint, tiny_centerpoint_config)
        ccfg = tiny_centerpoint_config() if args.tiny else CenterPointConfig()
        if args.dtype:
            ccfg = dataclasses.replace(ccfg, encoder_dtype=args.dtype)
        model = DynamicCenterPoint(ccfg)
    elif args.model == "sst":
        from objectcentricocccompletion_tpu.models.sst_detector import (
            SSTDetector, SSTDetectorConfig, tiny_sst_detector_config)
        scfg = tiny_sst_detector_config() if args.tiny \
            else SSTDetectorConfig()
        if args.dtype:
            scfg = dataclasses.replace(scfg, sst=dataclasses.replace(
                scfg.sst, compute_dtype=args.dtype))
        model = SSTDetector(scfg)
    elif args.model == "fsd2":
        from objectcentricocccompletion_tpu.models.fsd_two_stage import (
            TwoStageFSD, TwoStageFSDConfig, tiny_two_stage_config,
            two_stage_loss)

        class TwoStageWithLoss(TwoStageFSD):
            def loss(self, points, mask, gt_boxes, gt_labels, gt_valid):
                out = self(points, mask)
                return two_stage_loss(out, points, gt_boxes, gt_labels,
                                      gt_valid)

        tcfg = tiny_two_stage_config() if args.tiny else TwoStageFSDConfig()
        if args.dtype:
            # compute dtype lives on the single-stage sub-config
            # (fsd_two_stage reads cfg.fsd.compute_dtype)
            tcfg = dataclasses.replace(tcfg, fsd=dataclasses.replace(
                tcfg.fsd, compute_dtype=args.dtype))
        model = TwoStageWithLoss(tcfg)
    else:   # fsd
        from objectcentricocccompletion_tpu.models.fsd import (
            FSD, FSDConfig, fsd_loss, tiny_fsd_config)

        class FSDWithLoss(FSD):
            def loss(self, points, mask, gt_boxes, gt_labels, gt_valid):
                out = self(points, mask)
                return fsd_loss(out, points, gt_boxes, gt_labels, gt_valid)

        fcfg = tiny_fsd_config() if args.tiny else FSDConfig()
        if args.dtype:
            fcfg = dataclasses.replace(fcfg, compute_dtype=args.dtype)
        model = FSDWithLoss(fcfg)
    train_detector(model, ds, args.work_dir,
                   total_steps=args.total_steps or 1000,
                   ckpt_interval=args.ckpt_interval,
                   log_interval=args.log_interval, seed=args.seed,
                   resume=not args.no_resume,
                   disable_aug_after=args.disable_aug_after)


if __name__ == "__main__":
    main()
