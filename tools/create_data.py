#!/usr/bin/env python
"""Data-prep CLI — counterpart of the reference ``tools/create_data.py``
(+ the ``tools/ctrl`` prep scripts and ``tools/occ/occ_annotate.py``
launcher).

Subcommands:
  waymo_raw     tfrecords -> per-frame raw pkls for the occ annotator
                (needs tensorflow + waymo_open_dataset)
  tracklets     detection/tracking .bin results + kitti-format frames ->
                the tracklet dataset (proposals.pkl / gt_candidates.pkl /
                poses.pkl / point npys) OcOccNet and CTRL train on
  occ_annotate  GT tracklet .bin + raw frame pkls -> per-tracklet occupancy
                GT npz (ray-cast visibility labels)
"""
import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def _frame_points_getter(infos_path: str, data_root: str):
    """(segment, ts) -> [N, >=5] ego points, resolved through kitti-format
    infos. Pads the feature axis to 5 columns when the bins carry fewer."""
    import numpy as np
    with open(infos_path, "rb") as f:
        infos = pickle.load(f)
    index = {}
    for info in infos:
        seg = info.get("segment_name",
                       info["point_cloud"].get("segment_name", ""))
        index[(seg, int(info.get("timestamp", 0)))] = \
            info["point_cloud"]["velodyne_path"]

    def get_points(segment, ts):
        vp = index.get((segment, int(ts)))
        if vp is None:
            return np.zeros((0, 5), np.float32)
        pts = np.fromfile(os.path.join(data_root, vp),
                          np.float32).reshape(-1, 6)[:, :5]
        return pts

    return get_points, infos


def cmd_tracklets(args):
    from objectcentricocccompletion_tpu.tools_ctrl.generate_tracklets import \
        write_tracklet_dataset

    import numpy as np

    get_points, infos = _frame_points_getter(args.infos, args.data_root)
    poses = {}
    for info in infos:
        ts = int(info.get("timestamp", 0))
        pose = info.get("pose")
        # infos without ego poses (single-log exports): identity — every
        # frame already shares one world frame
        poses[ts] = (np.asarray(pose, np.float64) if pose is not None
                     else np.eye(4))
    paths = write_tracklet_dataset(args.pred_bin, args.gt_bin, get_points,
                                   args.out_dir, poses)
    print({k: v for k, v in paths.items()})


def cmd_occ_annotate(args):
    import numpy as np
    from objectcentricocccompletion_tpu.evalx.waymo_bin import read_bin
    from objectcentricocccompletion_tpu.tools_ctrl.generate_tracklets import \
        tracklets_from_bin
    from objectcentricocccompletion_tpu.tools_occ.annotate import \
        OccAnnotator

    get_points, _ = _frame_points_getter(args.infos, args.data_root)

    def get_raw_frame(ts):
        # expected layout: <raw-root>/<segment>/<ts>.pkl (waymo_raw output
        # arranged per segment)
        path = os.path.join(args.raw_root, get_raw_frame.segment,
                            f"{int(ts)}.pkl")
        with open(path, "rb") as f:
            return pickle.load(f)
    get_raw_frame.segment = ""

    workers = getattr(args, "workers", 1)
    if workers > 1:
        # host pool over SEGMENTS (the reference's mp.spawn worker pool,
        # tools/occ/occ_annotate.py:649-671): re-exec this CLI once per
        # shard; outputs are per-tracklet npz files so shards never collide
        import subprocess
        import sys as _sys
        base = [_sys.executable, os.path.abspath(__file__), "occ_annotate",
                "--gt-bin", args.gt_bin, "--infos", args.infos,
                "--data-root", args.data_root, "--raw-root", args.raw_root,
                "--out-dir", args.out_dir,
                "--voxel-size", str(args.voxel_size),
                "--min-track-len", str(args.min_track_len),
                "--workers", "1", "--num-shards", str(workers)]
        procs = [subprocess.Popen(base + ["--shard", str(i)])
                 for i in range(workers)]
        rcs = [p.wait() for p in procs]
        if any(rcs):
            raise SystemExit(f"annotation shard failed: {rcs}")
        return

    tracklets = tracklets_from_bin(args.gt_bin)
    if getattr(args, "num_shards", 1) > 1:
        segs = sorted({t.segment_name for t in tracklets})
        mine = {s for i, s in enumerate(segs)
                if i % args.num_shards == args.shard}
        tracklets = [t for t in tracklets if t.segment_name in mine]

    ann = OccAnnotator(
        lambda ts: get_points(get_raw_frame.segment, ts),
        get_raw_frame, args.out_dir, voxel_size=args.voxel_size,
        min_track_len=args.min_track_len)
    n_done = 0
    for trk in tracklets:
        get_raw_frame.segment = trk.segment_name
        out = ann.annotate_trk(trk.segment_name, trk.id,
                               np.asarray(trk.boxes), list(trk.ts))
        n_done += out is not None
    print(f"annotated {n_done}/{len(tracklets)} tracklets -> "
          f"{args.out_dir}")


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)

    pr = sub.add_parser("waymo_raw", help="tfrecords -> raw frame pkls")
    pr.add_argument("--tfrecord-dir", required=True)
    pr.add_argument("--out-dir", required=True)

    pt = sub.add_parser("tracklets",
                        help=".bin results -> tracklet train data")
    pt.add_argument("--pred-bin", required=True)
    pt.add_argument("--gt-bin", required=True)
    pt.add_argument("--infos", required=True,
                    help="kitti-format infos pkl (frame points + poses)")
    pt.add_argument("--data-root", required=True)
    pt.add_argument("--out-dir", required=True)

    po = sub.add_parser("occ_annotate",
                        help="GT tracklet .bin + raw pkls -> occ GT npz")
    po.add_argument("--gt-bin", required=True)
    po.add_argument("--infos", required=True)
    po.add_argument("--data-root", required=True)
    po.add_argument("--raw-root", required=True,
                    help="waymo_raw output: <segment>/<ts>.pkl")
    po.add_argument("--out-dir", required=True)
    po.add_argument("--voxel-size", type=float, default=0.2)
    po.add_argument("--min-track-len", type=int, default=10)
    po.add_argument("--workers", type=int, default=1,
                    help="host process pool over segments (reference runs "
                         "32 workers / 8 GPUs)")
    po.add_argument("--shard", type=int, default=0)
    po.add_argument("--num-shards", type=int, default=1)

    ps = sub.add_parser(
        "fsdpp_seeds",
        help="base-detector results .bin -> per-frame FSD++ seed store "
             "(reference tools/fsdpp/create_seed_boxes_from_bin.py)")
    ps.add_argument("--results-bin", required=True)
    ps.add_argument("--out", required=True, help="seed store pkl path")
    ps.add_argument("--max-seeds", type=int, default=128)
    ps.add_argument("--score-thr", type=float, default=0.1)

    args = p.parse_args()
    if args.cmd == "fsdpp_seeds":
        from objectcentricocccompletion_tpu.data.seed_store import SeedStore
        store = SeedStore.from_results_bin(
            args.results_bin, max_seeds=args.max_seeds,
            score_thr=args.score_thr)
        store.save(args.out)
        n = sum(len(v) for v in store.frames.values())
        print(f"{len(store.frames)} frames, {n} seed boxes -> {args.out}")
        return
    if args.cmd == "waymo_raw":
        from objectcentricocccompletion_tpu.tools_occ import \
            waymo_raw_converter as wrc
        records = sorted(f for f in os.listdir(args.tfrecord_dir)
                         if "tfrecord" in f)
        if not records:
            raise SystemExit(f"no tfrecords in {args.tfrecord_dir}")
        for i, r in enumerate(records):
            wrc.convert_segment(os.path.join(args.tfrecord_dir, r),
                                args.out_dir, f"{i:04d}")
    elif args.cmd == "tracklets":
        cmd_tracklets(args)
    else:
        cmd_occ_annotate(args)


if __name__ == "__main__":
    main()
