"""Package a results .bin into a Waymo leaderboard submission.

TPU-framework counterpart of the reference's prebuilt ``create_submission``
binary (``tools/create_submission``, see ``docs/overall_instructions.md:120``)
plus ``tools/ctrl/remove_empty.py``:

    python tools/create_submission.py results.bin --out-dir sub \\
        --method-name my_method --account me@example.com \\
        --authors "A. Author,B. Author" --affiliation Lab \\
        [--tracking] [--num-shards 4] \\
        [--remove-empty --tracklet-pkl val.pkl]   # drop point-free boxes

Writes ``sub/{prefix}0..N-1`` Submission protos and ``sub/{prefix}.tar.gz``.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from objectcentricocccompletion_tpu.evalx.submission import (  # noqa: E402
    SubmissionMeta, TASK_DETECTION_3D, TASK_TRACKING_3D, create_submission,
    remove_empty_predictions)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("bin", help="results .bin (serialized Objects)")
    p.add_argument("--out-dir", required=True)
    p.add_argument("--prefix", default="submission")
    p.add_argument("--method-name", required=True)
    p.add_argument("--account", default="")
    p.add_argument("--authors", default="", help="comma-separated")
    p.add_argument("--affiliation", default="")
    p.add_argument("--description", default="")
    p.add_argument("--method-link", default="")
    p.add_argument("--tracking", action="store_true",
                   help="TRACKING_3D task (default DETECTION_3D)")
    p.add_argument("--num-shards", type=int, default=4)
    p.add_argument("--past-frames", type=int, default=0)
    p.add_argument("--future-frames", type=int, default=0)
    p.add_argument("--latency", type=float, default=0.0)
    p.add_argument("--remove-empty", action="store_true",
                   help="drop predictions whose box contains no LiDAR point "
                        "(tools/ctrl/remove_empty.py semantics)")
    p.add_argument("--infos", default=None,
                   help="kitti-format infos pkl resolving (segment, ts) -> "
                        "point file, for --remove-empty")
    p.add_argument("--data-root", default=".")
    p.add_argument("--min-points", type=int, default=1)
    args = p.parse_args()

    bin_path = args.bin
    if args.remove_empty:
        assert args.infos, "--remove-empty needs --infos"
        from create_data import _frame_points_getter
        get_points, _ = _frame_points_getter(args.infos, args.data_root)
        os.makedirs(args.out_dir, exist_ok=True)
        filtered = os.path.join(args.out_dir, "nonempty_" +
                                os.path.basename(args.bin))
        kept, total = remove_empty_predictions(
            args.bin, filtered, get_points, min_points=args.min_points)
        print(f"remove-empty: kept {kept}/{total} predictions -> {filtered}")
        bin_path = filtered

    meta = SubmissionMeta(
        unique_method_name=args.method_name,
        account_name=args.account,
        authors=[a.strip() for a in args.authors.split(",") if a.strip()],
        affiliation=args.affiliation, description=args.description,
        method_link=args.method_link,
        task=TASK_TRACKING_3D if args.tracking else TASK_DETECTION_3D,
        num_past_frames=args.past_frames,
        num_future_frames=args.future_frames,
        latency_second=args.latency)
    paths = create_submission(bin_path, args.out_dir, args.prefix, meta,
                              num_shards=args.num_shards)
    for pth in paths:
        print(pth)


if __name__ == "__main__":
    main()
