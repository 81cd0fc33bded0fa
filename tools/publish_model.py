"""Checkpoint surgery CLI.

Counterpart of the reference's ``tools/model_converters/publish_model.py``
and ``fsd_pretrain_converter.py``:

    # strip optimizer state, content-hash the artifact
    python tools/publish_model.py publish work_dir/ckpt --out release/ococcnet

    # warm-start a detector tree from a pretrained subtree (e.g. the FSD
    # segmentor): copies src-prefix leaves into dst-prefix slots and saves a
    # NEW training checkpoint with fresh optimizer state
    python tools/publish_model.py transplant pretrain/ckpt target/ckpt \\
        --out warmstart/ckpt --src-prefix segmentor --dst-prefix segmentor
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from objectcentricocccompletion_tpu.training.surgery import (  # noqa: E402
    publish, restore_params, transplant)


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)

    pub = sub.add_parser("publish")
    pub.add_argument("ckpt_dir")
    pub.add_argument("--out", required=True)

    tr = sub.add_parser("transplant")
    tr.add_argument("src_ckpt", help="pretrained checkpoint (source leaves)")
    tr.add_argument("dst_ckpt", help="checkpoint providing the target tree")
    tr.add_argument("--out", required=True)
    tr.add_argument("--src-prefix", default="")
    tr.add_argument("--dst-prefix", default="")
    args = p.parse_args()

    if args.cmd == "publish":
        out = publish(args.ckpt_dir, args.out)
        print(out)
        return

    import numpy as np
    import orbax.checkpoint as ocp
    _, src = restore_params(args.src_ckpt)
    step, dst = restore_params(args.dst_ckpt)
    new, report = transplant(dst, src, args.src_prefix, args.dst_prefix)
    print(f"copied {len(report['copied'])} leaves; "
          f"{len(report['missing'])} missing; "
          f"{len(report['shape_mismatch'])} shape mismatches")
    for m in report["missing"][:10]:
        print("  missing:", m)
    for m in report["shape_mismatch"][:10]:
        print("  mismatch:", m)
    mgr = ocp.CheckpointManager(
        os.path.abspath(args.out),
        options=ocp.CheckpointManagerOptions(create=True))
    mgr.save(0, args=ocp.args.StandardSave(
        dict(step=np.asarray(0), params=new)))
    mgr.wait_until_finished()
    print(args.out)


if __name__ == "__main__":
    main()
