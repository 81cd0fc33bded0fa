"""Worker for tests/test_multiprocess_eval.py — one of N localhost CPU
processes joined via jax.distributed, running the multi-host Evaluator path
(process-sharded tracklets -> per-shard bins -> fs merge -> occ psum).

Usage: multiproc_eval_worker.py <pid> <nproc> <port> <data_root> <out_dir>
"""
import json
import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    data_root, out_dir = sys.argv[4], sys.argv[5]
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc

    from objectcentricocccompletion_tpu.configs import tiny_config
    from objectcentricocccompletion_tpu.data.loader import TrainLoader
    from objectcentricocccompletion_tpu.data.tracklet_dataset import \
        TrackletDataset
    from objectcentricocccompletion_tpu.evalx.evaluator import Evaluator
    from objectcentricocccompletion_tpu.models import OcOccNetWithLoss

    cfg = tiny_config()
    paths = dict(
        proposals_file=os.path.join(data_root, "proposals.pkl"),
        gt_candidates_file=os.path.join(data_root, "gt_candidates.pkl"),
        pose_file=os.path.join(data_root, "poses.pkl"),
        occ_anno_root=os.path.join(data_root, "occ_gt"))
    ds = TrackletDataset(cfg=cfg, min_tracklet_points=10, training=False,
                         min_tracklet_length=1, **paths)
    ds_train = TrackletDataset(cfg=cfg, min_tracklet_points=10, **paths)
    batch = next(TrainLoader(ds_train, batch_size=1))
    model = OcOccNetWithLoss(cfg)
    # identical PRNG on every process -> identical replicated params
    params = model.init({"params": jax.random.PRNGKey(0)}, batch,
                        train=False)["params"]
    ev = Evaluator(model, params, ds, cfg)
    metrics = ev.run(out_dir, eval_waymo=False)
    if pid == 0:
        with open(os.path.join(out_dir, "metrics.json"), "w") as f:
            json.dump({k: v for k, v in metrics.items()
                       if isinstance(v, (int, float, str))}, f,
                      default=float)
    print(f"worker {pid} done", flush=True)


if __name__ == "__main__":
    main()
