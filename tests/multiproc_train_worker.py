"""Worker for tests/test_multiprocess_train.py — one of N localhost CPU
processes joined via jax.distributed, running ONE data-parallel train step
over the global 2-device mesh (cross-process gradient psum — the
reference's DDP allreduce, ``tools/dist_train.sh`` semantics).

Env knobs:
  OCOCC_FORCE_GLOBAL_BATCH  global tracklet batch (default nproc)
  OCOCC_DEVICES_PER_PROC    virtual CPU devices per process (default 1)
  OCOCC_MODEL_AXIS          >1 selects the hybrid DCN-outer/ICI-inner 2D
                            mesh: 'data' spans processes, 'model' spans the
                            in-process devices (tensor-parallel kernels via
                            param_shardings at tp_min_dim=32)

Usage: multiproc_train_worker.py <pid> <nproc> <port> <data_root> <out_dir>
"""
import os
import sys

_DPP = int(os.environ.get("OCOCC_DEVICES_PER_PROC", "1"))
os.environ.setdefault(
    "XLA_FLAGS", f"--xla_force_host_platform_device_count={_DPP}")

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

    import numpy as np

    from objectcentricocccompletion_tpu.configs import tiny_config
    from objectcentricocccompletion_tpu.data.loader import TrainLoader
    from objectcentricocccompletion_tpu.data.tracklet_dataset import \
        TrackletDataset
    from objectcentricocccompletion_tpu.parallel.train import (
        batch_sharding, create_train_state, make_mesh, make_mesh_2d,
        make_train_step)

    cfg = tiny_config()
    ds = TrackletDataset(
        cfg=cfg, min_tracklet_points=10,
        proposals_file=os.path.join(data_root, "proposals.pkl"),
        gt_candidates_file=os.path.join(data_root, "gt_candidates.pkl"),
        pose_file=os.path.join(data_root, "poses.pkl"),
        occ_anno_root=os.path.join(data_root, "occ_gt"))
    # every process draws the SAME global batch (shared seed, no sharding);
    # the mesh sharding below hands each device its half
    gbs = int(os.environ.get("OCOCC_FORCE_GLOBAL_BATCH", nproc))
    batch = next(TrainLoader(ds, batch_size=gbs, seed=0))

    model, state, tx, _ = create_train_state(
        cfg, jax.random.PRNGKey(0), batch, total_steps=10)

    model_axis = int(os.environ.get("OCOCC_MODEL_AXIS", "1"))
    if model_axis > 1:
        # hybrid mesh: 'data' outer (across processes -> DCN), 'model'
        # inner (the per-process devices -> ICI) — multihost.py's claimed
        # topology. jax.devices() orders by process id, so the reshape in
        # make_mesh_2d lands each process's devices on one data row.
        data_axis = jax.device_count() // model_axis
        assert data_axis == jax.process_count()
        mesh = make_mesh_2d(data_axis, model_axis)
        assert data_axis == gbs
        step = make_train_step(model, tx, mesh, state=state, tp_min_dim=32)
    else:
        mesh = make_mesh(jax.devices())  # all devices across all processes
        assert jax.device_count() == gbs   # one tracklet per device
        step = make_train_step(model, tx, mesh)

    bsh = batch_sharding(mesh)

    def globalize(x):
        x = np.asarray(x)
        sh = jax.sharding.NamedSharding(mesh, bsh.spec)
        return jax.make_array_from_callback(x.shape, sh,
                                            lambda idx: x[idx])

    gbatch = jax.tree_util.tree_map(globalize, batch)
    new_state, metrics = step(state, gbatch, jax.random.PRNGKey(1))

    # params come back fully replicated: each process reads its local copy
    flat, _ = jax.tree_util.tree_flatten(
        jax.tree_util.tree_map(
            lambda x: np.asarray(x.addressable_data(0)), new_state.params))
    vec = np.concatenate([np.ravel(x) for x in flat])
    np.save(os.path.join(out_dir, f"params_after.{pid}.npy"), vec)
    with open(os.path.join(out_dir, f"loss.{pid}.txt"), "w") as f:
        f.write(repr(float(jax.device_get(metrics["loss"]))))
    print(f"worker {pid} done", flush=True)


if __name__ == "__main__":
    main()
