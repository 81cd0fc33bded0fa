"""VoteNet: backbone shapes, voting toward GT centers after training
steps, loss/grads, and the ScanNet-reader seam."""
import numpy as np
import jax
import jax.numpy as jnp

from objectcentricocccompletion_tpu.models.votenet import (
    VoteNet, tiny_votenet_config)


def make_room(cfg, seed=0, num_boxes=2, max_gt=8):
    rng = np.random.RandomState(seed)
    pts = rng.uniform(0, 8, (cfg.max_points - 200, 3))
    boxes = []
    for i in range(num_boxes):
        ctr = rng.uniform(2, 6, 3)
        size = np.abs(rng.normal([0.8, 0.8, 0.9], 0.05))
        boxes.append(np.concatenate([ctr[:2], [ctr[2] - size[2] / 2],
                                     size, [0.0]]))
        local = (rng.rand(100, 3) - 0.5) * size
        pts = np.concatenate([pts, local + ctr], 0)
    boxes = np.asarray(boxes, np.float32)
    points = np.concatenate([pts, rng.rand(len(pts), 3)], -1).astype(
        np.float32)
    mask = np.ones(len(points), bool)
    gt_boxes = np.zeros((max_gt, 7), np.float32)
    gt_boxes[:num_boxes] = boxes
    gt_labels = np.zeros((max_gt,), np.int32)
    gt_labels[:num_boxes] = rng.randint(0, cfg.num_classes, num_boxes)
    gt_valid = np.arange(max_gt) < num_boxes
    return (jnp.asarray(points), jnp.asarray(mask), jnp.asarray(gt_boxes),
            jnp.asarray(gt_labels), jnp.asarray(gt_valid))


def test_votenet_forward_shapes():
    cfg = tiny_votenet_config()
    pts, mask, *_ = make_room(cfg)
    model = VoteNet(cfg)
    v = model.init(jax.random.PRNGKey(0), pts, mask)
    out = model.apply(v, pts, mask)
    P = cfg.num_proposals
    assert out["boxes"].shape == (P, 7)
    assert out["obj"].shape == (P,)
    assert out["sem"].shape == (P, cfg.num_classes)
    assert out["vote_xyz"].shape[1] == 3
    assert np.isfinite(np.asarray(out["boxes"])).all()


def test_votenet_loss_and_training_reduces_vote_error():
    cfg = tiny_votenet_config()
    batch = make_room(cfg, seed=1)
    pts, mask, gb, gl, gv = batch
    model = VoteNet(cfg)
    v = model.init(jax.random.PRNGKey(0), pts, mask)
    losses = model.apply(v, *batch, method=VoteNet.loss)
    for k in ("loss_vote", "loss_obj", "loss_center", "loss_size",
              "loss_sem"):
        assert np.isfinite(float(losses[k])), k

    import optax
    tx = optax.adam(3e-3)
    params = v["params"]
    opt = tx.init(params)

    @jax.jit
    def step(p, o):
        def f(p_):
            return model.apply({"params": p_}, *batch,
                               method=VoteNet.loss)["loss"]
        l, g = jax.value_and_grad(f)(p)
        up, o2 = tx.update(g, o, p)
        return optax.apply_updates(p, up), o2, l

    l0 = float(model.apply({"params": params}, *batch,
                           method=VoteNet.loss)["loss_vote"])
    for _ in range(30):
        params, opt, l = step(params, opt)
    l1 = float(model.apply({"params": params}, *batch,
                           method=VoteNet.loss)["loss_vote"])
    assert np.isfinite(float(l))
    assert l1 < l0, (l0, l1)   # votes genuinely move toward GT centers


def test_votenet_on_scannet_reader(tmp_path):
    """ScanNet reader -> FrameLoader -> VoteNet loss: the indoor seam."""
    from objectcentricocccompletion_tpu.training.detector_trainer import \
        FrameLoader
    from tests.test_indoor_dataset import write_scannet_fixture
    from objectcentricocccompletion_tpu.data.indoor_dataset import \
        ScanNetDataset
    import dataclasses

    info_path = write_scannet_fixture(str(tmp_path))
    ds = ScanNetDataset(info_path, str(tmp_path), max_points=1024,
                        max_gt=8)
    cfg = dataclasses.replace(tiny_votenet_config(), num_classes=18)
    model = VoteNet(cfg)
    batch = next(FrameLoader(ds, batch_size=1))
    v = model.init(jax.random.PRNGKey(0), batch.points[0],
                   batch.points_mask[0])
    losses = model.apply(v, batch.points[0], batch.points_mask[0],
                         batch.gt_boxes[0], batch.gt_labels[0],
                         batch.gt_valid[0], method=VoteNet.loss)
    assert np.isfinite(float(losses["loss"]))


def test_votenet_cli_smoke(tmp_path):
    """Train + eval VoteNet on a ScanNet fixture through the CLIs (CPU)."""
    import subprocess
    import sys
    import os
    from tests.test_indoor_dataset import write_scannet_fixture

    info_path = write_scannet_fixture(str(tmp_path))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    wd = str(tmp_path / "run")
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "train.py"),
         "votenet", "--dataset", "scannet", "--infos", info_path,
         "--data-root", str(tmp_path), "--work-dir", wd,
         "--total-steps", "3", "--ckpt-interval", "3", "--tiny", "--cpu"],
        capture_output=True, text=True, timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]
    r2 = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "test.py"),
         "votenet", "--dataset", "scannet", "--infos", info_path,
         "--data-root", str(tmp_path), "--ckpt-dir", f"{wd}/ckpt",
         "--tiny", "--cpu", "--max-frames", "2"],
        capture_output=True, text=True, timeout=420)
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "_3d_" in r2.stdout   # KITTI-protocol AP keys printed
