"""Evaluation harness tests: .bin round-trip, occ IoU correctness on a
perfect/oracle decoder, and the full evaluator over the synthetic dataset."""
import math
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from objectcentricocccompletion_tpu.configs import tiny_config
from objectcentricocccompletion_tpu.data.loader import write_synthetic_dataset
from objectcentricocccompletion_tpu.data.tracklet_dataset import TrackletDataset
from objectcentricocccompletion_tpu.evalx.evaluator import Evaluator
from objectcentricocccompletion_tpu.evalx.occ_iou import (
    OccIoUAccumulator, load_full_occ_queries, occ_iou_per_frame)
from objectcentricocccompletion_tpu.evalx.waymo_bin import (
    WaymoObject, read_bin, write_bin)
from objectcentricocccompletion_tpu.models import OcOccNetWithLoss


def test_waymo_bin_roundtrip(tmp_path):
    objs = [WaymoObject((1.0, 2.0, 0.5, 2.0, 4.5, 1.8, 0.3), 0.9, 1,
                        "trk_a", "segment-x", 1234567890),
            WaymoObject((-3.0, 1.0, -0.2, 1.9, 4.0, 1.6, -2.5), 0.4, 1,
                        "trk_b", "segment-x", 1234667890)]
    path = str(tmp_path / "out.bin")
    write_bin(objs, path)
    back = read_bin(path)
    assert len(back) == 2
    b = back[0]["box"]
    # waymo: center_z = z + h/2; width=our w; length=our l;
    # heading = wrap(-yaw - pi/2)
    assert abs(b[1] - 1.0) < 1e-9 and abs(b[2] - 2.0) < 1e-9
    assert abs(b[3] - (0.5 + 0.9)) < 1e-9
    assert abs(b[4] - 2.0) < 1e-9 and abs(b[5] - 4.5) < 1e-9
    assert abs(b[7] - (-0.3 - math.pi / 2)) < 1e-6
    assert back[0]["id"] == "trk_a"
    assert back[0]["type"] == 1
    assert abs(back[1]["box"][7] - (2.5 - math.pi / 2)) < 1e-6  # wrapped


def test_occ_iou_oracle():
    """With an oracle decoder that returns GT occupancy, IoU must be 1."""
    L, K = 4, 64
    rng = np.random.RandomState(0)
    size = rng.uniform(2, 4, (1, 3))
    gt_boxes = np.concatenate([rng.uniform(-5, 5, (L, 3)),
                               np.repeat(size, L, 0),
                               rng.uniform(-np.pi, np.pi, (L, 1))],
                              -1).astype(np.float32)
    rois = gt_boxes.copy()   # perfect boxes -> query transform is identity
    occ_pts = (rng.uniform(-0.45, 0.45, (K, 3))
               * gt_boxes[0, 3:6]).astype(np.float32)
    occ_lab = (rng.rand(K) < 0.5).astype(np.int32)
    occ_msk = np.ones((K,), bool)
    latent = jnp.zeros((L, 8))

    def oracle(lat, queries):
        # same label for every frame: +10 where occupied else -10
        return jnp.where(jnp.asarray(occ_lab)[None] == 1, 10.0, -10.0) * \
            jnp.ones((queries.shape[0], 1))

    inter, union = occ_iou_per_frame(
        oracle, latent, jnp.asarray(rois), jnp.asarray(gt_boxes),
        jnp.ones((L,), bool), jnp.asarray(occ_pts), jnp.asarray(occ_lab),
        jnp.asarray(occ_msk))
    assert (np.asarray(inter) == np.asarray(union)).all()
    assert (np.asarray(inter) == occ_lab.sum()).all()


def test_occ_accumulator():
    acc = OccIoUAccumulator()
    acc.add_tracklet(np.array([5, 0]), np.array([10, 0]),
                     np.array([20.0, 20.0]), np.array([True, True]))
    acc.add_tracklet(np.array([3]), np.array([3]), np.array([200.0]),
                     np.array([True]))
    s = acc.summary()
    assert abs(s["occ/overall_iou"] - 8 / 13) < 1e-9
    assert abs(s["occ/miou_track"] - (0.5 + 1.0) / 2) < 1e-9
    assert abs(s["occ/miou_box"] - (0.5 + 1.0) / 2) < 1e-9
    assert s["occ/small_box_iou"] == 0.5
    assert s["occ/large_box_iou"] == 1.0


def test_full_evaluator(tmp_path):
    cfg = tiny_config()
    paths = write_synthetic_dataset(str(tmp_path / "ds"), num_tracklets=2,
                                    track_len=10)
    ds = TrackletDataset(cfg=cfg, min_tracklet_points=10, training=False,
                         min_tracklet_length=1, **paths)
    model = OcOccNetWithLoss(cfg)
    from objectcentricocccompletion_tpu.data.loader import TrainLoader
    ds_train = TrackletDataset(cfg=cfg, min_tracklet_points=10, **paths)
    batch = next(TrainLoader(ds_train, batch_size=1))
    params = model.init({"params": jax.random.PRNGKey(0)}, batch,
                        train=False)["params"]
    ev = Evaluator(model, params, ds, cfg)
    metrics = ev.run(str(tmp_path / "out"))
    assert metrics["num_tracklets"] == 2
    assert "occ/overall_iou" in metrics
    assert 0.0 <= metrics["occ/overall_iou"] <= 1.0
    back = read_bin(metrics["results_bin"])
    assert len(back) == 2 * 10      # 2 tracklets x 10 frames
    assert {r["context_name"] for r in back} == {"segment-0000"}
