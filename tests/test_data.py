"""Data layer round-trip: write a reference-format dataset, load it through
the pipeline, and check geometric consistency end-to-end (through the model
loss)."""
import numpy as np
import jax
import pytest

from objectcentricocccompletion_tpu.configs import tiny_config
from objectcentricocccompletion_tpu.data.loader import (
    TrainLoader, collate, write_synthetic_dataset)
from objectcentricocccompletion_tpu.data.tracklet_dataset import TrackletDataset
from objectcentricocccompletion_tpu.data import np_geometry as npg
from objectcentricocccompletion_tpu.models import OcOccNetWithLoss


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_ds")
    cfg = tiny_config()
    paths = write_synthetic_dataset(str(root), num_tracklets=3, track_len=12)
    ds = TrackletDataset(cfg=cfg, min_tracklet_points=10, **paths)
    return cfg, ds


def test_dataset_loads(dataset):
    cfg, ds = dataset
    assert len(ds) == 3
    s = ds.build_sample(0, np.random.RandomState(0))
    L, P = cfg.reg_len, cfg.max_points_per_frame
    assert s["points"].shape == (L, P, cfg.points_dim)
    assert s["rois"].shape == (L, 7)
    assert s["gt_valid"].all()          # candidates cover every ts
    assert s["points_mask"].any(-1).all()  # every frame has points
    assert s["occ_score"] == 1.0
    assert s["occ_labels"].sum() > 0 and (s["occ_labels"] == 0).sum() > 0
    # balanced sampling: half occupied
    assert abs(s["occ_labels"].mean() - 0.5) < 0.01


def test_roi_gt_alignment(dataset):
    """After pose transform + augs, proposals must still overlap their GT
    (synthetic proposals are small perturbations of GT)."""
    cfg, ds = dataset
    s = ds.build_sample(1, np.random.RandomState(1))
    ious = npg.aligned_iou_3d(s["rois"], s["gt_boxes"])
    assert (ious > 0.3).mean() > 0.9, ious


def test_points_near_roi(dataset):
    """Pipeline keeps points attached to the (pose-transformed) boxes:
    most points should fall inside the enlarged RoI."""
    cfg, ds = dataset
    s = ds.build_sample(2, np.random.RandomState(2))
    import jax.numpy as jnp
    from objectcentricocccompletion_tpu.ops.roi_pool import roi_pool
    info = roi_pool(jnp.asarray(s["points"][None, ..., :3]),
                    jnp.asarray(s["points_mask"][None]),
                    jnp.asarray(s["rois"][None]), (1.0, 1.0, 1.0))
    frac = (np.asarray(info.mask).sum()
            / max(np.asarray(s["points_mask"]).sum(), 1))
    assert frac > 0.4, frac


def test_loader_to_loss(dataset):
    cfg, ds = dataset
    loader = TrainLoader(ds, batch_size=2, seed=0)
    batch = next(loader)
    model = OcOccNetWithLoss(cfg)
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                           train=False)
    total, aux = model.apply(variables, batch, train=False)
    assert np.isfinite(float(total))
    assert float(aux["num_pos_rois"]) > 0


def test_determinism(dataset):
    cfg, ds = dataset
    s1 = ds.build_sample(0, np.random.RandomState(7))
    s2 = ds.build_sample(0, np.random.RandomState(7))
    np.testing.assert_array_equal(s1["points"], s2["points"])
    np.testing.assert_array_equal(s1["rois"], s2["rois"])


def test_loader_sharding(dataset):
    """Shards partition the shuffled index stream disjointly."""
    cfg, ds = dataset
    import objectcentricocccompletion_tpu.data.loader as L
    a = L.TrainLoader(ds, batch_size=1, seed=5, num_shards=2, shard_id=0)
    b = L.TrainLoader(ds, batch_size=1, seed=5, num_shards=2, shard_id=1)
    next(a), next(b)
    # after one epoch's draw, the index pools are disjoint and cover all
    seen_a = set(a._order)
    seen_b = set(b._order)
    assert not (seen_a & seen_b)


def test_all_samples_keep_points(tmp_path_factory):
    """Every synthetic tracklet must survive the range filter with points
    pooled into its RoIs (regression: out-of-range z once emptied whole
    samples silently)."""
    import jax.numpy as jnp
    from objectcentricocccompletion_tpu.ops.roi_pool import roi_pool
    root = tmp_path_factory.mktemp("range_ds")
    cfg = tiny_config()
    paths = write_synthetic_dataset(str(root), num_tracklets=6,
                                    track_len=12, seed=11)
    ds = TrackletDataset(cfg=cfg, min_tracklet_points=10, **paths)
    rng = np.random.RandomState(0)
    for i in range(len(ds)):
        s = ds.build_sample(i, rng)
        assert s["points_mask"].sum() > 0, f"sample {i} lost all points"
        info = roi_pool(jnp.asarray(s["points"][None, ..., :3]),
                        jnp.asarray(s["points_mask"][None]),
                        jnp.asarray(s["rois"][None]), cfg.extra_wlh)
        nonempty = np.asarray(info.mask.any(-1))[0]
        assert nonempty.mean() > 0.8, f"sample {i}: {nonempty.mean()}"


def test_frame_dropout(tmp_path_factory):
    root = tmp_path_factory.mktemp("fd_ds")
    cfg = tiny_config()
    paths = write_synthetic_dataset(str(root), num_tracklets=2,
                                    track_len=20, seed=2)
    ds = TrackletDataset(cfg=cfg, min_tracklet_points=10,
                         frame_dropout=0.5, **paths)
    s = ds.build_sample(0, np.random.RandomState(0))
    # shapes stay static; dropped frames are re-padded by regularization
    assert s["rois"].shape == (cfg.reg_len, 7)
    assert np.isfinite(s["rois"]).all()


def test_prefetch_loader_matches_serial(tmp_path):
    """PrefetchLoader (spawn workers) and ThreadPrefetcher yield valid
    batches with the same index schedule as TrainLoader; candidate
    memoization keeps build_sample deterministic."""
    import numpy as np
    from objectcentricocccompletion_tpu.configs import tiny_config
    from objectcentricocccompletion_tpu.data.loader import (
        PrefetchLoader, ThreadPrefetcher, TrainLoader,
        write_synthetic_dataset)
    from objectcentricocccompletion_tpu.data.tracklet_dataset import \
        TrackletDataset

    cfg = tiny_config()
    paths = write_synthetic_dataset(str(tmp_path / "pl"), num_tracklets=4,
                                    track_len=10)
    ds = TrackletDataset(cfg=cfg, min_tracklet_points=10, **paths)

    serial = TrainLoader(ds, 2, seed=3)
    b_serial = [next(serial) for _ in range(3)]

    par = PrefetchLoader(ds, 2, seed=3, workers=2, prefetch=2)
    b_par = [next(par) for _ in range(3)]
    par.close()
    for bs, bp in zip(b_serial, b_par):
        assert bs.points.shape == bp.points.shape
        # same index schedule: gt boxes come straight from the records
        # (augmentation noise differs only through the per-sample rng)
        assert np.isfinite(np.asarray(bp.points)).all()
        assert bp.points_mask.sum() > 0

    thr = ThreadPrefetcher(TrainLoader(ds, 2, seed=3), depth=2)
    b_thr = [next(thr) for _ in range(3)]
    thr.close()
    for bs, bt in zip(b_serial, b_thr):
        np.testing.assert_array_equal(np.asarray(bs.points),
                                      np.asarray(bt.points))


def test_candidate_memoization_identical_samples(tmp_path):
    """The memoized candidate selection returns the same sample as a fresh
    dataset computing it from scratch."""
    import numpy as np
    from objectcentricocccompletion_tpu.configs import tiny_config
    from objectcentricocccompletion_tpu.data.loader import \
        write_synthetic_dataset
    from objectcentricocccompletion_tpu.data.tracklet_dataset import \
        TrackletDataset

    cfg = tiny_config()
    paths = write_synthetic_dataset(str(tmp_path / "cm"), num_tracklets=2,
                                    track_len=10)
    ds = TrackletDataset(cfg=cfg, min_tracklet_points=10, **paths)
    a1 = ds.build_sample(0, np.random.RandomState(7))   # fills the cache
    a2 = ds.build_sample(0, np.random.RandomState(7))   # hits the cache
    np.testing.assert_array_equal(a1["points"], a2["points"])
    np.testing.assert_array_equal(a1["occ_points"], a2["occ_points"])


def test_occ_cache_transparent(tmp_path):
    """sample_occ draws identically whether the parsed-grid LRU is cold
    (npz parse) or warm (cache hit), incl. the compute_score variant whose
    known-fraction must come from the pre-mirror annotation."""
    from objectcentricocccompletion_tpu.data.loader import \
        write_synthetic_dataset
    from objectcentricocccompletion_tpu.data.tracklet_dataset import \
        TrackletDataset

    cfg = tiny_config()
    paths = write_synthetic_dataset(str(tmp_path / "oc"), num_tracklets=1,
                                    track_len=10, seed=9)
    for kwargs in ({}, {"occ_compute_score": True}, {"mirror_occ": True}):
        ds = TrackletDataset(cfg=cfg, min_tracklet_points=10, **kwargs,
                             **paths)
        gt = ds.candidates[0][ds.select_candidate(ds.records[0],
                                                  ds.candidates[0])]
        cold = ds.sample_occ(gt.segment_name, gt.id,
                             np.random.RandomState(3))
        assert len(ds._occ_cache) == 1
        warm = ds.sample_occ(gt.segment_name, gt.id,
                             np.random.RandomState(3))
        np.testing.assert_array_equal(cold[0], warm[0])
        np.testing.assert_array_equal(cold[1], warm[1])
        assert cold[2] == warm[2] and cold[2] > 0.0
    # missing-file result is cached too (the sentinel path)
    ds._occ_cache.clear()
    empty = ds.sample_occ("segment-0000", "no_such_track",
                          np.random.RandomState(0))
    assert empty[2] == 0.0 and len(ds._occ_cache) == 1
    assert ds.sample_occ("segment-0000", "no_such_track",
                         np.random.RandomState(0))[2] == 0.0
