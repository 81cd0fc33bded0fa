"""End-to-end evaluation driver: inference over a test TrackletDataset,
box writeback to per-frame ego coordinates, Waymo ``.bin`` export, and
occupancy IoU — the TPU-native equivalent of
``tools/test.py`` + ``TrackletRoIHeadOCC.simple_test``
(``tracklet_roi_head_occ.py:492-610``).

Tracklets have variable length at test (up to ~200 frames); frames are
padded to a small set of static length buckets so only a handful of XLA
compilations are needed for the whole validation set.
"""
from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from ..configs.ococcnet_config import OcOccNetConfig
from ..data.tracklet_dataset import (TrackletDataset, pose_transform_boxes)
from ..models.ococcnet import OcOccNetWithLoss, TrackletBatch
from . import occ_iou as occ_iou_mod
from .waymo_bin import WaymoObject, tracklets_to_objects, write_bin
from .waymo_metrics import compute_metrics

LENGTH_BUCKETS = (32, 64, 128, 256)
MAX_OCC_QUERIES = 16384


def pad_to_bucket(sample: dict, cfg: OcOccNetConfig) -> tuple[dict, int]:
    """Pad a variable-length eval sample to a static length bucket by
    repeating the last frame (mirrors TrackletRegularization padding).

    Tracklets longer than the largest fixed bucket get a bucket rounded up
    to the next multiple of 64 (one extra compile per such length class,
    never a silently dropped frame — the reference evaluates the full
    track, ``tracklet_roi_head_occ.simple_test``)."""
    T = sample["rois"].shape[0]
    L = next((b for b in LENGTH_BUCKETS if b >= T),
             ((T + 63) // 64) * 64)
    if T == L:
        return sample, T
    pad = L - T

    def pad_frames(x, value=None):
        rep = np.repeat(x[-1:], pad, axis=0) if value is None else \
            np.full((pad,) + x.shape[1:], value, x.dtype)
        return np.concatenate([x, rep], 0)

    out = dict(sample)
    out["points"] = pad_frames(sample["points"])
    out["points_mask"] = pad_frames(sample["points_mask"], value=False)
    out["rois"] = pad_frames(sample["rois"])
    out["roi_scores"] = pad_frames(sample["roi_scores"])
    out["gt_boxes"] = pad_frames(sample["gt_boxes"])
    out["gt_valid"] = pad_frames(sample["gt_valid"], value=False)
    last = sample["frame_inds"][-1]
    out["frame_inds"] = np.concatenate(
        [sample["frame_inds"], last + 1 + np.arange(pad, dtype=np.int32)])
    return out, T


def _sharded_jit(fn, rsh):
    """jit with every input/output replicated on an explicit mesh —
    the sharded compile path, which the remote TPU compiler handles at
    full scale where plain jax.jit hangs (BENCH_NOTES)."""
    import jax as _jax

    jitted = _jax.jit(fn)

    def call(*args):
        args = _jax.tree_util.tree_map(
            lambda x: _jax.device_put(x, rsh)
            if hasattr(x, "shape") else x, args)
        return jitted(*args)

    call._jitted = jitted
    return call


class Evaluator:
    def __init__(self, model: OcOccNetWithLoss, params, dataset: TrackletDataset,
                 cfg: OcOccNetConfig, occ_label_thresh: float | None = None,
                 online_tuning_iters: int = 0,
                 online_tuning_lr: float = 0.01,
                 tta: bool = False):
        """``online_tuning_iters > 0`` enables test-time latent optimization
        against the observed occupancy before decoding (reference
        ``test_cfg.online_tuning``, ``occ_ae_head.py:346-391``).

        ``tta=True`` runs the double-flip test-time augmentation
        (``MultiScaleFlipAug3D`` eval mode, ``configs/ococc/
        ococcnet.py:314-360`` + ``LiDARTracklet.merge_augs``): four flip
        variants per batch, predictions inverted and merged."""
        self.model = model
        self.params = params
        self.ds = dataset
        self.cfg = cfg
        self.tta = tta
        self.occ_label_thresh = (occ_label_thresh if occ_label_thresh
                                 is not None else cfg.occ_label_thresh)
        self.online_tuning_iters = online_tuning_iters
        self.online_tuning_lr = online_tuning_lr
        self._predict = {}
        self._occ_eval = {}
        self._save_occ = {}
        self._tune = None
        # jit through an explicit (local, 1-device-or-more) mesh: plain
        # jax.jit of full-size graphs has been observed to HANG the
        # remote TPU compiler, while the sharded compile path is fine
        # (same workaround as parallel/train.py; .claude verify notes)
        import numpy as _np
        from jax.sharding import Mesh, NamedSharding, PartitionSpec
        self._mesh = Mesh(_np.asarray(jax.local_devices()[:1]), ("data",))
        self._rsh = NamedSharding(self._mesh, PartitionSpec())

    def _maybe_tune(self, pred: dict, padded: dict) -> dict:
        """Adam-optimize each RoI's shape latent to fit the occupancy
        observed from its own pooled points (online test-time tuning)."""
        if self.online_tuning_iters <= 0:
            return pred
        from ..ops import roi_pool as rp
        from . import online_tuning as ot
        if self._tune is None:
            def fn(params, latent, rois, pts, pmask):
                pool = rp.roi_pool(pts[..., :3], pmask, rois,
                                   self.cfg.extra_wlh)
                K = min(512, pool.local_xyz.shape[-2])
                queries = rp.quantize_to_voxel_centers(
                    pool.local_xyz[..., :K, :], rois[..., 3:6],
                    self.cfg.ae_voxel_size)
                labels = ot.observation_targets(
                    pool.local_xyz, pool.mask, rois[..., 3:6],
                    self.cfg.ae_voxel_size, queries)
                msk = pool.mask[..., :K].astype(jnp.float32)

                def decode(lat, q):
                    return self.model.apply(
                        {"params": params}, lat, q,
                        method=self.model.decode_occ_queries)

                return ot.tune_latent(decode, latent, queries, labels, msk,
                                      self.online_tuning_iters,
                                      self.online_tuning_lr)
            self._tune = _sharded_jit(fn, self._rsh)
        tuned = self._tune(self.params, pred["shape_latent"][0],
                           jnp.asarray(padded["rois"]),
                           jnp.asarray(padded["points"]),
                           jnp.asarray(padded["points_mask"]))
        return dict(pred, shape_latent=tuned[None])

    def _predict_fn(self, L: int):
        if L not in self._predict:
            if self.tta:
                from .tta import predict_tta

                def fn(params, batch):
                    return predict_tta(
                        lambda b: self.model.apply(
                            {"params": params}, b,
                            method=self.model.predict), batch)
            else:
                def fn(params, batch):
                    return self.model.apply({"params": params}, batch,
                                            method=self.model.predict)
            self._predict[L] = _sharded_jit(fn, self._rsh)
        return self._predict[L]

    def _occ_fn(self, L: int):
        if L not in self._occ_eval:
            def fn(params, latent, rois, gt_boxes, gt_valid, pts, lab, msk):
                def decode(lat, q):
                    return self.model.apply(
                        {"params": params}, lat, q,
                        method=self.model.decode_occ_queries)
                return occ_iou_mod.occ_iou_per_frame(
                    decode, latent, rois, gt_boxes, gt_valid, pts, lab, msk,
                    self.cfg.occ_pos_thresh)
            self._occ_eval[L] = _sharded_jit(fn, self._rsh)
        return self._occ_eval[L]

    def run(self, out_dir: str, max_tracklets: int | None = None,
            eval_occ: bool = True, eval_waymo: bool = True,
            gt_bin: str | None = None,
            save_occ_root: str | None = None,
            batch_size: int = 1, eval_occ_baseline: bool = False) -> dict:
        """``batch_size > 1`` groups same-length-bucket tracklets into one
        device call (the reference evaluates strictly at batch 1,
        ``tracklet_roi_head_occ.simple_test``; bucketing makes batching
        free here). ``eval_occ_baseline`` additionally scores the
        point-aggregation baseline (``test_occ_baseline``,
        ``tracklet_roi_head_occ.py:116-266``) through the same accumulator
        so the summary shows model vs baseline side by side."""
        os.makedirs(out_dir, exist_ok=True)
        rng = np.random.RandomState(0)
        acc = occ_iou_mod.OccIoUAccumulator()
        acc_base = occ_iou_mod.OccIoUAccumulator() if eval_occ_baseline \
            else None
        out_tracklets = []
        n = len(self.ds) if max_tracklets is None else min(
            max_tracklets, len(self.ds))
        # multi-host: shard tracklets round-robin by process
        # (multi_gpu_test / DistributedSampler analog, apis/test.py:94-182)
        pid, pcount = jax.process_index(), jax.process_count()
        indices = list(range(pid, n, pcount)) if pcount > 1 else range(n)

        # group indices by bucket so batched predicts share one compile
        prepared = []
        for i in indices:
            sample = self.ds.build_sample(i, rng)
            padded, T = pad_to_bucket(sample, self.cfg)
            prepared.append((i, sample, padded, T))
        by_bucket: dict = {}
        for item in prepared:
            by_bucket.setdefault(item[2]["rois"].shape[0], []).append(item)

        preds: dict = {}
        for L, items in by_bucket.items():
            for beg in range(0, len(items), batch_size):
                chunk = items[beg:beg + batch_size]
                pad_n = batch_size - len(chunk)
                stacked = {
                    k: np.stack([it[2][k] for it in chunk]
                                + [chunk[-1][2][k]] * pad_n, 0)
                    for k in ("points", "points_mask", "rois", "roi_scores",
                              "frame_inds", "gt_boxes", "gt_valid",
                              "occ_points", "occ_labels", "occ_mask",
                              "occ_score")}
                batch = TrackletBatch(**{k: jnp.asarray(v)
                                         for k, v in stacked.items()})
                out = self._predict_fn((L, batch_size))(self.params, batch)
                for j, it in enumerate(chunk):
                    preds[it[0]] = jax.tree_util.tree_map(
                        lambda x, j=j: x[j:j + 1], out)

        for i, sample, padded, T in prepared:
            rec = self.ds.records[i]
            pred = self._maybe_tune(preds[i], padded)

            boxes = np.asarray(pred["boxes"][0])[:T]
            scores = np.asarray(pred["scores"][0])[:T]
            nonempty = np.asarray(pred["nonempty"][0])[:T]
            # keep original proposal where the RoI pooled no points
            boxes = np.where(nonempty[:, None], boxes, padded["rois"][:T])
            scores = np.where(nonempty, scores, padded["roi_scores"][:T])

            # writeback: shared frame -> per-frame ego (shared2ego)
            ts = sample["meta"]["ts"][:T]
            poses = np.stack([self.ds.poses[t] for t in ts], 0)
            center_pose = poses[len(poses) // 2]
            ego_boxes = np.stack([
                pose_transform_boxes(boxes[j:j + 1],
                                     center_pose[None],
                                     np.linalg.inv(poses[j]))[0]
                for j in range(T)], 0)
            out_tracklets.append(dict(
                segment_name=rec.segment_name, id=rec.id,
                waymo_type=rec.type,
                boxes=ego_boxes, scores=scores, ts=ts))

            if eval_occ:
                self._eval_occ_one(i, rec, padded, pred, T, acc,
                                   acc_base=acc_base)
            if save_occ_root is not None:
                self.save_occ(save_occ_root, rec, dict(sample, rois=padded[
                    "rois"]), pred, T)

        # per-process shard bins; byte-concat is a valid proto merge, so
        # process 0 assembles the full results.bin (collect_results_cpu
        # analog via the shared filesystem + a host barrier)
        shard_path = os.path.join(
            out_dir, "results.bin" if pcount == 1
            else f"results.shard{pid}.bin")
        write_bin(tracklets_to_objects(out_tracklets, self.ds.class_names),
                  shard_path)
        bin_path = os.path.join(out_dir, "results.bin")
        if pcount > 1:
            from ..parallel.multihost import sync_hosts
            sync_hosts("eval_shards")
            if pid == 0:
                with open(bin_path, "wb") as out:
                    for p in range(pcount):
                        sp = os.path.join(out_dir, f"results.shard{p}.bin")
                        with open(sp, "rb") as f:
                            out.write(f.read())
            sync_hosts("eval_merge")
        metrics = acc.summary() if eval_occ else {}
        if acc_base is not None:
            metrics.update(acc_base.summary(prefix="occ_baseline"))
        if pcount > 1:
            # occ accumulator reduces across hosts (scalar psums)
            from ..parallel.multihost import process_allgather
            sums = process_allgather(
                jnp.asarray([acc.total_inter, acc.total_union]))
            metrics = acc.summary() if eval_occ else {}
            if eval_occ and np.asarray(sums).sum() > 0:
                tot = np.asarray(sums).reshape(-1, 2).sum(0)
                metrics["occ/overall_iou"] = float(
                    tot[0] / max(tot[1], 1e-9))
        metrics["num_tracklets"] = n
        metrics["results_bin"] = bin_path

        if eval_waymo and pid == 0:
            gt_path = gt_bin or os.path.join(out_dir, "gt.bin")
            if gt_bin is None:
                self.write_gt_bin(gt_path, max_tracklets=n)
            ap = compute_metrics(bin_path, gt_path)
            metrics.update({k: v for k, v in ap.items() if k != "_raw"})
        return metrics

    def write_gt_bin(self, path: str, max_tracklets: int | None = None):
        """GT ``.bin`` from the dataset's selected candidate tracklets
        (per-frame ego boxes). Equivalent of tools/ctrl/
        generate_train_gt_bin.py restricted to the evaluated tracks."""
        objs = []
        n = len(self.ds) if max_tracklets is None else min(
            max_tracklets, len(self.ds))
        for i in range(n):
            rec = self.ds.records[i]
            ci = self.ds.select_candidate(rec, self.ds.candidates[i])
            if ci < 0:
                continue
            gt = self.ds.candidates[i][ci]
            npts = (gt.num_pts if gt.num_pts is not None
                    else [50] * len(gt))
            for box, ts, np_ in zip(gt.boxes, gt.ts, npts):
                objs.append(WaymoObject(
                    tuple(box), 1.0, int(gt.type), gt.id, gt.segment_name,
                    int(ts), num_lidar_points=int(np_), difficulty=1))
        write_bin(objs, path)

    def _save_occ_fn(self, key):
        """Batched occ dump decode, one compile per (L, Kq) bucket: decode
        ALL frames' query grids in one call and transform positives to the
        shared frame on device."""
        if key not in self._save_occ:
            from ..core import boxes as box_ops

            def fn(params, latent, queries, rois):
                # decode in frame chunks: one shot at long buckets
                # materializes [L, Kq, 1024] decoder activations
                # (HBM OOM at L=128, Kq=16k — see occ_iou_per_frame)
                L = latent.shape[0]
                chunk = max(min(16, L), 1)
                pad = (-L) % chunk
                lat_p = jnp.pad(latent, ((0, pad), (0, 0)))
                q_p = jnp.pad(queries, ((0, pad), (0, 0), (0, 0)))
                n_chunks = (L + pad) // chunk

                def one(args):
                    lat, q = args
                    logits = self.model.apply(
                        {"params": params}, lat, q,
                        method=self.model.decode_occ_queries)
                    return jax.nn.sigmoid(logits)

                prob = jax.lax.map(
                    one, (lat_p.reshape(n_chunks, chunk, -1),
                          q_p.reshape(n_chunks, chunk,
                                      *queries.shape[1:])))
                prob = prob.reshape(-1, queries.shape[1])[:L]
                ego = box_ops.local_to_global(queries, rois)  # [L, Kq, 3]
                return prob, ego
            self._save_occ[key] = _sharded_jit(fn, self._rsh)
        return self._save_occ[key]

    def save_occ(self, out_root: str, rec, sample: dict, pred, T: int,
                 max_queries: int = 8192):
        """Dump predicted occupancy per frame as
        ``<out>/<segment>/<ts>/<type>_<id>.bin`` float32 [K, 4] (xyz in the
        shared frame + score) — the W8 artifact consumed by
        ``LoadPointsAndOccPredFromFile`` (reference
        ``tracklet_roi_head_occ.save_occ_from_tracklet`` :612-744).

        All frames decode in ONE jitted call at a fixed query budget
        (per-frame grids padded/masked), so the device never recompiles per
        tracklet."""
        latent = pred["shape_latent"][0]                 # [L, D] (padded)
        L = latent.shape[0]
        Kq = max_queries
        rois = np.asarray(sample["rois"])[:L]
        ts = sample["meta"]["ts"][:T]
        scores = np.asarray(pred["scores"][0])[:T]

        queries = np.zeros((L, Kq, 3), np.float32)
        qvalid = np.zeros((L, Kq), bool)
        for j in range(T):
            centers = occ_iou_mod.dense_voxel_centers(
                rois[j, 3:6], self.cfg.ae_voxel_size)
            n = min(len(centers), Kq)
            queries[j, :n] = centers[:n]
            qvalid[j, :n] = True

        prob, ego = self._save_occ_fn((L, Kq))(
            self.params, latent, jnp.asarray(queries),
            jnp.asarray(np.pad(rois, ((0, max(0, L - len(rois))), (0, 0)))))
        prob = np.asarray(prob)
        ego = np.asarray(ego)
        for j in range(T):
            keep = (prob[j] > self.cfg.occ_pos_thresh) & qvalid[j]
            if not keep.any():
                continue
            out = np.concatenate(
                [ego[j][keep],
                 np.full((int(keep.sum()), 1), scores[j], np.float32)], -1)
            d = os.path.join(out_root, rec.segment_name, str(ts[j]))
            os.makedirs(d, exist_ok=True)
            out.astype(np.float32).tofile(
                os.path.join(d, f"{rec.type}_{rec.id}.bin"))

    def _eval_occ_one(self, i, rec, padded, pred, T, acc, acc_base=None):
        if self.ds.occ_anno_root is None:
            return
        ci = self.ds.select_candidate(rec, self.ds.candidates[i])
        if ci < 0:
            return
        gt_rec = self.ds.candidates[i][ci]
        occ_path = os.path.join(self.ds.occ_anno_root, gt_rec.segment_name,
                                f"{gt_rec.id}.npz")
        if not os.path.exists(occ_path):
            return
        if padded["occ_score"] < self.occ_label_thresh:
            return
        pts, lab, msk = occ_iou_mod.load_full_occ_queries(
            occ_path, self.cfg.ae_voxel_size, MAX_OCC_QUERIES)
        L = padded["rois"].shape[0]
        # refined rois for occ decode (reference uses the ORIGINAL rois for
        # the occ frame at test, tracklet_roi_head_occ.py:399 occ_rois=rois)
        inter, union = self._occ_fn(L)(
            self.params, pred["shape_latent"][0], jnp.asarray(padded["rois"]),
            jnp.asarray(padded["gt_boxes"]), jnp.asarray(padded["gt_valid"]),
            jnp.asarray(pts), jnp.asarray(lab), jnp.asarray(msk))
        gt_vols = padded["gt_boxes"][:, 3:6].prod(-1)
        valid = padded["gt_valid"].copy()
        valid[T:] = False
        acc.add_tracklet(np.asarray(inter), np.asarray(union), gt_vols, valid)
        if acc_base is not None:
            b_inter, b_union = occ_iou_mod.occ_baseline_tracklet(
                np.asarray(padded["points"]),
                np.asarray(padded["points_mask"]),
                np.asarray(padded["rois"]), np.asarray(padded["gt_boxes"]),
                valid, pts[np.asarray(msk)], lab[np.asarray(msk)],
                msk[np.asarray(msk)], self.cfg.ae_voxel_size)
            acc_base.add_tracklet(b_inter, b_union, gt_vols, valid)
