"""Offline object-centric occupancy GT annotation (W1).

Rebuild of ``tools/occ/occ_annotate.py`` (reference :91-647): for each vehicle
tracklet,
  1. gather in-box points of every frame, expressed in the box-local frame
     ``local = rotate_z(p - bottom_center, -yaw)`` (same frame this framework
     uses everywhere; reference ``get_local_point_list`` :91-138),
  2. voxelize the aggregated cloud on a grid of ``ceil(max_size / voxel)``
     cells spanning ``[-w/2, w/2] x [-l/2, l/2] x [0, h]`` (:414-441),
  3. ray-cast every non-occupied voxel center against the virtual range
     images of all 5 LiDARs over all frames: a voxel seen *through* by any
     sensor in any frame is free; voxels with points are occupied; the rest
     unknown (:479-567, ``point_cloud_to_range_image_idx`` :141-201),
  4. save ``<out>/<segment>/<trk_id>.npz`` with ``occ[X, Y, Z]`` int32 in
     {0 unknown, 1 occupied, 2 free} — bit-compatible with the reference.

TPU-native design: the reference runs a python loop of torch ops per frame
and per sensor on one GPU per worker. Here the whole visibility test is one
jitted computation over ``[frames, voxels]`` with padded static buckets —
the inclination argmin, azimuth binning, range-image gather, and the
frame/sensor max-reduction all fuse into a single XLA program; multiprocess
over segments remains at the host level.
"""
from __future__ import annotations

import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

LIDAR_NAMES = ("TOP", "FRONT", "SIDE_LEFT", "SIDE_RIGHT", "REAR")


def local_frame_points(points_ego: np.ndarray, box: np.ndarray) -> np.ndarray:
    """Ego points -> box-local (bottom-center origin, yaw-aligned)."""
    d = points_ego - box[:3]
    c, s = np.cos(-box[6]), np.sin(-box[6])
    return np.stack([d[:, 0] * c + d[:, 1] * s,
                     -d[:, 0] * s + d[:, 1] * c,
                     d[:, 2]], -1)


def points_in_box_mask(points_ego: np.ndarray, box: np.ndarray) -> np.ndarray:
    local = local_frame_points(points_ego, box)
    half = box[3:6] / 2
    return (np.abs(local[:, 0]) <= half[0]) & \
           (np.abs(local[:, 1]) <= half[1]) & \
           (np.abs(local[:, 2] - half[2]) <= half[2])


@partial(jax.jit, static_argnames=("width",))
def _range_image_visibility(centers_local, boxes, extrinsics, inclinations,
                            range_images, width: int):
    """Visibility of voxel centers against one sensor's range images.

    centers_local: [N, 3] box-local voxel centers (z from bottom).
    boxes: [T, 7] per-frame boxes (ego). extrinsics: [T, 4, 4].
    inclinations: [T, H] (already flipped ascending-row order).
    range_images: [T, H, W]. Returns [N] int32 visibility (2 free / 0).
    Mirrors ``point_cloud_to_range_image_idx`` + the >=range test.
    """
    # box-local -> per-frame ego
    yaw = boxes[:, 6]
    c, s = jnp.cos(yaw)[:, None], jnp.sin(yaw)[:, None]
    x, y, z = centers_local[:, 0][None], centers_local[:, 1][None], \
        centers_local[:, 2][None]
    ego = jnp.stack([x * c + y * s + boxes[:, 0:1],
                     -x * s + y * c + boxes[:, 1:2],
                     jnp.broadcast_to(z, (boxes.shape[0],
                                          centers_local.shape[0]))
                     + boxes[:, 2:3]], -1)  # [T, N, 3]

    inv = jnp.linalg.inv(extrinsics)
    pts = jnp.einsum("tij,tnj->tni", inv[:, :3, :3], ego) + inv[:, None, :3, 3]
    xy_norm = jnp.linalg.norm(pts[..., :2], axis=-1)
    incl = jnp.arctan2(pts[..., 2], xy_norm)  # [T, N]
    # row: nearest beam inclination
    diff = jnp.abs(incl[:, :, None] - inclinations[:, None, :])
    rows = jnp.argmin(diff, axis=-1)  # [T, N]

    az_corr = jnp.arctan2(extrinsics[:, 1, 0], extrinsics[:, 0, 0])
    az = jnp.arctan2(pts[..., 1], pts[..., 0]) + az_corr[:, None]
    az = jnp.where(az > jnp.pi, az - 2 * jnp.pi, az)
    az = jnp.where(az < -jnp.pi, az + 2 * jnp.pi, az)
    cols = jnp.round(width - 0.5 - (az + jnp.pi) / (2 * jnp.pi) * width)
    cols = jnp.mod(cols, width).astype(jnp.int32)

    rng = jnp.linalg.norm(pts, axis=-1)
    t_idx = jnp.arange(range_images.shape[0])[:, None]
    ri_val = range_images[t_idx, rows, cols]  # [T, N]
    visible = (ri_val >= rng)
    return jnp.where(jnp.any(visible, axis=0), 2, 0).astype(jnp.int32)


class OccAnnotator:
    """Annotates tracklets given host-side data providers.

    get_points(ts) -> [N, >=3] ego-frame points of that frame.
    get_raw_frame(ts) -> dict with ``{name}_BEAM_INCLINATION`` [H],
    ``{name}_LIDAR_EXTRINSIC`` [4,4], ``{name}_RANGE_IMAGE_MERGE_VIRTUAL``
    [H,W] for each name in ``lidar_names``.
    """

    def __init__(self, get_points, get_raw_frame, out_dir: str,
                 voxel_size: float = 0.2, min_track_len: int = 10,
                 lidar_names=LIDAR_NAMES, voxel_chunk: int = 8192,
                 overwrite: bool = False, save_mean_var: bool = False):
        self.get_points = get_points
        self.get_raw_frame = get_raw_frame
        self.out_dir = out_dir
        self.voxel_size = voxel_size
        self.min_track_len = min_track_len
        self.lidar_names = lidar_names
        self.voxel_chunk = voxel_chunk
        self.overwrite = overwrite
        self.save_mean_var = save_mean_var
        # per-(ts, sensor) DEVICE cache of staged range images: tracklets
        # of one segment share frames, so each frame's [H, W] image is
        # transferred host->device once and per-tracklet stacks are built
        # on device (measured: per-tracklet restaging dominated W1 —
        # BENCH_NOTES round 4). ~2.8 MB/frame across 5 sensors; the cap
        # bounds device residency to ~1.4 GB.
        self._ri_cache: dict = {}
        self._ri_cache_cap = 512

    def annotate_trk(self, segment_name: str, trk_id: str,
                     boxes: np.ndarray, ts_list: list) -> str | None:
        """boxes: [T, 7] per-frame ego boxes. Returns the npz path."""
        out_path = os.path.join(self.out_dir, segment_name)
        os.makedirs(out_path, exist_ok=True)
        out_name = os.path.join(out_path, f"{trk_id}.npz")
        if os.path.isfile(out_name) and not self.overwrite:
            try:
                np.load(out_name)
                return out_name
            except Exception:
                pass
        if len(ts_list) < self.min_track_len:
            return None

        # 1. aggregate in-box points in the shared box-local frame
        local_pts = []
        for i, ts in enumerate(ts_list):
            pc = np.asarray(self.get_points(ts))[:, :3]
            m = points_in_box_mask(pc, boxes[i])
            if m.any():
                local_pts.append(local_frame_points(pc[m], boxes[i]))
        if not local_pts:
            return None
        agg = np.concatenate(local_pts, 0)

        # 2. voxelize on the max-size grid
        size = boxes[:, 3:6].max(0)
        dims = np.maximum(np.ceil(size / self.voxel_size).astype(np.int32), 1)
        min_bound = np.array([-size[0] / 2, -size[1] / 2, 0.0])
        coors = np.floor((agg - min_bound) / self.voxel_size).astype(np.int64)
        ok = ((coors >= 0) & (coors < dims)).all(1)
        coors = coors[ok]
        occ = np.zeros(tuple(dims), bool)
        occ[coors[:, 0], coors[:, 1], coors[:, 2]] = True

        # 3. ray-cast the non-occupied voxel centers
        unknown = np.stack(np.nonzero(~occ), -1)
        result = np.zeros(occ.shape, np.int32)
        result[occ] = 1
        if len(unknown):
            centers = (unknown + 0.5) * self.voxel_size + min_bound
            vis = self._visibility(centers, boxes, ts_list, segment_name)
            result[unknown[:, 0], unknown[:, 1], unknown[:, 2]] = vis
        if self.save_mean_var:
            # per-occupied-voxel mean/variance of the aggregated points
            # (reference occ_annotate.py:627-645 save_mean_var): npz gains
            # mean_var [X, Y, Z, 6] = [mean_xyz, var_xyz], zeros elsewhere
            mv = np.zeros(tuple(dims) + (6,), np.float32)
            flat = np.ravel_multi_index(coors.T, tuple(dims))
            order = np.argsort(flat, kind="stable")
            flat_s = flat[order]
            pts_s = agg[ok][order]
            uniq, start = np.unique(flat_s, return_index=True)
            sums = np.add.reduceat(pts_s, start, axis=0)
            sq = np.add.reduceat(pts_s ** 2, start, axis=0)
            cnt = np.diff(np.append(start, len(flat_s)))[:, None]
            mean = sums / cnt
            var = np.maximum(sq / cnt - mean ** 2, 0.0)
            ix = np.stack(np.unravel_index(uniq, tuple(dims)), -1)
            mv[ix[:, 0], ix[:, 1], ix[:, 2]] = np.concatenate(
                [mean, var], -1)
            np.savez(out_name, occ=result, mean_var=mv)
        else:
            np.savez(out_name, occ=result)
        return out_name

    def _staged_frame(self, segment_name: str, ts, name: str, frame: dict):
        """Device-resident (extrinsic [4,4], flipped inclination [H],
        range image [H, W]) for one frame+sensor, cached across tracklets
        of the segment (FIFO-bounded)."""
        key = (segment_name, ts, name)
        hit = self._ri_cache.get(key)
        if hit is not None:
            return hit
        staged = (
            jnp.asarray(frame[f"{name}_LIDAR_EXTRINSIC"], jnp.float32),
            jnp.asarray(np.flip(np.asarray(
                frame[f"{name}_BEAM_INCLINATION"])).copy(), jnp.float32),
            jnp.asarray(frame[f"{name}_RANGE_IMAGE_MERGE_VIRTUAL"],
                        jnp.float32),
        )
        if len(self._ri_cache) >= self._ri_cache_cap:
            self._ri_cache.pop(next(iter(self._ri_cache)))
        self._ri_cache[key] = staged
        return staged

    def _visibility(self, centers: np.ndarray, boxes: np.ndarray,
                    ts_list: list, segment_name: str = "") -> np.ndarray:
        frames = [self.get_raw_frame(ts) for ts in ts_list]
        vis = np.zeros((len(centers),), np.int32)
        boxes_j = jnp.asarray(boxes, jnp.float32)
        # pad the voxel count to the next power of two (>=512, capped at
        # voxel_chunk) instead of always padding to voxel_chunk: typical
        # car grids have <2.4k unknown voxels, and padding 588 -> 8192
        # was 14x wasted [T, N, H] work per sensor (BENCH_NOTES round 4)
        bucket = 512
        while bucket < min(len(centers), self.voxel_chunk):
            bucket *= 2
        chunk_n = min(bucket, self.voxel_chunk)
        for name in self.lidar_names:
            if f"{name}_RANGE_IMAGE_MERGE_VIRTUAL" not in frames[0]:
                continue
            staged = [self._staged_frame(segment_name, ts, name, f)
                      for ts, f in zip(ts_list, frames)]
            extr = jnp.stack([s[0] for s in staged], 0)
            incl = jnp.stack([s[1] for s in staged], 0)
            ri = jnp.stack([s[2] for s in staged], 0)
            width = ri.shape[-1]
            # chunk voxels to bound the [T, N, H] intermediate
            for beg in range(0, len(centers), chunk_n):
                chunk = centers[beg:beg + chunk_n]
                pad = chunk_n - len(chunk)
                if pad:
                    chunk = np.pad(chunk, ((0, pad), (0, 0)))
                v = np.asarray(_range_image_visibility(
                    jnp.asarray(chunk, jnp.float32), boxes_j, extr, incl, ri,
                    width))
                n = min(chunk_n, len(centers) - beg)
                vis[beg:beg + n] = np.maximum(vis[beg:beg + n], v[:n])
        return vis
