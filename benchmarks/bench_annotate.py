"""W1 occupancy-annotation throughput on the real chip (VERDICT r3 weak #7).

Synthesizes a realistic Waymo-scale tracklet — 5 LiDARs (TOP 64x2650 +
4x 200x600 virtual range images), ~100 frames, car-sized box, ~20k in-box
points — and measures ``OccAnnotator.annotate_trk`` wall time end to end
(host gather + jitted [frames, voxels] visibility on device + npz write).

The reference burns 8 GPUs x 32 workers on this stage
(``/root/reference/README.md:40-43``).

    python benchmarks/bench_annotate.py [n_tracklets]
"""
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def make_realistic_scene(T=100, seed=0):
    rng = np.random.RandomState(seed)
    size = np.array([4.8, 2.1, 1.8])
    boxes = []
    for i in range(T):
        ctr = np.array([12.0 + 0.35 * i, -3.0 + 0.05 * i, -0.9])
        yaw = 0.2 + 0.002 * i
        boxes.append(np.concatenate([ctr, size, [yaw]]))
    boxes = np.asarray(boxes, np.float32)

    pts_per_frame = []
    for i in range(T):
        n_bg = 160_000
        bg = rng.uniform([-75, -75, -2], [75, 75, 4], (n_bg, 3))
        n_obj = rng.randint(150, 400)
        u = rng.uniform(-0.5, 0.5, (n_obj, 3))
        face = rng.randint(0, 3, n_obj)
        sgn = rng.choice([-0.5, 0.5], n_obj)
        for a in range(3):
            u[face == a, a] = sgn[face == a]
        local = u * size
        b = boxes[i]
        c, s = np.cos(b[6]), np.sin(b[6])
        obj = np.stack([local[:, 0] * c - local[:, 1] * s + b[0],
                        local[:, 0] * s + local[:, 1] * c + b[1],
                        local[:, 2] + b[2] + size[2] / 2], -1)
        pts_per_frame.append(
            np.concatenate([obj, bg], 0).astype(np.float32))

    lidars = {}
    specs = {"TOP": (64, 2650), "FRONT": (200, 600),
             "SIDE_LEFT": (200, 600), "SIDE_RIGHT": (200, 600),
             "REAR": (200, 600)}
    for name, (H, W) in specs.items():
        incl = np.linspace(-0.31, 0.04, H).astype(np.float32)
        ext = np.eye(4, dtype=np.float32)
        ri = rng.uniform(5.0, 70.0, (H, W)).astype(np.float32)
        lidars[name] = (np.flip(incl).copy(), ext, ri)

    def get_points(ts):
        return pts_per_frame[ts]

    def get_raw_frame(ts):
        out = {}
        for name, (incl, ext, ri) in lidars.items():
            out[f"{name}_BEAM_INCLINATION"] = incl
            out[f"{name}_LIDAR_EXTRINSIC"] = ext
            out[f"{name}_RANGE_IMAGE_MERGE_VIRTUAL"] = ri
        return out

    return boxes, list(range(T)), get_points, get_raw_frame


def main():
    from objectcentricocccompletion_tpu.tools_occ.annotate import (
        LIDAR_NAMES, OccAnnotator)
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    out = tempfile.mkdtemp()
    boxes, ts_list, get_points, get_raw_frame = make_realistic_scene()
    ann = OccAnnotator(get_points, get_raw_frame, out,
                       voxel_size=0.2, lidar_names=LIDAR_NAMES,
                       overwrite=True)
    # warmup (compile)
    t0 = time.perf_counter()
    ann.annotate_trk("seg", "warmup", boxes, ts_list)
    print(f"warmup (incl compile): {time.perf_counter() - t0:.1f} s")
    times = []
    for i in range(n):
        t0 = time.perf_counter()
        p = ann.annotate_trk("seg", f"trk{i}", boxes, ts_list)
        times.append(time.perf_counter() - t0)
        occ = np.load(p)["occ"]
        frac = [(occ == v).mean() for v in (0, 1, 2)]
        print(f"trk{i}: {times[-1]:.2f} s  grid {occ.shape} "
              f"unknown/occ/free = {frac[0]:.2f}/{frac[1]:.2f}/{frac[2]:.2f}")
    mean = float(np.mean(times))
    print(f"\nmean {mean:.2f} s/tracklet (T=100 frames, 5 lidars, 160k "
          f"pts/frame) -> {3600 / mean:.0f} tracklets/hour/host")
    shutil.rmtree(out)


if __name__ == "__main__":
    main()
