#!/usr/bin/env python
"""Occupancy grid visualization — equivalent of the reference
``tools/occ/visualizae_occ.py`` (mayavi cubes) without GUI deps: prints
class-fraction stats and writes colored point-cloud ``.obj`` files
(occupied red, free green, unknown blue) loadable in any mesh viewer.
"""
import argparse
import os

import numpy as np


def write_obj(points, path, color):
    with open(path, "w") as f:
        for p in points:
            f.write(f"v {p[0]:.4f} {p[1]:.4f} {p[2]:.4f} "
                    f"{color[0]} {color[1]} {color[2]}\n")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("npz", help="occ npz (grid values 0 unknown / 1 occupied"
                               " / 2 free)")
    p.add_argument("--voxel-size", type=float, default=0.2)
    p.add_argument("--out-dir", default=None)
    args = p.parse_args()

    occ = np.load(args.npz)["occ"]
    n = occ.size
    print(f"grid {occ.shape}  voxels {n}")
    for v, name in [(0, "unknown"), (1, "occupied"), (2, "free")]:
        c = int((occ == v).sum())
        print(f"  {name:>9}: {c:7d}  ({c / n:6.1%})")

    if args.out_dir:
        os.makedirs(args.out_dir, exist_ok=True)
        dims = np.asarray(occ.shape)
        size = dims * args.voxel_size
        min_bound = np.array([-size[0] / 2, -size[1] / 2, 0.0])
        colors = {1: (255, 0, 0), 2: (0, 255, 0), 0: (0, 0, 255)}
        for v, name in [(1, "occupied"), (2, "free"), (0, "unknown")]:
            coors = np.stack(np.nonzero(occ == v), -1)
            centers = (coors + 0.5) * args.voxel_size + min_bound
            out = os.path.join(args.out_dir, f"occ_{name}.obj")
            write_obj(centers, out, colors[v])
            print(f"wrote {out} ({len(centers)} voxels)")


if __name__ == "__main__":
    main()
