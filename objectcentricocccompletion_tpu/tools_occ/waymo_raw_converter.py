"""W0 CLI: Waymo tfrecords -> per-frame raw pkls for the occ annotator.

Rebuild of ``Waymo.convert_one`` / the ``waymo_raw`` mode
(``tools/data_converter/waymo_converter.py:549-676``,
``tools/create_data.py:206-236``): for each frame and each of the 5 LiDARs,
write ``{name}_BEAM_INCLINATION`` [H], ``{name}_LIDAR_EXTRINSIC`` [4, 4] and
``{name}_RANGE_IMAGE_MERGE_VIRTUAL`` [H, W] (min-range merge of both
returns, built with ``range_image.build_virtual_range_image``) into
``<out>/<file_idx>.pkl``.

Requires tensorflow + waymo_open_dataset (not available in every
environment; the import is guarded so the rest of the framework never pays
for it). The geometry core is dependency-free and unit-tested in
``range_image.py``.
"""
from __future__ import annotations

import argparse
import os
import pickle

import numpy as np

from .range_image import build_virtual_range_image

LIDAR_IDS = {1: "TOP", 2: "FRONT", 3: "SIDE_LEFT", 4: "SIDE_RIGHT",
             5: "REAR"}


def convert_segment(tfrecord_path: str, out_dir: str, file_idx_base: str):
    try:
        import tensorflow.compat.v1 as tf
        from waymo_open_dataset import dataset_pb2
        from waymo_open_dataset.utils import frame_utils
    except ImportError as e:
        raise SystemExit(
            "waymo_raw conversion needs tensorflow + waymo_open_dataset "
            f"({e}); run it in a data-prep environment") from e
    tf.enable_eager_execution()
    os.makedirs(out_dir, exist_ok=True)

    ds = tf.data.TFRecordDataset(tfrecord_path, compression_type="")
    for frame_idx, data in enumerate(ds):
        frame = dataset_pb2.Frame()
        frame.ParseFromString(bytearray(data.numpy()))
        (range_images, camera_projections, _, range_image_top_pose) = \
            frame_utils.parse_range_image_and_camera_projection(frame)
        out = {}
        for c in frame.context.laser_calibrations:
            name = LIDAR_IDS.get(c.name)
            if name is None:
                continue
            extrinsic = np.reshape(
                np.asarray(c.extrinsic.transform), (4, 4))
            if len(c.beam_inclinations) == 0:
                incl = np.linspace(c.beam_inclination_min,
                                   c.beam_inclination_max,
                                   range_images[c.name][0].shape.dims[0])
            else:
                incl = np.asarray(c.beam_inclinations)
            out[f"{name}_LIDAR_EXTRINSIC"] = extrinsic
            out[f"{name}_BEAM_INCLINATION"] = incl.astype(np.float32)

            # merge both returns' points into one virtual range image
            pts = []
            for ri_index in (0, 1):
                p, _ = frame_utils.convert_range_image_to_point_cloud(
                    frame, range_images, camera_projections,
                    range_image_top_pose, ri_index=ri_index,
                    keep_polar_features=False)
                lidar_row = [i for i, cal in enumerate(
                    sorted(frame.context.laser_calibrations,
                           key=lambda x: x.name)) if cal.name == c.name]
                if lidar_row:
                    pts.append(p[lidar_row[0]])
            pts_ego = np.concatenate(pts, 0) if pts else np.zeros((0, 3))
            width = range_images[c.name][0].shape.dims[1]
            out[f"{name}_RANGE_IMAGE_MERGE_VIRTUAL"] = \
                build_virtual_range_image(
                    pts_ego[:, :3], extrinsic,
                    np.flip(np.sort(incl)), width)[::-1]

        with open(os.path.join(out_dir,
                               f"{file_idx_base}{frame_idx:03d}.pkl"),
                  "wb") as f:
            pickle.dump(out, f)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tfrecord-dir", required=True)
    p.add_argument("--out-dir", required=True)
    args = p.parse_args()
    records = sorted(f for f in os.listdir(args.tfrecord_dir)
                     if "tfrecord" in f)
    for i, r in enumerate(records):
        convert_segment(os.path.join(args.tfrecord_dir, r), args.out_dir,
                        f"{i:04d}")


if __name__ == "__main__":
    main()
