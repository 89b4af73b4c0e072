#!/usr/bin/env python
"""Preprocess Waymo Open Dataset segmentation frames to per-frame npy.

Counterpart of the reference `pcseg/data/dataset/waymo/scripts/
preprocess_waymo_data.py`: extracts first/second-return range images per
frame into [range, intensity, elongation, x, y, z, label] rows consumed by
taseg_tpu.data.waymo.WaymoReader.  Requires tensorflow +
waymo-open-dataset (NOT in this image) — the script gates the imports.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tfrecord_dir", required=True)
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--split", default="train")
    args = ap.parse_args()

    try:
        import tensorflow as tf
        from waymo_open_dataset import dataset_pb2
        from waymo_open_dataset.utils import frame_utils
    except ImportError as e:
        raise SystemExit(
            "preprocess_waymo requires tensorflow + waymo-open-dataset; "
            f"install them in a preprocessing environment ({e})"
        )

    out_first = Path(args.out_dir) / args.split / "first"
    out_second = Path(args.out_dir) / args.split / "second"
    out_first.mkdir(parents=True, exist_ok=True)
    out_second.mkdir(parents=True, exist_ok=True)

    idx = 0
    for rec in sorted(Path(args.tfrecord_dir).glob("*.tfrecord")):
        for data in tf.data.TFRecordDataset(str(rec), compression_type=""):
            frame = dataset_pb2.Frame()
            frame.ParseFromString(bytearray(data.numpy()))
            if not frame.lasers[0].ri_return1.segmentation_label_compressed:
                continue
            parsed = frame_utils.parse_range_image_and_camera_projection(frame)
            range_images, _, seg_labels, ri_top_pose = parsed
            for ri, out in ((0, out_first), (1, out_second)):
                pts, feats, labels = frame_utils.convert_range_image_to_point_cloud_labels(
                    frame, range_images, seg_labels, ri_index=ri
                )
                rows = np.concatenate(
                    [feats[0][:, :3], pts[0], labels[0][:, 1:2]], axis=1
                ).astype(np.float32)
                np.save(out / f"{idx:08d}.npy", rows)
            idx += 1
    print(f"wrote {idx} frames to {args.out_dir}")


if __name__ == "__main__":
    main()
