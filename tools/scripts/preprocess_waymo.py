#!/usr/bin/env python
"""Preprocess Waymo Open Dataset segmentation frames to per-frame npy.

Counterpart of the reference `pcseg/data/dataset/waymo/scripts/
preprocess_waymo_data.py`: extracts first/second-return point clouds per
frame into [range, intensity, elongation, x, y, z, label] rows consumed
by taseg_tpu.data.waymo.WaymoReader.

The TFRecord→Frame decoding requires `waymo-open-dataset` (NOT in this
image; its proto schema is not reimplementable here) and is gated; the
row assembly + file layout (`frame_rows`, `write_frame`) are pure numpy
and covered by tests/test_waymo_roundtrip.py against the reader.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def frame_rows(
    xyz: np.ndarray,
    rangev: np.ndarray,
    intensity: np.ndarray,
    elongation: np.ndarray,
    labels: np.ndarray,
) -> np.ndarray:
    """(N, 7) float32 rows in the reference's preprocessed layout:
    [range, intensity, elongation, x, y, z, semantic_label]
    (`preprocess_waymo_data.py` row order; WaymoReader slices cols 3:6
    for xyz, 1:3 for intensity/elongation, -1 for the label)."""
    return np.concatenate(
        [
            rangev.reshape(-1, 1),
            intensity.reshape(-1, 1),
            elongation.reshape(-1, 1),
            xyz.reshape(-1, 3),
            labels.reshape(-1, 1),
        ],
        axis=1,
    ).astype(np.float32)


def write_frame(
    out_dir: Path, split: str, idx: int, first: np.ndarray,
    second: np.ndarray | None = None,
) -> list[Path]:
    """Write one frame's returns in the directory layout WaymoReader
    consumes (`<out>/<split>/{first,second}/<idx>.npy`)."""
    paths = []
    for name, rows in (("first", first), ("second", second)):
        if rows is None:
            continue
        d = Path(out_dir) / split / name
        d.mkdir(parents=True, exist_ok=True)
        p = d / f"{idx:08d}.npy"
        np.save(p, rows.astype(np.float32))
        paths.append(p)
    return paths


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

    idx = 0
    for rec in sorted(Path(args.tfrecord_dir).glob("*.tfrecord")):
        for data in tf.data.TFRecordDataset(str(rec), compression_type=""):
            frame = dataset_pb2.Frame()
            frame.ParseFromString(bytearray(data.numpy()))
            if not frame.lasers[0].ri_return1.segmentation_label_compressed:
                continue
            parsed = frame_utils.parse_range_image_and_camera_projection(
                frame
            )
            range_images, _, seg_labels, _ri_pose = parsed
            returns = []
            for ri in (0, 1):
                pts, feats, labels = (
                    frame_utils.convert_range_image_to_point_cloud_labels(
                        frame, range_images, seg_labels, ri_index=ri
                    )
                )
                returns.append(
                    frame_rows(
                        pts[0], feats[0][:, 0], feats[0][:, 1],
                        feats[0][:, 2], labels[0][:, 1],
                    )
                )
            write_frame(Path(args.out_dir), args.split, idx, *returns)
            idx += 1
    print(f"wrote {idx} frames to {args.out_dir}")


if __name__ == "__main__":
    main()
