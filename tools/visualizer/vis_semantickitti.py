#!/usr/bin/env python
"""Point-cloud visualizer for SemanticKITTI scans + predictions.

Counterpart of the reference `tools/visualizer/vis_SemanticKITTI.py`
(open3d viewer): renders a scan colored by its (predicted or GT) labels.
open3d is not part of this image, so the default backend writes a colored
PLY file (viewable in any mesh tool) and optionally a matplotlib top-down
png; if open3d IS importable, an interactive window is shown.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

# SemanticKITTI color map (train ids), BGR values from the benchmark spec
COLORS = np.array(
    [
        [0, 0, 0], [100, 150, 245], [100, 230, 245], [30, 60, 150],
        [80, 30, 180], [0, 0, 255], [255, 30, 30], [255, 40, 200],
        [150, 30, 90], [255, 0, 255], [255, 150, 255], [75, 0, 75],
        [175, 0, 75], [255, 200, 0], [255, 120, 50], [0, 175, 0],
        [135, 60, 0], [150, 240, 80], [255, 240, 150], [255, 0, 0],
    ],
    np.uint8,
)


def load(scan_path, label_path):
    from taseg_tpu.utils import storage

    pts = storage.load_bin(scan_path, "float32").reshape(-1, 4)
    raw = storage.load_bin(label_path, "uint32") & 0xFFFF
    from taseg_tpu.data.semantickitti.labels import remap_labels

    labels = remap_labels(raw) if raw.max() > 19 else raw.astype(np.int64)
    return pts, labels


def write_ply(path, pts, colors):
    with open(path, "w") as f:
        f.write(
            "ply\nformat ascii 1.0\n"
            f"element vertex {len(pts)}\n"
            "property float x\nproperty float y\nproperty float z\n"
            "property uchar red\nproperty uchar green\nproperty uchar blue\n"
            "end_header\n"
        )
        for p, c in zip(pts, colors):
            f.write(f"{p[0]:.3f} {p[1]:.3f} {p[2]:.3f} {c[0]} {c[1]} {c[2]}\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scan", required=True, help=".bin velodyne scan")
    ap.add_argument("--label", required=True, help=".label (GT or prediction)")
    ap.add_argument("--out", default="scan.ply")
    ap.add_argument("--png", default=None, help="optional top-down png")
    args = ap.parse_args()

    pts, labels = load(args.scan, args.label)
    colors = COLORS[np.clip(labels, 0, len(COLORS) - 1)]

    try:
        import open3d as o3d  # optional interactive path

        pc = o3d.geometry.PointCloud()
        pc.points = o3d.utility.Vector3dVector(pts[:, :3])
        pc.colors = o3d.utility.Vector3dVector(colors / 255.0)
        o3d.visualization.draw_geometries([pc])
        return
    except ImportError:
        pass

    write_ply(args.out, pts[:, :3], colors)
    print(f"wrote {args.out}")
    if args.png:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(10, 10))
        ax.scatter(pts[:, 0], pts[:, 1], c=colors / 255.0, s=0.2)
        ax.set_aspect("equal")
        fig.savefig(args.png, dpi=150)
        print(f"wrote {args.png}")


if __name__ == "__main__":
    main()
