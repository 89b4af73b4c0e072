"""Synthetic LiDAR scenes — deterministic stand-in for SemanticKITTI.

Generates structured point clouds (ground plane, walls, boxes, poles) with
consistent geometry->label mappings so models can actually *learn* on them;
used by tests, the benchmark harness, and demo configs when no dataset is
mounted.  The reference has no equivalent (it assumes real data on disk);
this is part of our test pyramid (SURVEY.md §4 implications).
"""

from __future__ import annotations

import numpy as np


def synthetic_scan(
    rng: np.random.Generator, n_points: int = 120_000, num_classes: int = 20
) -> tuple[np.ndarray, np.ndarray]:
    """Returns (points (N, 4) float32 xyz+intensity, labels (N,) int32).

    Class ids: 9 road (ground), 13 building (walls), 1 car (boxes),
    18 pole (vertical sticks), 15 vegetation (scatter)."""
    parts = []
    labels = []

    n_ground = int(n_points * 0.45)
    g = np.empty((n_ground, 3), np.float32)
    r = np.sqrt(rng.uniform(1, 2500, n_ground))
    phi = rng.uniform(-np.pi, np.pi, n_ground)
    g[:, 0] = r * np.cos(phi)
    g[:, 1] = r * np.sin(phi)
    g[:, 2] = rng.normal(-1.7, 0.02, n_ground)
    parts.append(g)
    labels.append(np.full(n_ground, 9))

    n_wall = int(n_points * 0.2)
    w = np.empty((n_wall, 3), np.float32)
    side = rng.integers(0, 4, n_wall)
    d = rng.uniform(15, 45, n_wall)
    along = rng.uniform(-40, 40, n_wall)
    w[:, 0] = np.where(side < 2, np.where(side == 0, d, -d), along)
    w[:, 1] = np.where(side < 2, along, np.where(side == 2, d, -d))
    w[:, 2] = rng.uniform(-1.7, 6.0, n_wall)
    parts.append(w)
    labels.append(np.full(n_wall, 13))

    n_car = int(n_points * 0.15)
    n_boxes = 12
    centers = rng.uniform(-30, 30, (n_boxes, 2))
    box_idx = rng.integers(0, n_boxes, n_car)
    c = np.empty((n_car, 3), np.float32)
    c[:, 0] = centers[box_idx, 0] + rng.uniform(-2.2, 2.2, n_car)
    c[:, 1] = centers[box_idx, 1] + rng.uniform(-0.9, 0.9, n_car)
    c[:, 2] = rng.uniform(-1.7, -0.2, n_car)
    parts.append(c)
    labels.append(np.full(n_car, 1))

    n_pole = int(n_points * 0.05)
    n_sticks = 20
    pole_xy = rng.uniform(-40, 40, (n_sticks, 2))
    pidx = rng.integers(0, n_sticks, n_pole)
    p = np.empty((n_pole, 3), np.float32)
    p[:, :2] = pole_xy[pidx] + rng.normal(0, 0.05, (n_pole, 2))
    p[:, 2] = rng.uniform(-1.7, 4.0, n_pole)
    parts.append(p)
    labels.append(np.full(n_pole, 18))

    n_veg = n_points - sum(len(x) for x in parts)
    v = np.empty((n_veg, 3), np.float32)
    v[:, 0] = rng.uniform(-48, 48, n_veg)
    v[:, 1] = rng.uniform(-48, 48, n_veg)
    v[:, 2] = rng.uniform(0.0, 5.0, n_veg)
    parts.append(v)
    labels.append(np.full(n_veg, 15))

    xyz = np.concatenate(parts).astype(np.float32)
    lbl = np.concatenate(labels).astype(np.int32)
    intensity = (0.05 * lbl[:, None] + rng.uniform(0, 0.2, (len(lbl), 1))).astype(
        np.float32
    )
    pts = np.concatenate([xyz, intensity], axis=1)
    perm = rng.permutation(len(pts))
    return pts[perm], lbl[perm]


class SyntheticMsKittiReader:
    """Synthetic multi-scan reader matching the TLAD/FSA reader contract
    (frame + pose-jittered history copies with the time-flag channel)."""

    def __init__(
        self, length: int = 16, n_points: int = 60_000, history: int = 3,
        seed: int = 0,
    ):
        self.length = length
        self.n_points = n_points
        self.history = history
        self.seed = seed
        self.class_names = [f"class_{i}" for i in range(20)]

    def __len__(self):
        return self.length

    def resample(self):
        pass

    def __getitem__(self, index: int) -> dict:
        rng = np.random.default_rng(self.seed * 99991 + index)
        pts, labels = synthetic_scan(rng, self.n_points)
        hist_parts, hist_labels = [], []
        for h in range(self.history):
            shift = rng.normal(0, 0.5, 3).astype(np.float32)
            keep = rng.random(len(pts)) < 0.3  # flexible-step style thinning
            moved = pts[keep].copy()
            moved[:, :3] += shift
            hist_parts.append(moved)
            hist_labels.append(labels[keep])
        fused = np.concatenate([pts] + hist_parts)
        fused_labels = np.concatenate([labels] + hist_labels)
        flag = np.zeros((len(fused), 1), np.float32)
        flag[: len(pts)] = 1.0
        ring = np.zeros((len(pts), 1), np.float32)
        ring_ms = np.zeros((len(fused), 1), np.float32)
        return {
            "xyzret": np.concatenate([pts, ring], axis=1),
            "labels": labels,
            "xyzret_ms": np.concatenate([fused[:, :4], flag, ring_ms], axis=1),
            "labels_ms": fused_labels,
            "path": f"synthetic_ms/08/velodyne/{index:06d}.bin",
        }


class SyntheticKittiReader:
    """Reader-contract-compatible synthetic dataset."""

    def __init__(
        self, length: int = 64, n_points: int = 120_000, seed: int = 0
    ):
        self.length = length
        self.n_points = n_points
        self.seed = seed
        self.class_names = [f"class_{i}" for i in range(20)]

    def __len__(self) -> int:
        return self.length

    def resample(self) -> None:
        pass

    def __getitem__(self, index: int) -> dict:
        rng = np.random.default_rng(self.seed * 100_003 + index)
        pts, labels = synthetic_scan(rng, self.n_points)
        ring = np.zeros((len(pts), 1), np.float32)
        return {
            "xyzret": np.concatenate([pts, ring], axis=1),
            "labels": labels,
            "path": f"synthetic/08/velodyne/{index:06d}.bin",
        }
