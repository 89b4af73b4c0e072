"""Cylindrical-partition dataset wrapper (host side).

Capability match of the reference cylinder wrapper
(`semantickitti_cylinder.py:19-265`): cartesian -> polar coordinates
(rho, phi, z), a fixed voxel grid (default 480 x 360 x 32 over
rho [0, 50] m, phi [-pi, pi], z [-4, 2] m), per-voxel majority labels via
the quantize inverse map, and the 9-channel cylinder point features
[d-rho, d-phi, d-z to the voxel center, rho, phi, z, x, y, intensity].
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from .augment import AugParams
from .voxel_dataset import VoxelSample
from ..ops.quantize import sparse_quantize

DEFAULT_GRID = (480, 360, 32)
DEFAULT_BOUNDS = ((0.0, 50.0), (-np.pi, np.pi), (-4.0, 2.0))


def cart2polar(xyz: np.ndarray) -> np.ndarray:
    rho = np.sqrt(xyz[:, 0] ** 2 + xyz[:, 1] ** 2)
    phi = np.arctan2(xyz[:, 1], xyz[:, 0])
    return np.stack([rho, phi, xyz[:, 2]], axis=1)


class CylinderPipeline:
    """reader dict -> VoxelSample on the polar grid."""

    def __init__(
        self,
        grid=DEFAULT_GRID,
        bounds=DEFAULT_BOUNDS,
        *,
        training: bool = True,
        if_flip=True, if_scale=True, scale_range=(0.9, 1.1),
        if_jitter=True, if_rotate=True,
        seed: int = 0,
    ):
        self.grid = np.asarray(grid)
        self.lo = np.asarray([b[0] for b in bounds], np.float32)
        self.hi = np.asarray([b[1] for b in bounds], np.float32)
        self.cell = (self.hi - self.lo) / self.grid
        self.training = training
        self.aug_flags = dict(
            if_flip=if_flip, if_scale=if_scale, scale_range=scale_range,
            if_jitter=if_jitter, if_rotate=if_rotate,
        )
        self.rng = np.random.default_rng(seed)

    def __call__(self, sample: dict, aug: Optional[AugParams] = None) -> VoxelSample:
        pts = sample["xyzret"][:, :4].astype(np.float32)
        labels = np.asarray(sample["labels"]).reshape(-1).astype(np.int32)
        if self.training:
            aug = aug or AugParams.sample(self.rng, **self.aug_flags)
        if aug is not None:
            pts = pts.copy()
            pts[:, :3] = aug.apply(pts[:, :3])

        polar = cart2polar(pts[:, :3])
        polar_c = np.clip(polar, self.lo, self.hi - 1e-5)
        vox = ((polar_c - self.lo) / self.cell).astype(np.int32)
        vox = np.minimum(vox, self.grid - 1)
        _, index, inverse = sparse_quantize(
            vox, return_index=True, return_inverse=True
        )
        # per-voxel MAJORITY label (reference voxelize_with_label,
        # seg_utils.py:29-40) instead of first-point label
        n_vox = len(index)
        maj = np.zeros(n_vox, np.int32)
        order = np.argsort(inverse, kind="stable")
        seg_ids = inverse[order]
        seg_lbl = labels[order]
        starts = np.searchsorted(seg_ids, np.arange(n_vox))
        ends = np.append(starts[1:], len(seg_ids))
        for v in range(n_vox):
            counts = np.bincount(seg_lbl[starts[v]:ends[v]])
            maj[v] = counts.argmax()

        center = self.lo + (vox + 0.5) * self.cell
        feats = np.concatenate(
            [
                (polar_c - center).astype(np.float32),  # offset to center
                polar_c.astype(np.float32),
                pts[:, :2],  # x, y
                pts[:, 3:4],  # intensity
            ],
            axis=1,
        )
        return VoxelSample(
            coords=vox[index],
            feats=feats[index],
            labels=maj,
            inverse_map=inverse.astype(np.int32),
            raw_labels=labels,
            num_raw_points=len(pts),
            name=sample.get("path", ""),
        )
