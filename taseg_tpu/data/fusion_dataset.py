"""Fusion (RPVNet) host pipeline: voxel sample + range image + pxpy.

Capability match of the reference fusion wrapper
(`pcseg/data/dataset/semantickitti/semantickitti_fusion.py:64-114,
205-207`): the augmented scan is quantized for the voxel/point branches
AND spherically projected into the 6-channel range image; every unique
voxel carries float (px, py) pixel coordinates for the bilinear
range->point sampling (reference normalized `range_pxpy` for
F.grid_sample — here kept in pixel units for ops.point_range tables).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

from .augment import AugParams
from .semantickitti.laserscan import project_scan
from .voxel_dataset import VoxelPipeline, VoxelSample, collate_batch


@dataclass
class FusionSample:
    voxel: VoxelSample
    range_img: np.ndarray  # (H, W, 6) float32
    pxpy: np.ndarray  # (N_vox, 2) float32 pixel coords (px, py)


class FusionPipeline(VoxelPipeline):
    def __init__(
        self, *args, h: int = 64, w: int = 2048,
        fov_up: float = 3.0, fov_down: float = -25.0, **kw,
    ):
        super().__init__(*args, **kw)
        self.h = h
        self.w = w
        self.fov_up = fov_up
        self.fov_down = fov_down

    def __call__(
        self, sample: dict, aug: Optional[AugParams] = None
    ) -> FusionSample:
        vox = super().__call__(sample, aug=aug)
        pts = vox.feats[:, :3]
        rem = vox.feats[:, 3] if vox.feats.shape[1] > 3 else np.zeros(
            len(pts), np.float32
        )
        # range image from the full augmented scan (denser than voxels)
        raw = sample["xyzret"][:, :4].astype(np.float32)
        proj = project_scan(
            raw[:, :3], raw[:, 3], h=self.h, w=self.w,
            fov_up_deg=self.fov_up, fov_down_deg=self.fov_down,
        )
        scan = np.concatenate(
            [
                proj.xyz / 50.0,
                proj.remission[..., None],
                proj.range_img[..., None] / 80.0,
                proj.mask[..., None],
            ],
            axis=-1,
        ).astype(np.float32)

        # float pixel coords of each voxel's representative point
        depth = np.maximum(np.linalg.norm(pts, axis=1), 1e-8)
        yaw = -np.arctan2(pts[:, 1], pts[:, 0])
        pitch = np.arcsin(np.clip(pts[:, 2] / depth, -1, 1))
        fov_up = np.radians(self.fov_up)
        fov_down = np.radians(self.fov_down)
        fov = abs(fov_down) + abs(fov_up)
        pxf = 0.5 * (yaw / np.pi + 1.0) * self.w
        pyf = (1.0 - (pitch + abs(fov_down)) / fov) * self.h
        pxpy = np.stack(
            [
                np.clip(pxf, 0, self.w - 1.001),
                np.clip(pyf, 0, self.h - 1.001),
            ],
            axis=1,
        ).astype(np.float32)
        return FusionSample(voxel=vox, range_img=scan, pxpy=pxpy)


def collate_fusion_batch(
    shards: list, point_capacity: int
) -> tuple[dict, list]:
    """Voxel Batch arrays + per-shard range image stack + padded pxpy."""
    vox_shards = [[f.voxel for f in shard] for shard in shards]
    arrays, meta = collate_batch(vox_shards, point_capacity)
    r = len(shards)
    b = max(len(s) for s in shards)
    h, w, c = shards[0][0].range_img.shape
    imgs = np.zeros((r, b, h, w, c), np.float32)
    pxpy = np.zeros((r, point_capacity, 2), np.float32)
    for ri, shard in enumerate(shards):
        off = meta[ri]["offsets"]
        for bi, f in enumerate(shard):
            imgs[ri, bi] = f.range_img
            n = len(f.pxpy)
            # rows offset by the in-shard scan index so one (B*H, W)
            # image stack serves the whole shard
            rc = f.pxpy.copy()
            rc[:, 1] += bi * h
            pxpy[ri, off[bi]: off[bi] + n] = rc
    arrays = dict(arrays)
    arrays["range_image"] = imgs
    arrays["range_pxpy"] = pxpy
    return arrays, meta
