"""TIAF multi-modal voxel pipeline + collate (host side).

Capability match of the reference MM voxel wrapper
(`semantickitti_voxel_ms_mm.py:1-319`): per scan it produces

  * the FSA main pair (frame + fused cloud, shared quantization origin);
  * the FOV sub-cloud — fused points that land in at least one window
    image's frustum — quantized on the SAME origin so FOV voxels align
    with main points for the fov->main interpolation tables;
  * per-FOV-voxel integer (row, col) image coordinates with rows offset
    by the image slot (the layout `models.voxel.minkunet_mm.UNet2D`
    gathers from);
  * the image stack + dilated 2D semantic targets.

The reader supplies projection results (fov_mask / fov_rowcol / images /
image_labels) computed BEFORE augmentation — image<->point correspondence
is by point identity, so geometric aug of the clouds leaves it intact.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

from .augment import AugParams
from .voxel_dataset import (
    MsVoxelPipeline,
    MsVoxelSample,
    VoxelSample,
    collate_batch,
)


@dataclass
class MmVoxelSample:
    main: MsVoxelSample  # frame + fused (FSA pair)
    fov: VoxelSample  # FOV-cropped fused cloud (same origin)
    fov_rowcol: np.ndarray  # (N_fov_vox, 2) int32, row offset by image slot
    images: np.ndarray  # (n_img, H, W, 3) float32
    image_labels: np.ndarray  # (n_img, H, W) int32 dilated targets


class MsMmVoxelPipeline(MsVoxelPipeline):
    """Reader dict -> MmVoxelSample. Expects the TIAF reader contract:
    `xyzret_ms`/`labels_ms` plus `fov_mask` (N_ms,), `fov_rowcol`
    (N_fov, 2), `images`, `image_labels`."""

    def __call__(self, sample: dict, aug: Optional[AugParams] = None):
        pts = sample["xyzret"][:, :4].astype(np.float32)
        pts_ms = sample["xyzret_ms"][:, : self.in_feature_dim].astype(
            np.float32
        )
        labels = np.asarray(sample["labels"]).reshape(-1).astype(np.int32)
        labels_ms = np.asarray(sample["labels_ms"]).reshape(-1).astype(
            np.int32
        )
        fov_mask = np.asarray(sample["fov_mask"]).reshape(-1)
        fov_rowcol = np.asarray(sample["fov_rowcol"], np.int32)

        if self.training:
            aug = aug or AugParams.sample(self.rng, **self.aug_flags)
        if aug is not None:
            pts, pts_ms = pts.copy(), pts_ms.copy()
            pts[:, :3] = aug.apply(pts[:, :3])
            pts_ms[:, :3] = aug.apply(pts_ms[:, :3])

        # clamp fused cloud to the frame's min bounds (shared quantization
        # origin, semantickitti_voxel_ms.py:121-125); keep the row mask so
        # the FOV projection stays aligned
        mn = pts[:, :3].min(0)
        keep = (pts_ms[:, :3] >= mn).all(1)
        pts_ms, labels_ms = pts_ms[keep], labels_ms[keep]
        fov_mask = fov_mask[keep]
        # fov_rowcol rows are per-FOV-point (pre-clamp); re-derive the
        # surviving subset
        if fov_rowcol.shape[0] == len(keep):
            fov_rowcol_kept = fov_rowcol[keep][fov_mask]
        else:  # rowcol already compacted to fov points (reader contract B)
            kept_of_fov = keep[np.asarray(sample["fov_mask"]).reshape(-1)]
            fov_rowcol_kept = fov_rowcol[kept_of_fov]

        origin = (
            np.round(pts_ms[:, :3] / self.voxel_size).astype(np.int32)
            .min(0, keepdims=True)
        )
        frame = self._quantize(pts, labels, origin)
        fused = self._quantize(pts_ms, labels_ms, origin)
        frame.name = fused.name = sample.get("path", "")
        main = MsVoxelSample(
            frame=frame, fused=fused, num_frame_points=len(pts)
        )

        fov_pts = pts_ms[fov_mask]
        fov_labels = labels_ms[fov_mask]
        fov = self._quantize(fov_pts, fov_labels, origin)
        fov.name = frame.name
        # per-FOV-voxel rowcol: take the first contributing point's pixel
        vox_ids, first_idx = np.unique(fov.inverse_map, return_index=True)
        order = np.zeros(len(fov.coords), np.int64)
        order[vox_ids] = first_idx
        rowcol_vox = fov_rowcol_kept[order].astype(np.int32)

        return MmVoxelSample(
            main=main,
            fov=fov,
            fov_rowcol=rowcol_vox,
            images=np.asarray(sample["images"], np.float32),
            image_labels=np.asarray(sample["image_labels"], np.int32),
        )


def collate_mm_batch(
    shards: list,
    point_capacity: int,
    fov_capacity: int,
) -> tuple[dict, list]:
    """Collate MmVoxelSamples: main + fov Batch arrays, padded rowcol
    (rows re-offset per collated image slot), stacked images + targets."""
    main_shards = [[m.main.fused for m in shard] for shard in shards]
    for shard in shards:
        for m in shard:
            m.main.fused.ms_pair = m.main
    fov_shards = [[m.fov for m in shard] for shard in shards]
    m_arrays, m_meta = collate_batch(main_shards, point_capacity)
    f_arrays, f_meta = collate_batch(fov_shards, fov_capacity)

    r = len(shards)
    n_img_tot = max(
        sum(m.images.shape[0] for m in shard) for shard in shards
    )
    h, w = shards[0][0].images.shape[1:3]
    images = np.zeros((r, n_img_tot, h, w, 3), np.float32)
    img_labels = np.zeros((r, n_img_tot, h, w), np.int32)
    rowcol = np.zeros((r, fov_capacity, 2), np.int32)
    for ri, shard in enumerate(shards):
        img_base = 0
        f_off = f_meta[ri]["offsets"]
        for b, m in enumerate(shard):
            n_i = m.images.shape[0]
            images[ri, img_base : img_base + n_i] = m.images
            img_labels[ri, img_base : img_base + n_i] = m.image_labels
            rc = m.fov_rowcol.copy()
            rc[:, 0] += img_base * h  # rows pre-offset by in-scan slot
            rowcol[ri, f_off[b] : f_off[b + 1]] = rc
            img_base += n_i
    arrays = {
        "main": m_arrays,
        "fov": f_arrays,
        "fov_rowcol": rowcol,
        "images": images,
        "image_labels": img_labels,
    }
    return arrays, m_meta
