"""Voxel-modality dataset wrapper + static-capacity collate.

Host pipeline (reference `semantickitti_voxel.py:78-177` semantics):
per-sample aug -> round(xyz / voxel_size) -> shift to nonnegative ->
sparse_quantize dedup -> per-voxel (coords, feats, labels) + eval-side
inverse map.  The collate step replaces torchsparse's dynamic concat
(`utils/collate.py:12-60`) with padding to a static point capacity per
data-parallel shard, producing the `parallel.Batch` pytree directly.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

from ..ops.quantize import sparse_quantize
from .augment import AugParams


@dataclass
class VoxelSample:
    """One quantized scan (host numpy)."""

    coords: np.ndarray  # (N, 3) int32 nonneg voxel coords
    feats: np.ndarray  # (N, C) float32 (xyz, intensity, ...)
    labels: np.ndarray  # (N,) int32 per-voxel train ids
    inverse_map: np.ndarray  # (N_raw,) raw point -> voxel row
    raw_labels: np.ndarray  # (N_raw,) train ids of the raw points
    num_raw_points: int
    name: str


class VoxelPipeline:
    """Stateless per-scan transform: reader dict -> VoxelSample."""

    def __init__(
        self,
        voxel_size: float = 0.05,
        *,
        training: bool = True,
        if_flip=True, if_scale=True, scale_range=(0.9, 1.1),
        if_jitter=True, if_rotate=True,
        in_feature_dim: int = 4,
        seed: int = 0,
    ):
        self.voxel_size = voxel_size
        self.training = training
        self.aug_flags = dict(
            if_flip=if_flip, if_scale=if_scale, scale_range=scale_range,
            if_jitter=if_jitter, if_rotate=if_rotate,
        )
        self.in_feature_dim = in_feature_dim
        self.rng = np.random.default_rng(seed)

    def __call__(
        self, sample: dict, aug: Optional[AugParams] = None
    ) -> VoxelSample:
        pts = sample["xyzret"][:, : self.in_feature_dim].astype(np.float32)
        labels = np.asarray(sample["labels"]).reshape(-1).astype(np.int32)

        if self.training:
            aug = aug or AugParams.sample(self.rng, **self.aug_flags)
        if aug is not None:
            pts = pts.copy()
            pts[:, :3] = aug.apply(pts[:, :3])

        vox = np.round(pts[:, :3] / self.voxel_size).astype(np.int32)
        vox -= vox.min(0, keepdims=True)
        _, index, inverse = sparse_quantize(
            vox, return_index=True, return_inverse=True
        )
        return VoxelSample(
            coords=vox[index],
            feats=pts[index],
            labels=labels[index],
            inverse_map=inverse.astype(np.int32),
            raw_labels=labels,
            num_raw_points=len(pts),
            name=sample.get("path", ""),
        )


@dataclass
class MsVoxelSample:
    """One frame + fused-cloud pair (TLAD/FSA), both quantized coherently.

    `frame` is the single-scan sample (used for eval mapping); `fused` the
    multi-scan cloud the model consumes; `num_frame_points` the count of
    current-frame raw points leading the fused cloud (point_mask invariant,
    reference semantickitti_voxel_ms.py:189-212).
    """

    frame: VoxelSample
    fused: VoxelSample
    num_frame_points: int


class MsVoxelPipeline:
    """Coupled transform for (frame, fused) pairs: identical aug params on
    both clouds (reference aug_points_ms, seg_utils.py:102-200), clamp the
    fused cloud to the frame's min bounds so both share a quantization
    origin (semantickitti_voxel_ms.py:121-130), then dual quantization."""

    def __init__(
        self,
        voxel_size: float = 0.05,
        *,
        training: bool = True,
        if_flip=True, if_scale=True, scale_range=(0.9, 1.1),
        if_jitter=True, if_rotate=True,
        in_feature_dim: int = 5,
        seed: int = 0,
    ):
        self.voxel_size = voxel_size
        self.training = training
        self.aug_flags = dict(
            if_flip=if_flip, if_scale=if_scale, scale_range=scale_range,
            if_jitter=if_jitter, if_rotate=if_rotate,
        )
        self.in_feature_dim = in_feature_dim
        self.rng = np.random.default_rng(seed)

    def _quantize(self, pts, labels, origin) -> VoxelSample:
        vox = np.round(pts[:, :3] / self.voxel_size).astype(np.int32) - origin
        _, index, inverse = sparse_quantize(
            vox, return_index=True, return_inverse=True
        )
        return VoxelSample(
            coords=vox[index],
            feats=pts[index],
            labels=labels[index],
            inverse_map=inverse.astype(np.int32),
            raw_labels=labels,
            num_raw_points=len(pts),
            name="",
        )

    def __call__(
        self, sample: dict, aug: Optional[AugParams] = None
    ) -> MsVoxelSample:
        pts = sample["xyzret"][:, :4].astype(np.float32)
        pts_ms = sample["xyzret_ms"][:, : self.in_feature_dim].astype(np.float32)
        labels = np.asarray(sample["labels"]).reshape(-1).astype(np.int32)
        labels_ms = np.asarray(sample["labels_ms"]).reshape(-1).astype(np.int32)

        if self.training:
            aug = aug or AugParams.sample(self.rng, **self.aug_flags)
        if aug is not None:
            pts = pts.copy()
            pts_ms = pts_ms.copy()
            pts[:, :3] = aug.apply(pts[:, :3])
            pts_ms[:, :3] = aug.apply(pts_ms[:, :3])

        # clamp fused cloud to the frame's min bounds (shared quant origin)
        mn = pts[:, :3].min(0)
        keep = (pts_ms[:, :3] >= mn).all(1)
        pts_ms, labels_ms = pts_ms[keep], labels_ms[keep]

        vox_ms = np.round(pts_ms[:, :3] / self.voxel_size).astype(np.int32)
        origin = vox_ms.min(0, keepdims=True)
        frame = self._quantize(pts, labels, origin)
        fused = self._quantize(pts_ms, labels_ms, origin)
        frame.name = fused.name = sample.get("path", "")
        # current-frame rows lead the fused cloud and always survive the
        # clamp (they define the min bound); the count equals the frame size
        return MsVoxelSample(
            frame=frame, fused=fused, num_frame_points=len(pts)
        )


def collate_shard(
    samples: list[VoxelSample], point_capacity: int
) -> dict:
    """Collate scans of one data-parallel shard: concat with a batch-index
    column, pad to `point_capacity`.  Returns host numpy arrays plus the
    eval-side metadata the device never needs."""
    total = sum(len(s.coords) for s in samples)
    if total > point_capacity:
        raise ValueError(
            f"shard holds {total} voxels > capacity {point_capacity}; raise "
            f"DATA.NUM_POINTS or lower the per-shard batch size"
        )
    coords = np.zeros((point_capacity, 4), np.float32)
    feats_dim = samples[0].feats.shape[1]
    feats = np.zeros((point_capacity, feats_dim), np.float32)
    labels = np.zeros((point_capacity,), np.int32)
    offsets = [0]
    cursor = 0
    for b, s in enumerate(samples):
        n = len(s.coords)
        coords[cursor : cursor + n, :3] = s.coords
        coords[cursor : cursor + n, 3] = b
        feats[cursor : cursor + n] = s.feats
        labels[cursor : cursor + n] = s.labels
        cursor += n
        offsets.append(cursor)
    return {
        "point_coords": coords,
        "point_feats": feats,
        "labels": labels,
        "num_points": np.array([cursor], np.int32),
        "offsets": np.array(offsets, np.int32),
        "samples": samples,
    }


def collate_batch(
    shards: list[list[VoxelSample]], point_capacity: int
) -> tuple[dict, list]:
    """Stack per-shard collations into (R, ...) arrays for `parallel.Batch`.

    Returns (arrays dict, per-shard metadata list)."""
    per = [collate_shard(s, point_capacity) for s in shards]
    arrays = {
        k: np.stack([p[k] for p in per])
        for k in ("point_coords", "point_feats", "labels", "num_points")
    }
    meta = [
        {"offsets": p["offsets"], "samples": p["samples"]} for p in per
    ]
    return arrays, meta
