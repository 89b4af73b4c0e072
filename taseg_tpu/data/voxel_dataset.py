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
    # optional benchmark identity (nuScenes sample_data token); None for
    # path-addressed datasets like SemanticKITTI
    token: str = None


class VoxelPipeline:
    """Stateless per-scan transform: reader dict -> VoxelSample."""

    # samples come out key-sorted (z, x, y) per scan, so shards collated
    # from this pipeline can run the level-0 unique's assume_sorted fast
    # path (engine passes assume_sorted_points to build_unet_topology)
    sorted_points = True

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
        # emit the deduped rows in (z, x, y) lexicographic order — the
        # device key order (ops/coords.py pack_keys: batch-major, then
        # z, x, y).  Shards collated scan-by-scan are then globally
        # key-sorted, and the level-0 unique runs its assume_sorted fast
        # path (ops/join.py), skipping the big main sort + inverse
        # back-sort on device.  `inverse_map` is composed with the sort
        # so raw-point mapping is unchanged.
        cd = vox[index]
        order = np.lexsort((cd[:, 1], cd[:, 0], cd[:, 2])).astype(np.int32)
        rank = np.empty_like(order)
        rank[order] = np.arange(len(order), dtype=np.int32)
        return VoxelSample(
            coords=cd[order],
            feats=pts[index][order],
            labels=labels[index][order],
            inverse_map=rank[inverse].astype(np.int32),
            raw_labels=labels,
            num_raw_points=len(pts),
            name=sample.get("path", ""),
            token=sample.get("token"),
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
        frame.token = fused.token = sample.get("token")
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


@dataclass
class KdVoxelSample:
    """Student (pseudo-mask) + teacher (GT-mask) fused clouds plus the
    host-computed coordinate-matched distillation pairs."""

    student: MsVoxelSample
    teacher: VoxelSample
    pair_student: np.ndarray  # (K,) rows into the student fused sample
    pair_teacher: np.ndarray  # (K,) matching rows in the teacher sample


class MsKdVoxelPipeline(MsVoxelPipeline):
    """KD-stage pipeline: coupled aug over frame / student-fused /
    teacher-fused clouds, dual quantization with a shared origin, and
    host-side voxel alignment (replacing the reference's on-device
    sphashquery, minkunet_ms_kd.py:613-615) sampled to <= max_voxel pairs.
    """

    def __init__(self, *args, max_voxel: int = 3000, **kw):
        super().__init__(*args, **kw)
        self.max_voxel = max_voxel

    def __call__(self, sample: dict, aug: Optional[AugParams] = None):
        pts = sample["xyzret"][:, :4].astype(np.float32)
        pts_ms = sample["xyzret_ms"][:, : self.in_feature_dim].astype(np.float32)
        pts_gt = sample["xyzret_ms_gt"][:, : self.in_feature_dim].astype(
            np.float32
        )
        labels = np.asarray(sample["labels"]).reshape(-1).astype(np.int32)
        labels_ms = np.asarray(sample["labels_ms"]).reshape(-1).astype(np.int32)
        labels_gt = np.asarray(sample["labels_ms_gt"]).reshape(-1).astype(
            np.int32
        )

        if self.training:
            aug = aug or AugParams.sample(self.rng, **self.aug_flags)
        if aug is not None:
            pts, pts_ms, pts_gt = pts.copy(), pts_ms.copy(), pts_gt.copy()
            pts[:, :3] = aug.apply(pts[:, :3])
            pts_ms[:, :3] = aug.apply(pts_ms[:, :3])
            pts_gt[:, :3] = aug.apply(pts_gt[:, :3])

        mn = pts[:, :3].min(0)
        keep = (pts_ms[:, :3] >= mn).all(1)
        pts_ms, labels_ms = pts_ms[keep], labels_ms[keep]
        keep_gt = (pts_gt[:, :3] >= mn).all(1)
        pts_gt, labels_gt = pts_gt[keep_gt], labels_gt[keep_gt]

        vox_ms = np.round(pts_ms[:, :3] / self.voxel_size).astype(np.int32)
        origin = np.minimum(
            vox_ms.min(0, keepdims=True),
            np.round(pts_gt[:, :3] / self.voxel_size).astype(np.int32).min(
                0, keepdims=True
            ),
        )
        frame = self._quantize(pts, labels, origin)
        fused = self._quantize(pts_ms, labels_ms, origin)
        teacher = self._quantize(pts_gt, labels_gt, origin)
        frame.name = fused.name = teacher.name = sample.get("path", "")
        frame.token = fused.token = teacher.token = sample.get("token")
        student = MsVoxelSample(
            frame=frame, fused=fused, num_frame_points=len(pts)
        )

        # host-side voxel alignment: match student voxel coords in the
        # teacher voxel set, then sample <= max_voxel pairs
        t_lut = {tuple(c): i for i, c in enumerate(teacher.coords)}
        s_idx, t_idx = [], []
        for i, c in enumerate(fused.coords):
            j = t_lut.get(tuple(c))
            if j is not None:
                s_idx.append(i)
                t_idx.append(j)
        s_idx = np.asarray(s_idx, np.int32)
        t_idx = np.asarray(t_idx, np.int32)
        if len(s_idx) > self.max_voxel:
            pick = self.rng.permutation(len(s_idx))[: self.max_voxel]
            s_idx, t_idx = s_idx[pick], t_idx[pick]
        return KdVoxelSample(
            student=student, teacher=teacher,
            pair_student=s_idx, pair_teacher=t_idx,
        )


def collate_kd_batch(
    shards: list[list[KdVoxelSample]],
    point_capacity: int,
    teacher_capacity: int,
    max_voxel: int,
) -> tuple[dict, list]:
    """Collate KD samples: student + teacher Batch arrays plus padded
    per-shard distillation pair tables (row indices offset per sample)."""
    student_shards = [[k.student.fused for k in shard] for shard in shards]
    teacher_shards = [[k.teacher for k in shard] for shard in shards]
    for sh in shards:
        for k in sh:
            k.student.fused.ms_pair = k.student
    s_arrays, s_meta = collate_batch(student_shards, point_capacity)
    t_arrays, t_meta = collate_batch(teacher_shards, teacher_capacity)

    cap_pairs = max_voxel * max(len(s) for s in shards)
    r = len(shards)
    ps = np.zeros((r, cap_pairs), np.int32)
    pt = np.zeros((r, cap_pairs), np.int32)
    pm = np.zeros((r, cap_pairs), bool)
    for ri, shard in enumerate(shards):
        cur = 0
        s_off = s_meta[ri]["offsets"]
        t_off = t_meta[ri]["offsets"]
        for b, k in enumerate(shard):
            n = len(k.pair_student)
            ps[ri, cur: cur + n] = k.pair_student + s_off[b]
            pt[ri, cur: cur + n] = k.pair_teacher + t_off[b]
            pm[ri, cur: cur + n] = True
            cur += n
    arrays = {
        "student": s_arrays,
        "teacher": t_arrays,
        "kd_student_idx": ps,
        "kd_teacher_idx": pt,
        "kd_mask": pm,
    }
    return arrays, s_meta
