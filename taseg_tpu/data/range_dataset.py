"""Range-view dataset pipeline + augmentations (host side).

Capability match of the reference range-view dataset
(`semantickitti_rv.py:15-360`): 6-channel input images
[x/50, y/50, z/3, intensity, range/80, mask], per-pixel train-id labels,
and the Range* augmentation family:

  * RangeShift — circular column roll at a random split (sample_transform,
    rv.py:304-330);
  * RangePaste — copy rare-class pixels from a second scan (rv.py:210-281,
    the 11 repeated class blocks parameterized into one list);
  * RangeUnion — fill empty pixels from a second scan (rv.py:197-207);
  * RangeMix — swap horizontal/vertical strips between two scans (the
    MixTeacher grid strategies, rv.py:360+, expressed as (rows, cols)
    grid partitions).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .semantickitti.laserscan import project_labels, project_scan

# rare/thing classes receiving RangePaste (train ids; reference rv.py:215-280)
RANGE_PASTE_CLASSES = (2, 3, 4, 5, 6, 7, 8, 12, 16, 18, 19)
# the reference MixTeacher 'mixtureV2' strategy grid — 17 col x row
# combinations (semantickitti_rv.py:388); (rows, cols) per entry
RANGE_MIX_GRIDS = (
    (3, 1), (4, 1), (5, 1), (6, 1),
    (3, 2), (4, 2), (5, 2), (6, 2),
    (3, 3), (4, 3), (5, 3), (6, 3),
    (3, 4), (4, 4), (5, 4), (6, 4),
    (4, 6),
)


def range_shift(scan, label, mask, split: int):
    roll = lambda a: np.concatenate([a[:, split:], a[:, :split]], axis=1)
    return roll(scan), roll(label), roll(mask)


def range_paste(scan, label, mask, scan_b, label_b, mask_b, min_pixels=20):
    out_s, out_l, out_m = scan.copy(), label.copy(), mask.copy()
    for cls in RANGE_PASTE_CLASSES:
        pix = label_b == cls
        if pix.sum() > min_pixels:
            out_s[pix] = scan_b[pix]
            out_l[pix] = label_b[pix]
            out_m[pix] = mask_b[pix]
    return out_s, out_l, out_m


def range_union(scan, label, mask, scan_b, label_b, mask_b):
    empty = mask == 0
    out_s, out_l, out_m = scan.copy(), label.copy(), mask.copy()
    out_s[empty] = scan_b[empty]
    out_l[empty] = label_b[empty]
    out_m[empty] = mask_b[empty]
    return out_s, out_l, out_m


def range_mix(scan, label, mask, scan_b, label_b, mask_b, rows: int,
              cols: int):
    """Swap alternating grid cells between scans (strip MixTeacher).

    Returns BOTH mixed complements — (A-major, B-major) — like the
    reference MixTeacher (`semantickitti_rv.py:368-380` hands back
    img_aux1 AND img_aux2; the dataset then keeps one at random,
    rv.py:170-175).  Each complement is an (scan, label, mask) triple.
    """
    h, w = label.shape
    a = (scan.copy(), label.copy(), mask.copy())
    b = (scan_b.copy(), label_b.copy(), mask_b.copy())
    src_a = (scan, label, mask)
    src_b = (scan_b, label_b, mask_b)
    r_edges = np.linspace(0, h, rows + 1).astype(int)
    c_edges = np.linspace(0, w, cols + 1).astype(int)
    for i in range(rows):
        for j in range(cols):
            if (i + j) % 2 == 1:
                rs, re = r_edges[i], r_edges[i + 1]
                cs, ce = c_edges[j], c_edges[j + 1]
                for out, src in zip(a, src_b):
                    out[rs:re, cs:ce] = src[rs:re, cs:ce]
                for out, src in zip(b, src_a):
                    out[rs:re, cs:ce] = src[rs:re, cs:ce]
    return a, b


@dataclass
class RangeSample:
    scan: np.ndarray  # (H, W, 6) float32
    label: np.ndarray  # (H, W) int32
    mask: np.ndarray  # (H, W) float32
    # per-point info for back-projection / KNN post-processing
    proj_x: np.ndarray
    proj_y: np.ndarray
    unproj_range: np.ndarray
    point_labels: np.ndarray
    name: str


class RangeViewPipeline:
    def __init__(
        self,
        h: int = 64,
        w: int = 2048,
        *,
        training: bool = True,
        fov_up: float = 3.0,
        fov_down: float = -25.0,
        if_shift=True, if_mix=True, if_paste=True, if_union=True,
        seed: int = 0,
    ):
        self.h, self.w = h, w
        self.fov_up, self.fov_down = fov_up, fov_down
        self.training = training
        self.if_shift, self.if_mix = if_shift, if_mix
        self.if_paste, self.if_union = if_paste, if_union
        self.rng = np.random.default_rng(seed)

    def _project(self, sample: dict):
        pts = sample["xyzret"]
        labels = np.asarray(sample["labels"]).reshape(-1)
        proj = project_scan(
            pts[:, :3], pts[:, 3], h=self.h, w=self.w,
            fov_up_deg=self.fov_up, fov_down_deg=self.fov_down,
        )
        label_img = project_labels(proj, labels)
        scan = np.concatenate(
            [
                proj.xyz / np.array([50.0, 50.0, 3.0], np.float32),
                proj.remission[..., None],
                proj.range_img[..., None] / 80.0,
                proj.mask[..., None],
            ],
            axis=-1,
        ).astype(np.float32)
        return scan, label_img, proj

    def __call__(self, sample: dict, sample_b: dict | None = None) -> RangeSample:
        scan, label, proj = self._project(sample)
        mask = proj.mask
        if self.training:
            if self.if_shift and self.rng.random() < 0.5:
                lo = min(100, self.w // 4)
                split = int(self.rng.integers(lo, max(self.w - lo, lo + 1)))
                scan, label, mask = range_shift(scan, label, mask, split)
            if sample_b is not None and (self.if_mix or self.if_paste or self.if_union):
                scan_b, label_b, proj_b = self._project(sample_b)
                mask_b = proj_b.mask
                if self.if_mix and self.rng.random() < 0.5:
                    rows, cols = RANGE_MIX_GRIDS[
                        self.rng.integers(0, len(RANGE_MIX_GRIDS))
                    ]
                    mix_a, mix_b = range_mix(
                        scan, label, mask, scan_b, label_b, mask_b,
                        rows, cols,
                    )
                    # keep one complement at random (rv.py:170-175)
                    scan, label, mask = (
                        mix_a if self.rng.random() < 0.5 else mix_b
                    )
                if self.if_paste and self.rng.random() < 0.5:
                    scan, label, mask = range_paste(
                        scan, label, mask, scan_b, label_b, mask_b
                    )
                if self.if_union and self.rng.random() < 0.5:
                    scan, label, mask = range_union(
                        scan, label, mask, scan_b, label_b, mask_b
                    )
        return RangeSample(
            scan=scan, label=label.astype(np.int32), mask=mask,
            proj_x=proj.proj_x, proj_y=proj.proj_y,
            unproj_range=proj.unproj_range,
            point_labels=np.asarray(sample["labels"]).reshape(-1),
            name=sample.get("path", ""),
        )


def collate_range_batch(shards: list[list[RangeSample]]):
    """Stack to (R, B, H, W, C) NHWC images + (R, B, H, W) labels/masks."""
    arrays = {
        "scan": np.stack(
            [np.stack([s.scan for s in shard]) for shard in shards]
        ),
        "label": np.stack(
            [np.stack([s.label for s in shard]) for shard in shards]
        ),
        "mask": np.stack(
            [np.stack([s.mask for s in shard]) for shard in shards]
        ),
    }
    meta = [{"samples": shard} for shard in shards]
    return arrays, meta
