#!/usr/bin/env python
"""Fit per-level voxel capacities to a real dataset (VERDICT r3 #8).

The static-shape engine pads every stride level to a fixed row capacity
(`UNetCapacities`); the default schedule is fitted to synthetic raycast
occupancy, and a badly-sized schedule either wastes gather/sort/matmul
rows (too big) or drops voxels (too small — surfaced as overflow
telemetry, engine.py `_check_capacity`).  This tool replaces guessing:
it streams scans through the SAME host pipeline the trainer uses,
measures the true per-level unique-voxel counts, and emits a
`MODEL.CAPACITY_SCHEDULE` block sized max-observed x margin (256-aligned,
as `UNetCapacities.for_points` will re-align it).

The reference never needs this — its tensors are exactly sized per step
(dynamic shapes); this is the static-shape analogue.

Usage:
    python tools/scripts/fit_capacities.py --cfg_file tools/cfgs/...yaml \
        [--samples 64] [--margin 1.15] [--set DATA.ROOT ...]

Prints the fitted YAML block and, if the config already carries a
schedule, an overflow/waste report against it.  Host-only (numpy): no
chip, no jit.
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

# host-only tool: never touch the TPU tunnel
os.environ.setdefault("JAX_PLATFORMS", "cpu")

from taseg_tpu.data import build_dataloader  # noqa: E402
from taseg_tpu.models import UNetCapacities  # noqa: E402
from taseg_tpu.utils.config import apply_overrides, load_config  # noqa: E402


def level_counts(coords: np.ndarray, num: int, n_levels: int) -> list[int]:
    """Unique-voxel count at strides 1, 2, ..., 2^(n_levels-1) for one
    shard's quantized (P, 4) coords — floor-division downsampling, exactly
    the engine's parent relation (ops.rulebook.spdownsample)."""
    c = np.asarray(coords[: int(num), :4], np.int64)
    out = []
    for l in range(n_levels):
        cl = np.concatenate([c[:, :3] >> l if l else c[:, :3], c[:, 3:]], 1)
        out.append(len(np.unique(cl, axis=0)))
    return out


def main():
    p = argparse.ArgumentParser(description="fit CAPACITY_SCHEDULE")
    p.add_argument("--cfg_file", required=True)
    p.add_argument("--samples", type=int, default=64,
                   help="scans to measure (train + val interleaved)")
    p.add_argument("--margin", type=float, default=1.15,
                   help="headroom over the max observed count")
    p.add_argument("--levels", type=int, default=5)
    p.add_argument("--set", dest="set_cfgs", nargs=argparse.REMAINDER,
                   default=[])
    args = p.parse_args()

    cfg = load_config(args.cfg_file)
    if args.set_cfgs:
        cfg = apply_overrides(cfg, args.set_cfgs)
    modality = str(cfg.get("MODALITY", "voxel"))
    if modality == "range":
        p.error("range models carry no voxel capacities; nothing to fit")
    pipeline_kind = (
        "cylinder" if cfg.MODEL["NAME"] == "Cylinder_TS"
        else "fusion" if cfg.MODEL["NAME"] == "RPVNet"
        else None
    )

    maxima = np.zeros(args.levels, np.int64)
    seen = 0
    points_cap = None
    for training in (True, False):
        loader = build_dataloader(
            cfg.DATA, training=training, n_shards=1, scans_per_shard=1,
            modality=modality, pipeline_kind=pipeline_kind,
        )
        points_cap = loader.point_capacity
        budget = args.samples // 2 if training else args.samples - seen
        taken = 0
        for arrays, _meta in loader:
            pc = np.asarray(arrays["point_coords"])
            nums = np.asarray(arrays["num_points"]).reshape(-1)
            for r in range(pc.shape[0]):
                counts = level_counts(pc[r], nums[r], args.levels)
                maxima = np.maximum(maxima, counts)
                seen += 1
                taken += 1
                if taken >= budget:
                    break
            if taken >= budget:
                break

    fitted = UNetCapacities.fit(points_cap, maxima.tolist(),
                                margin=args.margin)
    schedule = [
        round(min(1.0, v / points_cap), 4) for v in fitted.voxels
    ]
    print(f"# measured {seen} scans, point capacity {points_cap}")
    print(f"# max per-level voxel counts: {maxima.tolist()}")
    print(f"# fitted capacities (x{args.margin}, 256-aligned): "
          f"{list(fitted.voxels)}")
    print("MODEL:")
    print(f"  CAPACITY_SCHEDULE: {schedule}")

    current = cfg.MODEL.get("CAPACITY_SCHEDULE")
    if current is not None:
        cur = UNetCapacities.for_points(
            points_cap, num_levels=args.levels, schedule=list(current)
        )
        for l, (cap, mx) in enumerate(zip(cur.voxels, maxima)):
            if mx > cap:
                print(f"# OVERFLOW RISK level {l}: config capacity {cap} "
                      f"< observed max {mx}", file=sys.stderr)
            elif cap > max(512, int(mx * args.margin * 1.5)):
                print(f"# level {l}: config capacity {cap} is "
                      f"{cap / max(mx, 1):.1f}x the observed max {mx} — "
                      f"padding waste", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
