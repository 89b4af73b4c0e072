#!/usr/bin/env python
"""Generate semi-supervised split lists (1/10/20/50 percent of frames).

The reference ships precomputed lists under `pcseg/data/split/
{semantickitti,nuscenes,scribblekitti}/` for its semi-supervised
experiments; this tool regenerates equivalent uniform-random splits from
a dataset root (seeded, so lists are reproducible) instead of vendoring
the exact files.

Usage:
  python tools/scripts/make_semi_splits.py --data_path .../sequences \
      --out taseg_tpu/data/split/semantickitti [--seed 0]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

TRAIN_SEQS = ["00", "01", "02", "03", "04", "05", "06", "07", "09", "10"]
FRACTIONS = {"1": 0.01, "10": 0.10, "20": 0.20, "50": 0.50}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_path", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    root = Path(args.data_path)
    frames = []
    for seq in TRAIN_SEQS:
        vel = root / seq / "velodyne"
        if not vel.is_dir():
            continue
        frames += [f"{seq}/velodyne/{f.name}" for f in sorted(vel.glob("*.bin"))]
    if not frames:
        raise SystemExit(f"no frames under {root}")

    rng = np.random.default_rng(args.seed)
    order = rng.permutation(len(frames))
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    for name, frac in FRACTIONS.items():
        k = max(1, int(len(frames) * frac))
        chosen = sorted(frames[i] for i in order[:k])
        labeled = out / f"semantickitti_{name}pct_labeled.txt"
        unlabeled = out / f"semantickitti_{name}pct_unlabeled.txt"
        labeled.write_text("\n".join(chosen) + "\n")
        rest = sorted(set(frames) - set(chosen))
        unlabeled.write_text("\n".join(rest) + "\n")
        print(f"{name}%: {k} labeled / {len(rest)} unlabeled")


if __name__ == "__main__":
    main()
