"""fit_capacities CLI: measured schedule on the synthetic dataset
(VERDICT r3 #8 — fit-then-train flow, docs/RECIPES.md)."""

import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow

ROOT = Path(__file__).parent.parent


def test_fit_capacities_synthetic():
    out = subprocess.run(
        [
            sys.executable, "tools/scripts/fit_capacities.py",
            "--cfg_file", "tools/cfgs/voxel/synthetic/minkunet_tiny.yaml",
            "--samples", "6", "--margin", "1.2",
        ],
        cwd=ROOT, capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr
    lines = out.stdout.splitlines()
    sched_line = next(
        l for l in lines if l.strip().startswith("CAPACITY_SCHEDULE:")
    )
    sched = eval(sched_line.split(":", 1)[1].strip())  # plain list literal
    assert len(sched) == 5
    # monotone non-increasing fractions in (0, 1]
    assert all(0 < s <= 1.0 for s in sched)
    assert all(a >= b for a, b in zip(sched, sched[1:]))
    # level 0 cannot exceed the point capacity
    assert sched[0] == 1.0 or sched[0] < 1.0
    counts_line = next(l for l in lines if "max per-level" in l)
    counts = eval(counts_line.split(":", 1)[1].strip())
    assert all(a >= b for a, b in zip(counts, counts[1:]))
    assert counts[0] > 0
