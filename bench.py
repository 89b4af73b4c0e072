#!/usr/bin/env python
"""Benchmark: end-to-end MinkUNet scans/sec/chip (voxelize -> sparse UNet ->
per-point head), the BASELINE.json north-star metric (target >= 50).

Runs the flagship single-frame config (MinkUNet mk34 cr1.0, SemanticKITTI-
scale synthetic scans, ~100k voxels/scan at 0.05 m) in inference mode on
one chip and prints one JSON line.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_SCANS_PER_SEC = 50.0  # BASELINE.json north_star


def main():
    import jax
    import jax.numpy as jnp

    from taseg_tpu.models import MinkUNet, UNetCapacities, build_unet_topology
    from taseg_tpu.ops import PointSet
    from __graft_entry__ import _example_batch

    cap = 131072
    batch_scans = 1
    arrays = _example_batch(1, cap, n_raw=120_000)
    caps = UNetCapacities.for_points(cap)
    model = MinkUNet(num_classes=20, cr=1.0, block="ResBlock")

    coords = jnp.asarray(arrays["point_coords"][0])
    feats = jnp.asarray(arrays["point_feats"][0])
    num = jnp.asarray(arrays["num_points"][0, 0])
    points = PointSet(coords=coords, feats=feats, num=num)
    topo = build_unet_topology(coords, num, caps)
    params = model.init({"params": jax.random.PRNGKey(0)}, points, topo, False)

    @jax.jit
    def fwd(params, coords, feats, num):
        pts = PointSet(coords=coords, feats=feats, num=num)
        topo = build_unet_topology(coords, num, caps)
        return model.apply(params, pts, topo, False)

    out = fwd(params, coords, feats, num)
    out.block_until_ready()  # compile

    n_iter = 20
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = fwd(params, coords, feats, num)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    scans_per_sec = n_iter * batch_scans / dt
    print(
        json.dumps(
            {
                "metric": "minkunet_cr10_infer_scans_per_sec_per_chip",
                "value": round(scans_per_sec, 3),
                "unit": "scans/s",
                "vs_baseline": round(scans_per_sec / BASELINE_SCANS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
