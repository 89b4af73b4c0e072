#!/usr/bin/env python
"""Benchmark: end-to-end MinkUNet scans/sec/chip (voxelize -> sparse UNet ->
per-point head), the BASELINE.json north-star metric (target >= 50).

Runs the flagship single-frame config (MinkUNet mk34 cr1.0 ResBlock,
SemanticKITTI-scale synthetic scans, ~119k voxels/scan at 0.05 m) in
bfloat16 inference on one chip, batched to amortize per-batch topology
sorts, and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

BASELINE_SCANS_PER_SEC = 50.0  # BASELINE.json north_star
# larger batches amortize per-call dispatch + fixed per-level costs; the
# persistent compile cache makes the bigger-sort executables a one-time
# cost (override with TASEG_BENCH_BATCH)
BATCH_SCANS = int(os.environ.get("TASEG_BENCH_BATCH", "1"))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from taseg_tpu.models import MinkUNet, UNetCapacities, build_unet_topology
    from taseg_tpu.models.voxel.minkunet import unet_select_gps
    from taseg_tpu.ops import PointSet
    from taseg_tpu.data.synthetic import synthetic_scan
    from taseg_tpu.data.voxel_dataset import VoxelPipeline, collate_shard

    # one shard holding BATCH_SCANS collated scans
    pipe = VoxelPipeline(voxel_size=0.05, training=False)
    rng = np.random.default_rng(0)
    samples = []
    for _ in range(BATCH_SCANS):
        pts, labels = synthetic_scan(rng, 120_000)
        ring = np.zeros((len(pts), 1), np.float32)
        samples.append(
            pipe({"xyzret": np.concatenate([pts, ring], 1), "labels": labels})
        )
    cap = 131072 * BATCH_SCANS
    arrays = collate_shard(samples, cap)

    caps = UNetCapacities.for_points(cap)
    model = MinkUNet(
        num_classes=20, cr=1.0, block="ResBlock", compute_dtype="bfloat16"
    )

    coords = jnp.asarray(arrays["point_coords"])
    feats = jnp.asarray(arrays["point_feats"])
    num = jnp.asarray(arrays["num_points"][0])
    points = PointSet(coords=coords, feats=feats, num=num)
    # NOTE: the Pallas selection-conv path (select_gps=unet_select_gps(...))
    # is numerically exact and ~1.6x faster per conv than the XLA gather
    # path, but realistic scans leave ~0.4% of rulebook entries beyond its
    # (dual, predicated) selection windows, and the exact dense fixup those
    # entries trigger costs more than the kernel saves on this device.
    # Until the residual fixup is scatter-free it stays opt-in.
    sel_gps = ()
    topo = build_unet_topology(coords, num, caps)
    params = jax.jit(
        lambda c, f, n: model.init(
            {"params": jax.random.PRNGKey(0)},
            PointSet(coords=c, feats=f, num=n),
            build_unet_topology(c, n, caps),
            False,
        )
    )(coords, feats, num)

    @jax.jit
    def fwd(params, coords, feats, num):
        pts = PointSet(coords=coords, feats=feats, num=num)
        # inference: skip devox backward pair tables; build selection-kernel
        # tables so 3^3 convs run the Pallas resident-window path
        topo = build_unet_topology(
            coords, num, caps, devox_pairs=False, select_gps=sel_gps
        )
        return model.apply(params, pts, topo, False)

    out = fwd(params, coords, feats, num)
    out.block_until_ready()  # compile

    n_iter = 20
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = fwd(params, coords, feats, num)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    scans_per_sec = n_iter * BATCH_SCANS / dt
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
