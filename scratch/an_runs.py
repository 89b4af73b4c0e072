"""Drift-run structure of rulebooks: for each (offset k, output tile),
how many runs of constant drift (rb[k,v] - v) are there, and what window
width [min rb, max rb] - tile covers the matches?  Decides the run-select
kernel's MAXD and window widths."""

import os

os.environ.pop("JAX_PLATFORMS", None)
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp

from taseg_tpu.models import UNetCapacities, build_unet_topology
from taseg_tpu.data.synthetic import synthetic_scan
from taseg_tpu.data.voxel_dataset import VoxelPipeline, collate_shard

TILE = 256

pipe = VoxelPipeline(voxel_size=0.05, training=False)
rng = np.random.default_rng(0)
pts, labels = synthetic_scan(rng, 120_000)
ring = np.zeros((len(pts), 1), np.float32)
s = pipe({"xyzret": np.concatenate([pts, ring], 1), "labels": labels})
arrays = collate_shard([s], 131072)
caps = UNetCapacities.for_points(131072)
topo = build_unet_topology(
    jnp.asarray(arrays["point_coords"]),
    jnp.asarray(arrays["num_points"][0]),
    caps,
    devox_pairs=False,
)


def an(rb, v_out, name):
    k, V = rb.shape
    n_tiles = V // TILE
    rbt = rb.reshape(k, n_tiles, TILE)
    v_idx = np.arange(V).reshape(n_tiles, TILE)
    drift = rbt - v_idx[None]
    valid = rbt >= 0
    runs = np.zeros((k, n_tiles), np.int64)
    spread = np.zeros((k, n_tiles), np.int64)
    distinct = np.zeros((k, n_tiles), np.int64)
    for kk in range(k):
        for t in range(n_tiles):
            m = valid[kk, t]
            if not m.any():
                continue
            d = drift[kk, t][m]
            runs[kk, t] = 1 + int((d[1:] != d[:-1]).sum())
            distinct[kk, t] = len(np.unique(d))
            r = rbt[kk, t][m]
            spread[kk, t] = r.max() - r.min()
    occupied = valid.any(-1)
    rr = runs[occupied]
    dd = distinct[occupied]
    ss = spread[occupied]
    print(
        f"{name}: V={v_out} tiles={n_tiles} occ_pairs={occupied.sum()}"
        f"  runs p50={np.percentile(rr,50):.0f} p90={np.percentile(rr,90):.0f}"
        f" p99={np.percentile(rr,99):.0f} max={rr.max()}"
        f"  distinct p50={np.percentile(dd,50):.0f}"
        f" p90={np.percentile(dd,90):.0f} p99={np.percentile(dd,99):.0f}"
        f" max={dd.max()}"
        f"  spread p50={np.percentile(ss,50):.0f}"
        f" p90={np.percentile(ss,90):.0f} p99={np.percentile(ss,99):.0f}"
        f" max={ss.max()}"
    )


for l, lt in enumerate(topo.levels):
    v = int(lt.num)
    an(np.asarray(lt.rb_k3), v, f"L{l} k3 (num={v})")

# band analysis: per (dx band of 9 offsets, tile), window covering ALL
# 9 offsets' matches
print("\nper-band (9 offsets sharing dx) window spreads:")
for l, lt in enumerate(topo.levels):
    v = int(lt.num)
    rb = np.asarray(lt.rb_k3)
    K, V = rb.shape
    n_tiles = V // TILE
    rbt = rb.reshape(K, n_tiles, TILE)
    for band in range(3):
        sub = rbt[band * 9 : band * 9 + 9]  # (9, n_tiles, TILE)
        valid = sub >= 0
        occ = valid.any((0, 2))
        big = np.where(valid, sub, -1).max((0, 2))
        small = np.where(valid, sub, 2**30).min((0, 2))
        sp = (big - small)[occ]
        if len(sp) == 0:
            continue
        print(
            f"  L{l} band{band}: tiles_occ={occ.sum()}/{n_tiles}"
            f" spread p50={np.percentile(sp,50):.0f}"
            f" p90={np.percentile(sp,90):.0f} p99={np.percentile(sp,99):.0f}"
            f" max={sp.max()}"
        )
