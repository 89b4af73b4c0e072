"""Window-spread statistics of the f3 gather plan on real topology.

For a block of B consecutive output voxels, a streaming window kernel
DMAs rows [min st, min st + W) per (dx, dz) group and selects locally via
a one-hot MXU matmul (FLOPs scale with W).  This measures, per level and
group, the distribution of per-block (max-min) present-st spread on the
synthetic scan — i.e. the W the kernel would need, and the fraction of
blocks exceeding candidate W values (those would take a fallback path).

Runs on CPU (topology only, no chip contention).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax
import jax.numpy as jnp

from taseg_tpu.data.synthetic import synthetic_scan
from taseg_tpu.data.voxel_dataset import VoxelPipeline, collate_shard
from taseg_tpu.models import UNetCapacities, build_unet_topology


def main():
    pipe = VoxelPipeline(voxel_size=0.05, training=False)
    rng = np.random.default_rng(0)
    pts, labels = synthetic_scan(rng, 120000)
    ring = np.zeros((len(pts), 1), np.float32)
    sample = pipe({"xyzret": np.concatenate([pts, ring], 1), "labels": labels})
    arrays = collate_shard([sample], 131072)
    coords = jnp.asarray(arrays["point_coords"])
    num = jnp.asarray(arrays["num_points"][0])
    caps = UNetCapacities.for_points(131072)
    topo = jax.jit(
        lambda c, n: build_unet_topology(c, n, caps, devox_pairs=False)
    )(coords, num)
    level_nums = [int(np.asarray(lt.num)) for lt in topo.levels]
    caps = UNetCapacities.fit(131072, level_nums, margin=1.1)
    topo = jax.jit(
        lambda c, n: build_unet_topology(c, n, caps, devox_pairs=False)
    )(coords, num)

    B = int(os.environ.get("B", "256"))
    for l, lt in enumerate(topo.levels):
        rb = np.asarray(lt.rb_k3)
        v = rb.shape[1]
        nvalid = int(np.asarray(lt.num))
        print(f"level {l}: V={v} valid={nvalid}")
        for g in range(9):
            km = divmod(g, 3)[0] * 9 + divmod(g, 3)[1]
            cols = rb[[km, km + 3, km + 6]]  # (3, V)
            present = cols >= 0
            mn = np.where(present, cols, 1 << 30).min(0)
            nb = (v + B - 1) // B
            pad = nb * B - v
            mnp = np.concatenate([mn, np.full(pad, 1 << 30)])
            blocks = mnp.reshape(nb, B)
            bmin = blocks.min(1)
            # max over present rows only
            mxp = np.concatenate(
                [np.where(present.any(0), cols.max(0), -1), np.full(pad, -1)]
            ).reshape(nb, B)
            bmax = mxp.max(1)
            has = (bmax >= 0) & (bmin < (1 << 30))
            spread = np.where(has, bmax - bmin + 1, 0)
            qs = np.percentile(spread[has], [50, 90, 99, 100]) if has.any() else [0] * 4
            frac512 = float((spread > 508).mean())
            frac1024 = float((spread > 1020).mean())
            print(
                f"  g={g} spread p50={qs[0]:6.0f} p90={qs[1]:6.0f} "
                f"p99={qs[2]:6.0f} max={qs[3]:6.0f} "
                f">508: {frac512:6.4f}  >1020: {frac1024:6.4f}"
            )


if __name__ == "__main__":
    main()
