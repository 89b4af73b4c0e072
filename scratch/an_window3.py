"""Row-level miss fraction + greedy cover counts for the window kernel.

Pass 1 anchors a W-row window at each block's min present st; rows whose
st falls outside are misses.  Exactness demands the misses be handled by
a compacted side path whose STATIC capacity this measures: per level and
group, the total miss rows at W in {384, 512, 1024} and the worst-case
number of greedy windows a single block would need (monotone st).
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
        print(f"level {l}: V={v}")
        tot = {w: 0 for w in (384, 512, 1024)}
        worst_cover = 0
        for g in range(9):
            km = divmod(g, 3)[0] * 9 + divmod(g, 3)[1]
            cols = rb[[km, km + 3, km + 6]]  # (3, V)
            present = cols >= 0
            mn = np.where(present, cols, 1 << 30).min(0)
            nb = (v + B - 1) // B
            pad = nb * B - v
            mnp = np.concatenate([mn, np.full(pad, 1 << 30)]).reshape(nb, B)
            bmin = mnp.min(1)
            # row-level misses: ANY of the 3 dy rows outside the window
            # (the kernel covers rows [bmin, bmin + W))
            colmax = np.where(present, cols, -1).max(0)
            cmx = np.concatenate([colmax, np.full(pad, -1)]).reshape(nb, B)
            has = cmx >= 0
            for w in tot:
                miss = has & (cmx >= bmin[:, None] + w)
                tot[w] += int(miss.sum())
            # greedy cover count on the worst block (monotone mins)
            for k in np.argsort(-(np.where(has, cmx, 0).max(1) - bmin))[:4]:
                sts = np.sort(mnp[k][mnp[k] < (1 << 30)])
                covers, base = 0, -1
                for s in sts:
                    if base < 0 or s >= base + 512 - 2:
                        covers += 1
                        base = s
                worst_cover = max(worst_cover, covers)
        print(
            f"  miss rows (all 9 groups): W=384 {tot[384]}"
            f"  W=512 {tot[512]}  W=1024 {tot[1024]}"
            f"  of {9 * v} ({100 * tot[512] / (9 * v):.3f}% @512)"
            f"  worst greedy covers @512: {worst_cover}"
        )


if __name__ == "__main__":
    main()
