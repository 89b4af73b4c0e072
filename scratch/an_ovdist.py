import sys; sys.path.insert(0, "/root/repo")
import numpy as np
import os
os.environ.pop("JAX_PLATFORMS", None)
import jax; jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from taseg_tpu.models import UNetCapacities, build_unet_topology
from taseg_tpu.models.voxel.minkunet import unet_select_gps
from taseg_tpu.data.synthetic import synthetic_scan
from taseg_tpu.data.voxel_dataset import VoxelPipeline, collate_shard

pipe = VoxelPipeline(voxel_size=0.05, training=False)
rng = np.random.default_rng(0)
pts, labels = synthetic_scan(rng, 120_000)
ring = np.zeros((len(pts), 1), np.float32)
s = pipe({"xyzret": np.concatenate([pts, ring], 1), "labels": labels})
cap = 131072
arrays = collate_shard([s], cap)
caps = UNetCapacities.for_points(cap)
coords = jnp.asarray(arrays["point_coords"])
num = jnp.asarray(arrays["num_points"][0])
topo = build_unet_topology(coords, num, caps, devox_pairs=False,
                           select_gps=unet_select_gps(cr=1.0))
for l, lv in enumerate(topo.levels):
    for gp, tab in lv.sel_k3.items():
        ov = np.asarray(tab.overflow_rb) >= 0  # (K, V)
        K, V = ov.shape
        cnt = ov.reshape(K, V // 256, 256).sum(-1)  # per (k, tile)
        nz = cnt[cnt > 0]
        if len(nz) == 0:
            print(f"L{l} gp{gp}: no overflow"); continue
        print(f"L{l} gp{gp}: affected (k,tile): {len(nz)}/{cnt.size}"
              f" cnt p50={np.percentile(nz,50):.0f} p99={np.percentile(nz,99):.0f}"
              f" max={nz.max()}  total={nz.sum()}")
        break  # same rb for both gps
