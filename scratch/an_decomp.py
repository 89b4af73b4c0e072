"""Decompose bench fwd: table-build cost, kernel-conv cost w/ and w/o the
overflow fixup, on the real chip."""
import time
import jax, jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from taseg_tpu.models import MinkUNet, UNetCapacities, build_unet_topology
from taseg_tpu.models.voxel.minkunet import unet_select_gps
from taseg_tpu.ops import PointSet
from taseg_tpu.ops import select_conv as sc
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
sel_gps = unet_select_gps(cr=1.0)

def timeit(name, f, *args, n=8):
    o = f(*args); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(n): o = f(*args)
    jax.block_until_ready(o)
    print(f"{name}: {(time.perf_counter()-t0)/n*1e3:.1f} ms", flush=True)
    return o

# 1. topology without tables
f1 = jax.jit(lambda c, n: build_unet_topology(c, n, caps, devox_pairs=False))
topo = timeit("topology (no tables)", f1, coords, num)

# 2. topology with tables
f2 = jax.jit(lambda c, n: build_unet_topology(c, n, caps, devox_pairs=False, select_gps=sel_gps))
topo_t = timeit("topology (with tables)", f2, coords, num)

# overflow stats per level/gp
for l, lv in enumerate(topo_t.levels):
    for gp, tab in lv.sel_k3.items():
        tot = int((np.asarray(lv.rb_k3) >= 0).sum())
        print(f"  L{l} gp{gp}: overflow {int(tab.has_overflow)} / {tot} valid"
              f" ({int(tab.has_overflow)/max(tot,1)*100:.2f}%)", flush=True)
