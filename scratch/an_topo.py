"""Decompose topology build time on-chip."""
import time
import jax, jax.numpy as jnp
import numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from taseg_tpu.models import UNetCapacities, build_unet_topology
from taseg_tpu.ops import compute_bounds, kernel_offsets, unique_coords
from taseg_tpu.ops.rulebook import build_rulebook, build_reverse_rulebook, spdownsample
from taseg_tpu.ops.voxelize import build_segment_tables, trilinear_table
from taseg_tpu.data.synthetic import synthetic_scan
from taseg_tpu.data.voxel_dataset import VoxelPipeline, collate_shard

pipe = VoxelPipeline(voxel_size=0.05, training=False)
rng = np.random.default_rng(0)
pts, labels = synthetic_scan(rng, 120_000)
ring = np.zeros((len(pts), 1), np.float32)
s = pipe({"xyzret": np.concatenate([pts, ring], 1), "labels": labels})
arrays = collate_shard([s], 131072)
caps = UNetCapacities.for_points(131072)
coords = jnp.asarray(arrays["point_coords"])
num = jnp.asarray(arrays["num_points"][0])

def timeit(name, f, *args, n=6):
    o = f(*args); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(n): o = f(*args)
    jax.block_until_ready(o)
    print(f"{name}: {(time.perf_counter()-t0)/n*1e3:.1f} ms", flush=True)
    return o

# pieces at level 0
p = coords.shape[0]
valid = jnp.arange(p, dtype=jnp.int32) < num
vox0 = jnp.concatenate([jnp.floor(coords[:, :3]).astype(jnp.int32),
                        coords[:, 3:4].astype(jnp.int32)], 1)
f_bounds = jax.jit(lambda: compute_bounds(vox0, valid, margin=64))
bounds = timeit("bounds", f_bounds)

f_uni = jax.jit(lambda: unique_coords(vox0, valid, bounds, caps.voxels[0]))
c0, n0, inv, _ = timeit("unique L0 (131k)", f_uni)

f_seg = jax.jit(lambda: build_segment_tables(inv, caps.voxels[0]))
timeit("segment tables L0", f_seg)

offs = kernel_offsets(3, stride=1)
f_rb = jax.jit(lambda: build_rulebook(c0, n0, c0, n0, offs, bounds))
timeit("rb_k3 L0 (27x111k join)", f_rb)

f_down = jax.jit(lambda: spdownsample(c0, n0, 2, 1, bounds, caps.voxels[1]))
c1, n1 = timeit("spdownsample L1", f_down)
offs2 = kernel_offsets(2, stride=1)
f_rbd = jax.jit(lambda: build_rulebook(c1, n1, c0, n0, offs2, bounds))
timeit("rb_down L1 (8x join)", f_rbd)

f_rb1 = jax.jit(lambda: build_rulebook(c1, n1, c1, n1, kernel_offsets(3, stride=2), bounds))
timeit("rb_k3 L1 (27x78k join)", f_rb1)

f_tri = jax.jit(lambda: trilinear_table(coords, valid, c1, n1, 2, bounds, with_pairs=False))
timeit("trilinear stride2 (8x131k)", f_tri)

f_full = jax.jit(lambda c, n: build_unet_topology(c, n, caps, devox_pairs=False))
timeit("FULL topology", f_full, coords, num)
