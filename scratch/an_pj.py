import time
import jax, jax.numpy as jnp
import numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from taseg_tpu.models import UNetCapacities
from taseg_tpu.ops import compute_bounds, kernel_offsets, unique_coords
from taseg_tpu.ops.rulebook import build_rulebook, build_rulebook_fast
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
p = coords.shape[0]
valid = jnp.arange(p, dtype=jnp.int32) < num
vox0 = jnp.concatenate([jnp.floor(coords[:, :3]).astype(jnp.int32),
                        coords[:, 3:4].astype(jnp.int32)], 1)
bounds = compute_bounds(vox0, valid, margin=64)
c0, n0, inv, _ = unique_coords(vox0, valid, bounds, caps.voxels[0])
offs = kernel_offsets(3, stride=1)

def timeit(name, f, n=6):
    o = f(); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(n): o = f()
    jax.block_until_ready(o)
    print(f"{name}: {(time.perf_counter()-t0)/n*1e3:.1f} ms", flush=True)
    return o

a = timeit("old join L0", jax.jit(lambda: build_rulebook(c0, n0, c0, n0, offs, bounds)))
b = timeit("probe join L0", jax.jit(lambda: build_rulebook_fast(c0, n0, c0, n0, offs, bounds)))
print("equal:", bool((np.asarray(a) == np.asarray(b)).all()))
