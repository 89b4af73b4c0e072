"""A/B the TGF merge-threshold on the real chip: apply-only at
TGF_MERGE_MAX_V in {0, 16384, huge}, with an MXU probe as chip-state
control."""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import taseg_tpu.ops.tgf as tgf
from taseg_tpu.models import MinkUNet, UNetCapacities, build_unet_topology
from taseg_tpu.ops import PointSet
from taseg_tpu.data.synthetic import synthetic_scan
from taseg_tpu.data.voxel_dataset import VoxelPipeline, collate_shard


def bench(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


# chip-state control: chained bf16 matmuls
a = jnp.ones((2048, 512), jnp.bfloat16)
w = jnp.ones((512, 512), jnp.bfloat16)


@jax.jit
def probe(a, w):
    def body(x, _):
        y = jnp.dot(x, w, preferred_element_type=jnp.bfloat16)
        return y * (1.0 / 512.0), None

    return jax.lax.scan(body, a, None, length=200)[0]


t = bench(probe, a, w, n=5)
print(f"MXU probe: {200 * 2 * 2048 * 512 * 512 / (t / 1e3) / 1e12:.1f} TF/s",
      flush=True)

pipe = VoxelPipeline(voxel_size=0.05, training=False)
rng = np.random.default_rng(0)
pts, labels = synthetic_scan(rng, 120_000)
ring = np.zeros((len(pts), 1), np.float32)
s = pipe({"xyzret": np.concatenate([pts, ring], 1), "labels": labels})
arrays = collate_shard([s], 131072)
coords = jnp.asarray(arrays["point_coords"])
feats = jnp.asarray(arrays["point_feats"])
num = jnp.asarray(arrays["num_points"][0])

caps = UNetCapacities.for_points(131072)
topo_fn = jax.jit(lambda c, n: build_unet_topology(c, n, caps, devox_pairs=False))
topo0 = jax.block_until_ready(topo_fn(coords, num))
caps = UNetCapacities.fit(
    131072, [int(np.asarray(lt.num)) for lt in topo0.levels], margin=1.1
)
topo_fn = jax.jit(lambda c, n: build_unet_topology(c, n, caps, devox_pairs=False))
topo = jax.block_until_ready(topo_fn(coords, num))
print("level V:", [lt.idx_shape if hasattr(lt, 'idx_shape') else lt.coords.shape[0]
                   for lt in topo.levels], flush=True)

model = MinkUNet(num_classes=20, cr=1.0, block="ResBlock", compute_dtype="bfloat16")
params = jax.jit(
    lambda c, f, n: model.init(
        {"params": jax.random.PRNGKey(0)},
        PointSet(coords=c, feats=f, num=n),
        build_unet_topology(c, n, caps),
        False,
    )
)(coords, feats, num)
points = PointSet(coords=coords, feats=feats, num=num)

for mv in (0, 16384, 1 << 30):
    tgf.TGF_MERGE_MAX_V = mv
    apply_fn = jax.jit(lambda p, pts, topo: model.apply(p, pts, topo, False))
    t0 = time.perf_counter()
    o = apply_fn(params, points, topo)
    jax.block_until_ready(o)
    print(f"merge_max_v={mv}: compile {time.perf_counter() - t0:.0f}s "
          f"apply {bench(apply_fn, params, points, topo):7.2f} ms", flush=True)
