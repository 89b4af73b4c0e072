"""Overlap probe #2: real model apply (~102 ms) vs 48 MB device_put."""

import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from taseg_tpu.models import MinkUNet, UNetCapacities, build_unet_topology
from taseg_tpu.ops import PointSet
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
feats = jnp.asarray(arrays["point_feats"])
num = jnp.asarray(arrays["num_points"][0])
topo_fn = jax.jit(lambda c, n: build_unet_topology(c, n, caps, devox_pairs=False))
topo = topo_fn(coords, num)
caps = UNetCapacities.fit(
    131072, [int(np.asarray(lt.num)) for lt in topo.levels], margin=1.1
)
topo = jax.jit(lambda c, n: build_unet_topology(c, n, caps, devox_pairs=False))(
    coords, num
)
model = MinkUNet(num_classes=20, cr=1.0, block="ResBlock", compute_dtype="bfloat16")
points = PointSet(coords=coords, feats=feats, num=num)
params = jax.jit(
    lambda c, f, n: model.init(
        {"params": jax.random.PRNGKey(0)},
        PointSet(coords=c, feats=f, num=n),
        build_unet_topology(c, n, caps),
        False,
    )
)(coords, feats, num)
apply_fn = jax.jit(lambda p, pts, topo: model.apply(p, pts, topo, False))
out = apply_fn(params, points, topo)
jax.block_until_ready(out)

MB = 1024 * 1024
host48 = np.random.randint(0, 2**20, (48 * MB // 4,), np.int32)
host24 = host48[: 24 * MB // 4]


def timeit(fn, n=10):
    fn()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n


t_apply = timeit(lambda: jax.block_until_ready(apply_fn(params, points, topo)))
print(f"apply alone: {t_apply*1e3:.1f} ms")


def overlapped(h):
    o = apply_fn(params, points, topo)  # async dispatch
    d = jax.device_put(h)
    jax.block_until_ready((o, d))


def serial(h):
    jax.block_until_ready(apply_fn(params, points, topo))
    jax.device_put(h).block_until_ready()


for name, h in (("48MB", host48), ("24MB", host24)):
    t_ov = timeit(lambda: overlapped(h), n=8)
    t_se = timeit(lambda: serial(h), n=8)
    print(
        f"{name}: overlap {t_ov*1e3:6.1f} ms   serial {t_se*1e3:6.1f} ms"
        f"   hidden: {(t_se-t_ov)*1e3:.1f} ms"
    )
