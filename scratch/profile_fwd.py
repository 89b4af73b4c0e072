"""Profile the fused bench forward on the chip and dump per-op times."""

import glob
import os
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
# same calibration pass as bench.py
_coords = jnp.asarray(arrays["point_coords"])
_num = jnp.asarray(arrays["num_points"][0])
_topo = jax.jit(lambda c, n: build_unet_topology(c, n, caps, devox_pairs=False))(_coords, _num)
caps = UNetCapacities.fit(
    131072, [int(np.asarray(lt.num)) for lt in _topo.levels], margin=1.1
)
model = MinkUNet(num_classes=20, cr=1.0, block="ResBlock",
                 compute_dtype="bfloat16")
coords = jnp.asarray(arrays["point_coords"])
feats = jnp.asarray(arrays["point_feats"])
num = jnp.asarray(arrays["num_points"][0])
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
    topo = build_unet_topology(coords, num, caps, devox_pairs=False)
    return model.apply(params, pts, topo, False)


out = fwd(params, coords, feats, num)
jax.block_until_ready(out)

os.makedirs("/tmp/prof", exist_ok=True)
with jax.profiler.trace("/tmp/prof"):
    for _ in range(3):
        out = fwd(params, coords, feats, num)
    jax.block_until_ready(out)
print("trace files:", glob.glob("/tmp/prof/**/*.xplane.pb", recursive=True))
