"""Honest-timing A/B on the real chip (tutil.timed scalar-fetch drain):
topology under grouped-RB x join-kernel combos, then apply-only under the
TGF merge-threshold variants."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scratch")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tutil import timed, drain

import taseg_tpu.ops.tgf as tgf
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
coords = jnp.asarray(arrays["point_coords"])
feats = jnp.asarray(arrays["point_feats"])
num = jnp.asarray(arrays["num_points"][0])

caps = UNetCapacities.for_points(131072)
t0 = jax.jit(lambda c, n: build_unet_topology(c, n, caps, devox_pairs=False))(
    coords, num
)
caps = UNetCapacities.fit(
    131072, [int(np.asarray(lt.num)) for lt in t0.levels], margin=1.1
)

print("== topology-only (ms) ==", flush=True)
for grb in ("", "1"):
    for njk in ("", "1"):
        os.environ["TASEG_NO_GROUPED_RB"] = grb
        os.environ["TASEG_NO_JOIN_KERNEL"] = njk
        fn = jax.jit(
            lambda c, n: build_unet_topology(c, n, caps, devox_pairs=False)
        )
        ms = timed(fn, coords, num, n=20) * 1e3
        print(
            f"grouped_rb={'off' if grb else 'on '} "
            f"join_kernel={'off' if njk else 'on '}: {ms:7.2f} ms",
            flush=True,
        )

os.environ["TASEG_NO_GROUPED_RB"] = ""
os.environ["TASEG_NO_JOIN_KERNEL"] = ""
topo_fn = jax.jit(lambda c, n: build_unet_topology(c, n, caps, devox_pairs=False))
topo = topo_fn(coords, num)
drain(topo)

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

print("== apply-only (ms) ==", flush=True)
for mv in (0, 16384, 1 << 30):
    tgf.TGF_MERGE_MAX_V = mv
    apply_fn = jax.jit(lambda p, pts, topo: model.apply(p, pts, topo, False))
    tt0 = time.perf_counter()
    o = apply_fn(params, points, topo)
    drain(o)
    ct = time.perf_counter() - tt0
    ms = timed(apply_fn, params, points, topo, n=20) * 1e3
    print(f"merge_max_v={mv:>10d}: apply {ms:7.2f} ms  (compile {ct:.0f}s)",
          flush=True)

print("== fused fwd (ms) ==", flush=True)
tgf.TGF_MERGE_MAX_V = 16384


@jax.jit
def fwd(params, coords, feats, num):
    pts = PointSet(coords=coords, feats=feats, num=num)
    topo = build_unet_topology(coords, num, caps, devox_pairs=False)
    return model.apply(params, pts, topo, False)


ms = timed(fwd, params, coords, feats, num, n=20) * 1e3
print(f"fused: {ms:7.2f} ms  ({1000 / ms:.2f} scans/s)", flush=True)
