"""Clean in-model TGF threshold A/B: same process, interleaved order,
3 repetitions — controls for the chip-state noise that polluted the
first sweep (the 5.26 reading at threshold 96 coincided with a 60 ms
topology reading)."""

import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import taseg_tpu.models.layers as L
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
topo0 = jax.jit(lambda c, n: build_unet_topology(c, n, caps, devox_pairs=False))(
    coords, num
)
caps = UNetCapacities.fit(
    131072, [int(np.asarray(lt.num)) for lt in topo0.levels], margin=1.1
)
model = MinkUNet(num_classes=20, cr=1.0, block="ResBlock", compute_dtype="bfloat16")
params = jax.jit(
    lambda c, f, n: model.init(
        {"params": jax.random.PRNGKey(0)},
        PointSet(coords=c, feats=f, num=n),
        build_unet_topology(c, n, caps),
        False,
    )
)(coords, feats, num)

fns = {}
import os as _os

THRS = tuple(
    int(x) for x in _os.environ.get("TGF_THRS", "0,64,96,128,512").split(",")
)
for thr in THRS:
    L.TGF_MAX_CIN = thr

    @jax.jit
    def fwd(params, coords, feats, num):
        pts = PointSet(coords=coords, feats=feats, num=num)
        topo = build_unet_topology(coords, num, caps, devox_pairs=False)
        return model.apply(params, pts, topo, False)

    from tutil import drain

    t0 = time.perf_counter()
    o = fwd(params, coords, feats, num)
    drain(o)
    print(f"compiled thr={thr} in {time.perf_counter() - t0:.1f}s", flush=True)
    fns[thr] = fwd

res = {t: [] for t in fns}
for rep in range(3):
    for thr, fn in fns.items():
        t0 = time.perf_counter()
        for _ in range(10):
            o = fn(params, coords, feats, num)
        drain(o)
        res[thr].append((time.perf_counter() - t0) / 10)
for thr, ts in res.items():
    ms = [t * 1e3 for t in ts]
    print(
        f"TGF_MAX_CIN={thr:4d}: {min(ms):7.2f} ms best "
        f"({1000/min(ms):5.2f} scans/s)  reps={[f'{m:.1f}' for m in ms]}"
    )
