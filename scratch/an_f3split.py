"""In-model A/B: f3 packed (V, 3C) gather vs split 3x narrow gather."""

import sys

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from taseg_tpu.models import MinkUNet, UNetCapacities, build_unet_topology
from taseg_tpu.ops import PointSet
from taseg_tpu.ops import f3conv as f3_mod
from taseg_tpu.data.synthetic import synthetic_scan
from taseg_tpu.data.voxel_dataset import VoxelPipeline, collate_shard
from scratch.tutil import timed

pipe = VoxelPipeline(voxel_size=0.05, training=False)
rng = np.random.default_rng(0)
pts, labels = synthetic_scan(rng, 120_000)
ring = np.zeros((len(pts), 1), np.float32)
s = pipe({"xyzret": np.concatenate([pts, ring], 1), "labels": labels})
arrays = collate_shard([s], 131072)
coords = jnp.asarray(arrays["point_coords"])
feats = jnp.asarray(arrays["point_feats"])
num = jnp.asarray(arrays["num_points"][0])
caps0 = UNetCapacities.for_points(131072)
topo0 = jax.jit(
    lambda c, n: build_unet_topology(c, n, caps0, devox_pairs=False)
)(coords, num)
caps = UNetCapacities.fit(
    131072, [int(np.asarray(lt.num)) for lt in topo0.levels], margin=1.1
)
model = MinkUNet(num_classes=20, cr=1.0, block="ResBlock",
                 compute_dtype="bfloat16")
params = jax.jit(
    lambda c, f, n: model.init(
        {"params": jax.random.PRNGKey(0)},
        PointSet(coords=c, feats=f, num=n),
        build_unet_topology(c, n, caps),
        False,
    )
)(coords, feats, num)


def make_fwd():
    def fwd(params, coords, feats, num):
        pts = PointSet(coords=coords, feats=feats, num=num)
        topo = build_unet_topology(coords, num, caps, devox_pairs=False)
        return model.apply(params, pts, topo, False)

    return jax.jit(fwd)


ref_out = None
for name, packed in (("packed", True), ("split ", False)):
    os.environ["TASEG_F3_GATHER"] = "packed" if packed else "split"
    fwd = make_fwd()
    out = fwd(params, coords, feats, num)
    o = np.asarray(out[: int(np.asarray(num))]).astype(np.float32)
    if ref_out is None:
        ref_out, rel = o, 0.0
    else:
        rel = np.abs(o - ref_out).max() / (np.abs(ref_out).max() + 1e-9)
    t = timed(lambda: fwd(params, coords, feats, num), n=20) * 1e3
    print(f"{name}: fused {t:7.2f} ms = {1e3 / t:5.2f} scans/s  "
          f"rel-vs-packed {rel:.2e}", flush=True)
