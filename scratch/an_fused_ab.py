"""In-model fused-forward A/B over conv formulation knobs (one chip job).

Variants (each a fresh jit of the SAME fused topology+apply forward):
  base       CONV_BATCH_MAX_V=0   (per-offset everywhere, r3 behavior +
             per-voxel corners + TGF center identity)
  b16        CONV_BATCH_MAX_V=16384  (L3/L4 single-gather einsum conv)
  b32        CONV_BATCH_MAX_V=32768  (+ L2)
  f3         b16 + WIDE_CONV=f3      (L0/L1 decoder lane-packed windows)
  tgf96      b16 + TGF_MAX_CIN=96    (TGF with center-identity at 96ch)

Prints fused ms + scans/s per variant; parity of logits vs base.
"""

import sys

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from taseg_tpu.models import MinkUNet, UNetCapacities, build_unet_topology
from taseg_tpu.models import layers as layers_mod
from taseg_tpu.ops import PointSet
from taseg_tpu.ops import sparse_conv as sc_mod
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


VARIANTS = [
    ("base ", dict(batch=0, wide="27", tgf=64)),
    ("b16  ", dict(batch=16384, wide="27", tgf=64)),
    ("f3   ", dict(batch=16384, wide="f3", tgf=64)),
    ("b32  ", dict(batch=32768, wide="27", tgf=64)),
    ("accbf", dict(batch=16384, wide="27", tgf=64, acc="bf16")),
    ("tgf96", dict(batch=16384, wide="27", tgf=96)),
]

ref_out = None
for name, knobs in VARIANTS:
    sc_mod.CONV_BATCH_MAX_V = knobs["batch"]
    sc_mod.CONV_ACCUM = knobs.get("acc", "f32")
    layers_mod.WIDE_CONV = knobs["wide"]
    layers_mod.TGF_MAX_CIN = knobs["tgf"]
    fwd = make_fwd()
    try:
        out = fwd(params, coords, feats, num)
        o = np.asarray(out[: int(np.asarray(num))]).astype(np.float32)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        continue
    if ref_out is None:
        ref_out, rel = o, 0.0
    else:
        rel = np.abs(o - ref_out).max() / (np.abs(ref_out).max() + 1e-9)
    t = timed(lambda: fwd(params, coords, feats, num), n=20) * 1e3
    print(f"{name}: fused {t:7.2f} ms = {1e3 / t:5.2f} scans/s  "
          f"rel-vs-base {rel:.2e}", flush=True)
