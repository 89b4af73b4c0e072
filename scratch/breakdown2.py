#!/usr/bin/env python
"""Second-level breakdown: gather vs matmul inside the conv floor, and
the non-conv model remainder (BN/devox/head)."""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp  # noqa: E402

from taseg_tpu.models import MinkUNet, UNetCapacities, build_unet_topology  # noqa: E402
from taseg_tpu.ops import PointSet, devoxelize  # noqa: E402
from taseg_tpu.ops.sparse_conv import _gather_wide  # noqa: E402
from taseg_tpu.data.synthetic import synthetic_scan  # noqa: E402
from taseg_tpu.data.voxel_dataset import VoxelPipeline, collate_shard  # noqa: E402


def timeit(fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


pipe = VoxelPipeline(voxel_size=0.05, training=False)
rng = np.random.default_rng(0)
pts, labels = synthetic_scan(rng, 120_000)
ring = np.zeros((len(pts), 1), np.float32)
samples = [pipe({"xyzret": np.concatenate([pts, ring], 1), "labels": labels})]
cap = 131072
arrays = collate_shard(samples, cap)
caps = UNetCapacities.for_points(cap)

coords = jnp.asarray(arrays["point_coords"])
feats4 = jnp.asarray(arrays["point_feats"])
num = jnp.asarray(arrays["num_points"][0])
topo = jax.jit(
    lambda c, n: build_unet_topology(c, n, caps, devox_pairs=False)
)(coords, num)
lv = topo.levels
res = {}

# conv specs as in the model
cs = [32, 32, 64, 128, 256, 256, 128, 96, 96]
nl = (2, 3, 4, 6, 2, 2, 2, 2)
conv_seq = [(0, 4, cs[0], 27), (0, cs[0], cs[0], 27)]
cin = cs[0]
for l in range(1, 5):
    conv_seq.append((l, cin, cin, 8))
    for i in range(nl[l - 1]):
        conv_seq += [(l, cin if i == 0 else cs[l], cs[l], 27),
                     (l, cs[l], cs[l], 27)]
    cin = cs[l]
ups = [(4, cs[5], 3), (3, cs[6], 2), (2, cs[7], 1), (1, cs[8], 0)]
skip_c = [cs[0], cs[1], cs[2], cs[3]]
for (lvl, outc, tgt) in ups:
    conv_seq.append((tgt, cin, outc, 8))
    for i in range(2):
        conv_seq += [(tgt, (outc + skip_c[tgt]) if i == 0 else outc, outc, 27),
                     (tgt, outc, outc, 27)]
    cin = outc


def rb_of(spec):
    l, ci, co, K = spec
    lt = lv[l]
    if K == 27:
        return lt.rb_k3
    return lt.rb_down if lt.rb_down is not None else lt.rb_k3[:8]


# A. gather-only floor (materialize every conv's wide gather, no matmul)
@jax.jit
def gather_floor(topo):
    acc = 0.0
    for spec in conv_seq:
        l, ci, co, K = spec
        x = jnp.ones((rb_of(spec).shape[1] if K == 27 else lv[l - 0].rb_k3.shape[1], ci), jnp.bfloat16)
        # input rows for K==8 down conv live at the FINER level
        if K == 8:
            x = jnp.ones((lv[max(l - 1, 0)].rb_k3.shape[1], ci), jnp.bfloat16)
        g = _gather_wide(x, rb_of(spec))
        acc = acc + jnp.sum(g.astype(jnp.float32))
    return acc

res["gather_floor"] = timeit(gather_floor, topo)

# B. matmul-only floor (pre-gathered wide operands)
wides = []
weights = []
key = jax.random.PRNGKey(0)
for spec in conv_seq:
    l, ci, co, K = spec
    v = rb_of(spec).shape[1]
    key, k2 = jax.random.split(key)
    wides.append(jnp.ones((v, K * ci), jnp.bfloat16))
    weights.append(jax.random.normal(k2, (K * ci, co), jnp.bfloat16) * 0.01)

@jax.jit
def matmul_floor(wides, weights):
    acc = 0.0
    for g, w in zip(wides, weights):
        acc = acc + jnp.sum(
            jnp.dot(g, w, preferred_element_type=jnp.float32)
        )
    return acc

res["matmul_floor"] = timeit(matmul_floor, wides, weights)

# C. devox + head floor
x4 = jnp.ones((lv[4].rb_k3.shape[1], 256), jnp.bfloat16)
y2 = jnp.ones((lv[2].rb_k3.shape[1], 128), jnp.bfloat16)
y4 = jnp.ones((lv[0].rb_k3.shape[1], 96), jnp.bfloat16)
wcls = jax.random.normal(jax.random.PRNGKey(1), (480, 20), jnp.float32)

@jax.jit
def devox_head(topo, x4, y2, y4, wcls):
    z1 = devoxelize(x4, topo.devox[16])
    z2 = devoxelize(y2, topo.devox[4])
    z3 = devoxelize(y4, topo.devox[1])
    z = jnp.concatenate([z1, z2, z3], axis=-1).astype(jnp.float32)
    return jnp.sum(z @ wcls)

res["devox_head"] = timeit(devox_head, topo, x4, y2, y4, wcls)

# D. full model eval fwd with topology FIXED, f32 vs bf16 BN boundaries
model = MinkUNet(num_classes=20, cr=1.0, block="ResBlock",
                 compute_dtype="bfloat16")
points = PointSet(coords=coords, feats=feats4, num=num)
params = jax.jit(
    lambda c, f, n: model.init(
        {"params": jax.random.PRNGKey(0)},
        PointSet(coords=c, feats=f, num=n),
        build_unet_topology(c, n, caps), False,
    )
)(coords, feats4, num)

@jax.jit
def model_only(params, points, topo):
    return model.apply(params, points, topo, False)

res["model_given_topo"] = timeit(model_only, params, points, topo)

for k, v in res.items():
    print(f"{k:>18s}: {v * 1e3:8.2f} ms")
print(json.dumps({k: round(v, 5) for k, v in res.items()}))
