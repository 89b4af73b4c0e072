#!/usr/bin/env python
"""Per-stage timing breakdown of the bench forward on the real chip:
topology build, conv floor, devox, head — to direct round-3 perf work."""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

os.environ.setdefault("TASEG_BENCH_BATCH", "1")


def timeit(fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp  # noqa: E402

from taseg_tpu.models import MinkUNet, UNetCapacities, build_unet_topology  # noqa: E402
from taseg_tpu.ops import PointSet  # noqa: E402
from taseg_tpu.ops.sparse_conv import sparse_conv_apply, flip_rulebook  # noqa: E402
from taseg_tpu.data.synthetic import synthetic_scan  # noqa: E402
from taseg_tpu.data.voxel_dataset import VoxelPipeline, collate_shard  # noqa: E402

pipe = VoxelPipeline(voxel_size=0.05, training=False)
rng = np.random.default_rng(0)
pts, labels = synthetic_scan(rng, 120_000)
ring = np.zeros((len(pts), 1), np.float32)
samples = [pipe({"xyzret": np.concatenate([pts, ring], 1), "labels": labels})]
cap = 131072
arrays = collate_shard(samples, cap)
caps = UNetCapacities.for_points(cap)
model = MinkUNet(num_classes=20, cr=1.0, block="ResBlock",
                 compute_dtype="bfloat16")

coords = jnp.asarray(arrays["point_coords"])
feats = jnp.asarray(arrays["point_feats"])
num = jnp.asarray(arrays["num_points"][0])
points = PointSet(coords=coords, feats=feats, num=num)
topo = jax.jit(
    lambda c, n: build_unet_topology(c, n, caps, devox_pairs=False)
)(coords, num)
params = jax.jit(
    lambda c, f, n: model.init(
        {"params": jax.random.PRNGKey(0)},
        PointSet(coords=c, feats=f, num=n),
        build_unet_topology(c, n, caps),
        False,
    )
)(coords, feats, num)

res = {}

# 1. full e2e (topology inside jit)
@jax.jit
def fwd_e2e(params, coords, feats, num):
    pts = PointSet(coords=coords, feats=feats, num=num)
    t = build_unet_topology(coords, num, caps, devox_pairs=False)
    return model.apply(params, pts, t, False)

res["e2e"] = timeit(fwd_e2e, params, coords, feats, num)

# 2. topology alone
@jax.jit
def topo_only(coords, num):
    return build_unet_topology(coords, num, caps, devox_pairs=False)

res["topology"] = timeit(topo_only, coords, num)

# 2b. topology subparts
@jax.jit
def topo_l0_unique(coords, num):
    from taseg_tpu.ops import compute_bounds, unique_coords
    p = coords.shape[0]
    valid = jnp.arange(p, dtype=jnp.int32) < num
    vox0 = jnp.concatenate(
        [jnp.floor(coords[:, :3]).astype(jnp.int32),
         coords[:, 3:4].astype(jnp.int32)], axis=1)
    bounds = compute_bounds(vox0, valid, margin=64)
    return unique_coords(vox0, valid, bounds, caps.voxels[0])

res["topo_unique0"] = timeit(topo_l0_unique, coords, num)

from taseg_tpu.ops import (  # noqa: E402
    build_rulebook, compute_bounds, kernel_offsets, unique_coords,
    trilinear_table, build_segment_tables,
)

lv = topo.levels

@jax.jit
def topo_k3_all(topo):
    outs = []
    from taseg_tpu.ops import build_rulebook, kernel_offsets
    for l, lt in enumerate(topo.levels):
        outs.append(build_rulebook(
            lt.coords, lt.num, lt.coords, lt.num,
            kernel_offsets(3, stride=2**l), topo.bounds))
    return outs

res["topo_k3_joins"] = timeit(topo_k3_all, topo)

@jax.jit
def topo_devox(coords, num, topo):
    p = coords.shape[0]
    valid = jnp.arange(p, dtype=jnp.int32) < num
    outs = []
    for s in (4, 16):
        l = s.bit_length() - 1
        outs.append(trilinear_table(
            coords, valid, topo.levels[l].coords, topo.levels[l].num, s,
            topo.bounds, with_pairs=False))
    return outs

res["topo_devox_tables"] = timeit(topo_devox, coords, num, topo)

# 3. model with topology fixed (de-jitted constant topo arg)
@jax.jit
def model_only(params, points, topo):
    return model.apply(params, points, topo, False)

res["model_given_topo"] = timeit(model_only, params, points, topo)

# 4. conv floor: the exact conv sequence of MinkUNet (gather+matmul only)
cs = [int(1.0 * x) for x in (32, 32, 64, 128, 256, 256, 128, 96, 96)]
nl = (2, 3, 4, 6, 2, 2, 2, 2)
conv_seq = []  # (level, c_in, c_out, K)
conv_seq += [(0, 4, cs[0], 27), (0, cs[0], cs[0], 27)]
cin = cs[0]
for l in range(1, 5):
    conv_seq.append((l, cin, cin, 8))
    for i in range(nl[l - 1]):
        c_in_blk = cin if i == 0 else cs[l]
        conv_seq += [(l, c_in_blk, cs[l], 27), (l, cs[l], cs[l], 27)]
    cin = cs[l]
ups = [(4, cs[5], 3), (3, cs[6], 2), (2, cs[7], 1), (1, cs[8], 0)]
skip_c = [cs[0], cs[1], cs[2], cs[3]]
for (lvl, outc, tgt) in ups:
    conv_seq.append((tgt, cin, outc, 8))
    cat_c = outc + skip_c[tgt]
    for i in range(2):
        c_in_blk = cat_c if i == 0 else outc
        conv_seq += [(tgt, c_in_blk, outc, 27), (tgt, outc, outc, 27)]
    cin = outc

weights = []
key = jax.random.PRNGKey(0)
for i, (l, ci, co, K) in enumerate(conv_seq):
    key, k2 = jax.random.split(key)
    weights.append(jax.random.normal(k2, (K, ci, co), jnp.bfloat16) * 0.01)

flops = 0
for (l, ci, co, K) in conv_seq:
    v = lv[l].rb_k3.shape[1]
    flops += 2 * K * v * ci * co

@jax.jit
def conv_floor(topo, weights):
    outs = 0.0
    for (spec, w) in zip(conv_seq, weights):
        l, ci, co, K = spec
        lt = topo.levels[l]
        x = jnp.ones((lt.rb_k3.shape[1], ci), jnp.bfloat16)
        if K == 27:
            rb = lt.rb_k3
            y = sparse_conv_apply(x, w, rb, flip_rulebook(rb))
        else:
            y = sparse_conv_apply(
                x, w, lt.rb_down if lt.rb_down is not None else lt.rb_k3[:8],
                lt.rb_up if lt.rb_up is not None else lt.rb_k3[:8])
        outs = outs + jnp.sum(y.astype(jnp.float32))
    return outs

res["conv_floor"] = timeit(conv_floor, topo, weights)
res["conv_tflops"] = flops / 1e12
res["conv_floor_tfs"] = flops / res["conv_floor"] / 1e12

for k, v in res.items():
    if isinstance(v, float) and k not in ("conv_tflops", "conv_floor_tfs"):
        print(f"{k:>22s}: {v * 1e3:8.2f} ms")
    else:
        print(f"{k:>22s}: {v:8.3f}")
print(json.dumps({k: round(v, 5) for k, v in res.items()}))
