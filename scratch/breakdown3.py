#!/usr/bin/env python
"""Per-spec gather/matmul costs: one jit per distinct (level, ci, co, K),
multiplied by multiplicity — avoids one giant HLO."""

import json
import sys
import time
from collections import Counter

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp  # noqa: E402

from taseg_tpu.models import UNetCapacities, build_unet_topology  # noqa: E402
from taseg_tpu.ops import devoxelize  # noqa: E402
from taseg_tpu.ops.sparse_conv import _gather_wide  # noqa: E402
from taseg_tpu.data.synthetic import synthetic_scan  # noqa: E402
from taseg_tpu.data.voxel_dataset import VoxelPipeline, collate_shard  # noqa: E402


def timeit(fn, *args, n=20):
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
num = jnp.asarray(arrays["num_points"][0])
topo = jax.jit(
    lambda c, n: build_unet_topology(c, n, caps, devox_pairs=False)
)(coords, num)
lv = topo.levels

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

mult = Counter(conv_seq)
specs = sorted(mult)

gather_t = {}
matmul_t = {}
for spec in specs:
    l, ci, co, K = spec
    lt = lv[l]
    rb = lt.rb_k3 if K == 27 else (
        lt.rb_down if lt.rb_down is not None else lt.rb_k3[:8]
    )
    v_in = lv[max(l - 1, 0)].rb_k3.shape[1] if K == 8 else rb.shape[1]
    v_out = rb.shape[1]
    x = jnp.ones((v_in, ci), jnp.bfloat16)
    w = jnp.ones((K * ci, co), jnp.bfloat16) * 0.01
    g_fn = jax.jit(lambda x, rb: jnp.sum(
        _gather_wide(x, rb).astype(jnp.float32)))
    gather_t[spec] = timeit(g_fn, x, rb)
    wide = jnp.ones((v_out, K * ci), jnp.bfloat16)
    m_fn = jax.jit(lambda g, w: jnp.sum(
        jnp.dot(g, w, preferred_element_type=jnp.float32)))
    matmul_t[spec] = timeit(m_fn, wide, w)

tot_g = sum(gather_t[s] * mult[s] for s in specs)
tot_m = sum(matmul_t[s] * mult[s] for s in specs)
print(f"total gather: {tot_g * 1e3:.2f} ms   total matmul: {tot_m * 1e3:.2f} ms")
by_level_g = {}
by_level_m = {}
for s in specs:
    by_level_g[s[0]] = by_level_g.get(s[0], 0) + gather_t[s] * mult[s]
    by_level_m[s[0]] = by_level_m.get(s[0], 0) + matmul_t[s] * mult[s]
for l in range(5):
    print(f"level {l}: gather {by_level_g.get(l,0)*1e3:7.2f} ms  "
          f"matmul {by_level_m.get(l,0)*1e3:7.2f} ms")
worst = sorted(specs, key=lambda s: -gather_t[s] * mult[s])[:6]
for s in worst:
    print(f"  spec {s}: gather {gather_t[s]*1e3:6.2f} ms x{mult[s]}  "
          f"matmul {matmul_t[s]*1e3:6.2f} ms")
print(json.dumps({"total_gather_ms": round(tot_g*1e3, 2),
                  "total_matmul_ms": round(tot_m*1e3, 2)}))
