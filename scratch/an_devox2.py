"""Localize the devox corner-table cost (bench topo_detail said 29.5 ms)
and A/B alternative formulations of the (P, 8) corner lookup:

  a) current: (P,27) row-gather of rb_k3.T by ancestor + take_along_axis
  b) flat element gather: idx1d = col * V + anc into rb_k3.reshape(-1)
  c) static-slice + select_n: only 8 delta0 patterns exist, so the 8
     corner columns are one of 8 STATIC column sets of the (P,27) block —
     pick with lax.select_n on the per-point pattern id (no dynamic
     axis-1 gather at all)
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from taseg_tpu.models import UNetCapacities, build_unet_topology
from taseg_tpu.data.synthetic import synthetic_scan
from taseg_tpu.data.voxel_dataset import VoxelPipeline, collate_shard
from scratch.tutil import timed  # scalar-fetch drain timer

pipe = VoxelPipeline(voxel_size=0.05, training=False)
rng = np.random.default_rng(0)
N = int(os.environ.get("AN_POINTS", "120000"))
pts, labels = synthetic_scan(rng, N)
ring = np.zeros((len(pts), 1), np.float32)
s = pipe({"xyzret": np.concatenate([pts, ring], 1), "labels": labels})
CAP = (N * 131072 // 120000 + 255) // 256 * 256
arrays = collate_shard([s], CAP)
coords = jnp.asarray(arrays["point_coords"])
num = jnp.asarray(arrays["num_points"][0])

caps0 = UNetCapacities.for_points(CAP)
topo0 = jax.jit(
    lambda c, n: build_unet_topology(c, n, caps0, devox_pairs=False)
)(coords, num)
level_nums = [int(np.asarray(lt.num)) for lt in topo0.levels]
caps = UNetCapacities.fit(CAP, level_nums, margin=1.1)

full = jax.jit(lambda c, n: build_unet_topology(c, n, caps, devox_pairs=False))
nodev = jax.jit(
    lambda c, n: build_unet_topology(
        c, n, caps, devox_strides=(), devox_pairs=False
    )
)
only1 = jax.jit(
    lambda c, n: build_unet_topology(
        c, n, caps, devox_strides=(1,), devox_pairs=False
    )
)
only4 = jax.jit(
    lambda c, n: build_unet_topology(
        c, n, caps, devox_strides=(1, 4), devox_pairs=False
    )
)

for name, fn in [("full", full), ("nodev", nodev), ("s1", only1),
                 ("s14", only4)]:
    t = timed(lambda: fn(coords, num), n=10)
    print(f"topo {name}: {t * 1e3:.2f} ms", flush=True)

# ---- isolate the corner lookup styles on level 2 (stride 4) ----------
topo = full(coords, num)
lvl = 2
s4 = 4
rb = topo.levels[lvl].rb_k3  # (27, V)
vcap = rb.shape[1]

# host-side ancestor + delta0 reproduction (matches backbone_context)
anc = topo.point_inverse
for l in range(1, lvl + 1):
    par = topo.levels[l].strided.parent
    anc = jnp.where(anc >= 0, par[jnp.clip(anc, 0)], -1)
anc = jax.device_get(anc)
anc = jnp.asarray(anc)

p3 = coords[:, :3].astype(jnp.float32)
j8 = jnp.asarray(
    [[(k >> 2) & 1, (k >> 1) & 1, k & 1] for k in range(8)], jnp.int32
)


def corners_a(rb, anc, p3, lvl_coords):
    pf = (jnp.floor(p3 / s4) * s4).astype(jnp.int32)
    t = lvl_coords[jnp.clip(anc, 0), :3]
    delta0 = (pf - t) // jnp.int32(s4)
    o = delta0[:, None, :] + j8[None, :, :]
    cols = (o[..., 0] + 1) + 3 * (o[..., 1] + 1) + 9 * (o[..., 2] + 1)
    block = rb.T[jnp.clip(anc, 0)]
    return jnp.take_along_axis(block, cols, axis=1)


def corners_b(rb, anc, p3, lvl_coords):
    pf = (jnp.floor(p3 / s4) * s4).astype(jnp.int32)
    t = lvl_coords[jnp.clip(anc, 0), :3]
    delta0 = (pf - t) // jnp.int32(s4)
    o = delta0[:, None, :] + j8[None, :, :]
    cols = (o[..., 0] + 1) + 3 * (o[..., 1] + 1) + 9 * (o[..., 2] + 1)
    flat = cols * vcap + jnp.clip(anc, 0)[:, None]  # (P, 8) into (27V,)
    rbf = rb.reshape(-1)
    return rbf[flat.reshape(-1)].reshape(flat.shape)


def corners_c(rb, anc, p3, lvl_coords):
    pf = (jnp.floor(p3 / s4) * s4).astype(jnp.int32)
    t = lvl_coords[jnp.clip(anc, 0), :3]
    delta0 = (pf - t) // jnp.int32(s4)  # {-1, 0}
    pat = (-delta0[:, 0]) * 4 + (-delta0[:, 1]) * 2 + (-delta0[:, 2])
    block = rb.T[jnp.clip(anc, 0)]  # (P, 27)
    cases = []
    for m in range(8):
        d0 = np.array([-((m >> 2) & 1), -((m >> 1) & 1), -(m & 1)])
        o = d0[None, :] + np.asarray(j8)  # (8, 3)
        cols = tuple((o[:, 0] + 1) + 3 * (o[:, 1] + 1) + 9 * (o[:, 2] + 1))
        cases.append(block[:, list(cols)])
    return jax.lax.select_n(
        jnp.clip(pat, 0, 7)[:, None] * jnp.ones((1, 8), jnp.int32), *cases
    )


lc = topo.levels[lvl].coords
ja = jax.jit(corners_a)
jb = jax.jit(corners_b)
jc = jax.jit(corners_c)
ra, rbv, rc = (np.asarray(f(rb, anc, p3, lc)) for f in (ja, jb, jc))
nv = int(np.asarray(num))
ok = (np.asarray(anc) >= 0) & (np.arange(len(np.asarray(anc))) < nv)
print(
    "b == a:", np.array_equal(ra[ok], rbv[ok]),
    " c == a:", np.array_equal(ra[ok], rc[ok]),
)
for name, f in [("a take_along", ja), ("b flat", jb), ("c select_n", jc)]:
    t = timed(lambda: f(rb, anc, p3, lc), n=20)
    print(f"corners {name}: {t * 1e3:.3f} ms", flush=True)


def corners_d(rb, anc, p3, lvl_coords):
    """Pre-shuffle rb into (V, 64): for each of the 8 delta0 patterns the
    8 corner columns are STATIC rows of rb (27, V) -> stack 64 rows,
    transpose once, then ONE P-row gather + select_n of static slices."""
    pf = (jnp.floor(p3 / s4) * s4).astype(jnp.int32)
    t = lvl_coords[jnp.clip(anc, 0), :3]
    delta0 = (pf - t) // jnp.int32(s4)  # {-1, 0}
    pat = (-delta0[:, 0]) * 4 + (-delta0[:, 1]) * 2 + (-delta0[:, 2])
    rows = []
    for m in range(8):
        d0 = np.array([-((m >> 2) & 1), -((m >> 1) & 1), -(m & 1)])
        o = d0[None, :] + np.asarray(j8)  # (8, 3)
        rows.extend(
            int((x[0] + 1) + 3 * (x[1] + 1) + 9 * (x[2] + 1)) for x in o
        )
    combined = rb[np.asarray(rows)].T  # (V, 64)
    block = combined[jnp.clip(anc, 0)]  # (P, 64) one row-gather
    cases = [block[:, 8 * m : 8 * m + 8] for m in range(8)]
    return jax.lax.select_n(
        jnp.clip(pat, 0, 7)[:, None] * jnp.ones((1, 8), jnp.int32), *cases
    )


jd = jax.jit(corners_d)
rd = np.asarray(jd(rb, anc, p3, lc))
print("d == a:", np.array_equal(ra[ok], rd[ok]))
t = timed(lambda: jd(rb, anc, p3, lc), n=20)
print(f"corners d combined: {t * 1e3:.3f} ms", flush=True)
