"""Decompose the 29.5 ms devox-tables topology cost (bench topo_detail):
time the full topo under devox_strides subsets, then the _corner_idx
sub-stages (ancestor chain, rb block gather, take_along_axis) in
isolation at stride 4 and 16."""
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

from taseg_tpu.models import UNetCapacities, build_unet_topology
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

print("== full topo under devox_strides subsets ==", flush=True)
for ds in ((), (1,), (4,), (16,), (1, 4), (1, 4, 16)):
    fn = jax.jit(
        lambda c, n, ds=ds: build_unet_topology(
            c, n, caps, devox_strides=ds, devox_pairs=False
        )
    )
    ms = timed(fn, coords, num, n=20) * 1e3
    print(f"devox_strides={ds}: {ms:7.2f} ms", flush=True)

# ---- sub-stage isolation: reuse a prebuilt topology's levels ----------
topo = jax.jit(
    lambda c, n: build_unet_topology(c, n, caps, devox_pairs=False)
)(coords, num)
drain(topo)

P = coords.shape[0]
valid = jnp.arange(P, dtype=jnp.int32) < num


def ancestor(topo, l):
    a = topo.point_inverse
    for ll in range(1, l + 1):
        parent = topo.levels[ll].strided.parent
        a = jnp.where(a >= 0, parent[jnp.clip(a, 0)], -1)
    return a


j = jnp.asarray(
    [[(k >> 2) & 1, (k >> 1) & 1, k & 1] for k in range(8)], jnp.int32
)

for l, s_ in ((2, 4), (4, 16)):
    anc_fn = jax.jit(lambda topo, l=l: ancestor(topo, l))
    ms_anc = timed(anc_fn, topo, n=20) * 1e3
    anc = anc_fn(topo)

    def cols_fn(topo, anc, l=l, s_=s_):
        p3 = coords[:, :3].astype(jnp.float32)
        pf = (jnp.floor(p3 / s_) * s_).astype(jnp.int32)
        t = topo.levels[l].coords[jnp.clip(anc, 0), :3]
        delta0 = (pf - t) // jnp.int32(s_)
        o = delta0[:, None, :] + j[None, :, :]
        return (o[..., 0] + 1) + 3 * (o[..., 1] + 1) + 9 * (o[..., 2] + 1)

    cols_j = jax.jit(cols_fn)
    ms_cols = timed(cols_j, topo, anc, n=20) * 1e3
    cols = cols_j(topo, anc)

    def block_fn(topo, anc, l=l):
        return topo.levels[l].rb_k3.T[jnp.clip(anc, 0)]  # (P, 27)

    block_j = jax.jit(block_fn)
    ms_block = timed(block_j, topo, anc, n=20) * 1e3
    block = block_j(topo, anc)

    taa = jax.jit(lambda block, cols: jnp.take_along_axis(block, cols, axis=1))
    ms_taa = timed(taa, block, cols, n=20) * 1e3

    # alternative: flat scalar gather rb[col, anc] from the (27, V) table
    def flat_fn(topo, anc, cols, l=l):
        rb = topo.levels[l].rb_k3  # (27, V)
        v = rb.shape[1]
        flat = rb.reshape(-1)
        ix = cols * v + jnp.clip(anc, 0)[:, None]  # (P, 8)
        return flat[ix]

    flat_j = jax.jit(flat_fn)
    ms_flat = timed(flat_j, topo, anc, cols, n=20) * 1e3

    print(
        f"l={l} s={s_}: anc {ms_anc:6.2f}  cols {ms_cols:6.2f}  "
        f"block(P,27) {ms_block:6.2f}  take_along {ms_taa:6.2f}  "
        f"flat-gather {ms_flat:6.2f} ms",
        flush=True,
    )
