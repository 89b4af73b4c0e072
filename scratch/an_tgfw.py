"""TGF-W probe: wide-channel sparse conv via 3-row-slice gathers.

The 27-gather path issues 27V gather indices per conv; TGF cuts that to
9V but regresses at C>=96 (3*C_out z materialization).  TGF-W instead
gathers the INPUT side: present dy-neighbors occupy consecutive rows in
the key-sorted level (keys differ by exactly the stride in y; nothing
can sort between), so ONE lax.gather with slice_sizes=(3, C_in) per
(dx,dz) group fetches the whole dy-triple — 9V indices, no transformed
z stacks, and one (V,3C_in)@(3C_in,C_out) matmul per group (bigger K,
reference-equal FLOPs).

A/B at decoder-L0/L1 shapes vs the per-offset 27-path and TGF.
"""

import os
import sys

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from taseg_tpu.models import UNetCapacities, build_unet_topology
from taseg_tpu.data.synthetic import synthetic_scan
from taseg_tpu.data.voxel_dataset import VoxelPipeline, collate_shard
from taseg_tpu.ops.sparse_conv import sparse_conv_apply
from taseg_tpu.ops import flip_rulebook
from taseg_tpu.ops.tgf import build_tgf_tables, _tgf_fwd_impl
from scratch.tutil import timed

pipe = VoxelPipeline(voxel_size=0.05, training=False)
rng = np.random.default_rng(0)
N = int(os.environ.get("AN_POINTS", "120000"))
pts, labels = synthetic_scan(rng, N)
ring = np.zeros((len(pts), 1), np.float32)
s = pipe({"xyzret": np.concatenate([pts, ring], 1), "labels": labels})
arrays = collate_shard([s], (N * 131072 // 120000 + 255) // 256 * 256)
coords = jnp.asarray(arrays["point_coords"])
num = jnp.asarray(arrays["num_points"][0])

CAP = (N * 131072 // 120000 + 255) // 256 * 256
caps0 = UNetCapacities.for_points(CAP)
topo = jax.jit(
    lambda c, n: build_unet_topology(c, n, caps0, devox_pairs=False)
)(coords, num)
level_nums = [int(np.asarray(lt.num)) for lt in topo.levels]
caps = UNetCapacities.fit(CAP, level_nums, margin=1.1)
topo = jax.jit(
    lambda c, n: build_unet_topology(c, n, caps, devox_pairs=False)
)(coords, num)


def build_tgfw(rb):
    """st (9, V) int32 slice starts; od (9, 3, V) int32 in {0,1,2,3=absent}."""
    v = rb.shape[1]
    sts, ods = [], []
    for g in range(9):
        dz, dx = divmod(g, 3)
        km = dz * 9 + dx
        kc, kp = km + 3, km + 6
        rm, rc, rp = rb[km], rb[kc], rb[kp]
        big = jnp.int32(1 << 30)
        mn = jnp.minimum(
            jnp.minimum(jnp.where(rm >= 0, rm, big), jnp.where(rc >= 0, rc, big)),
            jnp.where(rp >= 0, rp, big),
        )
        st = jnp.clip(jnp.where(mn == big, 0, mn), 0, v - 3)
        od = [
            jnp.where(r >= 0, r - st, 3).astype(jnp.int32) for r in (rm, rc, rp)
        ]
        sts.append(st)
        ods.append(jnp.stack(od))
    return jnp.stack(sts), jnp.stack(ods)


def tgfw_apply(feats, weight, st, od):
    """feats (N, C_in); weight (27, C_in, C_out); kernel_offsets(3)
    x-fastest: k = (dx+1) + 3*(dy+1) + 9*(dz+1)."""
    c_in = feats.shape[1]
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0,)
    )
    w = weight.astype(feats.dtype)
    out = None
    for g in range(9):
        dz, dx = divmod(g, 3)
        km = dz * 9 + dx
        y = jax.lax.gather(
            feats, st[g][:, None], dn, slice_sizes=(3, c_in),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        )  # (V, 3, C_in)
        y0, y1, y2 = y[:, 0], y[:, 1], y[:, 2]

        def pick(o):
            return jnp.where(
                (o == 0)[:, None], y0,
                jnp.where((o == 1)[:, None], y1,
                          jnp.where((o == 2)[:, None], y2, 0)),
            )

        a = jnp.concatenate(
            [pick(od[g, d]) for d in range(3)], axis=1
        )  # (V, 3*C_in)
        wg = jnp.concatenate([w[km], w[km + 3], w[km + 6]], axis=0)
        c = jnp.dot(a, wg, preferred_element_type=jnp.float32)
        out = c if out is None else out + c
    return out.astype(feats.dtype)


# verify + time per level/width
for lvl, c_in, c_out in [(0, 128, 96), (1, 128, 96), (0, 32, 32), (2, 64, 64)]:
    lt = topo.levels[lvl]
    v = lt.rb_k3.shape[1]
    key = jax.random.PRNGKey(lvl)
    feats = jax.random.normal(key, (v, c_in), jnp.bfloat16)
    nvalid = int(np.asarray(lt.num))
    feats = feats * (jnp.arange(v)[:, None] < nvalid)
    weight = jax.random.normal(key, (27, c_in, c_out), jnp.float32) * 0.05

    rb = lt.rb_k3
    st, od = jax.jit(build_tgfw)(rb)
    # consecutive-row invariant (ADVICE r3): a present neighbor with
    # od > 2 would be silently zeroed by tgfw_apply's pick(); fail loudly
    # here instead of relying on the numeric A/B below.
    od_h, rb_h = np.asarray(od), np.asarray(rb)
    present = np.stack(
        [rb_h[dz * 9 + dx + 3 * d] >= 0
         for (dz, dx) in [divmod(g, 3) for g in range(9)] for d in range(3)]
    ).reshape(9, 3, -1)
    assert int(np.where(present, od_h, 0).max()) <= 2, (
        "dy-triple row span > 3: tgfw consecutive-row assumption violated"
    )
    f27 = jax.jit(lambda f, w: sparse_conv_apply(f, w, rb, flip_rulebook(rb)))
    ftw = jax.jit(lambda f, w: tgfw_apply(f, w, st, od))
    o27 = np.asarray(f27(feats, weight), np.float32)
    otw = np.asarray(ftw(feats, weight), np.float32)
    err = np.abs(o27[:nvalid] - otw[:nvalid]).max()
    rel = err / max(np.abs(o27[:nvalid]).max(), 1e-6)
    t27 = timed(f27, feats, weight, n=30) * 1e3
    ttw = timed(ftw, feats, weight, n=30) * 1e3
    line = (
        f"L{lvl} C{c_in}->{c_out} V={v} n={nvalid}: "
        f"27-path {t27:.3f} ms, tgfw {ttw:.3f} ms, relerr {rel:.2e}"
    )
    if c_in <= 64:
        tab = build_tgf_tables(rb, lt.coords, lt.num, 2 ** lvl,
                               topo.bounds)
        ftg = jax.jit(lambda f, w: _tgf_fwd_impl(f, w, tab))
        otg = np.asarray(ftg(feats, weight), np.float32)
        relg = np.abs(o27[:nvalid] - otg[:nvalid]).max() / max(
            np.abs(o27[:nvalid]).max(), 1e-6
        )
        ttg = timed(ftg, feats, weight, n=30) * 1e3
        line += f", tgf {ttg:.3f} ms (relerr {relg:.2e})"
    print(line, flush=True)
