"""F3 lane-packed wide-channel conv vs conv27/TGF (VERDICT r3 #1b, take 3).

an_conv96 measured the windowed-slice gather (slice_sizes=(3,C)) at ~1 s —
XLA lowers multi-row slice gathers catastrophically.  F3 gets the same
dy-triple in ONE ordinary V-row gather by packing the 3-row window into
LANES first:

    F3[r] = [f[r] | f[r+1] | f[r+2]]        (V, 3C) — two shifted copies
    G_g   = F3[st_g]                        one (V,)-row gather per group
    sel_d = pick window row od_gd from G_g  (static lane slices, select_n)
    out  += [sel_m|sel_c|sel_p] @ [Wm;Wc;Wp]

9V gather rows of 3C lanes instead of 27V rows of C (same bytes, 1/3 the
rows), no z-materialization.  Timed standalone AND chained (the chained
number is the honest in-model figure; standalone carries ~1 ms dispatch).
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
from taseg_tpu.ops.sparse_conv import _conv_fwd_impl
from taseg_tpu.ops.tgf import _tgf_fwd_impl, _take_rows
from taseg_tpu.data.synthetic import synthetic_scan
from taseg_tpu.data.voxel_dataset import VoxelPipeline, collate_shard
from scratch.tutil import timed, timed_chain

pipe = VoxelPipeline(voxel_size=0.05, training=False)
rng = np.random.default_rng(0)
N = int(os.environ.get("AN_POINTS", "120000"))
CAP = (N * 131072 // 120000 + 255) // 256 * 256
pts, labels = synthetic_scan(rng, N)
ring = np.zeros((len(pts), 1), np.float32)
s = pipe({"xyzret": np.concatenate([pts, ring], 1), "labels": labels})
arrays = collate_shard([s], CAP)
coords = jnp.asarray(arrays["point_coords"])
num = jnp.asarray(arrays["num_points"][0])
caps0 = UNetCapacities.for_points(CAP)
topo = jax.jit(
    lambda c, n: build_unet_topology(c, n, caps0, devox_pairs=False)
)(coords, num)
caps = UNetCapacities.fit(
    CAP, [int(np.asarray(lt.num)) for lt in topo.levels], margin=1.1
)
topo = jax.jit(
    lambda c, n: build_unet_topology(c, n, caps, devox_pairs=False)
)(coords, num)


def build_f3_plan(rb):
    """st (9, V) window starts; od (9, 3, V) in {0,1,2, 3=absent}."""
    v = rb.shape[1]
    sts, ods, kms = [], [], []
    for g in range(9):
        dz, dx = divmod(g, 3)
        km = dz * 9 + dx
        rm, rc, rp = rb[km], rb[km + 3], rb[km + 6]
        big = jnp.int32(1 << 30)
        mn = jnp.minimum(
            jnp.minimum(
                jnp.where(rm >= 0, rm, big), jnp.where(rc >= 0, rc, big)
            ),
            jnp.where(rp >= 0, rp, big),
        )
        st = jnp.clip(jnp.where(mn == big, 0, mn), 0, v - 3)
        od = [
            jnp.where(r >= 0, r - st, 3).astype(jnp.int32)
            for r in (rm, rc, rp)
        ]
        sts.append(st)
        ods.append(jnp.stack(od))
        kms.append(km)
    return jnp.stack(sts), jnp.stack(ods), kms


def f3sel(f, w, st, od, kms, one_mm=True):
    v, c = f.shape
    w = w.astype(f.dtype)
    z1 = jnp.zeros((1, c), f.dtype)
    f_u1 = jnp.concatenate([f[1:], z1], 0)
    f_u2 = jnp.concatenate([f[2:], z1, z1], 0)
    f3 = jnp.concatenate([f, f_u1, f_u2], 1)  # (V, 3C)
    out = None
    for g in range(9):
        km = kms[g]
        G = _take_rows(f3, st[g])  # (V, 3C)
        w0, w1, w2 = G[:, :c], G[:, c : 2 * c], G[:, 2 * c :]
        sels = []
        for d in range(3):
            o = od[g, d]
            pick = jax.lax.select_n(
                jnp.clip(o, 0, 2)[:, None] * jnp.ones((1, c), jnp.int32),
                w0, w1, w2,
            )
            sels.append(jnp.where((o <= 2)[:, None], pick, 0))
        if one_mm:
            a = jnp.concatenate(sels, 1)  # (V, 3C)
            wg = jnp.concatenate([w[km], w[km + 3], w[km + 6]], 0)
            c_g = jnp.dot(a, wg, preferred_element_type=jnp.float32)
        else:
            c_g = jnp.dot(sels[0], w[km], preferred_element_type=jnp.float32)
            c_g += jnp.dot(
                sels[1], w[km + 3], preferred_element_type=jnp.float32
            )
            c_g += jnp.dot(
                sels[2], w[km + 6], preferred_element_type=jnp.float32
            )
        out = c_g if out is None else out + c_g
    return out.astype(f.dtype)


for lvl, c_in, c_out in [(0, 128, 96), (0, 96, 96), (1, 128, 96),
                         (1, 96, 96), (0, 32, 32)]:
    lt = topo.levels[lvl]
    rb = lt.rb_k3
    v = rb.shape[1]
    nv = int(np.asarray(lt.num))
    kf = jax.random.PRNGKey(lvl)
    feats = jax.random.normal(kf, (v, c_in), jnp.bfloat16)
    weight = (
        jax.random.normal(jax.random.PRNGKey(7), (27, c_in, c_out),
                          jnp.float32) * 0.05
    )
    kms = [divmod(g, 3)[0] * 9 + divmod(g, 3)[1] for g in range(9)]
    st, od = jax.jit(lambda rb: build_f3_plan(rb)[:2])(rb)

    j27 = jax.jit(lambda f, w, rb=rb: _conv_fwd_impl(f, w, rb))
    jf3 = jax.jit(lambda f, w, st=st, od=od: f3sel(f, w, st, od, kms, True))
    jf3m = jax.jit(
        lambda f, w, st=st, od=od: f3sel(f, w, st, od, kms, False)
    )
    r27 = np.asarray(j27(feats, weight)).astype(np.float32)
    rf3 = np.asarray(jf3(feats, weight)).astype(np.float32)
    ok = np.arange(v) < nv
    rel = np.abs(rf3[ok] - r27[ok]).max() / (np.abs(r27[ok]).max() + 1e-9)
    t27 = timed(lambda: j27(feats, weight), n=20) * 1e3
    tf3 = timed(lambda: jf3(feats, weight), n=20) * 1e3
    tf3m = timed(lambda: jf3m(feats, weight), n=20) * 1e3
    line = (
        f"L{lvl} C{c_in}->{c_out} V={v} n={nv}: conv27 {t27:.3f}, "
        f"f3 {tf3:.3f}, f3-3mm {tf3m:.3f} ms, rel {rel:.2e}"
    )
    if c_in <= 64:
        jtg = jax.jit(lambda f, w, tab=lt.tgf: _tgf_fwd_impl(f, w, tab))
        rtg = np.asarray(jtg(feats, weight)).astype(np.float32)
        relg = np.abs(rtg[ok] - r27[ok]).max() / (
            np.abs(r27[ok]).max() + 1e-9
        )
        ttg = timed(lambda: jtg(feats, weight), n=20) * 1e3
        line += f", tgf {ttg:.3f} ms (rel {relg:.2e})"
    print(line, flush=True)

    # chained (dispatch-free) A/B at the hottest shape
    if (lvl, c_in) in ((0, 128), (0, 32)):
        if c_in == c_out:
            timed_chain(
                f"  chained conv27 L{lvl} C{c_in}",
                lambda f: _conv_fwd_impl(f, weight, rb), feats, n=10,
            )
            timed_chain(
                f"  chained f3     L{lvl} C{c_in}",
                lambda f: f3sel(f, weight, st, od, kms, True), feats, n=10,
            )
            if c_in <= 64:
                timed_chain(
                    f"  chained tgf    L{lvl} C{c_in}",
                    lambda f: _tgf_fwd_impl(f, weight, lt.tgf), feats, n=10,
                )
