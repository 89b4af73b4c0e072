"""Chip A/B: TGF (transform-first, y-fused) sparse conv vs the current
per-offset gather->matmul conv, on REAL rulebooks.

TGF exploits the key sort order (b, z, x, y): dy=+-1 neighbors occupy
adjacent rows.  One wide matmul Z = f @ [W_0..W_26], then per (dx,dz)
group g an output-space array E_g = Z_c + d1*down(Z_m) + u1*up(Z_p) plus
two fallback variants stacked into S_g (3V, C) so every presence pattern
is covered by ONE row gather per group: 9 gathers instead of 27.
Numerically exact (verified below against the reference conv)."""

import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from taseg_tpu.models import UNetCapacities, build_unet_topology
from taseg_tpu.ops.rulebook import kernel_offsets
from taseg_tpu.ops.coords import pack_keys, compute_bounds
from taseg_tpu.ops.sparse_conv import _conv_fwd_impl
from taseg_tpu.data.synthetic import synthetic_scan
from taseg_tpu.data.voxel_dataset import VoxelPipeline, collate_shard

pipe = VoxelPipeline(voxel_size=0.05, training=False)
rng = np.random.default_rng(0)
pts, labels = synthetic_scan(rng, 120_000)
ring = np.zeros((len(pts), 1), np.float32)
s = pipe({"xyzret": np.concatenate([pts, ring], 1), "labels": labels})
arrays = collate_shard([s], 131072)
caps0 = UNetCapacities.for_points(131072)
coords = jnp.asarray(arrays["point_coords"])
num = jnp.asarray(arrays["num_points"][0])
topo = jax.jit(lambda c, n: build_unet_topology(c, n, caps0, devox_pairs=False))(
    coords, num
)
caps = UNetCapacities.fit(
    131072, [int(np.asarray(lt.num)) for lt in topo.levels], margin=1.1
)
topo = jax.jit(lambda c, n: build_unet_topology(c, n, caps, devox_pairs=False))(
    coords, num
)

offs = kernel_offsets(3, stride=1)  # x fastest


def tgf_tables(rb_np, keys_np, num_v, v_cap, stride=1):
    """Host-side TGF tables from a (27, V) rulebook + level keys.

    At stride level s, y-neighbor keys differ by s (coords are multiples
    of s), and adjacency still holds: no voxel key can lie strictly
    between two keys that differ by s at that level."""
    s = stride
    u1 = np.zeros(v_cap, np.bool_)
    d1 = np.zeros(v_cap, np.bool_)
    u2 = np.zeros(v_cap, np.bool_)
    k = keys_np
    nv = num_v
    u1[: nv - 1] = k[1:nv] == k[: nv - 1] + s
    u2[: nv - 1] = k[1:nv] == k[: nv - 1] + 2 * s
    d1[1:nv] = k[1:nv] - s == k[: nv - 1]
    idx = np.zeros((9, v_cap), np.int32)
    mask = np.zeros((9, v_cap), np.bool_)
    for g in range(9):
        # group g: same (dx, dz), roles dy=-1,0,+1 -> columns km, kc, kp
        dz, dx = divmod(g, 3)
        km = (dz * 9) + 0 * 3 + dx
        kc = km + 3
        kp = km + 6
        rm, rc, rp = rb_np[km], rb_np[kc], rb_np[kp]
        any_p = (rm >= 0) | (rc >= 0) | (rp >= 0)
        left = rm >= 0
        fa = np.where(left, rm, rp)
        ix = np.where(rc >= 0, rc, np.where(left, v_cap + fa, 2 * v_cap + fa))
        idx[g] = np.where(any_p, ix, 0)
        mask[g] = any_p
    return (
        jnp.asarray(u1),
        jnp.asarray(d1),
        jnp.asarray(u2),
        jnp.asarray(idx),
        jnp.asarray(mask),
    )


def up(x):  # x[r+1]
    return jnp.concatenate([x[1:], jnp.zeros_like(x[:1])], 0)


def down(x):  # x[r-1]
    return jnp.concatenate([jnp.zeros_like(x[:1]), x[:-1]], 0)


def tgf_conv(f, w, tables, wide_z=True):
    """f (V, Cin) bf16, w (27, Cin, Cout)."""
    u1, d1, u2, idx, mask = tables
    v, c_in = f.shape
    k, _, c_out = w.shape
    u1b = u1[:, None].astype(f.dtype)
    d1b = d1[:, None].astype(f.dtype)
    u2b = u2[:, None].astype(f.dtype)
    if wide_z == "batched":
        # (27, V, C) layout: each offset's block is row-contiguous
        z = jnp.einsum(
            "vc,kco->kvo", f, w.astype(f.dtype),
            preferred_element_type=jnp.float32,
        ).astype(f.dtype)

        def zk(kk):
            return z[kk]

    elif wide_z:
        wf = jnp.transpose(w, (1, 0, 2)).reshape(c_in, k * c_out).astype(f.dtype)
        z = jnp.dot(f, wf, preferred_element_type=jnp.float32).astype(f.dtype)
        z = z.reshape(v, k, c_out)

        def zk(kk):
            return z[:, kk]

    else:
        wb = w.astype(f.dtype)

        def zk(kk):
            return jnp.dot(f, wb[kk], preferred_element_type=jnp.float32).astype(
                f.dtype
            )

    out = None
    for g in range(9):
        dz, dx = divmod(g, 3)
        km = dz * 9 + dx
        zm, zc, zp = zk(km), zk(km + 3), zk(km + 6)
        e = zc + d1b * down(zm) + u1b * up(zp)
        fl = zm + u2b * up(zp)
        s = jnp.concatenate([e, fl, zp], 0)  # (3V, Cout)
        g_rows = jnp.take(s, idx[g], axis=0)
        c = jnp.where(mask[g][:, None], g_rows, 0)
        out = c if out is None else out + c
    return out


def timeit(fn, *args, n=30):
    o = fn(*args)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(n):
        o = fn(*args)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / n


bounds = topo.bounds
shapes = [(0, 96, 96), (0, 4, 32), (0, 32, 32), (1, 32, 32), (1, 128, 96),
          (2, 64, 64), (3, 128, 128), (4, 256, 256)]
for lvl, c_in, c_out in shapes:
    lt = topo.levels[lvl]
    v_cap = lt.coords.shape[0]
    nv = int(np.asarray(lt.num))
    rb_np = np.asarray(lt.rb_k3)
    valid = np.arange(v_cap) < nv
    hi, lo = pack_keys(lt.coords, bounds, jnp.asarray(valid))
    keys_np = np.asarray(hi).astype(np.int64) * (2**31) + np.asarray(lo)
    tabs = tgf_tables(rb_np, keys_np, nv, v_cap, stride=2**lvl)

    rngk = jax.random.PRNGKey(0)
    f = jax.random.normal(rngk, (v_cap, c_in), jnp.float32).astype(jnp.bfloat16)
    f = jnp.where(jnp.asarray(valid)[:, None], f, 0)
    w = jax.random.normal(rngk, (27, c_in, c_out), jnp.float32) * 0.1

    ref_fn = jax.jit(lambda f, w: _conv_fwd_impl(f, w, lt.rb_k3))
    o_ref = np.asarray(ref_fn(f, w), np.float32)
    scale = np.abs(o_ref).max() + 1e-6
    t_ref = timeit(ref_fn, f, w)
    line = f"L{lvl} V={v_cap} {c_in:3d}->{c_out:3d}: ref {t_ref*1e3:7.3f}"
    for name, mode in (("wideZ", True), ("perK", False), ("batZ", "batched")):
        fn = jax.jit(lambda f, w, m=mode: tgf_conv(f, w, tabs, wide_z=m))
        o = np.asarray(fn(f, w), np.float32)
        err = np.abs(o_ref - o).max() / scale
        t = timeit(fn, f, w)
        line += f"  {name} {t*1e3:7.3f} ({t_ref/t:4.2f}x, e{err:.0e})"
    print(line)
