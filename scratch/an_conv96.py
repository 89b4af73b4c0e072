"""Decoder-L0 conv formulations A/B at (V=L0 cap, C_in=128, C_out=96).

VERDICT r3 #1b: TGF at 96-128 ch regresses in-model (thr-96 sweep went
131.7 -> 179.8 ms) from the z / [E;FL;FR] materialization writes; the
FLOPs are identical to the 27-path, so the lever is implementation.
Variants probed here:

  conv27    27 per-offset gathers + matmul accumulation (current default
            at C_in > 64)
  tgf       current TGF (9 groups: (C_in,3C) matmul -> e/fl/fr ->
            (3V,C) concat -> 1 gather)
  tgfp      TGF with the gather PACKED by variant: p_g = [E|FL|FR]
            (V, 3C) row-major, gather at (idx mod V), slice by variant
            (rows 3x wider, same row count)
  winsel    windowed INPUT gather: per group ONE gather with
            slice_sizes=(3, C_in) at anchor-1, per-dy select_n of the 3
            window rows, 3 matmuls -- no z materialization at all
  winsel1   winsel but with the 3 selected arrays concatenated into ONE
            (V, 3C_in) @ (3C_in, C_out) matmul per group

plus a gather row-rate sweep vs row width (is the 192 B row-bound claim
still true under the honest drain?).
"""

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
from scratch.tutil import timed

pipe = VoxelPipeline(voxel_size=0.05, training=False)
rng = np.random.default_rng(0)
pts, labels = synthetic_scan(rng, 120_000)
ring = np.zeros((len(pts), 1), np.float32)
s = pipe({"xyzret": np.concatenate([pts, ring], 1), "labels": labels})
arrays = collate_shard([s], 131072)
caps0 = UNetCapacities.for_points(131072)
coords = jnp.asarray(arrays["point_coords"])
num = jnp.asarray(arrays["num_points"][0])
topo = jax.jit(
    lambda c, n: build_unet_topology(c, n, caps0, devox_pairs=False)
)(coords, num)
caps = UNetCapacities.fit(
    131072, [int(np.asarray(lt.num)) for lt in topo.levels], margin=1.1
)
topo = jax.jit(
    lambda c, n: build_unet_topology(c, n, caps, devox_pairs=False)
)(coords, num)

LVL = 0
lt = topo.levels[LVL]
rb = lt.rb_k3
tab = lt.tgf
V = rb.shape[1]
NV = int(np.asarray(lt.num))
C_IN, C_OUT = 128, 96
print(f"L{LVL}: V cap {V}, valid {NV}", flush=True)

kf = jax.random.PRNGKey(0)
feats = jax.random.normal(kf, (V, C_IN), jnp.bfloat16)
weight = (
    jax.random.normal(jax.random.PRNGKey(1), (27, C_IN, C_OUT), jnp.float32)
    * 0.05
)

j27 = jax.jit(lambda f, w: _conv_fwd_impl(f, w, rb))
jtgf = jax.jit(lambda f, w: _tgf_fwd_impl(f, w, tab))


def tgf_packed(f, w):
    """TGF with [E|FL|FR] packed along LANES: same V-row gather count but
    3C-wide rows; variant picked by slice select after the gather."""
    w = w.astype(f.dtype)
    u1 = tab.u1[:, None].astype(f.dtype)
    d1 = tab.d1[:, None].astype(f.dtype)
    u2 = tab.u2[:, None].astype(f.dtype)
    out = None
    for g in range(9):
        km, kc, kp = tab.cols[g]
        wg = jnp.concatenate([w[km], w[kc], w[kp]], axis=1)
        z = jnp.dot(f, wg, preferred_element_type=jnp.float32).astype(
            f.dtype
        )
        zm, zc, zp = (
            z[:, :C_OUT],
            z[:, C_OUT : 2 * C_OUT],
            z[:, 2 * C_OUT :],
        )
        zp_up = jnp.concatenate([zp[1:], jnp.zeros_like(zp[:1])], 0)
        zm_dn = jnp.concatenate([jnp.zeros_like(zm[:1]), zm[:-1]], 0)
        e = zc + d1 * zm_dn + u1 * zp_up
        fl = zm + u2 * zp_up
        p_g = jnp.concatenate([e, fl, zp], 1)  # (V, 3C)
        row = tab.idx[g] % V
        var = tab.idx[g] // V  # 0/1/2
        got = _take_rows(p_g, row)  # (V, 3C)
        sel = jax.lax.select_n(
            var[:, None] * jnp.ones((1, C_OUT), jnp.int32),
            got[:, :C_OUT],
            got[:, C_OUT : 2 * C_OUT],
            got[:, 2 * C_OUT :],
        )
        c = jnp.where(tab.mask[g][:, None], sel, 0)
        out = c if out is None else out + c
    return out


def _win_plan():
    """Per-group anchor-window selectors, host-precomputed from tab."""
    idx = np.asarray(tab.idx)
    mask = np.asarray(tab.mask)
    u1 = np.asarray(tab.u1)
    u2 = np.asarray(tab.u2)
    d1 = np.asarray(tab.d1)
    starts, rows = [], []
    for g in range(9):
        var = idx[g] // V
        a = idx[g] % V
        start = np.clip(a - 1, 0, V - 3)
        # target feats row per dy role (-1 = absent)
        rm = np.where(var == 0, np.where(d1[a], a - 1, -1),
                      np.where(var == 1, a, -1))
        rc = np.where(var == 0, a, -1)
        rp = np.where(var == 0, np.where(u1[a], a + 1, -1),
                      np.where(var == 1, np.where(u2[a], a + 1, -1), a))
        r3 = np.stack([rm, rc, rp])  # (3, V)
        wrow = np.where((r3 >= 0) & mask[g][None], r3 - start[None], -1)
        starts.append(start)
        rows.append(wrow)
    return (
        jnp.asarray(np.stack(starts), jnp.int32),
        jnp.asarray(np.stack(rows), jnp.int32),
    )


w_start, w_rows = _win_plan()


def _gather_win(f, starts):
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0,)
    )
    return jax.lax.gather(
        f, starts[:, None], dn, slice_sizes=(3, f.shape[1]),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )  # (V, 3, C)


def winsel(f, w, one_mm=False):
    w = w.astype(f.dtype)
    out = None
    for g in range(9):
        km, kc, kp = tab.cols[g]
        win = _gather_win(f, w_start[g])  # (V, 3, C_in)
        sels = []
        for r, kk in ((0, km), (1, kc), (2, kp)):
            wr = w_rows[g, r]
            pick = jax.lax.select_n(
                jnp.clip(wr, 0, 2)[:, None] * jnp.ones((1, C_IN), jnp.int32),
                win[:, 0], win[:, 1], win[:, 2],
            )
            sels.append(jnp.where((wr >= 0)[:, None], pick, 0))
        if one_mm:
            sel = jnp.concatenate(sels, 1)  # (V, 3C_in)
            wg = jnp.concatenate([w[km], w[kc], w[kp]], axis=0)
            c = jnp.dot(sel, wg, preferred_element_type=jnp.float32)
        else:
            c = jnp.dot(sels[0], w[km], preferred_element_type=jnp.float32)
            c += jnp.dot(sels[1], w[kc], preferred_element_type=jnp.float32)
            c += jnp.dot(sels[2], w[kp], preferred_element_type=jnp.float32)
        out = c if out is None else out + c
    return out.astype(f.dtype)


jtgfp = jax.jit(tgf_packed)
jwin = jax.jit(lambda f, w: winsel(f, w, False))
jwin1 = jax.jit(lambda f, w: winsel(f, w, True))

r27 = np.asarray(j27(feats, weight)).astype(np.float32)
ok = np.arange(V) < NV
for name, fn in (("tgf", jtgf), ("tgfp", jtgfp), ("win", jwin),
                 ("win1", jwin1)):
    r = np.asarray(fn(feats, weight)).astype(np.float32)
    err = np.abs(r[ok] - r27[ok]).max()
    rel = err / (np.abs(r27[ok]).max() + 1e-9)
    print(f"{name} vs 27: maxabs {err:.4f} rel {rel:.5f}", flush=True)

for name, fn in (("conv27", j27), ("tgf", jtgf), ("tgfp", jtgfp),
                 ("winsel", jwin), ("winsel1", jwin1)):
    t = timed(lambda: fn(feats, weight), n=20)
    print(f"{name}: {t * 1e3:.3f} ms", flush=True)

# ---- gather row-rate vs row width (bf16 table, V rows) ---------------
print("\ngather rate vs width (from (V,C) bf16, V-row sorted gather):")
ridx = jnp.asarray(np.sort(rng.integers(0, NV, V)).astype(np.int32))
for c in (32, 64, 96, 128, 192, 288):
    tbl = jax.random.normal(kf, (V, c), jnp.bfloat16)
    fn = jax.jit(lambda t: _take_rows(t, ridx))
    tt = timed(lambda: fn(tbl), n=30)
    print(
        f"  C={c:4d} ({c*2:4d} B/row): {tt*1e3:7.3f} ms "
        f"= {V / tt / 1e6:6.1f} M rows/s, {V * c * 2 / tt / 1e9:6.1f} GB/s",
        flush=True,
    )

# windowed gather rate: (3, C) slices
print("windowed (3,C) slice gather rate:")
for c in (32, 64, 128):
    tbl = jax.random.normal(kf, (V, c), jnp.bfloat16)
    st = jnp.clip(ridx, 0, V - 3)
    fn = jax.jit(lambda t: _gather_win(t, st))
    tt = timed(lambda: fn(tbl), n=30)
    print(
        f"  C={c:4d}: {tt*1e3:7.3f} ms = {V / tt / 1e6:6.1f} M win/s",
        flush=True,
    )
