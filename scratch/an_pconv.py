"""Pallas fused gather+GEMM sparse conv vs conv27/TGF at decoder shapes.

The XLA conv27 path round-trips every gathered (V, C) intermediate through
HBM (27 gathers + 27 matmuls per conv).  If Mosaic's dynamic gather
(take_along_axis lowering, verified exact in an_dyngather.py) runs at
vector speed, a kernel that keeps feats WHOLE in VMEM and does
gather->matmul->accumulate per output tile never touches HBM between
offsets: reads feats once, writes out once.

Probed at the real L0/L1 decoder shapes (V~86k/55k, 128->96, 96->96) on
real rulebooks, parity vs _conv_fwd_impl.

AN_INTERPRET=1 runs the kernel in interpret mode (correctness anywhere).
"""

import functools
import os
import sys

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from taseg_tpu.models import UNetCapacities, build_unet_topology
from taseg_tpu.ops.sparse_conv import _conv_fwd_impl
from taseg_tpu.ops.tgf import _tgf_fwd_impl
from taseg_tpu.data.synthetic import synthetic_scan
from taseg_tpu.data.voxel_dataset import VoxelPipeline, collate_shard
from scratch.tutil import timed

INTERPRET = bool(int(os.environ.get("AN_INTERPRET", "0")))
TILE = int(os.environ.get("AN_TILE", "1024"))


def pconv(feats, weight, rb, *, tile=TILE, interpret=INTERPRET):
    """feats (V, C_in) bf16, weight (27, C_in, C_out), rb (27, V) int32."""
    v, c_in = feats.shape
    k, _, c_out = weight.shape
    vp = (v + tile - 1) // tile * tile
    if vp != v:
        rb = jnp.pad(rb, ((0, 0), (0, vp - v)), constant_values=-1)
    w = weight.astype(feats.dtype)

    def kernel(f_ref, rb_ref, w_ref, o_ref):
        t = rb_ref.shape[1]
        acc = jnp.zeros((t, c_out), jnp.float32)
        for kk in range(k):
            idx = rb_ref[kk]
            m = idx >= 0
            i2 = jnp.broadcast_to(
                jnp.where(m, idx, 0)[:, None], (t, c_in)
            )
            g = jnp.take_along_axis(f_ref[:], i2, axis=0)
            g = jnp.where(m[:, None], g, jnp.zeros((), f_ref.dtype))
            acc += jnp.dot(g, w_ref[kk], preferred_element_type=jnp.float32)
        o_ref[:] = acc.astype(o_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid=(vp // tile,),
        out_shape=jax.ShapeDtypeStruct((vp, c_out), feats.dtype),
        in_specs=[
            pl.BlockSpec((v, c_in), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tile), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, c_in, c_out), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, c_out), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(feats, rb, w)
    return out[:v]


def main():
    pipe = VoxelPipeline(voxel_size=0.05, training=False)
    rng = np.random.default_rng(0)
    n_pts = int(os.environ.get("AN_POINTS", "120000"))
    cap = (n_pts * 131072 // 120000 + 255) // 256 * 256
    pts, labels = synthetic_scan(rng, n_pts)
    ring = np.zeros((len(pts), 1), np.float32)
    s = pipe({"xyzret": np.concatenate([pts, ring], 1), "labels": labels})
    arrays = collate_shard([s], cap)
    caps0 = UNetCapacities.for_points(cap)
    coords = jnp.asarray(arrays["point_coords"])
    num = jnp.asarray(arrays["num_points"][0])
    topo = jax.jit(
        lambda c, n: build_unet_topology(c, n, caps0, devox_pairs=False)
    )(coords, num)
    caps = UNetCapacities.fit(
        cap, [int(np.asarray(lt.num)) for lt in topo.levels], margin=1.1
    )
    topo = jax.jit(
        lambda c, n: build_unet_topology(c, n, caps, devox_pairs=False)
    )(coords, num)

    for lvl, c_in, c_out in [(0, 128, 96), (0, 96, 96), (1, 128, 96),
                             (0, 32, 32), (2, 64, 64)]:
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
        j27 = jax.jit(lambda f, w, rb=rb: _conv_fwd_impl(f, w, rb))
        jpc = jax.jit(lambda f, w, rb=rb: pconv(f, w, rb))
        r27 = np.asarray(j27(feats, weight)).astype(np.float32)
        try:
            rpc = np.asarray(jpc(feats, weight)).astype(np.float32)
        except Exception as e:  # noqa: BLE001
            print(f"L{lvl} C{c_in}->{c_out}: pconv FAILED "
                  f"{type(e).__name__}: {str(e)[:300]}", flush=True)
            continue
        ok = np.arange(v) < nv
        rel = np.abs(rpc[ok] - r27[ok]).max() / (
            np.abs(r27[ok]).max() + 1e-9
        )
        t27 = timed(lambda: j27(feats, weight), n=20) * 1e3
        tpc = timed(lambda: jpc(feats, weight), n=20) * 1e3
        line = (
            f"L{lvl} C{c_in}->{c_out} V={v} n={nv}: conv27 {t27:.3f} ms, "
            f"pconv {tpc:.3f} ms, rel {rel:.2e}"
        )
        if c_in <= 64:
            jtg = jax.jit(
                lambda f, w, tab=lt.tgf: _tgf_fwd_impl(f, w, tab)
            )
            ttg = timed(lambda: jtg(feats, weight), n=20) * 1e3
            line += f", tgf {ttg:.3f} ms"
        print(line, flush=True)


if __name__ == "__main__":
    main()
