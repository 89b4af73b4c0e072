"""Cascade (separable data-movement) conv probe — NEGATIVE RESULT.

MEASURED WRITE-OFF (2026-08-19, CPU exactness harness below): separable
data movement is WRONG on sparse coordinate sets.  Composing per-axis
gathers (z then x) reaches a diagonal neighbor only THROUGH an occupied
intermediate site — but e.g. (z-1, x-1, y) can be occupied while
(z, x-1, y) is not, and the rulebook (torchsparse semantics) matches the
diagonal regardless.  Per-offset check: all 7 axis-aligned offsets exact,
all 20 diagonal offsets wrong (err ~3.4 on unit-scale data).  Any single
routing order misses matches; summing both orders double-counts.  Do not
revisit without a dilated intermediate site set (costs more than it
saves).

Original design note kept below for context.

Measured facts driving the design (an_gatherrate, honest drain): XLA row
gathers are ROW-bound at a rate roughly flat in row width up to >=192 B
(~80-90 M rows/s sorted); Mosaic dynamic_gather is ~0.8 M rows/s (dead);
per-window DMA issue is ~1 us (dead).  So the only lever left is FEWER
GATHER ROWS.  The 27-point stride-1 conv's data movement is separable
even though its weights are not:

  Z = [g(z-1) | f | g(z+1)]        2 gathers at C width    (V, 3C)
  X = [Z(x-1) | Z | Z(x+1)]        2 gathers at 3C width   (V, 9C)
  out = shift_dn(X) @ Wm + X @ Wc + shift_up(X) @ Wp       (dy by SHIFTS)

i.e. 4V gather rows/conv vs f3's 9V and the 27-path's 27V, with the dy
axis handled by the sort-order adjacency invariant (keys sort (b,z,x,y);
a present y-neighbor is the adjacent row) as pure shifted reads + masks.
FLOPs identical to the conv (3 x (V,9C)@(9C,C_out) = 27*V*C*C_out MACs).

This probe checks exactness vs sparse_conv_apply on a REAL synthetic
topology and times 27 / f3 / tgf / cascade per conv shape.
"""

import sys

sys.path.insert(0, "/root/repo")
import os

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from scratch.tutil import timed
from taseg_tpu.data.synthetic import synthetic_scan
from taseg_tpu.models import UNetCapacities, build_unet_topology
from taseg_tpu.ops import flip_rulebook, sparse_conv_apply
from taseg_tpu.ops.f3conv import f3_conv_apply
from taseg_tpu.ops.tgf import tgf_conv_apply

# k = (dx+1) + 3*(dy+1) + 9*(dz+1)  (kernel_offsets(3), x-fastest)
K_ZM, K_ZP = 4, 22
K_XM, K_XP = 12, 14
K_YM, K_YP = 10, 16


def _take(f, idx):
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,)
    )
    g = jax.lax.gather(
        f, jnp.clip(idx, 0)[:, None], dn, slice_sizes=(1, f.shape[1]),
        indices_are_sorted=True,
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )
    return jnp.where((idx >= 0)[:, None], g, 0)


def _pack_w(w, d, c_in):
    blocks = []
    for ix in range(3):
        for iz in range(3):
            k = ix + 3 * d + 9 * iz
            blocks.append(w[k])
    return jnp.concatenate(blocks, 0)  # (9C, C_out)


def cascade_conv(feats, w, rb):
    v, c = feats.shape
    # padding rows have no center match (rb[13] == -1); the cascade's
    # center path is the identity, so mask them at the input once
    feats = jnp.where((rb[13] >= 0)[:, None], feats, 0)
    z = jnp.concatenate(
        [_take(feats, rb[K_ZM]), feats, _take(feats, rb[K_ZP])], 1
    )
    x = jnp.concatenate([_take(z, rb[K_XM]), z, _take(z, rb[K_XP])], 1)
    zr = jnp.zeros((1, x.shape[1]), x.dtype)
    m_prev = (rb[K_YM] >= 0)[:, None]
    m_next = (rb[K_YP] >= 0)[:, None]
    xm = jnp.where(m_prev, jnp.concatenate([zr, x[:-1]], 0), 0)
    xp = jnp.where(m_next, jnp.concatenate([x[1:], zr], 0), 0)
    out = (
        jnp.dot(xm, _pack_w(w, 0, c), preferred_element_type=jnp.float32)
        + jnp.dot(x, _pack_w(w, 1, c), preferred_element_type=jnp.float32)
        + jnp.dot(xp, _pack_w(w, 2, c), preferred_element_type=jnp.float32)
    )
    return out.astype(feats.dtype)


def main():
    rng = np.random.default_rng(0)
    pts, _ = synthetic_scan(rng, 120_000)
    ring = np.zeros((len(pts), 1), np.float32)
    coords_f = np.concatenate([pts, ring], 1)
    from taseg_tpu.data.voxel_dataset import VoxelPipeline, collate_shard

    pipe = VoxelPipeline(voxel_size=0.05, training=False)
    s = pipe({"xyzret": coords_f, "labels": np.zeros(len(pts), np.int64)})
    cap = 131072
    arrays = collate_shard([s], cap)
    coords = jnp.asarray(arrays["point_coords"])
    num = jnp.asarray(arrays["num_points"][0])
    caps = UNetCapacities.for_points(cap)
    topo = jax.jit(
        lambda c, n: build_unet_topology(c, n, caps, devox_pairs=False)
    )(coords, num)
    caps = UNetCapacities.fit(
        cap, [int(np.asarray(lt.num)) for lt in topo.levels], margin=1.1
    )
    topo = jax.jit(
        lambda c, n: build_unet_topology(c, n, caps, devox_pairs=False)
    )(coords, num)

    # structural sanity: present y-neighbors are adjacent rows
    for lvl in (0, 1):
        rb = np.asarray(topo.levels[lvl].rb_k3)
        v = rb.shape[1]
        r = rb[K_YM]
        ok = r[r >= 0] == (np.arange(v)[r >= 0] - 1)
        print(f"L{lvl}: y-adjacency holds {ok.all()} "
              f"({(r >= 0).sum()} present)", flush=True)

    for lvl, c_in, c_out in [
        (0, 32, 32), (0, 96, 96), (1, 96, 96), (0, 128, 96), (1, 64, 64),
        (2, 64, 64),
    ]:
        lt = topo.levels[lvl]
        rbj = lt.rb_k3
        v = rbj.shape[1]
        kf = np.random.default_rng(1)
        f32 = jnp.asarray(kf.standard_normal((v, c_in)), jnp.float32)
        w32 = jnp.asarray(
            kf.standard_normal((27, c_in, c_out)) * 0.05, jnp.float32
        )
        # exactness in f32
        ref = jax.jit(
            lambda f, w, rb: sparse_conv_apply(f, w, rb, flip_rulebook(rb))
        )(f32, w32, rbj)
        got = jax.jit(cascade_conv)(f32, w32, rbj)
        err = float(
            jnp.max(jnp.abs(ref - got)) / (jnp.max(jnp.abs(ref)) + 1e-9)
        )
        f = f32.astype(jnp.bfloat16)
        w = w32.astype(jnp.bfloat16)
        t27 = timed(
            jax.jit(
                lambda f, w, rb: sparse_conv_apply(
                    f, w, rb, flip_rulebook(rb)
                )
            ),
            f, w, rbj, n=30,
        )
        tf3 = timed(
            jax.jit(lambda f, w, rb: f3_conv_apply(f, w, rb, rb[::-1])),
            f, w, rbj, n=30,
        )
        tcas = timed(jax.jit(cascade_conv), f, w, rbj, n=30)
        ttgf = float("nan")
        if lt.tgf is not None and c_in <= 64:
            ttgf = timed(
                jax.jit(
                    lambda f, w, rb: tgf_conv_apply(
                        f, w, lt.tgf, lt.tgf_bwd, rb
                    )
                ),
                f, w, rbj, n=30,
            )
        print(
            f"L{lvl} V={v:6d} {c_in:3d}->{c_out:3d}: relerr={err:.2e}  "
            f"27={t27 * 1e3:7.2f}  f3={tf3 * 1e3:7.2f}  "
            f"tgf={ttgf * 1e3:7.2f}  cascade={tcas * 1e3:7.2f} ms",
            flush=True,
        )


if __name__ == "__main__":
    main()
