"""Probe: dense-brick hybrid conv building blocks on the real chip.

Questions (VERDICT r4 next-round #2b):
  P1. How fast is the brick PACK gather (B*64 random narrow rows)?
  P2. How fast are HALO slab gathers — (B,) rows with multi-dim
      slice_sizes (1,sz,sx,sy,C) from a (B,4,4,4,C) dense array?
  P3. How fast is the 27-slice matmul-accumulate dense conv on
      (B,6,6,6,C), vs lax.conv_general_dilated, vs the f3 conv's
      measured per-conv cost at the same (V, C_in, C_out)?

Shapes model the decoder-L0 hot spot: V ~ 98k voxels, brick occupancy
~0.25-0.35 -> B ~ 5-6k occupied 4^3 bricks, C_in 128, C_out 96.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

_first = None


def drain(out):
    global _first
    if _first is None:
        _first = jax.jit(
            lambda x: jax.lax.reshape(x, (x.size,))[:1].astype(jnp.float32)
        )
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(np.asarray(_first(leaf))[0])


def timeit(label, fn, *args, n=10):
    out = fn(*args)
    drain(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    drain(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{label:44s} {dt * 1e3:9.3f} ms", flush=True)
    return dt


def main():
    B = int(os.environ.get("NB", "6144"))      # occupied bricks (padded cap)
    C = int(os.environ.get("C", "128"))        # C_in
    CO = int(os.environ.get("CO", "96"))       # C_out
    V = int(os.environ.get("V", "98304"))      # valid voxels
    rng = np.random.default_rng(0)

    print(f"B={B} C={C} CO={CO} V={V}", flush=True)
    D = jnp.asarray(rng.standard_normal((B, 4, 4, 4, C)), jnp.bfloat16)
    feats = jnp.asarray(rng.standard_normal((V, C)), jnp.bfloat16)
    inv = jnp.asarray(rng.integers(0, V, B * 64, np.int32))
    nbr = jnp.asarray(rng.integers(0, B, (B,), np.int32))
    W = jnp.asarray(rng.standard_normal((27, C, CO)), jnp.bfloat16)

    # P1: pack gather — B*64 random rows of C lanes
    @jax.jit
    def pack(feats, inv):
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,)
        )
        return jax.lax.gather(
            feats, inv[:, None], dn, slice_sizes=(1, C),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        ).reshape(B, 4, 4, 4, C)

    t = timeit(f"P1 pack gather {B * 64} rows x{C}", pack, feats, inv)
    print(f"   -> {B * 64 / t / 1e6:8.1f} Mrows/s  "
          f"{B * 64 * C * 2 / t / 1e9:6.1f} GB/s", flush=True)

    # P2: halo slab gathers at the three piece shapes
    def slab(d, nbr, z0, x0, y0, sz, sx, sy):
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3, 4),
            collapsed_slice_dims=(0,),
            start_index_map=(0, 1, 2, 3),
        )
        idx = jnp.concatenate(
            [
                nbr[:, None],
                jnp.full((B, 1), z0, jnp.int32),
                jnp.full((B, 1), x0, jnp.int32),
                jnp.full((B, 1), y0, jnp.int32),
            ],
            1,
        )
        return jax.lax.gather(
            d, idx, dn, slice_sizes=(1, sz, sx, sy, C),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        )

    for label, (sz, sx, sy) in (
        ("face  (1,4,4)", (1, 4, 4)),
        ("edge  (1,1,4)", (1, 1, 4)),
        ("corner(1,1,1)", (1, 1, 1)),
        ("full  (4,4,4)", (4, 4, 4)),
    ):
        f = jax.jit(
            lambda d, nbr, sz=sz, sx=sx, sy=sy: slab(
                d, nbr, 0, 0, 0, sz, sx, sy
            )
        )
        t = timeit(f"P2 slab gather {label} x{B}", f, D, nbr)
        cells = sz * sx * sy
        print(f"   -> {B / t / 1e6:8.2f} Mrows/s  "
              f"{B * cells * C * 2 / t / 1e9:6.1f} GB/s", flush=True)

    # P2b: full 26-piece halo assembly by nested concat (6 faces,
    # 12 edges, 8 corners; distinct source offsets per piece so XLA
    # cannot CSE any of the 26 gathers away)
    def _rng_1d(dc):
        # slab taken FROM the neighbor in direction dc: +1 -> its low
        # plane, -1 -> its high plane, 0 -> the full extent
        return (3, 1) if dc == -1 else ((0, 1) if dc == 1 else (0, 4))

    @jax.jit
    def halo(d, nbr):
        def piece(dzc, dxc, dyc):
            z0, sz = _rng_1d(dzc)
            x0, sx = _rng_1d(dxc)
            y0, sy = _rng_1d(dyc)
            return slab(d, nbr, z0, x0, y0, sz, sx, sy)

        def xslab(dzc):
            rows = []
            for dxc in (-1, 0, 1):
                mid = d if (dzc == 0 and dxc == 0) else piece(dzc, dxc, 0)
                rows.append(
                    jnp.concatenate(
                        [piece(dzc, dxc, -1), mid, piece(dzc, dxc, 1)], 3
                    )
                )
            return jnp.concatenate(rows, 2)

        return jnp.concatenate([xslab(-1), xslab(0), xslab(1)], 1)

    t_h = timeit("P2b full 26-piece halo assembly", halo, D, nbr)
    halo_bytes = B * 152 * C * 2
    print(f"   -> {halo_bytes / t_h / 1e9:6.1f} GB/s effective", flush=True)

    H = halo(D, nbr)

    # P3a: 27-slice matmul accumulate
    @jax.jit
    def conv_slices(h, w):
        out = None
        for k in range(27):
            dz, r = divmod(k, 9)
            dx, dy = divmod(r, 3)
            a = jax.lax.dynamic_slice(
                h, (0, dz, dx, dy, 0), (B, 4, 4, 4, C)
            ).reshape(B * 64, C)
            c = jnp.dot(a, w[k], preferred_element_type=jnp.float32)
            out = c if out is None else out + c
        return out.astype(h.dtype)

    t3 = timeit("P3a 27-slice matmul dense conv", conv_slices, H, W)
    fl = 27 * B * 64 * C * CO * 2
    print(f"   -> {fl / t3 / 1e12:6.2f} TF/s", flush=True)

    # P3b: lax.conv_general_dilated NDHWC
    @jax.jit
    def conv_xla(h, w):
        return jax.lax.conv_general_dilated(
            h, w.reshape(3, 3, 3, C, CO),
            window_strides=(1, 1, 1), padding="VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32,
        ).astype(h.dtype)

    try:
        t3b = timeit("P3b lax.conv dense conv", conv_xla, H, W)
        print(f"   -> {fl / t3b / 1e12:6.2f} TF/s", flush=True)
    except Exception as e:
        print(f"P3b failed: {e!r}", flush=True)

    # P3c: f3-equivalent cost at same V/C/CO — 9 random gathers of 3C rows
    f3src = jnp.asarray(rng.standard_normal((V, 3 * C)), jnp.bfloat16)
    gidx = jnp.asarray(rng.integers(0, V, (9, V), np.int32))
    Wf = jnp.asarray(rng.standard_normal((9, 3 * C, CO)), jnp.bfloat16)

    @jax.jit
    def f3_like(src, gi, w):
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,)
        )
        out = None
        for g in range(9):
            rows = jax.lax.gather(
                src, gi[g][:, None], dn, slice_sizes=(1, 3 * C),
                mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
            )
            c = jnp.dot(rows, w[g], preferred_element_type=jnp.float32)
            out = c if out is None else out + c
        return out.astype(src.dtype)

    t4 = timeit("P3c f3-equivalent 9x(V,3C) gather+mm", f3_like, f3src, gidx, Wf)
    print(f"   -> brick conv vs f3: {t4 / (t3 + t_h):5.2f}x "
          f"(excl. pack/unpack, incl. halo)", flush=True)


if __name__ == "__main__":
    main()
