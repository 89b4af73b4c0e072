"""Probe: are int32 ROW gathers faster when bitcast to bf16 lanes?

Commit 0839279 measured 32-bit dtypes gathering at ~74 Mrows/s at ANY
width while bf16 rows <= 128 lanes run 200-238 Mrows/s.  If the engine
keys on element type (not bytes), bitcasting an (V, C) int32 table to
(V, 2C) bf16, gathering, and bitcasting back is a free ~3x for every
integer table gather in the topology (ancestor chains, corner tables,
rulebook row reads).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

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
    return float(np.asarray(_first(jax.tree_util.tree_leaves(out)[0]))[0])


def timeit(label, fn, *args, n=20):
    out = fn(*args)
    drain(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    drain(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{label:40s} {dt * 1e3:8.3f} ms", flush=True)
    return dt


def take_rows(src, idx):
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,)
    )
    return jax.lax.gather(
        src, idx[:, None], dn, slice_sizes=(1, src.shape[1]),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )


def main():
    rng = np.random.default_rng(0)
    V = int(os.environ.get("V", "131072"))
    N = int(os.environ.get("N", "131072"))
    for C in (1, 8, 27):
        src = jnp.asarray(
            rng.integers(-(2**30), 2**30, (V, C), np.int64).astype(np.int32)
        )
        idx = jnp.asarray(rng.integers(0, V, N, np.int32))

        f_i32 = jax.jit(lambda s, i: take_rows(s, i))

        def via_i16(s, i):
            # int16 lanes: a bf16 detour would canonicalize NaN bit
            # patterns inside the gather; integer lanes are bit-exact
            b = jax.lax.bitcast_convert_type(s, jnp.int16)  # (V, C, 2)
            b = b.reshape(V, 2 * C)
            g = take_rows(b, i)
            return jax.lax.bitcast_convert_type(
                g.reshape(N, C, 2), jnp.int32
            )

        f_bc = jax.jit(via_i16)
        a = np.asarray(f_i32(src, idx))
        b = np.asarray(f_bc(src, idx))
        assert (a == b).all(), f"bitcast mismatch at C={C}"
        t1 = timeit(f"int32 rows C={C:2d} direct", f_i32, src, idx)
        t2 = timeit(f"int32 rows C={C:2d} via i16 bitcast", f_bc, src, idx)
        print(f"   -> {N / t1 / 1e6:7.1f} vs {N / t2 / 1e6:7.1f} Mrows/s "
              f"({t1 / t2:4.2f}x)", flush=True)


if __name__ == "__main__":
    main()
