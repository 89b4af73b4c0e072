"""Probe: XLA gather rate vs rows-per-index (slab gathers).

The conv gathers are row-rate-bound (~194 M rows/s, ~37 GB/s at 192 B
rows).  If the binding resource is the INDEX issue rate rather than rows,
a gather with slice_sizes=(S, C) fetching S contiguous rows per index
moves S x the bytes at the same cost — the lever for a block-window conv
(each block of B outputs reads one W-row window per group, selecting
locally).  Measures Mindices/s and effective Mrows/s for
S in {1, 4, 8, 16, 32} at widths 96 and 288 (bf16), random + diagonal
index order, with/without indices_are_sorted.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
import sys, os as _os
sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


from tutil import drain  # noqa: E402  (module-level jitted drain)


def timeit(fn, *args, n=10):
    out = fn(*args)
    drain(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    drain(out)
    return (time.perf_counter() - t0) / n


def make_slab_gather(s, sorted_flag):
    @jax.jit
    def g(src, idx):
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0,)
        )
        out = jax.lax.gather(
            src,
            idx[:, None],
            dn,
            slice_sizes=(s, src.shape[1]),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
            indices_are_sorted=sorted_flag,
        )
        # reduce so the drain is cheap and the gather can't be elided
        return out.sum(axis=(0, 1))

    return g


def main():
    rng = np.random.default_rng(1)
    V = 262144
    for width in (96, 288):
        src = jnp.ones((V, width), jnp.bfloat16)
        for s in (1, 4, 8, 16, 32):
            n_idx = 2097152 // s  # constant total rows moved
            rand = rng.integers(0, V - s, n_idx).astype(np.int32)
            diag = np.clip(
                (np.arange(n_idx) * ((V - s) / n_idx)).astype(np.int32),
                0,
                V - s - 1,
            ).astype(np.int32)
            for name, idx in (("rand", rand), ("diag", diag)):
                idx_d = jnp.asarray(idx)
                for flag in ((False, True) if name == "diag" else (False,)):
                    t = timeit(make_slab_gather(s, flag), src, idx_d)
                    rows = n_idx * s
                    print(
                        f"w={width:3d} S={s:2d} {name:4s} srt={int(flag)} "
                        f"{n_idx / t / 1e6:7.1f} Midx/s "
                        f"{rows / t / 1e6:8.1f} Mrows/s "
                        f"{rows * width * 2 / t / 1e9:7.1f} GB/s"
                    )


if __name__ == "__main__":
    main()
