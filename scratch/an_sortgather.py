"""Probe: does index ORDER (locality) change the TPU row-gather rate?

The conv gathers' indices are near-monotone (sorted keys + constant
offset => non-decreasing target rows, modulo absent-row clips).  bench.py
probes with uniform-random indices; if sorted or near-diagonal indices
gather materially faster, the roofline floor in BENCH is overstated and
the right fix is keeping st_g monotone (carry last value on absent rows)
+ indices_are_sorted=True.
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


def make_gather(sorted_flag):
    @jax.jit
    def g(src, idx):
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,)
        )
        return jax.lax.gather(
            src, idx[:, None], dn, slice_sizes=(1, src.shape[1]),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
            indices_are_sorted=sorted_flag,
        )
    return g


def main():
    rng = np.random.default_rng(1)
    V = 262144
    N = 1048576
    rand = rng.integers(0, V, N).astype(np.int32)
    srt = np.sort(rand)
    # near-diagonal: like st_g — monotone ramp + small jitter
    diag = np.clip(
        (np.arange(N) * (V / N)).astype(np.int32)
        + rng.integers(-4, 5, N).astype(np.int32),
        0, V - 1,
    ).astype(np.int32)
    for width in (32, 96, 288):
        src = jnp.ones((V, width), jnp.bfloat16)
        for name, idx in (("rand", rand), ("sorted", srt), ("diag", diag)):
            idx_d = jnp.asarray(idx)
            for flag in (False, True):
                t = timeit(make_gather(flag), src, idx_d)
                print(
                    f"w={width:4d} {name:6s} sorted_flag={int(flag)} "
                    f"{N / t / 1e6:8.1f} Mrows/s  {N * width * 2 / t / 1e9:7.1f} GB/s"
                )


if __name__ == "__main__":
    main()
