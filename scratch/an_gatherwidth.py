"""Row-gather rate vs row width (bf16 lanes), rand vs diag order.

an_slabgather showed 192 B rows at ~265 M rows/s but 576 B rows at only
26-48 M rows/s — locating the cliff decides whether f3's (V, 3C) packed
gather should split into narrower column groups at wide channels.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
import sys, os as _os

sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from tutil import drain  # noqa: E402


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
    diag = np.clip(
        (np.arange(N) * (V / N)).astype(np.int32)
        + rng.integers(-4, 5, N).astype(np.int32),
        0,
        V - 1,
    ).astype(np.int32)
    for width in (32, 64, 96, 128, 144, 192, 224, 256, 288, 384, 576):
        src = jnp.ones((V, width), jnp.bfloat16)
        for name, idx, flag in (
            ("rand", rand, False),
            ("diag", diag, False),
            ("diag", diag, True),
        ):
            t = timeit(make_gather(flag), src, jnp.asarray(idx))
            print(
                f"w={width:4d} ({width*2:4d} B) {name:4s} srt={int(flag)} "
                f"{N / t / 1e6:7.1f} Mrows/s  {N * width * 2 / t / 1e9:7.1f} GB/s"
            )


if __name__ == "__main__":
    main()
