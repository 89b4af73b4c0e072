"""Is the gather row-rate cliff at 128 LANES or 256 BYTES?

bf16 gathers run ~200-238 M rows/s up to 128 lanes (256 B) and ~55-70
M rows/s beyond.  If the cliff is a lane count, bitcasting pairs of bf16
lanes into one int32 lane doubles the bytes moved per fast row — the
f3 conv's (V, 3C) packed gathers would bitcast to (V, 3C/2) int32.
Probes int32/f32 at 32..160 lanes and int8 at 128..512 lanes.
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


@jax.jit
def g(src, idx):
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,)
    )
    return jax.lax.gather(
        src, idx[:, None], dn, slice_sizes=(1, src.shape[1]),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )


def main():
    rng = np.random.default_rng(1)
    V = 262144
    N = 1048576
    rand = jnp.asarray(rng.integers(0, V, N).astype(np.int32))
    cases = []
    for w in (32, 64, 96, 128, 144, 160):
        cases.append((jnp.int32, w))
        cases.append((jnp.float32, w))
    for w in (128, 256, 512):
        cases.append((jnp.int8, w))
    for dt, width in cases:
        bpe = jnp.dtype(dt).itemsize
        src = jnp.ones((V, width), dt)
        t = timeit(g, src, rand)
        print(
            f"{jnp.dtype(dt).name:8s} w={width:4d} ({width*bpe:4d} B) "
            f"{N / t / 1e6:7.1f} Mrows/s  {N * width * bpe / t / 1e9:7.1f} GB/s"
        )


if __name__ == "__main__":
    main()
