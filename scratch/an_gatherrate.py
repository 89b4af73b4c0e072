"""Gather throughput vs row width on the chip: rows/s and GB/s for the
27-narrow-gather conv pattern at each channel width the model uses."""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

dn = jax.lax.GatherDimensionNumbers(
    offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,)
)


def timeit(fn, *args, n=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


rng = np.random.default_rng(0)

for V, C in [
    (86784, 32), (86784, 96), (86784, 4),
    (55296, 32), (55296, 96),
    (25600, 64), (25600, 128),
    (10240, 128), (10240, 256),
    (3584, 256),
]:
    feats = jnp.asarray(rng.standard_normal((V, C)), jnp.bfloat16)
    idx = np.sort(rng.integers(0, V, (27, V)).astype(np.int32), axis=1)
    idx = jnp.asarray(idx)

    def g1(feats, ids):
        return jax.lax.gather(
            feats, ids[:, None], dn, slice_sizes=(1, feats.shape[1]),
            indices_are_sorted=True,
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        )

    @jax.jit
    def gathers27(feats, idx):
        return sum(jnp.sum(g1(feats, idx[k]).astype(jnp.float32)) for k in range(27))

    t = timeit(gathers27, feats, idx)
    rows = 27 * V
    gb = rows * C * 2 / 1e9
    print(
        f"V={V:6d} C={C:3d}: {t*1e3:7.2f} ms  {rows/t/1e6:7.1f} M rows/s"
        f"  {gb/t:6.1f} GB/s"
    )
