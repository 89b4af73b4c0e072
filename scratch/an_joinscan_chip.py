"""Standalone chip probe for the join_scan kernel (compile + timing)."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from taseg_tpu.ops.join_scan import BLOCK, join_scan

for blocks in (4, 593):  # small compile check + L0-join scale (2.43M rows)
    n = BLOCK * blocks
    rng = np.random.default_rng(0)
    shi = jnp.asarray(np.sort(rng.integers(0, 1000, n)).astype(np.int32))
    slo2 = jnp.asarray(rng.integers(0, 100, n).astype(np.int32))
    srow = jnp.asarray(rng.permutation(n).astype(np.int32))
    scalars = jnp.asarray([n // 2, n // 2, 2**31 - 2, 0], jnp.int32)
    t0 = time.perf_counter()
    out = join_scan(shi, slo2, srow, scalars, n)
    jax.block_until_ready(out)
    print(f"n={n}: compile+run {time.perf_counter()-t0:.1f} s")
    t0 = time.perf_counter()
    for _ in range(20):
        out = join_scan(shi, slo2, srow, scalars, n)
    jax.block_until_ready(out)
    print(f"n={n}: {(time.perf_counter()-t0)/20*1e3:.3f} ms/call")
