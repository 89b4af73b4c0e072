"""Standalone chip probe for the join_scan kernel: BIT-EXACTNESS vs the
XLA cummax formulation on the real backend (the kernel has only ever run
in interpret mode on CPU), then timing.  Covers both modes (classic
join + floor)."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from taseg_tpu.ops.join_scan import BLOCK, join_scan

QSENT = 2**31 - 2


def xla_ref(shi, slo2, srow, num_refs, v, mode):
    is_ref = srow < v
    n = shi.shape[0]
    pos = jnp.arange(n, dtype=jnp.int32)
    differs = jnp.concatenate(
        [jnp.ones((1,), bool),
         (shi[1:] != shi[:-1]) | ((slo2[1:] >> 1) != (slo2[:-1] >> 1))]
    )
    lb = jax.lax.cummax(jnp.where(differs, pos, -1))
    lr = jax.lax.cummax(jnp.where(is_ref, pos, -1))
    ri = jax.lax.cummax(jnp.where(is_ref & (srow < num_refs), srow, -1))
    matched = (lr >= lb) & (ri >= 0) & (shi < QSENT)
    if mode:
        return jnp.where(shi < QSENT, ri * 2 + matched.astype(jnp.int32), -2)
    return jnp.where(matched, ri, -1)


for blocks in (4, 593):  # small compile check + L0-join scale (2.43M rows)
    n = BLOCK * blocks
    rng = np.random.default_rng(0)
    keys = np.sort(rng.integers(0, n, n).astype(np.int64))
    shi = jnp.asarray((keys // 7).astype(np.int32))
    slo2 = jnp.asarray(((keys % 7) * 2 + rng.integers(0, 2, n)).astype(np.int32))
    srow = jnp.asarray(rng.permutation(n).astype(np.int32))
    for mode in (0, 1):
        scalars = jnp.asarray([n // 2, n // 2, QSENT, mode], jnp.int32)
        out = jax.block_until_ready(join_scan(shi, slo2, srow, scalars, n))
        want = jax.block_until_ready(
            jax.jit(xla_ref, static_argnums=(4, 5))(
                shi, slo2, srow, jnp.int32(n // 2), n // 2, mode
            )
        )
        eq = bool(jnp.all(out == want))
        print(f"n={n} mode={mode}: exact={eq}")
        if not eq:
            bad = np.nonzero(np.asarray(out != want))[0][:5]
            print("  first mismatches at", bad, np.asarray(out)[bad],
                  np.asarray(want)[bad])
            sys.exit(1)
    t0 = time.perf_counter()
    for _ in range(20):
        out = join_scan(shi, slo2, srow, scalars, n)
    jax.block_until_ready(out)
    print(f"n={n}: {(time.perf_counter()-t0)/20*1e3:.3f} ms/call")
