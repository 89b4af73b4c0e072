"""Honest timing on the axon tunnel.

Two hazards measured on 2026-08-18 (scratch/an_timing_sanity*.py):
  * `block_until_ready` can return WITHOUT draining the execution queue
    (a 200-chained-matmul probe "measured" 3826 TF/s); only a host fetch
    of result-derived bytes reliably drains it.
  * D2H of large buffers runs at ~0.1 MB/s through the tunnel — so the
    drain must fetch a SCALAR derived from the output, via a jitted
    reduction (eager ops dispatch pathologically slowly).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _first_elem(x):
    return jax.lax.reshape(x, (x.size,))[:1].astype(jnp.float32)


def drain(out) -> float:
    """Force completion of everything enqueued before `out` (in-order
    execution) by fetching one f32 derived from its first leaf."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(np.asarray(_first_elem(leaf))[0])


def timed(fn, *args, n=20, reps=3):
    """Best-of-reps mean ms/call with scalar-fetch draining.  The ~20 ms
    fixed drain/dispatch overhead is amortized over n calls; use n >= 50
    for sub-ms work."""
    out = fn(*args)
    drain(out)
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        drain(out)
        dt = (time.perf_counter() - t0) / n
        best = dt if best is None else min(best, dt)
    return best


def timed_chain(label, body, init, n=20, flops=None, bytes_=None, reps=3):
    """body(carry) -> carry (same pytree structure/shape); nothing
    loop-invariant or dedupable, one jit call per rep."""

    @jax.jit
    def run(init):
        def f(c, _):
            return body(c), None

        c, _ = jax.lax.scan(f, init, None, length=n)
        return jax.tree.map(
            lambda x: jnp.max(jnp.real(x)).astype(jnp.float32), c
        )

    o = run(init)
    drain(o)
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        o = run(init)
        drain(o)
        dt = (time.perf_counter() - t0) / n
        best = dt if best is None else min(best, dt)
    extra = ""
    if flops:
        extra += f"  {flops / best / 1e12:.2f} TF/s"
    if bytes_:
        extra += f"  {bytes_ / best / 1e9:.0f} GB/s"
    print(f"{label}: {best * 1e6:.1f} us/iter{extra}", flush=True)
    return best
