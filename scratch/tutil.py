"""Honest timing on the axon tunnel: one jit call, lax.scan whose carry is the
full working array, nonlinearly transformed each iteration (abs) so nothing is
loop-invariant, affine-hoistable, or dedupable."""
import time
import jax, jax.numpy as jnp

def timed_chain(label, body, init, n=20, flops=None, bytes_=None, reps=3):
    """body(carry) -> carry (same pytree structure/shape)."""
    @jax.jit
    def run(init):
        def f(c, _):
            return body(c), None
        c, _ = jax.lax.scan(f, init, None, length=n)
        return jax.tree.map(lambda x: jnp.max(jnp.real(x)).astype(jnp.float32), c)
    o = run(init); jax.block_until_ready(o)
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        o = run(init); jax.block_until_ready(o)
        dt = (time.perf_counter() - t0) / n
        best = dt if best is None else min(best, dt)
    extra = ""
    if flops: extra += f"  {flops/best/1e12:.2f} TF/s"
    if bytes_: extra += f"  {bytes_/best/1e9:.0f} GB/s"
    print(f"{label}: {best*1e6:.1f} us/iter{extra}", flush=True)
    return best
