import sys; sys.path.insert(0, "/root/repo/scratch")
import jax, jax.numpy as jnp
import numpy as np
from tutil import timed_chain

# 1. MXU
for (M, K, N) in [(4096, 4096, 4096), (131072, 128, 128), (131072, 128, 512),
                  (131072, 512, 512), (16384, 256, 256), (131072, 864, 32)]:
    a = jax.random.normal(jax.random.PRNGKey(0), (M, K), jnp.bfloat16)
    b = jax.random.normal(jax.random.PRNGKey(1), (K, N), jnp.bfloat16) * 0.02
    def body(a, b=b, K=K):
        o = jnp.dot(a, b, preferred_element_type=jnp.float32)
        if N >= K: o = o[:, :K]
        else: o = jnp.tile(o, (1, K // N))
        return jnp.abs(o).astype(jnp.bfloat16)
    timed_chain(f"mm ({M},{K})@({K},{N})", body, a, flops=2*M*K*N)

# 2. HBM bandwidth
x = jax.random.normal(jax.random.PRNGKey(2), (8192, 8192), jnp.bfloat16)
timed_chain("eltwise 134MB rw", lambda x: jnp.abs(x * 0.999 + 0.001).astype(jnp.bfloat16),
            x, bytes_=2*8192*8192*2)

# 3. XLA row gather (27,V) from (V,32)
V = 131072
rng = np.random.default_rng(0)
idx = jnp.asarray(rng.integers(0, V, (27, V)), jnp.int32)
f0 = jax.random.normal(jax.random.PRNGKey(3), (V, 32), jnp.bfloat16)
def gbody(f):
    g = f[idx]                      # (27, V, 32)
    return jnp.abs(g.mean(0)).astype(jnp.bfloat16)
timed_chain("row-gather 27xV (V,32)", gbody, f0, bytes_=27*V*64)

# 4. sort: carry keys, nonlinear scramble each iter
for n_rows in [131072, 1_000_000, 3_700_000]:
    keys = jnp.asarray(rng.integers(0, 2**31 - 1, n_rows), jnp.int32)
    lo = jnp.asarray(rng.integers(0, 2**30, n_rows), jnp.int32)
    def sbody(c, n_rows=n_rows):
        k, l = c
        pm = jnp.arange(n_rows, dtype=jnp.int32)
        sk, sl, sp = jax.lax.sort((k, l, pm), num_keys=2)
        return (sk ^ (sl >> 3), sl ^ (sp >> 2))
    timed_chain(f"sort3 {n_rows}", sbody, (keys, lo), bytes_=n_rows*12)
