import time
import jax, jax.numpy as jnp
import numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

V, C = 131072, 32
for OC in [2048, 8192, 32768]:
    rng = np.random.default_rng(0)
    idx = jnp.asarray(np.sort(rng.integers(0, V, OC)), jnp.int32)
    NB = 10
    outs = jnp.asarray(rng.standard_normal((NB, V, C)), jnp.float32)
    contrib = jnp.asarray(rng.standard_normal((OC, C)), jnp.float32)
    f = jax.jit(lambda o, c: o.at[idx].add(c))
    r = f(outs[0], contrib); r.block_until_ready()
    t0 = time.perf_counter()
    for i in range(NB): r = f(outs[i], contrib)
    r.block_until_ready()
    print(f"scatter-add {OC} rows into ({V},{C}): {(time.perf_counter()-t0)/NB*1e3:.2f} ms", flush=True)
# also segment-sum-free alternative: gather-based correction of only affected tiles? skip
