import time
import jax, jax.numpy as jnp
import numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

V, C, K = 131072, 32, 27
rng = np.random.default_rng(0)
# realistic monotone rulebook
rb = np.zeros((K, V), np.int32)
for k in range(K):
    idx = np.clip(np.arange(V) + rng.integers(-500, 500)
                  + rng.integers(-3, 4, V).cumsum() // 7, 0, V - 1)
    rb[k] = np.where(rng.random(V) < 0.15, idx, 0)  # clamp -1 -> 0 form
rbj = jnp.asarray(rb)
NB = 10
feats = jnp.asarray(rng.standard_normal((NB, V, C)), jnp.bfloat16)
w = jnp.asarray(rng.standard_normal((K, C, C)) * 0.05, jnp.bfloat16)

def timeit(name, f):
    o = f(feats[0]); o.block_until_ready()
    t0 = time.perf_counter()
    for i in range(NB): o = f(feats[i])
    o.block_until_ready()
    print(f"{name}: {(time.perf_counter()-t0)/NB*1e3:.2f} ms", flush=True)

# A: plain take (current path shape)
@jax.jit
def conv_plain(f):
    g = f[rbj]  # (K, V, C)
    return jnp.einsum("kvi,kio->vo", g, w, preferred_element_type=jnp.float32)
timeit("plain-take", conv_plain)

# B: sorted+unique hints via lax.gather per offset
from jax import lax
dn = lax.GatherDimensionNumbers(
    offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,)
)
@jax.jit
def conv_hints(f):
    def one(rbk):
        return lax.gather(
            f, rbk[:, None], dn, slice_sizes=(1, C),
            indices_are_sorted=True, unique_indices=False,
            mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        )
    g = jax.vmap(one)(rbj)
    return jnp.einsum("kvi,kio->vo", g, w, preferred_element_type=jnp.float32)
timeit("sorted-hints", conv_hints)

# C: per-offset loop accumulate (no (K,V,C) materialization)
@jax.jit
def conv_loop(f):
    acc = jnp.zeros((V, C), jnp.float32)
    for k in range(K):
        g = lax.gather(
            f, rbj[k][:, None], dn, slice_sizes=(1, C),
            indices_are_sorted=True,
            mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        )
        acc += jnp.dot(g, w[k], preferred_element_type=jnp.float32)
    return acc
timeit("loop-hints", conv_loop)
