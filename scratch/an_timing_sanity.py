"""Is the tunnel memoizing repeated identical executions?  Time the same
matmul three ways: (a) repeated same-args calls + block_until_ready,
(b) chained dependent calls (each output feeds the next input),
(c) same-args calls with a device_get of the result each iteration."""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

a = jnp.ones((2048, 512), jnp.bfloat16)
w = jnp.ones((512, 512), jnp.bfloat16)


@jax.jit
def probe(a, w):
    def body(x, _):
        y = jnp.dot(x, w, preferred_element_type=jnp.bfloat16)
        return y * (1.0 / 512.0), None

    return jax.lax.scan(body, a, None, length=200)[0]


gf = 200 * 2 * 2048 * 512 * 512 / 1e9

o = jax.block_until_ready(probe(a, w))
t0 = time.perf_counter()
for _ in range(5):
    o = probe(a, w)
jax.block_until_ready(o)
t = (time.perf_counter() - t0) / 5
print(f"(a) same-args block:  {t * 1e3:8.3f} ms/call  {gf / t / 1e3:8.1f} TF/s",
      flush=True)

x = a
t0 = time.perf_counter()
for _ in range(5):
    x = probe(x, w)
jax.block_until_ready(x)
t = (time.perf_counter() - t0) / 5
print(f"(b) chained deps:     {t * 1e3:8.3f} ms/call  {gf / t / 1e3:8.1f} TF/s",
      flush=True)

t0 = time.perf_counter()
for _ in range(5):
    r = np.asarray(probe(a, w))
t = (time.perf_counter() - t0) / 5
print(f"(c) same-args fetch:  {t * 1e3:8.3f} ms/call  {gf / t / 1e3:8.1f} TF/s",
      flush=True)
