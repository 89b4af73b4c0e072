"""Scalar-fetch timing: does fetching a 4-byte reduction drain the pipe
at sane cost?  Also: how does measured ms/call scale with n (queue-depth
check) under block_until_ready?"""
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


@jax.jit
def red(x):
    return jnp.sum(x.astype(jnp.float32))


gf = 200 * 2 * 2048 * 512 * 512 / 1e9

o = jax.block_until_ready(probe(a, w))
s = float(red(o))
print(f"warm, sum={s}", flush=True)

for n in (5, 20, 100):
    t0 = time.perf_counter()
    for _ in range(n):
        o = probe(a, w)
    _ = float(red(o))
    t = (time.perf_counter() - t0) / n
    print(f"scalar-fetch n={n:4d}: {t * 1e3:8.3f} ms/call "
          f"{gf / t / 1e3:8.1f} TF/s", flush=True)

x = a
t0 = time.perf_counter()
n = 100
for _ in range(n):
    x = probe(x, w)
_ = float(red(x))
t = (time.perf_counter() - t0) / n
print(f"chained scalar n={n}: {t * 1e3:8.3f} ms/call {gf / t / 1e3:8.1f} TF/s",
      flush=True)
