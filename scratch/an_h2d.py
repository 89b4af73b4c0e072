"""Chip probe: host->device transfer bandwidth + compute overlap.

Decides the host-pipelined-topology design: the UNetTopology pytree is
~45 MB/scan; if H2D through the tunnel is slow AND serial, host topology
is dead.  If async device_put overlaps device compute, only max(transfer,
apply) matters."""

import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

MB = 1024 * 1024


def timeit(fn, n=10):
    fn()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n


# 1) raw H2D bandwidth at topology-like sizes
for size_mb in (2, 10, 48):
    host = np.random.randint(0, 2**20, (size_mb * MB // 4,), np.int32)

    def put():
        jax.device_put(host).block_until_ready()

    dt = timeit(put, n=5)
    print(f"H2D {size_mb:3d} MB: {dt*1e3:7.2f} ms  ({size_mb/dt/1024:.2f} GB/s)")

# 2) many-array pytree (topology is ~40 leaves)
leaves = [np.random.randint(0, 2**20, (1200 * 1024,), np.int32) for _ in range(10)]


def put_tree():
    jax.block_until_ready(jax.device_put(leaves))


dt = timeit(put_tree, n=5)
tot = sum(x.nbytes for x in leaves) / MB
print(f"H2D pytree {tot:.0f} MB in 10 leaves: {dt*1e3:.2f} ms ({tot/dt/1024:.2f} GB/s)")

# 3) overlap: long matmul chain (~100 ms) while a 48 MB put is in flight
a = jnp.ones((4096, 512), jnp.bfloat16)
w = jnp.ones((512, 512), jnp.bfloat16)


from functools import partial


@partial(jax.jit, static_argnums=2)
def burn(a, w, length):
    def body(x, _):
        return jnp.dot(x, w, preferred_element_type=jnp.bfloat16) * (1 / 512.0), None

    return jax.lax.scan(body, a, None, length=length)[0]


# ~100 ms of chained matmuls (measured 27.8 TF/s probe rate)
L = 1200
t = timeit(lambda: burn(a, w, L).block_until_ready(), n=3)
print(f"burn: {t*1e3:.1f} ms at L={L}")

host48 = np.random.randint(0, 2**20, (48 * MB // 4,), np.int32)


def overlapped():
    out = burn(a, w, L)  # dispatched async
    dev = jax.device_put(host48)
    jax.block_until_ready((out, dev))


def serial():
    burn(a, w, L).block_until_ready()
    jax.device_put(host48).block_until_ready()


t_ov = timeit(overlapped, n=5)
t_se = timeit(serial, n=5)
print(f"overlap: {t_ov*1e3:.1f} ms   serial: {t_se*1e3:.1f} ms   "
      f"(overlap saves {(t_se-t_ov)*1e3:.1f} ms)")
