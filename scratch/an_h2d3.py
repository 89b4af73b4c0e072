"""H2D probe #3: fresh arrays vs repeated array; with/without compute."""

import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

MB = 1024 * 1024
N = 5

# (a) same array repeatedly
h = np.random.randint(0, 2**20, (24 * MB // 4,), np.int32)
jax.device_put(h).block_until_ready()
t0 = time.perf_counter()
for _ in range(N):
    jax.device_put(h).block_until_ready()
dt = (time.perf_counter() - t0) / N
print(f"same 24MB array:  {dt*1e3:7.1f} ms ({24/dt/1024:.2f} GB/s)")

# (b) fresh arrays each time
arrs = [
    np.random.randint(0, 2**20, (24 * MB // 4,), np.int32) for _ in range(N + 1)
]
jax.device_put(arrs[-1]).block_until_ready()
t0 = time.perf_counter()
for i in range(N):
    jax.device_put(arrs[i]).block_until_ready()
dt = (time.perf_counter() - t0) / N
print(f"fresh 24MB arrays: {dt*1e3:7.1f} ms ({24/dt/1024:.2f} GB/s)")

# (c) fresh array, same CONTENTS (copy of h)
copies = [h.copy() for _ in range(N)]
t0 = time.perf_counter()
for i in range(N):
    jax.device_put(copies[i]).block_until_ready()
dt = (time.perf_counter() - t0) / N
print(f"copy 24MB arrays:  {dt*1e3:7.1f} ms ({24/dt/1024:.2f} GB/s)")

# (d) small fresh arrays (2 MB) — the per-scan input scale
small = [np.random.randint(0, 2**20, (2 * MB // 4,), np.int32) for _ in range(N)]
jax.device_put(small[0]).block_until_ready()
t0 = time.perf_counter()
for i in range(1, N):
    jax.device_put(small[i]).block_until_ready()
dt = (time.perf_counter() - t0) / (N - 1)
print(f"fresh 2MB arrays:  {dt*1e3:7.1f} ms ({2/dt/1024:.2f} GB/s)")
