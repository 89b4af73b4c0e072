"""Gather-rate probe: does index ORDER (sorted / clustered / random) and
the `indices_are_sorted` promise change the v5e row-gather rate?

The conv's real indices are not random: per offset they are monotone
(sort-join structural fact) and cluster within a window of the output row.
bench.py's 200 M rows/s figure is measured on RANDOM indices — if the
engine exploits locality, the in-model rate may be higher and the
roofline floor correspondingly lower (VERDICT r4 #2 asks for an updated
roofline block).

Run on the real chip: python scratch/an_sorted_gather.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from scratch.tutil import drain  # noqa: E402

V = 262144
N_IDX = 1048576


def _time(fn, *args, n=10):
    out = fn(*args)
    drain(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    drain(out)
    return (time.perf_counter() - t0) / n


def make_gather(width, promise_sorted):
    @jax.jit
    def g(src, idx):
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,)
        )
        return jax.lax.gather(
            src, idx[:, None], dn, slice_sizes=(1, width),
            indices_are_sorted=promise_sorted,
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        )

    return g


rng = np.random.default_rng(0)
idx_random = rng.integers(0, V, N_IDX).astype(np.int32)
idx_sorted = np.sort(idx_random)
# clustered: monotone base + small jitter, like a conv offset's matches
base = np.linspace(0, V - 64, N_IDX).astype(np.int32)
idx_clustered = np.clip(base + rng.integers(0, 48, N_IDX), 0, V - 1).astype(
    np.int32
)

for width in (32, 96, 128):
    src = jnp.ones((V, width), jnp.bfloat16)
    for name, idx in (
        ("random   ", idx_random),
        ("sorted   ", idx_sorted),
        ("clustered", idx_clustered),
    ):
        for promise in (False, True):
            if promise and name == "random   ":
                continue  # would be a lie
            fn = make_gather(width, promise)
            t = _time(fn, src, jnp.asarray(idx))
            print(
                f"w={width:4d} {name} promise={int(promise)} "
                f"{N_IDX / t / 1e6:8.1f} Mrows/s "
                f"{N_IDX * width * 2 / t / 1e9:7.1f} GB/s"
            )
