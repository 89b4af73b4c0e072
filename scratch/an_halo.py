"""Chip probe: does gather throughput depend on row width?  Compares
27x narrow gathers (the current conv pattern) vs 9x triple-wide gathers
(halo formulation) and the matmul shapes each feeds."""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

V = 131072
C = 96


def timeit(fn, *args, n=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


rng = np.random.default_rng(0)
feats = jnp.asarray(rng.standard_normal((V, C)), jnp.bfloat16)
# sorted-ish indices, like a rulebook
idx = np.sort(rng.integers(0, V, (27, V)).astype(np.int32), axis=1)
idx = jnp.asarray(idx)
w_wide = jnp.asarray(rng.standard_normal((27 * C, C)), jnp.bfloat16)

dn = jax.lax.GatherDimensionNumbers(
    offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,)
)


def g1(feats, ids):
    return jax.lax.gather(
        feats, ids[:, None], dn, slice_sizes=(1, feats.shape[1]),
        indices_are_sorted=True,
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )


@jax.jit
def conv27(feats, idx):
    g = jnp.concatenate([g1(feats, idx[k]) for k in range(27)], axis=1)
    return jnp.dot(g, w_wide, preferred_element_type=jnp.float32)


@jax.jit
def halo_gather9(feats, idx):
    halo = jnp.concatenate(
        [
            jnp.roll(feats, 1, axis=0),
            feats,
            jnp.roll(feats, -1, axis=0),
        ],
        axis=1,
    )  # (V, 3C)
    gs = []
    sel = idx[1] % 3  # stand-in chunk selector
    for p in range(9):
        h = g1(halo, idx[3 * p])  # (V, 3C)
        for j in range(3):
            m = (sel == j)[:, None]
            gs.append(jnp.where(m, h[:, j * C : (j + 1) * C], 0))
    g = jnp.concatenate(gs, axis=1)
    return jnp.dot(g, w_wide, preferred_element_type=jnp.float32)


@jax.jit
def gathers_only27(feats, idx):
    return sum(jnp.sum(g1(feats, idx[k])) for k in range(27))


@jax.jit
def gathers_only9_wide(feats, idx):
    halo = jnp.concatenate(
        [jnp.roll(feats, 1, 0), feats, jnp.roll(feats, -1, 0)], axis=1
    )
    return sum(jnp.sum(g1(halo, idx[3 * p])) for p in range(9))


@jax.jit
def up_one_gather(feats, idx):
    g = g1(feats, idx[0])
    w8 = w_wide[: C, :].astype(jnp.bfloat16)
    out = jnp.dot(g, jnp.tile(w8, (1, 8))[:, : 8 * C // 1],
                  preferred_element_type=jnp.float32)
    sel = idx[1] % 8
    acc = jnp.zeros((V, C), jnp.float32)
    for s in range(8):
        acc = acc + jnp.where(
            (sel == s)[:, None], out[:, s * C : (s + 1) * C], 0
        )
    return acc


for name, fn in [
    ("conv27 (current)", conv27),
    ("halo9 conv", halo_gather9),
    ("gathers only 27x narrow", gathers_only27),
    ("gathers only 9x wide", gathers_only9_wide),
    ("up: 1 gather + 8-select", up_one_gather),
]:
    t = timeit(fn, feats, idx)
    print(f"{name}: {t * 1e3:.2f} ms")
