"""Pallas row-gather probe (VERDICT r3 #1c feasibility).

Question: can a Pallas TPU kernel gather rows of a VMEM-resident (V, C)
table at a competitive rate?  If Mosaic lowers `jnp.take(axis=0)` /
dynamic-slice loops to something near 1 row/cycle, a fused
rulebook-gather + MXU matmul kernel beats the XLA conv formulation
(whose gathers round-trip HBM between every offset).  If it lowers to a
serial scalar loop, the round-2 write-off stands.

Variants:
  xla    jnp.take on the device (the current conv gather), whole array
  pk_tk  pallas kernel, feats whole-array VMEM resident, jnp.take inside
  pk_lp  pallas kernel, fori_loop of per-row dynamic slices
  pk_tile grid over output tiles, feats whole-array VMEM, per-tile take
plus a fused gather+matmul kernel (gmm) vs XLA gather->matmul at
(V, 64)x(64, 64).
"""

import sys

sys.path.insert(0, "/root/repo")
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from scratch.tutil import timed

V, C = 32768, 64
rng = np.random.default_rng(0)
feats = jnp.asarray(rng.normal(size=(V, C)).astype(np.float32)).astype(
    jnp.bfloat16
)
# sorted-ish indices like a rulebook column (local neighborhoods)
base = np.arange(V)
idx = np.clip(base + rng.integers(-2000, 2000, V), 0, V - 1).astype(np.int32)
idx = jnp.asarray(idx)
w = jnp.asarray(rng.normal(size=(C, C)).astype(np.float32) * 0.1).astype(
    jnp.bfloat16
)


def k_take(f_ref, i_ref, o_ref):
    o_ref[:] = jnp.take(f_ref[:], i_ref[:], axis=0)


def k_loop(f_ref, i_ref, o_ref):
    def body(r, _):
        o_ref[r, :] = f_ref[i_ref[r], :]
        return 0

    jax.lax.fori_loop(0, o_ref.shape[0], body, 0)


def k_tile(f_ref, i_ref, o_ref):
    # grid dim 0 tiles the OUTPUT; feats stay whole in VMEM
    o_ref[:] = jnp.take(f_ref[:], i_ref[:], axis=0)


TILE = 1024


def run_take(f, i):
    return pl.pallas_call(
        k_take,
        out_shape=jax.ShapeDtypeStruct((V, C), f.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(f, i)


def run_loop(f, i):
    return pl.pallas_call(
        k_loop,
        out_shape=jax.ShapeDtypeStruct((V, C), f.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(f, i)


def run_tile(f, i):
    return pl.pallas_call(
        k_tile,
        grid=(V // TILE,),
        out_shape=jax.ShapeDtypeStruct((V, C), f.dtype),
        in_specs=[
            pl.BlockSpec((V, C), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE,), lambda t: (t,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, C), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
    )(f, i)


def k_gmm(f_ref, i_ref, w_ref, o_ref):
    g = jnp.take(f_ref[:], i_ref[:], axis=0)
    o_ref[:] = jnp.dot(
        g, w_ref[:], preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def run_gmm(f, i, w):
    return pl.pallas_call(
        k_gmm,
        grid=(V // TILE,),
        out_shape=jax.ShapeDtypeStruct((V, C), f.dtype),
        in_specs=[
            pl.BlockSpec((V, C), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE,), lambda t: (t,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, C), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
    )(f, i, w)


jx = jax.jit(lambda f, i: jnp.take(f, i, axis=0))
jxm = jax.jit(
    lambda f, i, w: jnp.dot(
        jnp.take(f, i, axis=0), w, preferred_element_type=jnp.float32
    ).astype(f.dtype)
)

ref = np.asarray(jx(feats, idx))
for name, fn in (
    ("pk_take", run_take),
    ("pk_tile", run_tile),
    ("pk_loop", run_loop),
):
    try:
        jf = jax.jit(functools.partial(fn))
        got = np.asarray(jf(feats, idx))
        ok = np.array_equal(got, ref)
        t = timed(lambda: jf(feats, idx), n=30) * 1e3
        print(f"{name}: {t:7.3f} ms ({V / t * 1e3 / 1e6:6.1f} M rows/s) "
              f"exact={ok}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)

t = timed(lambda: jx(feats, idx), n=30) * 1e3
print(f"xla take: {t:7.3f} ms ({V / t * 1e3 / 1e6:6.1f} M rows/s)",
      flush=True)

refm = np.asarray(jxm(feats, idx, w), np.float32)
try:
    jg = jax.jit(run_gmm)
    gotm = np.asarray(jg(feats, idx, w), np.float32)
    err = np.abs(gotm - refm).max() / (np.abs(refm).max() + 1e-9)
    t = timed(lambda: jg(feats, idx, w), n=30) * 1e3
    print(f"pk_gmm : {t:7.3f} ms relerr={err:.2e}", flush=True)
except Exception as e:  # noqa: BLE001
    print(f"pk_gmm : FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
t = timed(lambda: jxm(feats, idx, w), n=30) * 1e3
print(f"xla g+mm: {t:7.3f} ms", flush=True)
