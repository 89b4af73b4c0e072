"""Mosaic dynamic-gather feasibility probe (VERDICT r3 #1c, attempt 2).

an_plgather.py's `jnp.take(f, i, axis=0)` failed to lower ("Shape mismatch
in input, indices and output") — Mosaic's tpu.DynamicGatherOp wants the
indices broadcast to the OUTPUT shape (take_along_axis semantics).  This
probe tries the formulations that match that contract:

  taa      jnp.take_along_axis(f, idx2d, axis=0) with idx2d (T, C)
           broadcast from (T,), whole (V, C) table VMEM-resident
  taa_tile same, grid over output tiles
  gmm      fused take_along_axis + MXU matmul per tile (the actual conv
           inner loop shape: gather (T, C_in) then @ (C_in, C_out))

Run on the real chip; interpret=True path checks correctness anywhere.
"""

import functools
import os
import sys

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from scratch.tutil import timed

INTERPRET = bool(int(os.environ.get("AN_INTERPRET", "0")))
V = int(os.environ.get("AN_V", "32768"))
C, COUT = 128, 96
TILE = min(2048, V)
print(f"dyngather probe V={V} C={C} tile={TILE}", flush=True)
rng = np.random.default_rng(0)
feats = jnp.asarray(rng.normal(size=(V, C)).astype(np.float32)).astype(
    jnp.bfloat16
)
# rulebook-like locality: mostly-sorted indices
base = np.arange(V)
idx = np.clip(base + rng.integers(-2000, 2000, V), 0, V - 1).astype(np.int32)
idx = jnp.asarray(idx)
w = jnp.asarray(rng.normal(size=(C, COUT)).astype(np.float32) * 0.1).astype(
    jnp.bfloat16
)


def k_taa(f_ref, i_ref, o_ref):
    i2 = jnp.broadcast_to(i_ref[:][:, None], o_ref.shape)
    o_ref[:] = jnp.take_along_axis(f_ref[:], i2, axis=0)


def run_taa(f, i):
    return pl.pallas_call(
        k_taa,
        out_shape=jax.ShapeDtypeStruct((V, C), f.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY)
            if False
            else pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=INTERPRET,
    )(f, i)


def run_taa_tile(f, i):
    return pl.pallas_call(
        k_taa,
        grid=(V // TILE,),
        out_shape=jax.ShapeDtypeStruct((V, C), f.dtype),
        in_specs=[
            pl.BlockSpec((V, C), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE,), lambda t: (t,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, C), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        interpret=INTERPRET,
    )(f, i)


def k_gmm(f_ref, i_ref, w_ref, o_ref):
    i2 = jnp.broadcast_to(i_ref[:][:, None], (i_ref.shape[0], f_ref.shape[1]))
    g = jnp.take_along_axis(f_ref[:], i2, axis=0)
    o_ref[:] = jnp.dot(
        g, w_ref[:], preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def run_gmm(f, i, w):
    return pl.pallas_call(
        k_gmm,
        grid=(V // TILE,),
        out_shape=jax.ShapeDtypeStruct((V, COUT), f.dtype),
        in_specs=[
            pl.BlockSpec((V, C), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE,), lambda t: (t,), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, COUT), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, COUT), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        interpret=INTERPRET,
    )(f, i, w)


jx = jax.jit(lambda f, i: jnp.take(f, i, axis=0))
jxm = jax.jit(
    lambda f, i, w: jnp.dot(
        jnp.take(f, i, axis=0), w, preferred_element_type=jnp.float32
    ).astype(f.dtype)
)

ref = np.asarray(jx(feats, idx))
for name, fn in (("taa", run_taa), ("taa_tile", run_taa_tile)):
    try:
        jf = jax.jit(functools.partial(fn))
        got = np.asarray(jf(feats, idx))
        ok = np.array_equal(got, ref)
        t = timed(lambda: jf(feats, idx), n=30) * 1e3
        print(
            f"{name}: {t:7.3f} ms ({V / t * 1e3 / 1e6:6.1f} M rows/s) "
            f"exact={ok}",
            flush=True,
        )
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}",
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
    print(f"pk_gmm : FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)
t = timed(lambda: jxm(feats, idx, w), n=30) * 1e3
print(f"xla g+mm: {t:7.3f} ms", flush=True)
