"""Gather rate vs row width / dtype / form — honest drain (tutil.timed).

Decides the next conv formulation (VERDICT r4 item 1):
  * row rate vs row BYTES: if flat beyond 576 B, packing more neighbors
    per gathered row (stride-2 output windows) cuts rows further;
  * int8/fp8 rows: if the wide-row regime is byte-bound, narrower dtypes
    double the rate;
  * windowed slice gather (slice_sizes=(W, C)): whether XLA moves
    contiguous W-row slices at closer-to-DMA rates than W single rows.
"""

import sys

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from scratch.tutil import timed

dn = jax.lax.GatherDimensionNumbers(
    offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,)
)
rng = np.random.default_rng(0)


def row_gather(feats, ids):
    return jax.lax.gather(
        feats, ids[:, None], dn, slice_sizes=(1, feats.shape[1]),
        indices_are_sorted=True,
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )


V = 86784
print("== single sorted near-identity row gather, rate vs width/dtype ==",
      flush=True)
for c, dt in [
    (32, jnp.bfloat16), (96, jnp.bfloat16), (288, jnp.bfloat16),
    (576, jnp.bfloat16), (864, jnp.bfloat16), (1728, jnp.bfloat16),
    (96, jnp.int8), (288, jnp.int8), (864, jnp.int8),
]:
    feats = jnp.asarray(
        rng.standard_normal((V, c)).astype(np.float32)
    ).astype(dt)
    idx = np.clip(
        np.arange(V) + rng.integers(-64, 64, V), 0, V - 1
    ).astype(np.int32)
    idx.sort()
    ids = jnp.asarray(idx)

    @jax.jit
    def g9(feats, ids):
        # 9 gathers like one conv's f3 groups; sum to keep them live
        acc = None
        for k in range(9):
            r = row_gather(feats, jnp.clip(ids + k, 0, V - 1))
            s = r.astype(jnp.float32) if r.dtype == jnp.int8 else r
            acc = s if acc is None else acc + s
        return acc

    t = timed(g9, feats, ids, n=20)
    rows = 9 * V
    nbytes = np.dtype(dt.dtype if hasattr(dt, "dtype") else dt).itemsize
    gbs = rows * c * jnp.zeros((), dt).dtype.itemsize / t / 1e9
    print(
        f"C={c:5d} {jnp.zeros((), dt).dtype.name:8s}"
        f" rowB={c * jnp.zeros((), dt).dtype.itemsize:5d}:"
        f" {t * 1e3:7.3f} ms  {rows / t / 1e6:7.1f} M rows/s  {gbs:6.1f} GB/s",
        flush=True,
    )

print("== windowed slice gather (n_tiles slices of (W, C)) ==", flush=True)
for tile, w, c in [(256, 320, 96), (512, 640, 96), (1024, 1280, 96),
                   (512, 640, 32)]:
    n_tiles = V // tile
    feats = jnp.asarray(
        rng.standard_normal((V + w, c)).astype(np.float32)
    ).astype(jnp.bfloat16)
    starts = jnp.asarray(
        (np.arange(n_tiles) * tile).astype(np.int32)
    )

    @jax.jit
    def gw(feats, starts):
        g = jax.lax.gather(
            feats, starts[:, None], dn_w, slice_sizes=(w, feats.shape[1]),
            indices_are_sorted=True,
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        )
        return jnp.sum(g.astype(jnp.float32), axis=1)

    dn_w = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0,)
    )
    t = timed(gw, feats, starts, n=20)
    rows = n_tiles * w
    print(
        f"tile={tile:5d} W={w:5d} C={c:3d}: {t * 1e3:7.3f} ms "
        f" {rows / t / 1e6:7.1f} M rows/s "
        f" {rows * c * 2 / t / 1e9:6.1f} GB/s",
        flush=True,
    )

print("== dynamic-slice loop (scan over tiles) for contrast ==", flush=True)
for tile, c in [(512, 96)]:
    n_tiles = V // tile
    feats = jnp.asarray(
        rng.standard_normal((V + tile, c)).astype(np.float32)
    ).astype(jnp.bfloat16)
    starts = jnp.asarray((np.arange(n_tiles) * tile).astype(np.int32))

    @jax.jit
    def gs(feats, starts):
        def body(carry, st):
            sl = jax.lax.dynamic_slice(feats, (st, 0), (tile, feats.shape[1]))
            return carry + jnp.sum(sl.astype(jnp.float32), 0), None

        out, _ = jax.lax.scan(body, jnp.zeros((c,), jnp.float32), starts)
        return out

    t = timed(gs, feats, starts, n=20)
    rows = n_tiles * tile
    print(
        f"tile={tile:5d} C={c:3d}: {t * 1e3:7.3f} ms "
        f" {rows / t / 1e6:7.1f} M rows/s "
        f" {rows * c * 2 / t / 1e9:6.1f} GB/s",
        flush=True,
    )
