"""Pallas slab-conv: exactness vs the XLA einsum path (interpret mode on
CPU; the real-TPU run is exercised by bench experiments)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from taseg_tpu.ops.pallas_conv import build_slab_rulebook


def test_slab_rulebook_decomposition_exact():
    rng = np.random.default_rng(0)
    V, K, tile, slab = 4096, 8, 256, 512
    rows = []
    for k in range(K):
        hits = rng.random(V) < 0.6
        vals = np.minimum(np.sort(rng.integers(0, V, V)), V - 1)
        rows.append(np.where(hits, vals, -1))
    rb = jnp.asarray(np.stack(rows).astype(np.int32))
    srb = build_slab_rulebook(rb, V, tile=tile, slab=slab)
    local = np.asarray(srb.local)  # (K, n_tiles, 1, tile)
    blocks = np.asarray(srb.blocks)
    ovf = np.asarray(srb.overflow_rb)
    rb_np = np.asarray(rb)
    n_tiles = V // tile
    # every valid rb entry is represented exactly once: either via
    # (block, local) or via the overflow table
    for k in range(K):
        for t in range(0, n_tiles, 3):
            for j in range(0, tile, 17):
                v = t * tile + j
                r = rb_np[k, v]
                if r < 0:
                    assert local[k, t, 0, j] == -1 and ovf[k, v] == -1
                    continue
                lo = local[k, t, 0, j]
                if lo >= 0:
                    assert blocks[k, t] * slab + lo == r
                    assert ovf[k, v] == -1
                else:
                    assert ovf[k, v] == r
