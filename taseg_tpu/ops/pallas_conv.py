"""Pallas sparse-conv kernel — slab + one-hot MXU formulation.

Key structural fact (by construction in rulebook.py): voxel sets are
key-sorted and a kernel offset shifts every packed key by a constant, so
the matched input indices rb[k, :] are STRICTLY INCREASING in the output
index wherever valid.  Row gathers with monotone indices are streaming
slab reads, not random access — sidestepping the TPU's weak gather
(measured ~117M lookups/s via XLA).

Kernel layout: grid (n_tiles, K).  For output tile i and offset k, the
matches live in a window of at most 2 consecutive S-row input blocks whose
block index is precomputed per (k, i) ('slab block').  Both blocks arrive
via the normal Pallas pipeline (scalar-prefetched index maps — no manual
DMA or alignment proofs), and rows are selected with a (T, 2S) one-hot
matmul on the MXU:

    out[i] += onehot(rb_local) @ [slab_b ; slab_b1] @ W[k]

Rows whose window spills past the two blocks (possible when long runs of
unmatched inputs interleave a tile) are fixed up EXACTLY with a sparse XLA
gather over just those entries; `has_overflow` counts them (typically 0).

STATUS (measured, v5e): numerically exact (bf16 noise only, zero overflow
on realistic rulebooks), but currently at parity with the XLA einsum path
(~30 ms for a 131k x 32ch x 27-offset conv vs ~31 ms).  Profiling shows a
~20 ms floor dominated by slab DMA inefficiency: with C=32 < 128 lanes the
(8, 128)-tiled VMEM blocks waste 4x of each transfer.  Roadmap: pack four
32-channel voxel rows per 128-lane VMEM row (selection then operates on
packed rows), fuse consecutive layers per slab residency, and batch the
one-hot selection across offsets sharing a window.  The exact XLA path
(ops.sparse_conv) remains the default.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 256  # output rows per grid step
SLAB = 512  # input rows per slab block (window = 2 * SLAB)


class SlabRulebook(NamedTuple):
    local: jnp.ndarray  # (K, n_tiles, 1, tile) int32 — rb - block*SLAB, -1 invalid
    blocks: jnp.ndarray  # (K, n_tiles) int32 — slab block index per (k, tile)
    overflow_rb: jnp.ndarray  # (K, V_out) int32 — rb where overflowed else -1
    has_overflow: jnp.ndarray  # () int32


def build_slab_rulebook(
    rb: jnp.ndarray, v_in: int, *, tile: int = TILE, slab: int = SLAB
) -> SlabRulebook:
    k, v_out = rb.shape
    assert v_out % tile == 0, (v_out, tile)
    n_tiles = v_out // tile
    n_blocks = max(v_in // slab, 1)
    rbt = rb.reshape(k, n_tiles, tile)
    valid = rbt >= 0
    big = jnp.int32(2**30)
    row_min = jnp.min(jnp.where(valid, rbt, big), axis=-1)  # (K, n_tiles)
    blocks = jnp.where(row_min >= big, 0, row_min // slab)
    blocks = jnp.clip(blocks, 0, n_blocks - 2 if n_blocks > 1 else 0)
    local = rbt - blocks[:, :, None] * slab
    in_win = valid & (local >= 0) & (local < 2 * slab)
    # layout (K, n_tiles, 1, tile): the per-(k, tile) row is selected by
    # the BlockSpec index map (no dynamic lane indexing inside the kernel)
    local_flat = jnp.where(in_win, local, -1)[:, :, None, :]
    overflow = valid & ~in_win
    overflow_rb = jnp.where(overflow, rbt, -1).reshape(k, v_out)
    return SlabRulebook(
        local=local_flat,
        blocks=blocks,
        overflow_rb=overflow_rb,
        has_overflow=jnp.sum(overflow.astype(jnp.int32)),
    )


def _conv_kernel(
    blocks_ref,  # scalar prefetch (K, n_tiles)
    local_ref,  # (1, 1, 1, T) int32 block for (k, tile i)
    w_ref,  # (1, C, Co)
    slab0_ref,  # (S, C)
    slab1_ref,  # (S, C)
    out_ref,  # (T, Co)
    *,
    tile: int,
    slab: int,
):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    loc = local_ref[0, 0, 0, :]
    iota0 = jax.lax.broadcasted_iota(jnp.int32, (tile, slab), 1)
    onehot0 = (loc[:, None] == iota0).astype(slab0_ref.dtype)
    onehot1 = (loc[:, None] == iota0 + slab).astype(slab0_ref.dtype)
    picked = jnp.dot(
        onehot0, slab0_ref[:], preferred_element_type=jnp.float32
    ) + jnp.dot(onehot1, slab1_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] += jnp.dot(
        picked.astype(w_ref.dtype), w_ref[0],
        preferred_element_type=jnp.float32,
    ).astype(out_ref.dtype)


def slab_conv_forward(
    feats: jnp.ndarray,
    weight: jnp.ndarray,
    srb: SlabRulebook,
    *,
    tile: int = TILE,
    slab: int = SLAB,
) -> jnp.ndarray:
    """Forward sparse conv via the slab kernel + exact overflow fixup.

    feats rows beyond the last full slab block are covered by clamping
    block indices in the builder; v_in must be a multiple of `slab`.
    """
    k, n_tiles, _, tile_ = srb.local.shape
    assert tile_ == tile
    v_out = n_tiles * tile
    c_in = feats.shape[1]
    c_out = weight.shape[-1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles, k),
        in_specs=[
            pl.BlockSpec((1, 1, 1, tile), lambda i, kk, b: (kk, i, 0, 0)),
            pl.BlockSpec((1, c_in, c_out), lambda i, kk, b: (kk, 0, 0)),
            pl.BlockSpec((slab, c_in), lambda i, kk, b: (b[kk, i], 0)),
            pl.BlockSpec((slab, c_in), lambda i, kk, b: (b[kk, i] + 1, 0)),
        ],
        out_specs=pl.BlockSpec((tile, c_out), lambda i, kk, b: (i, 0)),
    )
    out = pl.pallas_call(
        partial(_conv_kernel, tile=tile, slab=slab),
        out_shape=jax.ShapeDtypeStruct((v_out, c_out), jnp.float32),
        grid_spec=grid_spec,
    )(srb.blocks, srb.local, weight, feats, feats)

    def fixup(out):
        g = jnp.where(
            (srb.overflow_rb >= 0)[:, :, None],
            feats[jnp.clip(srb.overflow_rb, 0)],
            0,
        )
        extra = jnp.einsum(
            "kvi,kio->vo", g, weight.astype(feats.dtype),
            preferred_element_type=jnp.float32,
        )
        return out + extra

    out = jax.lax.cond(srb.has_overflow > 0, fixup, lambda o: o, out)
    return out.astype(feats.dtype)
