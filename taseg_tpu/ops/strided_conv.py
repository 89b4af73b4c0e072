"""Strided (ks=2, stride=2) sparse conv pairs via the parent relation.

For the stride-2 down/up convs of UNet backbones the dense 8-offset
rulebooks are redundant: every fine voxel f belongs to EXACTLY ONE coarse
cell (`parent(f)`, the downsample unique's inverse) at exactly one kernel
offset (`slot(f)`, its per-axis parity bits), and — because truncating
division preserves lexicographic order — the children of each coarse cell
are a CONTIGUOUS run of the (key-sorted) fine rows.  So (reference
torchsparse downsample/transposed kmaps, `nn/functional/conv.py:156-192`):

  down:  out[c] = sum_{f: parent(f)=c}  feats[f] @ W[slot(f)]
       = segment-sum over child runs of a slot-selected matmul.  Children
         are NOT contiguous in the fine level's own key order (keys sort
         (batch, z, x, y); cells interleave along x/y at fixed z), so the
         rows are first permuted by the downsample unique's own sort
         (`perm`, free — that sort already ran) -> ONE row gather + a
         contiguous segment sum, zero joins
  up:    out[f] = feats[parent(f)] @ W[slot(f)]
       -> ONE row gather instead of 8

vs the generic path's 8 row-gathers + an 8-offset sort-join per table.
Both directions are custom VJPs (the gradient of a segment sum is a
parent gather and vice versa), keeping the backward scatter-free.  Weight
layout (8, C_in, C_out) and the z-fastest offset enumeration match
`kernel_offsets(2, ...)` / torchsparse exactly, so checkpoints are
unaffected.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class StridedTables:
    """Parent relation between one fine level and its 2x-coarser level.

    parent: (V_fine,) int32 — coarse uid per fine row, -1 for padding.
    slot:   (V_fine,) int32 — kernel-offset index (bx*4 + by*2 + bz).
    perm:   (V_fine,) int32 — fine rows reordered by parent key (the
            downsample unique's sort permutation; invalid rows last).
    starts: (V_coarse + 1,) int32 — exclusive prefix over children counts;
            children of c are PERMUTED rows [starts[c], starts[c+1]).
    """

    parent: jnp.ndarray
    slot: jnp.ndarray
    perm: jnp.ndarray
    starts: jnp.ndarray


def build_strided_tables(
    fine_coords: jnp.ndarray,
    num_fine: jnp.ndarray,
    parent: jnp.ndarray,
    counts: jnp.ndarray,
    perm: jnp.ndarray,
    tensor_stride: int,
) -> StridedTables:
    """From spdownsample's inverse/counts/perm (no extra sort)."""
    s = tensor_stride
    xyz = fine_coords[:, :3].astype(jnp.int32)
    bits = (xyz % (2 * s)) // s
    slot = bits[:, 0] * 4 + bits[:, 1] * 2 + bits[:, 2]
    v = fine_coords.shape[0]
    valid = (jnp.arange(v, dtype=jnp.int32) < num_fine) & (parent >= 0)
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts, dtype=jnp.int32)]
    )
    return StridedTables(
        parent=jnp.where(valid, parent, -1),
        slot=slot,
        perm=perm.astype(jnp.int32),
        starts=starts,
    )


def _slot_onehot(tables: StridedTables, dtype) -> jnp.ndarray:
    oh = (
        tables.slot[:, None] == jnp.arange(8, dtype=jnp.int32)[None, :]
    ) & (tables.parent >= 0)[:, None]
    return oh.astype(dtype)


def _slot_matmul(x: jnp.ndarray, w: jnp.ndarray, tables) -> jnp.ndarray:
    """x (V_fine, Ci) -> rows x[f] @ W[slot(f)], zero for padding rows.

    Written as 8 mask-then-matmul accumulations (not one (V, 8, Co)
    einsum) so the slot mask fuses into the matmul operand instead of
    materializing an 8x-wide f32 intermediate in HBM."""
    oh = _slot_onehot(tables, x.dtype)
    out = None
    for k in range(w.shape[0]):
        c = jnp.einsum(
            "vc,co->vo", x * oh[:, k : k + 1], w[k].astype(x.dtype),
            preferred_element_type=jnp.float32,
        )
        out = c if out is None else out + c
    return out


def _segment_sum(rows_f32: jnp.ndarray, starts: jnp.ndarray) -> jnp.ndarray:
    """Sum contiguous runs [starts[c], starts[c+1]) of (V_fine, C) rows.

    Mean-centered cumsum keeps fp32 prefix error small (same scheme as
    ops.voxelize._segment_sum_sorted)."""
    center = jnp.mean(rows_f32, axis=0, keepdims=True)
    cum = jnp.cumsum(rows_f32 - center, axis=0)
    cum = jnp.concatenate([jnp.zeros_like(cum[:1]), cum], axis=0)
    v = starts.shape[0] - 1
    lo, hi = starts[:v], starts[1:]
    seg = cum[hi] - cum[lo]
    return seg + (hi - lo)[:, None].astype(jnp.float32) * center[0]


def _parent_gather(rows: jnp.ndarray, tables: StridedTables) -> jnp.ndarray:
    g = rows[jnp.clip(tables.parent, 0)]
    return jnp.where((tables.parent >= 0)[:, None], g, 0)


@jax.custom_vjp
def downsample_conv_apply(
    feats: jnp.ndarray, weight: jnp.ndarray, tables: StridedTables
) -> jnp.ndarray:
    """feats (V_fine, Ci), weight (8, Ci, Co) -> (V_coarse, Co)."""
    h = _slot_matmul(feats, weight, tables)
    return _segment_sum(h[tables.perm], tables.starts).astype(feats.dtype)


def _down_fwd(feats, weight, tables):
    return downsample_conv_apply(feats, weight, tables), (feats, weight, tables)


def _down_bwd(res, g):
    feats, weight, tables = res
    d_h = _parent_gather(g, tables)  # (V_fine, Co)
    w_t = jnp.swapaxes(weight, 1, 2)  # (8, Co, Ci)
    d_feats = _slot_matmul(d_h, w_t, tables).astype(feats.dtype)
    oh = _slot_onehot(tables, feats.dtype)  # (V_fine, 8)
    d_w = jnp.einsum(
        "vk,vc,vo->kco", oh, feats, d_h.astype(feats.dtype),
        preferred_element_type=jnp.float32,
    ).astype(weight.dtype)
    return d_feats, d_w, None


downsample_conv_apply.defvjp(_down_fwd, _down_bwd)


@jax.custom_vjp
def upsample_conv_apply(
    feats: jnp.ndarray, weight: jnp.ndarray, tables: StridedTables
) -> jnp.ndarray:
    """Transposed pair: feats (V_coarse, Ci), weight (8, Ci, Co) ->
    (V_fine, Co); out[f] = feats[parent(f)] @ W[slot(f)]."""
    g = _parent_gather(feats, tables)
    return _slot_matmul(g, weight, tables).astype(feats.dtype)


def _up_fwd(feats, weight, tables):
    g = _parent_gather(feats, tables)
    out = _slot_matmul(g, weight, tables).astype(feats.dtype)
    # zero-size dtype token: residuals must be JAX types
    return out, (g, weight, tables, jnp.zeros((0,), feats.dtype))


def _up_bwd(res, gr):
    g, weight, tables, dtype_tok = res
    in_dtype = dtype_tok.dtype
    w_t = jnp.swapaxes(weight, 1, 2)
    d_g = _slot_matmul(gr, w_t, tables)  # (V_fine, Ci) f32
    d_feats = _segment_sum(d_g[tables.perm], tables.starts).astype(in_dtype)
    oh = _slot_onehot(tables, g.dtype)
    d_w = jnp.einsum(
        "vk,vc,vo->kco", oh, g, gr.astype(g.dtype),
        preferred_element_type=jnp.float32,
    ).astype(weight.dtype)
    return d_feats, d_w, None


upsample_conv_apply.defvjp(_up_fwd, _up_bwd)
