"""TGF sparse conv — transform-first, y-fused: 9 row gathers instead of 27.

TPU gathers are ROW-bound (~610M rows/s on v5e regardless of row width up
to ~192 B), so the 27 per-offset gathers of `ops.sparse_conv` are the
inference bottleneck at narrow channel counts.  TGF exploits a structural
fact of the sort-based topology (`ops.coords`): voxel keys sort by
(batch, z, x, y), so the dy=-1/dy=+1 neighbors of any voxel occupy the
rows IMMEDIATELY adjacent to the dy=0 row whenever they exist (keys differ
by exactly the level stride `s`, and no key can lie strictly between two
multiples of `s` at that level — verified adjacency-violation-free on real
rulebooks).

So the 27 offsets collapse into 9 (dx, dz) groups of 3 dy-columns each.
Per group g the voxel features are FIRST pushed through the three weight
slices (z_m, z_c, z_p — same FLOPs as the reference conv, reference
`convolution_cuda.cu:52-165` does gather-then-GEMM), then three
output-space arrays cover every presence pattern of the (dy-1, dy0, dy+1)
triple with ONE gather:

    E[r]  = z_c[r] + d1[r] * z_m[r-1] + u1[r] * z_p[r+1]   (center present)
    FL[r] = z_m[r] + u2[r] * z_p[r+1]       (center absent, left present)
    FR[r] = z_p[r]                          (only right present)

where u1/d1/u2 are per-level key-adjacency flags (key[r+1] == key[r] + s,
etc.).  S_g = [E; FL; FR] stacked (3V, C) and a precomputed index picks
the right variant row per output voxel: out += S_g[idx_g] masked.  The
result is bit-exact vs the 27-gather path up to bf16 re-association
(whole-model rel-err ~5e-3, tested).

Measured per-conv on v5e (real rulebooks): 1.4-1.8x for C_in <= 64,
~parity at 96-128 (the z materialization offsets the gather win), so the
layer routes through TGF only below a channel threshold.

The custom VJP shares ONE F3 window pass over the cotangent between the
input and weight gradients (ops.f3conv.f3_bwd_fused): 9 gather rows per
voxel for the whole backward, the same as the forward.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from flax import struct

from .coords import GridBounds, pack_keys


@struct.dataclass
class TgfTables:
    """Per-level TGF gather plan (one direction).

    u1/d1/u2: (V,) bool — key-adjacency flags at this level's stride.
    idx:      (9, V) int32 — row into the stacked [E; FL; FR] (3V rows).
    mask:     (9, V) bool — any of the 3 dy-neighbors present.
    """

    u1: jnp.ndarray
    d1: jnp.ndarray
    u2: jnp.ndarray
    idx: jnp.ndarray
    mask: jnp.ndarray
    # per-group (dy=-1, dy=0, dy=+1) column triples into the rulebook /
    # weight arrays — static structure, not traced
    cols: tuple = struct.field(pytree_node=False, default=())
    # group 4 (dx=dz=0) reads rulebook column 13 (the zero offset), which
    # is the identity for any same-coordinate-set k3 table (a voxel always
    # matches itself), so idx[4] == arange on valid rows and its gather
    # can be skipped: the E variant applies directly.  Holds for flipped
    # tables too (flip keeps column 13 in the center slot).
    center_identity: bool = struct.field(pytree_node=False, default=False)


def _group_cols(g: int, flipped: bool) -> tuple[int, int, int]:
    """Offset columns (dy=-1, 0, +1) of group g; kernel_offsets(3) is
    x-fastest: k = (dx+1) + 3*(dy+1) + 9*(dz+1).

    In a FLIPPED rulebook (rb[::-1], the reverse table) column k holds the
    NEGATED offset, so the dy roles swap: column km carries dy=+1 data and
    column kp carries dy=-1."""
    dz, dx = divmod(g, 3)
    km = dz * 9 + dx
    if flipped:
        return km + 6, km + 3, km
    return km, km + 3, km + 6


def build_tgf_tables(
    rb: jnp.ndarray,
    coords: jnp.ndarray,
    num: jnp.ndarray,
    stride: int,
    bounds: GridBounds,
    *,
    flipped: bool = False,
) -> TgfTables:
    """Derive the TGF plan from an existing (27, V) rulebook + level keys.

    Pure elementwise work — no sorts or joins beyond what the rulebook
    build already paid.  Pass flipped=True when `rb` is a reverse table
    (rb_fwd[::-1]) so the dy roles are read correctly."""
    v = rb.shape[1]
    valid = jnp.arange(v, dtype=jnp.int32) < num
    hi, lo = pack_keys(coords, bounds, valid)
    s = jnp.int32(stride)
    # y-neighbor keys differ by exactly `stride` in lo (hi unchanged);
    # sentinel rows (hi huge, lo 0) can never satisfy the compares
    nxt_same = (hi[1:] == hi[:-1]) & valid[1:] & valid[:-1]
    u1 = jnp.concatenate(
        [nxt_same & (lo[1:] == lo[:-1] + s), jnp.zeros((1,), bool)]
    )
    u2 = jnp.concatenate(
        [nxt_same & (lo[1:] == lo[:-1] + 2 * s), jnp.zeros((1,), bool)]
    )
    d1 = jnp.concatenate([jnp.zeros((1,), bool), u1[:-1]])

    idxs, masks = [], []
    cols = tuple(_group_cols(g, flipped) for g in range(9))
    for g in range(9):
        km, kc, kp = cols[g]
        rm, rc, rp = rb[km], rb[kc], rb[kp]
        any_p = (rm >= 0) | (rc >= 0) | (rp >= 0)
        left = rm >= 0
        fa = jnp.where(left, rm, rp)
        ix = jnp.where(rc >= 0, rc, jnp.where(left, v + fa, 2 * v + fa))
        idxs.append(jnp.where(any_p, ix, 0))
        masks.append(any_p)
    return TgfTables(
        u1=u1, d1=d1, u2=u2, idx=jnp.stack(idxs), mask=jnp.stack(masks),
        cols=cols, center_identity=True,
    )


def _up(x):  # x[r+1], zero past the end
    return jnp.concatenate([x[1:], jnp.zeros_like(x[:1])], 0)


def _down(x):  # x[r-1], zero before the start
    return jnp.concatenate([jnp.zeros_like(x[:1]), x[:-1]], 0)


def _take_rows(s: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,)
    )
    return jax.lax.gather(
        s, idx[:, None], dn, slice_sizes=(1, s.shape[1]),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )


# Below this static per-level row count the 9 groups' [E; FL; FR] stacks
# are fused into one (27V, C_out) array served by ONE gather — the
# per-launch overhead (~1 ms) dominates at the small coarse levels.  At
# the big levels the 27V-row materialization costs more HBM writes than
# the 8 saved launches, so the per-group gather-accumulate wins there.
# Whole-model threshold sweep on v5e with TGF routing at every width
# (2026-08-21): 0 -> 9.75, 4096 -> 10.05, 16384 -> 9.88, 65536 -> 5.71
# scans/s — merge only the two coarsest levels (L3/L4).
TGF_MERGE_MAX_V = int(os.environ.get("TASEG_TGF_MERGE_MAX_V", "4096"))


def _tgf_fwd_impl(feats, weight, tab: TgfTables):
    """Per group: ONE (C_in, 3*C_out) matmul (the three dy weight slices
    share the input, and a 3x-wider N dim keeps the 128-lane MXU fed at
    narrow channel counts), then one gather per group through the
    [E; FL; FR] stack — or, at small static V, a single merged gather
    over all 9 stacks (see TGF_MERGE_MAX_V)."""
    w = weight.astype(feats.dtype)
    u1 = tab.u1[:, None].astype(feats.dtype)
    d1 = tab.d1[:, None].astype(feats.dtype)
    u2 = tab.u2[:, None].astype(feats.dtype)
    v = tab.idx.shape[1]
    c_out = weight.shape[2]
    merged = v <= TGF_MERGE_MAX_V
    parts = []
    out = None
    for g in range(9):
        km, kc, kp = tab.cols[g]
        wg = jnp.concatenate([w[km], w[kc], w[kp]], axis=1)  # (C_in, 3C)
        z = jnp.dot(feats, wg, preferred_element_type=jnp.float32).astype(
            feats.dtype
        )
        zm = z[:, :c_out]
        zc = z[:, c_out : 2 * c_out]
        zp = z[:, 2 * c_out :]
        zp_up = _up(zp)
        e = zc + d1 * _down(zm) + u1 * zp_up
        if g == 4 and tab.center_identity and not merged:
            # identity gather: the center offset always matches itself,
            # so the E variant row IS the output row
            c = jnp.where(tab.mask[g][:, None], e, 0)
            out = c if out is None else out + c
            continue
        fl = zm + u2 * zp_up
        s_g = jnp.concatenate([e, fl, zp], 0)  # (3V, C_out)
        if merged:
            parts.append(s_g)
        else:
            rows = _take_rows(s_g, tab.idx[g])
            c = jnp.where(tab.mask[g][:, None], rows, 0)
            out = c if out is None else out + c
    if not merged:
        return out
    s_all = jnp.concatenate(parts, 0)  # (27V, C_out)
    idx_all = (
        tab.idx + (jnp.arange(9, dtype=jnp.int32) * (3 * v))[:, None]
    ).reshape(-1)
    rows = _take_rows(s_all, idx_all).reshape(9, v, c_out)
    masked = jnp.where(tab.mask[:, :, None], rows, 0).astype(jnp.float32)
    return jnp.sum(masked, axis=0).astype(feats.dtype)


@partial(jax.custom_vjp, nondiff_argnums=())
def tgf_conv_apply(feats, weight, tab, tab_bwd, rb_fwd):
    """TGF sparse conv (27-point, stride 1, shared coord set).

    `tab`/`tab_bwd` from `build_tgf_tables` on rb / flipped rb; `rb_fwd`
    is kept for the weight gradient (27 per-offset gathers, training
    only)."""
    return _tgf_fwd_impl(feats, weight, tab)


def _tgf_vjp_fwd(feats, weight, tab, tab_bwd, rb_fwd):
    out = tgf_conv_apply(feats, weight, tab, tab_bwd, rb_fwd)
    return out, (feats, weight, tab_bwd, rb_fwd)


def _tgf_vjp_bwd(res, g):
    from .f3conv import f3_bwd_fused
    from .sparse_conv import flip_rulebook

    feats, weight, tab_bwd, rb_fwd = res
    # one fused F3 window pass over the cotangent through the reverse
    # book yields BOTH d_feats and d_W (f3conv.f3_bwd_fused): the same
    # 9 gathered A'_g blocks serve the input gradient (A'_g @ W^T
    # slices) and the weight gradient (feats^T @ A'_g) — 9 gather rows
    # per voxel total, vs 9 (d_feats) + 9 (d_W re-gather) before and
    # 9 + 27 before that
    d_feats, d_w = f3_bwd_fused(feats, weight, g, flip_rulebook(rb_fwd))
    return (
        d_feats,
        d_w.astype(weight.dtype),
        None,
        None,
        None,
    )


tgf_conv_apply.defvjp(_tgf_vjp_fwd, _tgf_vjp_bwd)
