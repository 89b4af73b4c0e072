"""Sparse conv via one-hot row selection from VMEM-resident features.

TPU-native replacement for the gather-GEMM-scatter sparse conv (reference
torchsparse `backend/convolution/convolution_cuda.cu:52-165`), designed
around measured v5e constraints: XLA row gathers run ~240M rows/s (45x off
HBM bandwidth), scatters are pathological, but MXU matmuls and in-VMEM
dynamic slices are fast.  The whole per-level feature array fits in VMEM
(<= 8.4 MB packed at 131k voxels x 32ch bf16), so:

  * features (V, C) are bit-packed GP = 128//C voxel rows per 128-lane VMEM
    row (lane-dense DMAs; GP in {1, 2, 4, 8});
  * the packed array is loaded ONCE per conv as a grid-invariant resident
    block; every (offset k, output tile) reads a WINDOW of it with an
    in-VMEM dynamic slice at a 16-packed-row-aligned start — no per-step
    HBM windows, no DMA-issue latency;
  * rows are selected from the window with a one-hot (T, W) @ (W, 128)
    bf16 MXU matmul (exact: one-hot entries are 0/1), multiplied by
    kron(I_GP, W_k) so each packed lane group is convolved in place, and
    the right group is extracted with VPU masks;
  * matches beyond the window cluster at z-plane crossings (~1-2% of
    (offset, tile) pairs carry a SECOND far cluster; scratch/an_window),
    so the kernel runs a pl.when-PREDICATED second window anchored at the
    first uncovered match — ~2% extra compute instead of 2x; the rare
    residual beyond both windows goes through a lax.cond-gated exact XLA
    fixup that almost never fires.

Rulebook semantics, weight layout (K, C_in, C_out) and offset enumeration
match `ops.rulebook` / torchsparse exactly, so this is a drop-in for
`sparse_conv_apply` wherever tables are available.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 256  # output rows per grid step
ALIGN = 16  # window starts aligned to 16 packed rows (bf16 sublane tile)
W2_MULT = 4  # second (predicated) window is this many times wider


@struct.dataclass
class SelectTables:
    """Per-conv selection tables derived from a dense (K, V_out) rulebook."""

    starts: jnp.ndarray  # (K_pad, n_tiles) int32 — packed-row window starts
    loc: jnp.ndarray  # (n_tiles, K_pad, T) int32 — voxel-local idx, -1 inval
    starts2: jnp.ndarray  # (K_pad, n_tiles) int32 — 2nd-window starts, -1 off
    loc2: jnp.ndarray  # (n_tiles, K_pad, T) int32 — 2nd-window local idx
    overflow_rb: jnp.ndarray  # (K, V_out) int32 — rb beyond BOTH windows
    has_overflow: jnp.ndarray  # () int32
    # static meta
    gp: int = struct.field(pytree_node=False)
    w_packed: int = struct.field(pytree_node=False)
    k: int = struct.field(pytree_node=False)
    v_in: int = struct.field(pytree_node=False)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def group_factor(c_in: int) -> int:
    """Packed voxel rows per 128-lane VMEM row (0 if unsupported)."""
    if c_in >= 128:
        return 1 if c_in % 128 == 0 else 0
    if 128 % c_in == 0 and c_in >= 16:
        return 128 // c_in
    return 0


def supports(c_in: int, v_out: int) -> bool:
    return group_factor(c_in) > 0 and v_out % TILE == 0


def build_select_tables(
    rb: jnp.ndarray,
    v_in: int,
    c_in: int,
    *,
    window_voxels: int = 512,
) -> SelectTables:
    """Derive window starts + local indices from a dense rulebook.

    `window_voxels` bounds the per-(k, tile) selection domain; matches
    whose index exceeds the (aligned) window land in `overflow_rb` and are
    applied by the exact XLA fixup.  512 covers ~98-99% of entries on
    LiDAR data (p99 per-offset spread ~290-550)."""
    k, v_out = rb.shape
    assert v_out % TILE == 0, (v_out, TILE)
    gp = group_factor(c_in)
    assert gp > 0, c_in
    n_tiles = v_out // TILE
    vp = v_in // gp
    w_packed = window_voxels // gp
    assert w_packed % ALIGN == 0

    rbt = rb.reshape(k, n_tiles, TILE)
    valid = rbt >= 0
    big = jnp.int32(2**30)

    def window(mask):
        mn = jnp.min(jnp.where(mask, rbt, big), axis=-1)  # (K, n_tiles)
        empty = mn >= big
        st = jnp.where(empty, 0, (mn // gp) // ALIGN * ALIGN)
        st = jnp.clip(st, 0, max(vp - w_packed, 0))
        lc = rbt - (st * gp)[:, :, None]
        inside = mask & (lc >= 0) & (lc < w_packed * gp)
        return jnp.where(empty, -1, st), jnp.where(inside, lc, -1), inside

    def window2(mask):
        w2 = min(w_packed * W2_MULT, vp)
        mn = jnp.min(jnp.where(mask, rbt, big), axis=-1)
        empty = mn >= big
        st = jnp.where(empty, 0, (mn // gp) // ALIGN * ALIGN)
        st = jnp.clip(st, 0, max(vp - w2, 0))
        lc = rbt - (st * gp)[:, :, None]
        inside = mask & (lc >= 0) & (lc < w2 * gp)
        return jnp.where(empty, -1, st), jnp.where(inside, lc, -1), inside

    starts, loc, in1 = window(valid)
    starts = jnp.maximum(starts, 0)  # primary window always on
    uncovered = valid & ~in1
    starts2, loc2, in2 = window2(uncovered)
    overflow = uncovered & ~in2
    overflow_rb = jnp.where(overflow, rbt, -1).reshape(k, v_out)

    k_pad = _round_up(k, 8)
    if k_pad != k:
        zpad = jnp.zeros((k_pad - k, n_tiles), jnp.int32)
        starts = jnp.concatenate([starts, zpad])
        starts2 = jnp.concatenate([starts2, zpad - 1])
        lpad = jnp.full((k_pad - k, n_tiles, TILE), -1, jnp.int32)
        loc = jnp.concatenate([loc, lpad])
        loc2 = jnp.concatenate([loc2, lpad])
    return SelectTables(
        starts=starts,
        loc=loc.transpose(1, 0, 2),
        starts2=starts2,
        loc2=loc2.transpose(1, 0, 2),
        overflow_rb=overflow_rb,
        has_overflow=jnp.sum(overflow.astype(jnp.int32)),
        gp=gp,
        w_packed=w_packed,
        k=k,
        v_in=v_in,
    )


def _kernel(
    s_ref, s2_ref, loc_ref, loc2_ref, w_ref, feats_ref, out_ref,
    *, nk, t, w, w2, gp, c_out,
):
    i = pl.program_id(0)
    out_ref[:] = jnp.zeros((t, c_out), jnp.float32)

    def contribution(start, lv, wide=False):
        st = pl.multiple_of(start, ALIGN)
        ww = w2 if wide else w
        win = feats_ref[pl.ds(st, ww), :]
        if gp > 1:
            pr = lv // gp
            g = lv - pr * gp
        else:
            pr = lv
        iota = jax.lax.broadcasted_iota(jnp.int32, (t, ww), 1)
        sel = (pr[:, None] == iota).astype(jnp.bfloat16)
        picked = jnp.dot(
            sel, win, preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16)
        res = jnp.dot(picked, w_ref[k_cur[0]], preferred_element_type=jnp.float32)
        if gp == 1:
            return res
        acc = jnp.zeros((t, c_out), jnp.float32)
        for gg in range(gp):
            m = (g == gg).astype(jnp.float32)
            acc = acc + m[:, None] * res[:, gg * c_out : (gg + 1) * c_out]
        return acc

    k_cur = [0]

    def one(k, carry):
        k_cur[0] = k
        out_ref[:] += contribution(s_ref[k, i], loc_ref[0, k, :])

        @pl.when(s2_ref[k, i] >= 0)
        def _():
            # predicated second window: the far cluster of plane-crossing
            # tiles (~1-2% of (k, tile) pairs) — near-zero amortized cost
            out_ref[:] += contribution(
                jnp.maximum(s2_ref[k, i], 0), loc2_ref[0, k, :],
                wide=True,
            )

        return carry

    jax.lax.fori_loop(0, nk, one, jnp.int32(0))


def _interpret_mode() -> bool:
    return jax.default_backend() == "cpu"


def _run_kernel(feats, weight, tables: SelectTables, c_out: int):
    """feats (V_in, C_in), weight (K, C_in, C_out) -> (V_out, C_out) f32."""
    v_in, c_in = feats.shape
    gp = tables.gp
    w = tables.w_packed
    k = tables.k
    n_tiles = tables.loc.shape[0]
    t = TILE
    v_out = n_tiles * t
    lanes = max(c_in, 128)
    assert gp == 1 or gp * c_in == 128, (gp, c_in)

    assert v_in % (ALIGN * gp) == 0, (v_in, gp)
    vp = v_in // gp
    packed = feats.reshape(vp, gp * c_in).astype(jnp.bfloat16)

    # kron(I_gp, W_k): (K_pad, lanes, gp*c_out)
    k_pad = tables.starts.shape[0]
    wk = jnp.zeros((k_pad, lanes, gp * c_out), jnp.float32)
    eye = jnp.eye(gp, dtype=jnp.float32)
    kron = jnp.einsum("ab,kio->kaibo", eye, weight.astype(jnp.float32))
    kron = kron.reshape(k, gp * c_in, gp * c_out)
    wk = wk.at[:k, : gp * c_in, :].set(kron)
    wk = wk.astype(jnp.bfloat16)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, k_pad, t), lambda i, s, s2: (i, 0, 0)),
            pl.BlockSpec((1, k_pad, t), lambda i, s, s2: (i, 0, 0)),
            pl.BlockSpec((k_pad, lanes, gp * c_out), lambda i, s, s2: (0, 0, 0)),
            pl.BlockSpec((vp, lanes), lambda i, s, s2: (0, 0)),
        ],
        out_specs=pl.BlockSpec((t, c_out), lambda i, s, s2: (i, 0)),
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel, nk=k, t=t, w=w, w2=min(w * W2_MULT, vp),
            gp=gp, c_out=c_out,
        ),
        out_shape=jax.ShapeDtypeStruct((v_out, c_out), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        interpret=_interpret_mode(),
    )(tables.starts, tables.starts2, tables.loc, tables.loc2, wk, packed)
    return out


def _overflow_fixup(out, feats, weight, tables: SelectTables):
    def fix(out):
        rb = tables.overflow_rb
        g = jnp.where(
            (rb >= 0)[:, :, None], feats[jnp.clip(rb, 0)], 0
        )
        extra = jnp.einsum(
            "kvi,kio->vo", g, weight.astype(feats.dtype),
            preferred_element_type=jnp.float32,
        )
        return out + extra

    return jax.lax.cond(tables.has_overflow > 0, fix, lambda o: o, out)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def select_conv(
    feats: jnp.ndarray,
    weight: jnp.ndarray,
    tables: SelectTables,
    tables_bwd: SelectTables,
    rb_fwd: jnp.ndarray,
) -> jnp.ndarray:
    """Sparse conv through selection tables; exact w.r.t. the rulebook.

    `tables_bwd` must be built from the REVERSE rulebook (the gradient /
    transposed pairing, reference torchsparse `nn/functional/conv.py:
    184-192`); `rb_fwd` is kept for the weight-gradient einsum.
    """
    out = _run_kernel(feats, weight, tables, weight.shape[-1])
    out = _overflow_fixup(out, feats, weight, tables)
    return out.astype(feats.dtype)


def _fwd(feats, weight, tables, tables_bwd, rb_fwd):
    return (
        select_conv(feats, weight, tables, tables_bwd, rb_fwd),
        (feats, weight, tables, tables_bwd, rb_fwd),
    )


def _bwd(res, g):
    feats, weight, tables, tables_bwd, rb_fwd = res
    # d_feats: conv of g through the reverse tables with W^T (same offset
    # index pairing as ops.sparse_conv._conv_vjp_bwd)
    w_t = jnp.swapaxes(weight, 1, 2)  # (K, C_out, C_in)
    d_feats = _run_kernel(g, w_t, tables_bwd, weight.shape[1])
    d_feats = _overflow_fixup_bwd(d_feats, g, w_t, tables_bwd)
    d_feats = d_feats.astype(feats.dtype)
    # d_W via the XLA gather path (correct; slower — training only)
    in_gathered = jnp.where(
        (rb_fwd >= 0)[:, :, None], feats[jnp.clip(rb_fwd, 0)], 0
    )
    d_w = jnp.einsum(
        "kvi,vo->kio", in_gathered, g, preferred_element_type=jnp.float32
    ).astype(weight.dtype)
    return d_feats, d_w, None, None, None


def _overflow_fixup_bwd(out, g, w_t, tables_bwd):
    def fix(out):
        rb = tables_bwd.overflow_rb
        gg = jnp.where((rb >= 0)[:, :, None], g[jnp.clip(rb, 0)], 0)
        extra = jnp.einsum(
            "kvo,koi->vi", gg, w_t.astype(g.dtype),
            preferred_element_type=jnp.float32,
        )
        return out + extra

    return jax.lax.cond(tables_bwd.has_overflow > 0, fix, lambda o: o, out)


select_conv.defvjp(_fwd, _bwd)


def flip_tables(tab: SelectTables) -> SelectTables:
    """Tables of the FLIPPED rulebook (offset k -> K-1-k), i.e. the reverse
    pairing of a same-coordinate-set odd kernel (see ops.sparse_conv
    flip_rulebook).  Pure reindexing along the offset axis — no rebuild."""
    k = tab.k

    def flip_k(x, axis):
        if axis == 0:
            return jnp.concatenate([x[:k][::-1], x[k:]])
        return jnp.concatenate([x[:, :k][:, ::-1], x[:, k:]], axis=1)

    return SelectTables(
        starts=flip_k(tab.starts, 0),
        loc=flip_k(tab.loc, 1),
        starts2=flip_k(tab.starts2, 0),
        loc2=flip_k(tab.loc2, 1),
        overflow_rb=tab.overflow_rb[::-1],
        has_overflow=tab.has_overflow,
        gp=tab.gp,
        w_packed=tab.w_packed,
        k=tab.k,
        v_in=tab.v_in,
    )
