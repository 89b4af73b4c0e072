"""F3 sparse conv — lane-packed dy-window, 9 row gathers for ANY width.

The wide-channel (C_in > TGF threshold) stride-1 convs are the single
largest apply cost (decoder L0/L1 at 96-128 ch issue ~10M of the model's
~25M gather rows through the 27-offset path, VERDICT r3 #1b).  ops.tgf
regresses there because it materializes transformed [E; FL; FR] stacks
(3*C_out per group).  F3 keeps the gather on the INPUT side and packs the
dy-window into LANES instead:

    F3[r]  = [f[r] | f[r+1] | f[r+2]]          (V, 3C) — 2 shifted copies
    G_g    = F3[st_g]                           ONE (V,)-row gather/group
    sel_d  = window row od_gd of G_g            static lane slices,
                                                lax.select_n, mask od==3
    out   += [sel_-1 | sel_0 | sel_+1] @ [W_m; W_c; W_p]

st_g is the smallest present dy-neighbor row (clipped), od_gd in {0,1,2}
the window offset of the dy=d neighbor (3 = absent).  The same structural
fact behind ops.tgf guarantees od <= 2: voxel keys sort (batch, z, x, y),
keys within a dy-triple differ by exactly the level stride, and nothing
can sort strictly between two stride multiples — so present dy-neighbors
occupy consecutive rows.  9V gather rows of 3C-wide lanes replace 27V
rows of C (same bytes, one third the row count), with no transformed-
feature materialization; the (C_in x 3C_in) window concat feeds one
(V, 3C_in) @ (3C_in, C_out) MXU matmul per group (reference gathers then
GEMMs per offset, torchsparse `convolution_cuda.cu:100-160`).

The plan (st, od) is pure elementwise work on the rulebook — it is built
inside the apply and deduplicated across the convs of a level by XLA CSE
rather than carried in the topology.

Custom VJP mirrors ops.sparse_conv: d_feats is the same F3 conv through
the FLIPPED rulebook with per-offset-transposed weights (the window
invariant holds for flipped books too — a flipped dy-triple is the
mirrored group's triple).  d_W rides the SAME 9 window gathers: the
group's windowed rows A_g = [sel_-1 | sel_0 | sel_+1] are exactly the
three per-offset gathered inputs side by side, so

    d_W[km + 3d] = A_g[:, dC:(d+1)C]^T @ d_out

— one (3C_in, C_out) contraction per group instead of 27 per-offset
gathers (the backward conv cost drops from 9+27 to 9+9 gather rows per
output voxel).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

from .tgf import _take_rows


def _f3_packed() -> bool:
    """Gather mode, read at TRACE time (not import time) so setting
    TASEG_F3_GATHER before a (re-)jit takes effect without a reimport.

    The gather-width probe (scratch/an_gatherwidth.py) says packed
    (V, 3C) rows sit in the slow >128-lane gather regime (~55-64 M
    rows/s vs ~200-238 narrow) and predicts a 1.4x win for splitting the
    window into three narrow rows at st/st+1/st+2 — but IN-MODEL the
    split path measures 8.40 scans/s vs packed 9.27 (scratch/
    an_f3split.py, identical logits): the isolated-rate model does not
    transfer once the gathers interleave with the group matmuls.  Packed
    therefore stays the default; the split path is kept measurable."""
    return os.environ.get("TASEG_F3_GATHER", "packed") == "packed"


def _f3_quant_mode() -> str:
    """TASEG_F3_QUANT (read at trace time): "auto" (default) defers to
    the per-call `quant` argument — models request it on their eval
    path (ConvPlan.quant); "1"/"on" forces int8 gathers for any bf16
    call, "0"/"off" disables them everywhere (A/B knob).

    Why int8: wide (V, 3C) rows are BYTES-bound on the gather engine
    (~60 GB/s random-row ceiling, commit 0839279), so int8 halves the
    dominant cost of the wide decoder convs.  Quantization is symmetric
    per-channel over the level (amax/127); the exact per-channel scale is
    folded into the group weight slices, so the only error is int8
    rounding of the activations (<= amax/254 per element — the same
    order as bf16's 2^-8 relative rounding).  Inference-only: the custom
    VJP's backward ignores it (gradients use the unquantized linear
    form), and f32 calls (parity/oracle paths) are never quantized."""
    return os.environ.get("TASEG_F3_QUANT", "auto")

# group g covers (dz, dx) = divmod(g, 3); its dy = (-1, 0, +1) rulebook
# columns are km, km+3, km+6 with km = dz*9 + dx (kernel_offsets(3) is
# x-fastest: k = (dx+1) + 3*(dy+1) + 9*(dz+1))
_GROUP_KM = tuple(divmod(g, 3)[0] * 9 + divmod(g, 3)[1] for g in range(9))


def _build_plan(rb: jnp.ndarray):
    """(9, V) window starts and (9, 3, V) window offsets from a (27, V)
    dense rulebook; od == 3 marks an absent dy-neighbor."""
    v = rb.shape[1]
    big = jnp.int32(1 << 30)
    sts, ods = [], []
    for g in range(9):
        km = _GROUP_KM[g]
        rm, rc, rp = rb[km], rb[km + 3], rb[km + 6]
        mn = jnp.minimum(
            jnp.minimum(
                jnp.where(rm >= 0, rm, big), jnp.where(rc >= 0, rc, big)
            ),
            jnp.where(rp >= 0, rp, big),
        )
        st = jnp.clip(jnp.where(mn == big, 0, mn), 0, v - 3)
        ods.append(
            jnp.stack(
                [
                    jnp.where(r >= 0, r - st, 3).astype(jnp.int32)
                    for r in (rm, rc, rp)
                ]
            )
        )
        sts.append(st)
    return jnp.stack(sts), jnp.stack(ods)


def _f3_window(feats: jnp.ndarray):
    """Lane-packed window source (V, 3C): row r = [f[r] | f[r+1] | f[r+2]],
    or None in split-gather mode (see _f3_packed)."""
    if not _f3_packed():
        # Split gather: the chip's row-gather engine runs ~200-238 M
        # rows/s for rows <= 128 lanes but collapses ~4x beyond
        # (scratch/an_gatherwidth.py) — at C_in > 42 the packed (V, 3C)
        # row is in the slow regime, so fetch the dy-window as THREE
        # narrow rows of the unshifted feats at st, st+1, st+2 (st is
        # clipped to V-3, so all three are in bounds) in one launch.
        return None
    c = feats.shape[1]
    z1 = jnp.zeros((1, c), feats.dtype)
    f_u1 = jnp.concatenate([feats[1:], z1], 0)
    f_u2 = jnp.concatenate([feats[2:], z1, z1], 0)
    return jnp.concatenate([feats, f_u1, f_u2], 1)  # (V, 3C)


def _group_window_rows(feats, f3, st_g, od_g):
    """One group's windowed inputs A_g = [sel_-1 | sel_0 | sel_+1]
    (V, 3C_in): column block d equals the per-offset gather of
    feats through rb[km + 3d] with absent rows zeroed (the window
    invariant — present dy-neighbors occupy consecutive rows)."""
    v, c = feats.shape
    if f3 is None:
        idx3 = jnp.concatenate([st_g, st_g + 1, st_g + 2], 0)
        rows3 = _take_rows(feats, idx3)  # (3V, C) narrow rows
        w0, w1, w2 = rows3[:v], rows3[v : 2 * v], rows3[2 * v :]
    else:
        rows = _take_rows(f3, st_g)  # (V, 3C)
        w0, w1, w2 = rows[:, :c], rows[:, c : 2 * c], rows[:, 2 * c :]
    sels = []
    for d in range(3):
        o = od_g[d]
        pick = jax.lax.select_n(
            jnp.clip(o, 0, 2)[:, None] * jnp.ones((1, c), jnp.int32),
            w0, w1, w2,
        )
        sels.append(jnp.where((o <= 2)[:, None], pick, 0))
    return jnp.concatenate(sels, 1)  # (V, 3C_in)


def _f3_fwd_impl(
    feats: jnp.ndarray,
    weight: jnp.ndarray,
    rb: jnp.ndarray,
    quant: bool = False,
):
    w = weight.astype(feats.dtype)
    st, od = _build_plan(rb)
    mode = _f3_quant_mode()
    if mode not in ("auto",):
        quant = mode in ("1", "on")
    quant = quant and _f3_packed() and feats.dtype == jnp.bfloat16
    if quant:
        f32 = feats.astype(jnp.float32)
        amax = jnp.max(jnp.abs(f32), axis=0)  # (C,)
        scale = jnp.where(amax > 0, amax / 127.0, 1.0)
        src = jnp.clip(jnp.round(f32 / scale), -127, 127).astype(jnp.int8)
        scale3 = jnp.tile(scale, 3)[:, None]  # (3C, 1) f32
    else:
        src = feats
    f3 = _f3_window(src)
    out = None
    for g in range(9):
        km = _GROUP_KM[g]
        a = _group_window_rows(src, f3, st[g], od[g])
        wg = jnp.concatenate([w[km], w[km + 3], w[km + 6]], 0)
        if quant:
            # exact per-channel dequant folded into the weight slice; the
            # int8 rows upcast inside the matmul operand read
            wg = (scale3 * wg.astype(jnp.float32)).astype(feats.dtype)
            a = a.astype(feats.dtype)
        c_g = jnp.dot(a, wg, preferred_element_type=jnp.float32)
        out = c_g if out is None else out + c_g
    return out.astype(feats.dtype)


def f3_dw_impl(feats: jnp.ndarray, grad: jnp.ndarray, rb: jnp.ndarray):
    """d_W (27, C_in, C_out) from the 9 window gathers: per group,
    A_g^T @ grad is the three dy-offsets' weight gradients stacked on
    the contraction side.  Shared by the F3 and TGF VJPs (the old path
    was 27 per-offset gathers, 3x the backward gather rows)."""
    c = feats.shape[1]
    st, od = _build_plan(rb)
    f3 = _f3_window(feats)
    g16 = grad.astype(feats.dtype)
    d_w = [None] * 27
    for g in range(9):
        km = _GROUP_KM[g]
        a = _group_window_rows(feats, f3, st[g], od[g])
        dwg = jnp.dot(a.T, g16, preferred_element_type=jnp.float32)
        for d in range(3):
            d_w[km + 3 * d] = dwg[d * c : (d + 1) * c]
    return jnp.stack(d_w)


def f3_bwd_fused(
    feats: jnp.ndarray,
    weight: jnp.ndarray,
    grad: jnp.ndarray,
    rb_bwd: jnp.ndarray,
):
    """(d_feats, d_W) from ONE window-gather pass over the cotangent.

    The f3-form input gradient gathers A'_g = the cotangent's dy-windows
    through the flipped book (9 gathers).  The SAME blocks give the
    weight gradient: rb_bwd[k, i] = v  <=>  rb_fwd[k, v] = i (the flip
    pairs column k with W[k] on both sides), so

        d_W[k] = sum_v feats[rb_fwd[k, v]] (x) g[v]
               = sum_i feats[i] (x) g[rb_bwd[k, i]]
               = feats^T @ A'_g[:, dCo:(d+1)Co]        (k = km + 3d)

    — the backward conv cost drops to the forward's 9 gather rows per
    voxel (previously 9 for d_feats + 9 more re-gathering feats windows
    for d_W)."""
    g16 = grad.astype(feats.dtype)
    w_t = jnp.transpose(weight, (0, 2, 1)).astype(feats.dtype)  # (27,Co,Ci)
    co = weight.shape[2]
    st, od = _build_plan(rb_bwd)
    f3g = _f3_window(g16)
    d_feats = None
    d_w = [None] * 27
    for g in range(9):
        km = _GROUP_KM[g]
        a = _group_window_rows(g16, f3g, st[g], od[g])  # (V, 3Co)
        wg = jnp.concatenate([w_t[km], w_t[km + 3], w_t[km + 6]], 0)
        c = jnp.dot(a, wg, preferred_element_type=jnp.float32)
        d_feats = c if d_feats is None else d_feats + c
        dwg = jnp.dot(feats.T, a, preferred_element_type=jnp.float32)
        for d in range(3):
            d_w[km + 3 * d] = dwg[:, d * co : (d + 1) * co]
    return d_feats.astype(feats.dtype), jnp.stack(d_w)


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def f3_conv_apply(
    feats: jnp.ndarray,
    weight: jnp.ndarray,
    rb_fwd: jnp.ndarray,
    rb_bwd: jnp.ndarray,
    quant: bool = False,
) -> jnp.ndarray:
    """feats (V, C_in), weight (27, C_in, C_out), rb_fwd/rb_bwd (27, V)
    stride-1 same-coordinate-set rulebooks (rb_bwd == flip(rb_fwd)).
    `quant` (static) requests int8 window gathers — honored only for
    bf16 inputs, see _f3_quant_mode."""
    return _f3_fwd_impl(feats, weight, rb_fwd, quant)


def _f3_vjp_fwd(feats, weight, rb_fwd, rb_bwd, quant):
    return (
        _f3_fwd_impl(feats, weight, rb_fwd, quant),
        (feats, weight, rb_fwd, rb_bwd),
    )


def _f3_vjp_bwd(quant, res, g):
    feats, weight, rb_fwd, rb_bwd = res
    # one fused window pass over the cotangent yields BOTH gradients;
    # always the exact unquantized linear form
    d_feats, d_w = f3_bwd_fused(feats, weight, g, rb_bwd)
    return (
        d_feats,
        d_w.astype(weight.dtype),
        None,
        None,
    )


f3_conv_apply.defvjp(_f3_vjp_fwd, _f3_vjp_bwd)
