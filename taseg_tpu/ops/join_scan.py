"""Pallas fused post-sort scan for `join_keys` — one pass, one kernel.

After the tagged-union sort, `join_keys` derives per-row match results
with three `lax.cummax` scans plus masked-iota / compare / select
elementwise passes.  XLA lowers each cummax to a multi-pass
reduce-window running at ~11 GB/s on v5e (measured: 0.93 ms per pass at
2.4M rows), so the post-sort phase costs more than the sort itself at the
big levels.  This kernel computes all three running maxima and the final
match/select in a single sequential sweep at HBM speed:

    last_boundary[i] = max position of a key-group start at or before i
    last_ref_pos[i]  = max position of a reference row at or before i
    ref_id[i]        = max reference index seen (refs are key-sorted, so
                       their indices are monotone -> running max == last)
    matched[i]       = last_ref_pos >= last_boundary  (refs tie-break
                       first within a key group and are unique per key)

Grid steps run sequentially on TPU; five carries (the three maxima plus
the previous row's key pair for the group-boundary test) live in SMEM
scratch and flow across blocks.  In-block, each running max is a
log-step shifted-max scan along the row-major (sublane, lane) order.

Used only on TPU backends; the XLA formulation in join.py remains the
reference implementation and the CPU/test path (bit-identical results,
see tests/test_ops_join.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB, LANE = 32, 128
BLOCK = SUB * LANE  # rows per grid step
_INT_MIN = -(2**31)  # python int: jnp scalars would be captured constants


def _shift_rowmajor_prev(x, carry_scalar):
    """prev[i] = x[i-1] in row-major order; position 0 takes the carry."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    r1 = pltpu.roll(x, 1, axis=1)  # [s, 0] <- x[s, LANE-1] (wrong row)
    r2 = pltpu.roll(r1, 1, axis=0)  # fixes lane 0: [s, 0] <- x[s-1, LANE-1]
    prev = jnp.where(lane == 0, r2, r1)
    return jnp.where((lane == 0) & (sub == 0), carry_scalar, prev)


def _cummax_rowmajor(x, carry_scalar):
    """Inclusive running max over the (SUB, LANE) tile in row-major order,
    seeded with the carry from earlier blocks."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    sh = 1
    while sh < LANE:
        rolled = pltpu.roll(x, sh, axis=1)
        rolled = jnp.where(lane < sh, _INT_MIN, rolled)
        x = jnp.maximum(x, rolled)
        sh *= 2
    # per-row totals -> exclusive prefix down the sublanes
    sub = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    row_tot = jnp.max(x, axis=1, keepdims=True)  # inclusive row max
    pref = pltpu.roll(row_tot, 1, axis=0)
    pref = jnp.where(sub[:, :1] == 0, _INT_MIN, pref)  # exclusive
    sh = 1
    while sh < SUB:
        rolled = pltpu.roll(pref, sh, axis=0)
        rolled = jnp.where(sub[:, :1] < sh, _INT_MIN, rolled)
        pref = jnp.maximum(pref, rolled)
        sh *= 2
    x = jnp.maximum(x, pref)
    return jnp.maximum(x, carry_scalar)


def _kernel(nref_ref, shi_ref, slo2_ref, srow_ref, out_ref, carry):
    """carry (SMEM, 5): prev_hi, prev_lokey, c_bound, c_refpos, c_refid.

    scalars[3] selects the output encoding: 0 -> matched ref id or -1
    (classic join); 1 -> floor encoding `refid * 2 + exact` (-2 when no
    reference sorts at-or-before the row), consumed by
    `join.floor_join_keys` for the grouped rulebook build."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        carry[0] = _INT_MIN  # prev hi: guarantees a boundary at row 0
        carry[1] = _INT_MIN
        carry[2] = -1
        carry[3] = -1
        carry[4] = -1

    shi = shi_ref[...]
    lokey = slo2_ref[...] >> 1
    srow = srow_ref[...]
    num_refs = nref_ref[0]
    v = nref_ref[1]
    qsent = nref_ref[2]
    mode = nref_ref[3]

    pos0 = i * BLOCK
    lane = jax.lax.broadcasted_iota(jnp.int32, shi.shape, 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, shi.shape, 0)
    pos = pos0 + sub * LANE + lane

    prev_hi = _shift_rowmajor_prev(shi, carry[0])
    prev_lo = _shift_rowmajor_prev(lokey, carry[1])
    differs = (shi != prev_hi) | (lokey != prev_lo)

    is_ref = srow < v
    ref_valid = is_ref & (srow < num_refs)

    bound = _cummax_rowmajor(jnp.where(differs, pos, -1), carry[2])
    refpos = _cummax_rowmajor(jnp.where(is_ref, pos, -1), carry[3])
    refid = _cummax_rowmajor(jnp.where(ref_valid, srow, -1), carry[4])

    matched = (refpos >= bound) & (refid >= 0) & (shi < qsent)
    floor_enc = jnp.where(
        shi < qsent, refid * 2 + matched.astype(jnp.int32), -2
    )
    out_ref[...] = jnp.where(
        mode == 1, floor_enc, jnp.where(matched, refid, -1)
    )

    carry[0] = shi[SUB - 1, LANE - 1]
    carry[1] = lokey[SUB - 1, LANE - 1]
    carry[2] = bound[SUB - 1, LANE - 1]
    carry[3] = refpos[SUB - 1, LANE - 1]
    carry[4] = refid[SUB - 1, LANE - 1]


@partial(jax.jit, static_argnums=(4, 5))
def join_scan(shi, slo2, srow, scalars, n_pad, interpret=False):
    """Fused post-sort join scan.

    shi/slo2/srow: (n,) int32 sorted union (refs tagged via slo2 low bit).
    scalars: (4,) int32 — (num_refs, v, QUERY_SENTINEL_HI, mode).
    n_pad: static padded length (multiple of BLOCK; pad rows must carry
    sentinel hi so they never match).
    Returns result_sorted (n_pad,) int32.
    """
    grid = n_pad // BLOCK

    def body(nref, a, b, c):
        return pl.pallas_call(
            _kernel,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((SUB, LANE), lambda i: (i, 0)),
                pl.BlockSpec((SUB, LANE), lambda i: (i, 0)),
                pl.BlockSpec((SUB, LANE), lambda i: (i, 0)),
            ],
            out_specs=pl.BlockSpec((SUB, LANE), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((grid * SUB, LANE), jnp.int32),
            scratch_shapes=[pltpu.SMEM((5,), jnp.int32)],
            interpret=interpret,
        )(nref, a, b, c)

    shape = (grid * SUB, LANE)
    out = body(
        scalars,
        shi.reshape(shape),
        slo2.reshape(shape),
        srow.reshape(shape),
    )
    return out.reshape(-1)
