"""Two-level probe join — the fast path for sorted query streams.

`join_keys` (the general sphashquery replacement) sorts the tagged union
of references and ALL query streams: for a 27-offset rulebook that is a
28V-row sort plus a 28V-row back-sort — the dominant cost of topology
construction.  But every rulebook query stream is the reference keys
shifted by a constant, hence ALREADY SORTED; this module exploits that:

  1. COARSE RANKS: one merged sort of (refs + every 16th query) — only
     V + KV/16 rows — yields, per (stream, microtile-of-16), the exact
     reference rank interval [r_j, r_{j+1}) that contains ALL 16 matches
     (ranks of sorted streams are monotone, so the interval is a
     guarantee, not a heuristic).
  2. WINDOWED COMPARE: microtiles whose interval fits a W-key window are
     resolved by comparing their 16 query keys against a gathered window
     (packed-row gathers, sorted-indices hint) — ~95-98% of microtiles.
  3. EXACT SECOND LEVEL: the flagged remainder (a SMALL (K, V/16) matrix
     — cheap to compact by sorting, unlike per-entry compaction) re-enters
     a second merged rank sort with per-query probes; the exact rank plus
     one packed-row key lookup decides match-or-absent.  Results return
     via a rank-merge slot lookup — no scatters anywhere.
  4. A lax.cond full `join_keys` fallback guards the static second-level
     capacity (fires only if >~6% of microtiles overflow — not observed
     on LiDAR data).

Exactness: every query is decided by key equality at a PROVEN candidate
rank; `tests/test_probe_join.py` checks bit-equality against `join_keys`
on adversarial densities.

STATUS (measured, tunnel v5e): exact and ~equal-speed to the general
join at L0 scale (22 ms isolated) but ~18% SLOWER in the full topology —
this backend's sorts are unusually strong (~450M rows/s) while its
gathers are weak, so the window gathers + compare matrices cost what the
big sorts did, and the level-2 fixed costs hurt at small levels.  The
sort join stays the default; this module is the right design for
hardware where sorting, not gathering, is the bottleneck.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .coords import QUERY_SENTINEL_HI

MICRO = 16  # queries per microtile
WIN = 32  # candidate window (keys) for the compare level
PACK = 8  # ref keys per gathered row


def _merged_ranks(ref_hi, ref_lo, p_hi, p_lo):
    """rank[i] = #refs with key < probe_i (searchsorted-LEFT: probes sort
    BEFORE equal refs, so an exact hit's own ref is not counted and the
    rank IS its index)."""
    v = ref_hi.shape[0]
    n = v + p_hi.shape[0]
    hi = jnp.concatenate([ref_hi, p_hi])
    lo2 = jnp.concatenate([ref_lo * 2 + 1, p_lo * 2])  # probes first on ties
    row = jnp.arange(n, dtype=jnp.int32)
    shi, slo2, srow = jax.lax.sort((hi, lo2, row), num_keys=2)
    is_probe = srow >= v
    pos = jnp.arange(n, dtype=jnp.int32)
    nprobe_before = jnp.cumsum(is_probe.astype(jnp.int32)) - is_probe
    rank_sorted = pos - nprobe_before
    # back to probe order (scatter-free: sort by original row)
    _, back = jax.lax.sort(
        (srow, jnp.where(is_probe, rank_sorted, 0)), num_keys=1
    )
    return back[v:]


def _gather_rows(arr2d, rows, width):
    """arr2d (R, PACK); rows (N,) -> (N, width, PACK).

    `width` separate single-row gathers: XLA lowers multi-row slice
    gathers to per-element copies on this backend (~20x slower), while
    plain row gathers run at the measured ~240M rows/s."""
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,)
    )
    r_max = arr2d.shape[0] - 1
    parts = [
        jax.lax.gather(
            arr2d, jnp.minimum(rows + i, r_max)[:, None], dn,
            slice_sizes=(1, PACK),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        )
        for i in range(width)
    ]
    return jnp.stack(parts, axis=1)


@functools.partial(jax.jit, static_argnames=("cap_frac",))
def probe_join(
    ref_hi: jnp.ndarray,
    ref_lo: jnp.ndarray,
    num_refs: jnp.ndarray,
    q_hi: jnp.ndarray,  # (K, V) — every row sorted ascending
    q_lo: jnp.ndarray,
    *,
    cap_frac: int = 16,
) -> jnp.ndarray:
    """(K, V) int32 indices into refs, -1 where absent.

    Requirements: refs unique + key-sorted with sentinel padding
    (unique_coords output); every query ROW sorted ascending (constant
    key shifts of a sorted array — invalid rows carry QUERY_SENTINEL_HI
    which sorts last)."""
    k, v = q_hi.shape
    vr = ref_hi.shape[0]
    assert v % MICRO == 0
    p = v // MICRO

    # ---- level 1: coarse ranks ------------------------------------------
    r = _merged_ranks(
        ref_hi, ref_lo,
        q_hi[:, ::MICRO].reshape(-1), q_lo[:, ::MICRO].reshape(-1),
    ).reshape(k, p)
    r_next = jnp.concatenate(
        [r[:, 1:], jnp.broadcast_to(num_refs, (k, 1)).astype(jnp.int32)],
        axis=1,
    )
    # matches of microtile j lie in [r_j, r_{j+1})
    span_ok = (r_next - r) <= (WIN - PACK)

    # ---- level 2 flags + windowed compare --------------------------------
    pad_rows = WIN // PACK + 1
    refs_hi2 = jnp.concatenate(
        [ref_hi, jnp.full((PACK * pad_rows,), QUERY_SENTINEL_HI, ref_hi.dtype)]
    ).reshape(-1, PACK)
    refs_lo2 = jnp.concatenate(
        [ref_lo, jnp.zeros((PACK * pad_rows,), ref_lo.dtype)]
    ).reshape(-1, PACK)
    base_row = jnp.clip(r, 0, vr - 1) // PACK
    win_hi = _gather_rows(
        refs_hi2, base_row.reshape(-1), pad_rows
    ).reshape(k, p, pad_rows * PACK)
    win_lo = _gather_rows(
        refs_lo2, base_row.reshape(-1), pad_rows
    ).reshape(k, p, pad_rows * PACK)

    qh = q_hi.reshape(k, p, MICRO)
    ql = q_lo.reshape(k, p, MICRO)
    eq = (win_hi[:, :, None, :] == qh[..., None]) & (
        win_lo[:, :, None, :] == ql[..., None]
    )  # (K, P, MICRO, pad_rows*PACK)
    local = jnp.argmax(eq, axis=-1).astype(jnp.int32)
    found = jnp.any(eq, axis=-1)
    idx1 = jnp.where(
        found, base_row[..., None] * PACK + local, -1
    )
    valid_q = qh < QUERY_SENTINEL_HI
    resolved = span_ok[..., None] & valid_q
    idx1 = jnp.where(resolved, idx1, -1)

    # ---- level 2: exact ranks for unresolved microtiles ------------------
    need = (~span_ok) & jnp.any(valid_q, axis=-1)  # (K, P)
    cap = max((k * p) // cap_frac, MICRO)
    flat_id = jnp.arange(k * p, dtype=jnp.int32)
    sort_key = jnp.where(need.reshape(-1), flat_id, jnp.int32(2**30))
    slot_src, _ = jax.lax.sort(
        (sort_key, flat_id), num_keys=1
    )
    slot_src = slot_src[:cap]  # (cap,) flat (k, j) ids, 2**30-padded
    n_need = jnp.sum(need.astype(jnp.int32))
    overflow = n_need > cap

    src = jnp.clip(slot_src, 0, k * p - 1)
    q2_hi = q_hi.reshape(k * p, MICRO)[src]
    q2_lo = q_lo.reshape(k * p, MICRO)[src]
    live = (slot_src < 2**30)[:, None]
    q2_hi = jnp.where(live, q2_hi, QUERY_SENTINEL_HI)
    q2_lo = jnp.where(live, q2_lo, 0)
    r2 = _merged_ranks(
        ref_hi, ref_lo, q2_hi.reshape(-1), q2_lo.reshape(-1)
    ).reshape(cap, MICRO)
    # verify the candidate at the exact rank
    cand = jnp.clip(r2, 0, vr - 1)
    ch = refs_hi2.reshape(-1)[cand]
    cl = refs_lo2.reshape(-1)[cand]
    ok2 = (
        (ch == q2_hi) & (cl == q2_lo) & (r2 < num_refs) & live
    )
    idx2_slots = jnp.where(ok2, r2, -1)  # (cap, MICRO)

    # route slots back: rank of each flat (k, j) among slot_src
    pos2 = _merged_ranks(
        slot_src.astype(jnp.int32), jnp.zeros_like(slot_src),
        flat_id, jnp.zeros_like(flat_id),
    )  # for flat id f: #slots with src < f; slot matches when src == f
    slot_of = jnp.clip(pos2, 0, cap - 1)
    hit = jnp.take(slot_src, slot_of) == flat_id
    idx2 = jnp.where(
        hit[:, None], idx2_slots[slot_of], -1
    ).reshape(k, p, MICRO)

    out = jnp.where(span_ok[..., None], idx1, idx2).reshape(k, v)

    # ---- static-capacity guard: exact fallback (not observed in practice)
    def fallback(_):
        from .join import join_keys

        return join_keys(
            ref_hi, ref_lo, num_refs,
            q_hi.reshape(-1), q_lo.reshape(-1),
        ).reshape(k, v)

    return jax.lax.cond(overflow, fallback, lambda o: o, out)
