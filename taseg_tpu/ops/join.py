"""Sort-based unique / hash-query primitives on coordinate keys.

TPU-native equivalents of the reference's hash-map ops:
  * `unique_coords`   ~ `sphash` + `torch.unique` + `sphashquery` + `spcount`
    composed (torchsparse `nn/functional/{hash,query,count}.py`, and the
    host-side `utils/quantize.py:24-46`), done with one `lax.sort`.
  * `lex_search`      ~ `sphashquery` (cuckoo-map lookup,
    `backend/hashmap/hashmap_cuda.cu:8-212`) as a vectorized binary search
    over lexicographically sorted (hi, lo) int32 key pairs.

Everything is static-shape: callers supply a capacity; valid rows are packed
first (sorted keys put sentinels last) and a scalar count is returned.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .coords import GridBounds, QUERY_SENTINEL_HI, pack_keys


def unique_coords(
    coords: jnp.ndarray,
    valid: jnp.ndarray,
    bounds: GridBounds,
    capacity: int,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Deduplicate (N, 4) int coords into a capacity-padded unique set.

    Returns (unique_coords (capacity, 4) int32 — key-sorted, valid rows
    first; num_unique scalar int32; inverse (N,) int32 with -1 for invalid
    input rows; counts (capacity,) int32 occurrences per unique coord).

    If the true number of unique coords exceeds `capacity`, the overflow
    rows are dropped (their inverse entries point past the capacity and are
    set to -1); callers can detect this via `num_unique > capacity` since
    the returned count is *not* clipped.
    """
    n = coords.shape[0]
    hi, lo = pack_keys(coords, bounds, valid)
    perm = jnp.arange(n, dtype=jnp.int32)
    shi, slo, sperm = jax.lax.sort((hi, lo, perm), num_keys=2)

    valid_sorted = shi < QUERY_SENTINEL_HI
    prev_differs = jnp.concatenate(
        [
            jnp.ones((1,), dtype=bool),
            (shi[1:] != shi[:-1]) | (slo[1:] != slo[:-1]),
        ]
    )
    is_first = valid_sorted & prev_differs
    uid = jnp.cumsum(is_first.astype(jnp.int32)) - 1  # id of each sorted row
    num_unique = jnp.sum(is_first.astype(jnp.int32))

    in_capacity = valid_sorted & (uid < capacity)
    inverse = jnp.zeros((n,), jnp.int32).at[sperm].set(jnp.where(in_capacity, uid, -1))

    scatter_to = jnp.where(is_first & (uid < capacity), uid, capacity)
    out_coords = (
        jnp.zeros((capacity, 4), jnp.int32)
        .at[scatter_to]
        .set(coords.astype(jnp.int32)[sperm], mode="drop")
    )
    counts = jax.ops.segment_sum(
        in_capacity.astype(jnp.int32),
        jnp.where(in_capacity, uid, capacity),
        num_segments=capacity + 1,
    )[:capacity]
    return out_coords, num_unique, inverse, counts


def lex_search(
    ref_hi: jnp.ndarray,
    ref_lo: jnp.ndarray,
    q_hi: jnp.ndarray,
    q_lo: jnp.ndarray,
) -> jnp.ndarray:
    """Exact-match lookup of query keys in lexicographically sorted ref keys.

    `ref_hi/ref_lo` must be sorted by (hi, lo) with sentinel-padded tails
    (the layout produced by `unique_coords`).  Returns the position of each
    query in the reference arrays, or -1 when absent.  Static O(log V)
    rounds of gathered compares — the TPU replacement for cuckoo lookup.
    """
    v = ref_hi.shape[0]
    steps = max(1, math.ceil(math.log2(max(v, 2))) + 1)
    lo_b = jnp.zeros(q_hi.shape, jnp.int32)
    hi_b = jnp.full(q_hi.shape, v, jnp.int32)
    for _ in range(steps):
        mid = jnp.clip((lo_b + hi_b) // 2, 0, v - 1)
        mh = ref_hi[mid]
        ml = ref_lo[mid]
        less = (mh < q_hi) | ((mh == q_hi) & (ml < q_lo))
        lo_b = jnp.where(less, mid + 1, lo_b)
        hi_b = jnp.where(less, hi_b, mid)
    pos = jnp.clip(lo_b, 0, v - 1)
    found = (lo_b < v) & (ref_hi[pos] == q_hi) & (ref_lo[pos] == q_lo)
    return jnp.where(found, pos, -1)


def query_coords(
    query: jnp.ndarray,
    query_valid: jnp.ndarray,
    refs: jnp.ndarray,
    num_refs: jnp.ndarray,
    bounds: GridBounds,
) -> jnp.ndarray:
    """Find each query coord (..., 4) in a key-sorted reference coord set.

    `refs` must be the (capacity, 4) output of `unique_coords`: its first
    `num_refs` rows key-sorted valid coords, the tail zero padding (which is
    masked out here so it can never match or break the sort order).
    Returns int32 indices into `refs`, -1 when absent.  Equivalent to the
    reference's `sphashquery(sphash(q), sphash(refs))`.
    """
    ref_valid = jnp.arange(refs.shape[0], dtype=jnp.int32) < num_refs
    ref_hi, ref_lo = pack_keys(refs, bounds, ref_valid)
    q_hi, q_lo = pack_keys(
        query.reshape(-1, 4), bounds, query_valid.reshape(-1), is_query=True
    )
    idx = lex_search(ref_hi, ref_lo, q_hi, q_lo)
    return idx.reshape(query.shape[:-1])
