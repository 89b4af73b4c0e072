"""Golden tests for coordinate keys, unique, and sort-based joins.

Oracle semantics come from the reference CPU kernels (torchsparse
`backend/hash/hash_cpu.cpp`, `backend/hashmap/hashmap_cpu.cpp`) re-derived
in pure numpy: exact coordinate matching, -1 for misses.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from taseg_tpu.ops import (
    compute_bounds,
    pack_keys,
    query_coords,
    unique_coords,
)


def random_coords(rng, n, lo=-50, hi=50, batches=3):
    xyz = rng.integers(lo, hi, size=(n, 3))
    b = rng.integers(0, batches, size=(n, 1))
    return np.concatenate([xyz, b], axis=1).astype(np.int32)


def test_pack_keys_bijective_in_bounds():
    rng = np.random.default_rng(0)
    coords = random_coords(rng, 500)
    valid = np.ones(500, bool)
    bounds = compute_bounds(jnp.asarray(coords), jnp.asarray(valid))
    hi, lo = pack_keys(jnp.asarray(coords), bounds, jnp.asarray(valid))
    keys = np.stack([np.asarray(hi), np.asarray(lo)], axis=1)
    uniq_rows = np.unique(coords, axis=0)
    uniq_keys = np.unique(keys, axis=0)
    assert len(uniq_rows) == len(uniq_keys)


def test_unique_coords_matches_numpy():
    rng = np.random.default_rng(1)
    n, cap = 400, 512
    coords = random_coords(rng, n, lo=-10, hi=10)
    valid = rng.random(n) > 0.1
    bounds = compute_bounds(jnp.asarray(coords), jnp.asarray(valid))
    ucoords, num, inverse, counts = unique_coords(
        jnp.asarray(coords), jnp.asarray(valid), bounds, cap
    )
    ucoords, num, inverse, counts = map(np.asarray, (ucoords, num, inverse, counts))

    ref_unique, ref_counts = np.unique(
        coords[valid], axis=0, return_counts=True
    )
    assert num == len(ref_unique)
    got = ucoords[:num]
    # same set of coords (order may differ)
    assert {tuple(r) for r in got} == {tuple(r) for r in ref_unique}
    # counts per coord agree
    ref_map = {tuple(r): c for r, c in zip(ref_unique, ref_counts)}
    for row, c in zip(got, counts[:num]):
        assert ref_map[tuple(row)] == c
    # inverse correctness: every valid point maps to its own coord
    for i in range(n):
        if valid[i]:
            assert (ucoords[inverse[i]] == coords[i]).all()
        else:
            assert inverse[i] == -1
    # valid rows are packed first & key-sorted (strictly increasing keys)
    hi, lo = pack_keys(jnp.asarray(ucoords), bounds,
                       jnp.arange(cap) < num)
    hi, lo = np.asarray(hi), np.asarray(lo)
    key = hi[:num].astype(np.int64) * 2**31 + lo[:num]
    assert (np.diff(key) > 0).all()


def test_unique_coords_overflow_reports_true_count():
    rng = np.random.default_rng(2)
    coords = random_coords(rng, 300, lo=-40, hi=40)
    valid = np.ones(300, bool)
    bounds = compute_bounds(jnp.asarray(coords), jnp.asarray(valid))
    cap = 16  # far below the true unique count
    _, num, inverse, _ = unique_coords(
        jnp.asarray(coords), jnp.asarray(valid), bounds, cap
    )
    true_unique = len(np.unique(coords, axis=0))
    assert int(num) == true_unique
    assert (np.asarray(inverse) < cap).all()


@pytest.mark.parametrize("seed", [0, 7])
def test_query_coords_exact_and_missing(seed):
    rng = np.random.default_rng(seed)
    n, cap = 300, 512
    coords = random_coords(rng, n, lo=-20, hi=20)
    valid = np.ones(n, bool)
    bounds = compute_bounds(jnp.asarray(coords), jnp.asarray(valid))
    ucoords, num, _, _ = unique_coords(
        jnp.asarray(coords), jnp.asarray(valid), bounds, cap
    )

    # queries: half existing coords, half guaranteed-missing, some invalid
    q_exist = coords[rng.integers(0, n, 100)]
    q_miss = random_coords(rng, 100, lo=200, hi=260)  # in-bounds? no: OOB
    q_near_miss = coords[rng.integers(0, n, 50)].copy()
    q_near_miss[:, 2] += 1000  # inside margin? no — far outside
    q = np.concatenate([q_exist, q_miss, q_near_miss])
    q_valid = np.ones(len(q), bool)
    q_valid[-10:] = False

    idx = np.asarray(
        query_coords(jnp.asarray(q), jnp.asarray(q_valid), ucoords, num, bounds)
    )
    un = np.asarray(ucoords)
    coord_set = {tuple(r) for r in np.asarray(un)[: int(num)]}
    for i in range(len(q)):
        if not q_valid[i] or tuple(q[i]) not in coord_set:
            assert idx[i] == -1
        else:
            assert idx[i] >= 0 and (un[idx[i]] == q[i]).all()


def test_query_respects_num_refs():
    # padding rows past num must never match, even for a (0,0,0,0) query
    coords = np.array([[5, 5, 5, 0], [6, 6, 6, 0]], np.int32)
    valid = np.ones(2, bool)
    bounds = compute_bounds(jnp.asarray(coords), jnp.asarray(valid))
    ucoords, num, _, _ = unique_coords(
        jnp.asarray(coords), jnp.asarray(valid), bounds, 8
    )
    q = np.array([[0, 0, 0, 0]], np.int32)  # equals the zero padding rows
    idx = query_coords(
        jnp.asarray(q), jnp.asarray(np.ones(1, bool)), ucoords, num, bounds
    )
    assert int(idx[0]) == -1


def test_join_scan_kernel_matches_xla_formulation():
    """The fused Pallas post-sort sweep (ops.join_scan, interpret mode on
    CPU) must reproduce the XLA cummax formulation bit-exactly, incl.
    sentinel rows, invalid refs beyond num_refs, and block-boundary
    carries (n spans multiple 4096-row blocks)."""
    import jax
    import jax.numpy as jnp
    from taseg_tpu.ops.coords import QUERY_SENTINEL_HI
    from taseg_tpu.ops.join_scan import BLOCK, join_scan

    rng = np.random.default_rng(17)
    for trial, (v, q) in enumerate(((600, 2200), (4096, 8192), (33, 40))):
        n = v + q
        # random sorted union with heavy key collisions
        ref_keys = np.sort(rng.integers(0, v, size=v).astype(np.int64))
        ref_keys = np.unique(ref_keys)
        pad_r = v - len(ref_keys)
        ref_hi = np.concatenate(
            [ref_keys // 7, np.full(pad_r, 2**31 - 1)]
        ).astype(np.int32)
        ref_lo = np.concatenate(
            [ref_keys % 7, np.zeros(pad_r)]
        ).astype(np.int32)
        q_hi = rng.integers(0, max(v // 7, 2), size=q).astype(np.int32)
        q_lo = rng.integers(0, 7, size=q).astype(np.int32)
        # some sentinel queries
        q_hi[:: 13] = int(QUERY_SENTINEL_HI)
        q_lo[:: 13] = 0
        num_refs = jnp.int32(len(ref_keys))

        hi = jnp.concatenate([jnp.asarray(ref_hi), jnp.asarray(q_hi)])
        lo2 = jnp.concatenate(
            [jnp.asarray(ref_lo) * 2, jnp.asarray(q_lo) * 2 + 1]
        )
        row = jnp.arange(n, dtype=jnp.int32)
        shi, slo2, srow = jax.lax.sort((hi, lo2, row), num_keys=2)

        # XLA reference
        is_ref = srow < v
        pos = jnp.arange(n, dtype=jnp.int32)
        key_differs = jnp.concatenate(
            [
                jnp.ones((1,), bool),
                (shi[1:] != shi[:-1]) | ((slo2[1:] >> 1) != (slo2[:-1] >> 1)),
            ]
        )
        lb = jax.lax.cummax(jnp.where(key_differs, pos, -1))
        lr = jax.lax.cummax(jnp.where(is_ref, pos, -1))
        ri = jax.lax.cummax(jnp.where(is_ref & (srow < num_refs), srow, -1))
        matched = (lr >= lb) & (ri >= 0) & (shi < QUERY_SENTINEL_HI)
        want = np.asarray(jnp.where(matched, ri, -1))

        n_pad = (n + BLOCK - 1) // BLOCK * BLOCK
        padn = n_pad - n
        shi_p = jnp.concatenate(
            [shi, jnp.full((padn,), QUERY_SENTINEL_HI, jnp.int32)]
        )
        slo2_p = jnp.concatenate([slo2, jnp.ones((padn,), jnp.int32)])
        srow_p = jnp.concatenate([srow, jnp.full((padn,), 2**30, jnp.int32)])
        scalars = jnp.stack(
            [num_refs, jnp.int32(v), QUERY_SENTINEL_HI, jnp.int32(0)]
        )
        got = np.asarray(
            join_scan(shi_p, slo2_p, srow_p, scalars, n_pad, True)
        )[:n]
        np.testing.assert_array_equal(got, want, err_msg=f"trial {trial}")

        # floor mode (scalars[3] == 1): refid * 2 + exact, -2 when no
        # reference sorts at-or-before the row
        want_floor = np.asarray(
            jnp.where(
                shi < QUERY_SENTINEL_HI, ri * 2 + matched.astype(jnp.int32), -2
            )
        )
        scalars_f = jnp.stack(
            [num_refs, jnp.int32(v), QUERY_SENTINEL_HI, jnp.int32(1)]
        )
        got_f = np.asarray(
            join_scan(shi_p, slo2_p, srow_p, scalars_f, n_pad, True)
        )[:n]
        np.testing.assert_array_equal(
            got_f, want_floor, err_msg=f"floor trial {trial}"
        )


@pytest.mark.parametrize("seed,stride", [(3, 1), (4, 2), (5, 4), (6, 16)])
def test_grouped_k3_rulebook_matches_dense_build(seed, stride):
    """`build_rulebook_k3` (9 floor queries + neighbor reconstruction)
    must reproduce the 27-query dense build exactly — including negative
    coords, multiple batches, padding rows, and sparse/dense regimes."""
    from taseg_tpu.ops import (
        build_rulebook,
        build_rulebook_k3,
        kernel_offsets,
    )

    rng = np.random.default_rng(seed)
    n, cap = 700, 1024
    # stride-aligned coords (as produced by spdownsample at this level):
    # a dense clump (many neighbors) + sparse outliers (isolated voxels)
    dense = random_coords(rng, n // 2, lo=-4, hi=4) * stride
    sparse = random_coords(rng, n - n // 2, lo=-30, hi=30) * stride
    coords = np.concatenate([dense, sparse])
    coords[:, 3] = np.abs(coords[:, 3]) // stride % 2  # 2 batches
    valid = rng.random(n) > 0.05
    bounds = compute_bounds(jnp.asarray(coords), jnp.asarray(valid))
    ucoords, num, _, _ = unique_coords(
        jnp.asarray(coords), jnp.asarray(valid), bounds, cap
    )
    want = np.asarray(
        build_rulebook(
            ucoords, num, ucoords, num,
            kernel_offsets(3, stride=stride), bounds,
        )
    )
    got = np.asarray(build_rulebook_k3(ucoords, num, stride, bounds))
    np.testing.assert_array_equal(got, want)


def test_unique_coords_assume_sorted_matches_general():
    """assume_sorted=True (used when a host loader pre-sorts points by
    voxel key) must agree with the general path on key-sorted input."""
    rng = np.random.default_rng(11)
    n, cap = 500, 1024
    coords = random_coords(rng, n, lo=-15, hi=15)
    valid = np.ones(n, bool)
    bounds = compute_bounds(jnp.asarray(coords), jnp.asarray(valid))
    hi, lo = map(
        np.asarray, pack_keys(jnp.asarray(coords), bounds, jnp.asarray(valid))
    )
    order = np.lexsort((lo, hi))
    coords = coords[order]

    a = unique_coords(jnp.asarray(coords), jnp.asarray(valid), bounds, cap,
                      return_perm=True)
    b = unique_coords(jnp.asarray(coords), jnp.asarray(valid), bounds, cap,
                      return_perm=True, assume_sorted=True)
    for name, x, y in zip(("coords", "num", "inverse", "counts", "perm"),
                          a, b):
        np.testing.assert_array_equal(
            np.asarray(x), np.asarray(y), err_msg=name
        )


def test_voxel_pipeline_shard_is_key_sorted():
    """VoxelPipeline emits each scan key-sorted (z, x, y) and composes
    inverse_map with the sort; a collate_shard of such scans is globally
    key-sorted, so build_unet_topology(assume_sorted_points=True) — the
    engine's fast path for sorted host pipelines — must agree with the
    general path end to end (data/voxel_dataset.py, engine.py)."""
    from taseg_tpu.data.synthetic import synthetic_scan
    from taseg_tpu.data.voxel_dataset import VoxelPipeline, collate_shard

    pipe = VoxelPipeline(voxel_size=0.2, training=False)
    rng = np.random.default_rng(3)
    samples = []
    for _ in range(2):
        pts, labels = synthetic_scan(rng, 3000)
        ring = np.zeros((len(pts), 1), np.float32)
        s = pipe({"xyzret": np.concatenate([pts, ring], 1), "labels": labels})
        # per-scan (z, x, y) lex order
        key = (
            s.coords[:, 2].astype(np.int64) * 2**40
            + s.coords[:, 0].astype(np.int64) * 2**20
            + s.coords[:, 1]
        )
        assert (np.diff(key) > 0).all()
        # inverse_map still maps raw points onto their voxel rows
        np.testing.assert_array_equal(
            s.coords[s.inverse_map],
            np.round(
                np.concatenate([pts, ring], 1)[:, :3] / 0.2
            ).astype(np.int32)
            - np.round(pts[:, :3] / 0.2).astype(np.int32).min(0),
        )
        samples.append(s)

    arrays = collate_shard(samples, 8192)
    coords = jnp.asarray(arrays["point_coords"])
    num = jnp.asarray(arrays["num_points"][0])

    from taseg_tpu.models import UNetCapacities
    from taseg_tpu.models.voxel.backbone_context import build_unet_topology

    caps = UNetCapacities.for_points(8192)
    ref = build_unet_topology(coords, num, caps)
    fast = build_unet_topology(coords, num, caps, assume_sorted_points=True)
    np.testing.assert_array_equal(
        np.asarray(ref.levels[0].coords), np.asarray(fast.levels[0].coords)
    )
    np.testing.assert_array_equal(
        np.asarray(ref.point_inverse), np.asarray(fast.point_inverse)
    )
    np.testing.assert_array_equal(
        np.asarray(ref.levels[0].rb_k3), np.asarray(fast.levels[0].rb_k3)
    )
