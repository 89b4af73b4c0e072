"""probe_join vs the general sort-merge join — bit-exact equivalence on
adversarial densities (plane crossings, fringe microtiles, empties)."""

import numpy as np
import jax.numpy as jnp
import pytest

from taseg_tpu.ops import compute_bounds, kernel_offsets, unique_coords
from taseg_tpu.ops.rulebook import build_rulebook, build_rulebook_fast


def _coords_case(rng, kind, n=3000):
    if kind == "uniform":
        xyz = rng.integers(-40, 40, (n, 3))
    elif kind == "planes":
        # dense ground plane + sparse fringe planes (the adversarial
        # multi-cluster case for windowed matching)
        ground = np.stack([
            rng.integers(-60, 60, n // 2),
            rng.integers(-60, 60, n // 2),
            np.zeros(n // 2, np.int64),
        ], 1)
        fringe = np.stack([
            rng.integers(-8, 8, n // 2),
            rng.integers(-8, 8, n // 2),
            rng.integers(1, 40, n // 2),
        ], 1)
        xyz = np.concatenate([ground, fringe])
    elif kind == "lines":
        # extreme density ratio between adjacent planes
        a = np.stack([np.arange(n // 2) % 97, np.arange(n // 2) // 97,
                      np.zeros(n // 2, np.int64)], 1)
        b = np.stack([rng.integers(0, 5, n // 2) * 19,
                      rng.integers(0, 5, n // 2),
                      np.ones(n // 2, np.int64)], 1)
        xyz = np.concatenate([a, b])
    batch = rng.integers(0, 2, len(xyz))
    return np.concatenate([xyz, batch[:, None]], 1).astype(np.float32)


@pytest.mark.parametrize("kind", ["uniform", "planes", "lines"])
@pytest.mark.parametrize("ks,stride", [(3, 1), (2, 1)])
def test_probe_join_matches_general_join(kind, ks, stride):
    rng = np.random.default_rng(hash((kind, ks)) % 2**31)
    coords = jnp.asarray(_coords_case(rng, kind))
    n = coords.shape[0]
    cap = 4096
    valid = jnp.arange(n) < n
    bounds = compute_bounds(coords.astype(jnp.int32), valid, margin=8)
    refs, num, _, _ = unique_coords(
        coords.astype(jnp.int32), valid, bounds, cap
    )
    offs = kernel_offsets(ks, stride=stride)
    want = build_rulebook(refs, num, refs, num, offs, bounds)
    got = build_rulebook_fast(refs, num, refs, num, offs, bounds)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_probe_join_cross_sets():
    """out/in sets differ (down-conv case)."""
    from taseg_tpu.ops.rulebook import spdownsample

    rng = np.random.default_rng(7)
    coords = jnp.asarray(_coords_case(rng, "planes"))
    n = coords.shape[0]
    valid = jnp.arange(n) < n
    bounds = compute_bounds(coords.astype(jnp.int32), valid, margin=8)
    refs, num, _, _ = unique_coords(
        coords.astype(jnp.int32), valid, bounds, 4096
    )
    down, num_d = spdownsample(refs, num, 2, 1, bounds, 2048)
    offs = kernel_offsets(2, stride=1)
    want = build_rulebook(down, num_d, refs, num, offs, bounds)
    got = build_rulebook_fast(down, num_d, refs, num, offs, bounds)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
