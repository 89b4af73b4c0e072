"""Global pools + ToBEV family vs dense numpy oracles (VERDICT r3 #6).

Oracles re-derive the torchsparse semantics (`nn/functional/pooling.py`,
`nn/modules/bev.py`) in plain numpy over the same random sparse batch:
per-batch mean/max, duplicate-mean BEV reduction, height-sliced FC with
dense scatter-sum, and height->channel compression.  Dense outputs here
are NHWC (the modules document the deviation from the reference's NCHW).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from taseg_tpu.ops import (
    GridBounds,
    SparseGrid,
    bev_height_compression,
    bev_reduction,
    bev_sparse_conv,
    compute_bounds,
    global_avg_pool,
    global_max_pool,
    to_dense_bev,
)
from taseg_tpu.models import (
    GlobalAvgPool,
    GlobalMaxPool,
    ToBEVHeightCompression,
    ToDenseBEVConvolution,
)


CAP, C, B = 256, 8, 3
H = W = 16
D = 4


@pytest.fixture(scope="module")
def grid():
    rng = np.random.default_rng(7)
    n = 180
    coords = np.zeros((CAP, 4), np.int32)
    coords[:n, 0] = rng.integers(0, H, n)
    coords[:n, 1] = rng.integers(0, W, n)
    coords[:n, 2] = rng.integers(0, D, n)
    coords[:n, 3] = rng.integers(0, B, n)
    # deduplicate rows so the unique-based ops see a clean voxel set
    _, keep = np.unique(
        coords[:n, 0] * 10000 + coords[:n, 1] * 100 + coords[:n, 2] * 10
        + coords[:n, 3],
        return_index=True,
    )
    n = len(keep)
    coords[:n] = coords[sorted(keep)]
    coords[n:] = 0
    feats = np.zeros((CAP, C), np.float32)
    feats[:n] = rng.normal(size=(n, C)).astype(np.float32)
    g = SparseGrid(
        coords=jnp.asarray(coords), feats=jnp.asarray(feats),
        num=jnp.int32(n), stride=1,
    )
    return g, coords[:n], feats[:n]


def test_global_pools(grid):
    g, coords, feats = grid
    avg = np.asarray(jax.jit(
        lambda x: global_avg_pool(x, B))(g))
    mx = np.asarray(jax.jit(
        lambda x: global_max_pool(x, B))(g))
    for b in range(B):
        rows = feats[coords[:, 3] == b]
        np.testing.assert_allclose(avg[b], rows.mean(0), rtol=1e-5)
        np.testing.assert_allclose(mx[b], rows.max(0), rtol=1e-5)
    # module wrappers are parameterless pass-throughs
    assert np.allclose(
        np.asarray(GlobalAvgPool(B).apply({}, g)), avg
    )
    assert np.allclose(
        np.asarray(GlobalMaxPool(B).apply({}, g)), mx
    )


def test_bev_reduction_mean(grid):
    g, coords, feats = grid
    bounds = jax.jit(
        lambda c, n: compute_bounds(c, jnp.arange(CAP) < n)
    )(g.coords, g.num)
    out = jax.jit(lambda x: bev_reduction(x, bounds, dim=2))(g)
    n_out = int(out.num)
    oc = np.asarray(out.coords)[:n_out]
    of = np.asarray(out.feats)[:n_out]
    assert (oc[:, 2] == 0).all()
    # oracle: group by (x, y, batch), mean
    seen = {}
    for r in range(len(coords)):
        k = (coords[r, 0], coords[r, 1], coords[r, 3])
        seen.setdefault(k, []).append(feats[r])
    assert n_out == len(seen)
    for i in range(n_out):
        k = (oc[i, 0], oc[i, 1], oc[i, 3])
        np.testing.assert_allclose(
            of[i], np.mean(seen[k], axis=0), rtol=1e-5, atol=1e-6
        )


def _dense_oracle(coords, vals, shape):
    out = np.zeros(shape, np.float32)
    for r in range(len(coords)):
        b, u, v = coords[r, 3], coords[r, 0], coords[r, 1]
        out[b, u, v] += vals[r]
    return out


def test_to_dense_bev_scatter(grid):
    g, coords, feats = grid
    dense = np.asarray(jax.jit(
        lambda x: to_dense_bev(x, x.feats, B, (H, W), dim=2))(g))
    assert dense.shape == (B, H, W, C)
    np.testing.assert_allclose(
        dense, _dense_oracle(coords, feats, (B, H, W, C)), rtol=1e-5
    )


def test_to_dense_bev_convolution_module(grid):
    g, coords, feats = grid
    mod = ToDenseBEVConvolution(
        in_channels=C, out_channels=5, shape=(H, W, D), dim=2,
        batch_size=B,
    )
    variables = mod.init(jax.random.PRNGKey(0), g)
    kernel = np.asarray(variables["params"]["kernel"])  # (D, C, 5)
    out = np.asarray(jax.jit(lambda v, x: mod.apply(v, x))(variables, g))
    assert out.shape == (B, H, W, 5)
    # oracle: per-voxel z-sliced FC then scatter-sum (ts bev.py:96-110)
    vals = np.einsum("vi,vio->vo", feats, kernel[coords[:, 2]])
    np.testing.assert_allclose(
        out, _dense_oracle(coords, vals, (B, H, W, 5)),
        rtol=1e-4, atol=1e-5,
    )


def test_bev_sparse_conv_sums_duplicates(grid):
    g, coords, feats = grid
    bounds = jax.jit(
        lambda c, n: compute_bounds(c, jnp.arange(CAP) < n)
    )(g.coords, g.num)
    kernel = np.random.default_rng(1).normal(size=(D, C, 6)).astype(
        np.float32
    )
    out = jax.jit(
        lambda x: bev_sparse_conv(x, jnp.asarray(kernel), bounds, dim=2)
    )(g)
    n_out = int(out.num)
    oc = np.asarray(out.coords)[:n_out]
    of = np.asarray(out.feats)[:n_out]
    # oracle: z-sliced FC, collapse z, SUM duplicates (ts bev.py:140-158)
    vals = np.einsum("vi,vio->vo", feats, kernel[coords[:, 2]])
    seen = {}
    for r in range(len(coords)):
        k = (coords[r, 0], coords[r, 1], coords[r, 3])
        seen[k] = seen.get(k, 0) + vals[r]
    assert n_out == len(seen)
    for i in range(n_out):
        np.testing.assert_allclose(
            of[i], seen[(oc[i, 0], oc[i, 1], oc[i, 3])],
            rtol=1e-4, atol=1e-5,
        )


def test_height_compression(grid):
    g, coords, feats = grid
    out = np.asarray(jax.jit(
        lambda x: bev_height_compression(x, B, (H, W, D), dim=2))(g))
    assert out.shape == (B, H, W, D * C)
    oracle = np.zeros((B, H, W, D, C), np.float32)
    for r in range(len(coords)):
        b, u, v, z = (
            coords[r, 3], coords[r, 0], coords[r, 1], coords[r, 2]
        )
        oracle[b, u, v, z] += feats[r]
    np.testing.assert_allclose(
        out, oracle.reshape(B, H, W, D * C), rtol=1e-5
    )
    mod = ToBEVHeightCompression(
        channels=C, shape=(H, W, D), dim=2, batch_size=B
    )
    assert np.allclose(np.asarray(mod.apply({}, g)), out)
