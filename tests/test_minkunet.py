"""MinkUNet forward smoke + invariance tests on synthetic point clouds."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from taseg_tpu.models import MinkUNet, UNetCapacities, build_unet_topology
from taseg_tpu.ops import PointSet

pytestmark = pytest.mark.slow


def synthetic_points(rng, n_valid, capacity, batches=2, span=40.0):
    pts = np.zeros((capacity, 4), np.float32)
    xyz = rng.uniform(0, span, size=(n_valid, 3)).astype(np.float32)
    xyz = np.floor(xyz)  # voxel-deduped int coords, as the host pipeline emits
    b = rng.integers(0, batches, size=(n_valid, 1)).astype(np.float32)
    rows = np.concatenate([xyz, b], axis=1)
    rows = np.unique(rows, axis=0)  # dedup like sparse_quantize
    n_valid = len(rows)
    pts[:n_valid] = rows
    feats = np.zeros((capacity, 4), np.float32)
    feats[:n_valid] = rng.normal(size=(n_valid, 4)).astype(np.float32)
    return pts, feats, n_valid


@pytest.fixture(scope="module")
def small_setup():
    rng = np.random.default_rng(11)
    cap = 2048
    pts, feats, n = synthetic_points(rng, 1500, cap)
    caps = UNetCapacities.for_points(cap)
    points = PointSet(
        coords=jnp.asarray(pts), feats=jnp.asarray(feats), num=jnp.int32(n)
    )
    topo = build_unet_topology(points.coords, points.num, caps)
    model = MinkUNet(num_classes=20, cr=0.25)
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, points, topo, False
    )
    return points, topo, model, params, n


def test_forward_shapes_and_finite(small_setup):
    points, topo, model, params, n = small_setup
    logits = model.apply(params, points, topo, False)
    assert logits.shape == (points.capacity, 20)
    assert np.isfinite(np.asarray(logits[:n])).all()


def test_train_mode_runs_with_dropout(small_setup):
    points, topo, model, params, n = small_setup
    logits = model.apply(
        params,
        points,
        topo,
        True,
        rngs={"dropout": jax.random.PRNGKey(1)},
        mutable=["batch_stats"],
    )[0]
    assert np.isfinite(np.asarray(logits[:n])).all()


def test_padding_invariance(small_setup):
    """Growing the padding (same valid points, larger capacity) must not
    change valid-point logits — the core static-shape correctness property."""
    points, topo, model, params, n = small_setup
    bigger = PointSet(
        coords=jnp.concatenate(
            [points.coords, jnp.zeros((512, 4), jnp.float32)]
        ),
        feats=jnp.concatenate([points.feats, jnp.zeros((512, 4), jnp.float32)]),
        num=points.num,
    )
    caps2 = UNetCapacities.for_points(bigger.capacity)
    topo2 = build_unet_topology(bigger.coords, bigger.num, caps2)
    out1 = np.asarray(model.apply(params, points, topo, False))[:n]
    out2 = np.asarray(model.apply(params, bigger, topo2, False))[:n]
    # capacities differ -> different reduction orders; only f32 noise allowed
    np.testing.assert_allclose(out1, out2, rtol=1e-3, atol=1e-3)


def test_gradients_finite(small_setup):
    points, topo, model, params, n = small_setup
    labels = jnp.asarray(
        np.random.default_rng(2).integers(0, 20, size=points.capacity)
    )
    mask = jnp.arange(points.capacity) < n

    def loss_fn(p):
        logits, _ = model.apply(
            p, points, topo, True,
            rngs={"dropout": jax.random.PRNGKey(3)},
            mutable=["batch_stats"],
        )
        lp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(lp, labels[:, None], axis=1)[:, 0]
        return jnp.sum(jnp.where(mask, nll, 0.0)) / jnp.sum(mask)

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # at least some gradient signal everywhere
    total = sum(float(jnp.sum(jnp.abs(l))) for l in leaves)
    assert total > 0
