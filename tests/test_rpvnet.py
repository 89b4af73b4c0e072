
"""RPVNet + point<->range op tests."""
import pytest
import numpy as np
import jax
import jax.numpy as jnp

from taseg_tpu.ops import (
    PointSet, point_to_range, point_to_range_tables, range_sample_table,
    range_to_point,
)
from taseg_tpu.models.fusion.rpvnet import RPVNet, build_rpv_context
from taseg_tpu.models.voxel.backbone_context import (
    UNetCapacities, build_unet_topology,
)

pytestmark = pytest.mark.slow


def test_point_to_range_mean_and_sample_roundtrip():
    rng = np.random.default_rng(0)
    h, w, c, p = 8, 16, 3, 200
    px = rng.integers(0, w, p)
    py = rng.integers(0, h, p)
    feats = rng.normal(size=(p, c)).astype(np.float32)
    valid = np.ones(p, bool)
    ids, tables = point_to_range_tables(
        jnp.asarray(px), jnp.asarray(py), jnp.asarray(valid), h, w
    )
    img = np.asarray(point_to_range(jnp.asarray(feats), ids, tables, h, w))
    # oracle: mean per pixel
    for y, x in [(0, 0), (3, 7), (7, 15)]:
        rows = feats[(px == x) & (py == y)]
        if len(rows):
            np.testing.assert_allclose(img[y, x], rows.mean(0), atol=1e-4)
        else:
            np.testing.assert_allclose(img[y, x], 0.0, atol=1e-5)

    # bilinear sampling at exact pixel centers returns the pixel value
    table = range_sample_table(
        jnp.asarray(px.astype(np.float32)), jnp.asarray(py.astype(np.float32)),
        jnp.asarray(valid), h, w,
    )
    sampled = np.asarray(range_to_point(jnp.asarray(img), table))
    np.testing.assert_allclose(sampled, img[py, px], atol=1e-5)

    # gradient flows through sampling without error
    def loss(im):
        return jnp.sum(range_to_point(im, table) ** 2)
    g = jax.grad(loss)(jnp.asarray(img))
    assert np.isfinite(np.asarray(g)).all()


def test_rpvnet_forward():
    rng = np.random.default_rng(1)
    cap, h, w = 2048, 16, 64
    rows = np.unique(
        np.concatenate(
            [np.floor(rng.uniform(0, 24, (1600, 3))),
             np.zeros((1600, 1))], axis=1
        ).astype(np.float32), axis=0,
    )
    n = len(rows)
    pts = np.zeros((cap, 4), np.float32)
    pts[:n] = rows
    feats = np.zeros((cap, 4), np.float32)
    feats[:n] = rng.normal(size=(n, 4))
    pxf = np.zeros(cap, np.float32)
    pyf = np.zeros(cap, np.float32)
    pxf[:n] = rng.uniform(0, w - 1, n)
    pyf[:n] = rng.uniform(0, h - 1, n)
    range_img = rng.normal(size=(h, w, 6)).astype(np.float32)

    points = PointSet(coords=jnp.asarray(pts), feats=jnp.asarray(feats),
                      num=jnp.int32(n))
    caps = UNetCapacities.for_points(cap)
    topo = build_unet_topology(
        points.coords, points.num, caps, point_voxel_strides=(1, 4, 16)
    )
    rpv = build_rpv_context(
        jnp.asarray(pxf), jnp.asarray(pyf), points.valid_mask(), h, w
    )
    model = RPVNet(num_classes=20, cr=0.125, num_layer=(1,) * 8, dropout_p=0.0)
    v = model.init(
        {"params": jax.random.PRNGKey(0)}, points, topo, rpv,
        jnp.asarray(range_img), False,
    )
    logits = model.apply(v, points, topo, rpv, jnp.asarray(range_img), False)
    assert logits.shape == (cap, 20)
    assert np.isfinite(np.asarray(logits[:n])).all()
