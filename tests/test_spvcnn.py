"""SPVCNN forward/grad smoke test."""
import pytest
import numpy as np
import jax
import jax.numpy as jnp

from taseg_tpu.models.fusion import SPVCNN
from taseg_tpu.models.voxel.backbone_context import (
    UNetCapacities, build_unet_topology,
)
from taseg_tpu.ops import PointSet

pytestmark = pytest.mark.slow


def test_spvcnn_forward_and_grad():
    rng = np.random.default_rng(21)
    cap = 2048
    pts = np.zeros((cap, 4), np.float32)
    rows = np.unique(
        np.concatenate(
            [np.floor(rng.uniform(0, 24, (1800, 3))),
             rng.integers(0, 2, (1800, 1))], axis=1
        ).astype(np.float32), axis=0,
    )
    n = len(rows)
    pts[:n] = rows
    feats = np.zeros((cap, 4), np.float32)
    feats[:n] = rng.normal(size=(n, 4))
    points = PointSet(coords=jnp.asarray(pts), feats=jnp.asarray(feats),
                      num=jnp.int32(n))
    caps = UNetCapacities.for_points(cap)
    topo = build_unet_topology(
        points.coords, points.num, caps, point_voxel_strides=(1, 4, 16)
    )
    model = SPVCNN(num_classes=20, cr=0.125, num_layer=(1,) * 8, dropout_p=0.0)
    v = model.init({"params": jax.random.PRNGKey(0)}, points, topo, False)
    logits = model.apply(v, points, topo, False)
    assert logits.shape == (cap, 20)
    assert np.isfinite(np.asarray(logits[:n])).all()

    labels = jnp.asarray(rng.integers(1, 20, cap))
    mask = jnp.arange(cap) < n

    def loss_fn(params):
        lg, _ = model.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            points, topo, True, mutable=["batch_stats"],
        )
        lp = jax.nn.log_softmax(lg, -1)
        nll = -jnp.take_along_axis(lp, labels[:, None], 1)[:, 0]
        return jnp.sum(jnp.where(mask, nll, 0)) / jnp.sum(mask)

    g = jax.grad(loss_fn)(v["params"])
    assert all(
        np.isfinite(np.asarray(l)).all() for l in jax.tree_util.tree_leaves(g)
    )
