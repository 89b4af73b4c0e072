"""Cylinder3D tests: polar pipeline + asymmetric-kernel model forward."""
import pytest
import numpy as np
import jax
import jax.numpy as jnp

from taseg_tpu.data.cylinder_dataset import CylinderPipeline, cart2polar
from taseg_tpu.models.voxel.cylinder3d import (
    CylinderTS, build_cylinder_topology,
)
from taseg_tpu.models.voxel.backbone_context import UNetCapacities
from taseg_tpu.ops import PointSet

pytestmark = pytest.mark.slow


def test_cylinder_pipeline_polar_grid():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-40, 40, (3000, 4)).astype(np.float32)
    labels = rng.integers(0, 20, 3000).astype(np.int32)
    pipe = CylinderPipeline(training=False)
    s = pipe({"xyzret": pts, "labels": labels})
    assert s.coords.min() >= 0
    assert (s.coords < np.array([480, 360, 32])).all()
    assert s.feats.shape[1] == 9
    # polar conversion sanity
    polar = cart2polar(pts[:, :3])
    np.testing.assert_allclose(
        polar[:, 0], np.hypot(pts[:, 0], pts[:, 1]), rtol=1e-5
    )
    # inverse map covers all raw points
    assert len(s.inverse_map) == 3000
    assert s.inverse_map.max() == len(s.coords) - 1


def test_cylinder_model_forward():
    rng = np.random.default_rng(1)
    cap = 2048
    pts_raw = rng.uniform(-30, 30, (1500, 4)).astype(np.float32)
    labels = rng.integers(0, 20, 1500).astype(np.int32)
    pipe = CylinderPipeline(grid=(64, 64, 16), training=False)
    s = pipe({"xyzret": pts_raw, "labels": labels})
    n = len(s.coords)
    coords = np.zeros((cap, 4), np.float32)
    coords[:n, :3] = s.coords
    feats = np.zeros((cap, 9), np.float32)
    feats[:n] = s.feats
    points = PointSet(
        coords=jnp.asarray(coords), feats=jnp.asarray(feats), num=jnp.int32(n)
    )
    caps = UNetCapacities.for_points(cap)
    topo = build_cylinder_topology(points.coords, points.num, caps)
    model = CylinderTS(num_classes=20, init_size=4)
    v = model.init({"params": jax.random.PRNGKey(0)}, points, topo, False)
    logits = model.apply(v, points, topo, False)
    assert logits.shape == (cap, 20)
    assert np.isfinite(np.asarray(logits[:n])).all()
