"""TIAF tests: frustum projection, image-window selection, dilation, and
the multi-modal model forward with all five loss terms."""

import numpy as np
import jax
import jax.numpy as jnp

from taseg_tpu.data.semantickitti.tiaf import (
    dilate_semantic_map,
    image_window,
    project_to_image,
    projection_matrix,
)
from taseg_tpu.loss import Losses
from taseg_tpu.models.voxel.backbone_context import (
    UNetCapacities,
    build_unet_topology,
)
from taseg_tpu.models.voxel.minkunet_mm import MinkUNetMsMm
from taseg_tpu.ops import PointSet, trilinear_table


def test_frustum_projection():
    proj = projection_matrix(
        {
            "P2": np.array(
                [[500.0, 0, 320, 0], [0, 500.0, 120, 0], [0, 0, 1, 0]]
            ),
            "Tr": np.array(
                # velodyne x-forward -> camera z-forward
                [[0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0], [0, 0, 0, 1.0]]
            ),
        }
    )
    pts = np.array(
        [
            [10.0, 0.0, 0.0, 0.5],  # straight ahead -> image center
            [-5.0, 0.0, 0.0, 0.1],  # behind -> dropped
            [10.0, 50.0, 0.0, 0.2],  # far left -> out of frustum
        ],
        np.float32,
    )
    keep, rowcol = project_to_image(pts, proj, img_w=640, img_h=240)
    assert keep.tolist() == [True, False, False]
    assert rowcol.shape == (1, 2)
    assert abs(rowcol[0, 1] - 320) <= 1 and abs(rowcol[0, 0] - 120) <= 1


def test_image_window_speed_adaptive():
    slow = [np.eye(4) for _ in range(100)]
    fast = []
    for t in range(100):
        p = np.eye(4)
        p[:3, 3] = [2.0 * t, 0, 0]
        fast.append(p)
    w_slow = image_window(60, multiscan_image=48, step_image=12, poses=slow)
    w_fast = image_window(60, multiscan_image=48, step_image=12, poses=fast)
    assert w_slow == [60, 48, 36, 24, 12]
    assert len(w_fast) > len(w_slow)  # halved step -> more frames


def test_dilate_semantic_map():
    img = np.zeros((8, 8), np.int32)
    img[4, 4] = 7
    out = dilate_semantic_map(img, iterations=2)
    assert out[4, 4] == 7
    assert out[4, 5] == 7 and out[2, 4] == 7 or out[4, 6] == 7
    assert (out != 0).sum() > 5


def test_minkunet_mm_forward_and_losses():
    rng = np.random.default_rng(0)
    cap, fov_cap = 2048, 1024
    h, w, n_img = 32, 64, 2

    def make_points(capacity, n, ch):
        pts = np.zeros((capacity, 4), np.float32)
        rows = np.unique(
            np.concatenate(
                [np.floor(rng.uniform(0, 20, (n, 3))),
                 np.zeros((n, 1))], axis=1,
            ).astype(np.float32), axis=0,
        )
        m = len(rows)
        pts[:m] = rows
        feats = np.zeros((capacity, ch), np.float32)
        feats[:m] = rng.normal(size=(m, ch))
        return jnp.asarray(pts), jnp.asarray(feats), m

    p_coords, p_feats, n_main = make_points(cap, 1600, 5)
    points = PointSet(coords=p_coords, feats=p_feats, num=jnp.int32(n_main))
    caps = UNetCapacities.for_points(cap)
    topo = build_unet_topology(p_coords, jnp.int32(n_main), caps)

    f_coords, f_feats, n_fov = make_points(fov_cap, 700, 5)
    fov_points = PointSet(coords=f_coords, feats=f_feats, num=jnp.int32(n_fov))
    fov_caps = UNetCapacities.for_points(fov_cap)
    fov_topo = build_unet_topology(f_coords, jnp.int32(n_fov), fov_caps)

    # FOV voxels -> MAIN points interpolation tables (voxel_to_point_fov)
    fov_devox = {}
    for s in (1, 4, 16):
        lvl = s.bit_length() - 1
        fov_devox[s] = trilinear_table(
            p_coords, points.valid_mask(),
            fov_topo.levels[lvl].coords, fov_topo.levels[lvl].num, s,
            fov_topo.bounds,
        )

    images = jnp.asarray(
        rng.normal(size=(n_img, h, w, 3)).astype(np.float32)
    )
    rowcol = jnp.asarray(
        np.stack(
            [rng.integers(0, h * n_img, fov_cap),
             rng.integers(0, w, fov_cap)], axis=1,
        ).astype(np.int32)
    )

    model = MinkUNetMsMm(
        num_classes=20, in_dim=5, cr=0.125, fov_cr=0.125, image_base=8,
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        points, topo, fov_points, fov_topo, fov_devox, images, rowcol, False,
    )
    out = model.apply(
        variables, points, topo, fov_points, fov_topo, fov_devox,
        images, rowcol, False,
    )
    assert out["logits"].shape == (cap, 20)
    assert out["image_logits"].shape == (n_img, h, w, 20)
    assert out["fusion_logits"].shape == (cap, 20)
    assert np.isfinite(np.asarray(out["logits"][:n_main])).all()

    # 5-term TIAF loss (reference minkunet_ms_mm.py:517-535)
    crit = Losses(["CELoss"], [1.0], ignore_index=0)
    labels = jnp.asarray(rng.integers(0, 20, cap))
    fov_labels = jnp.asarray(rng.integers(0, 20, fov_cap))
    img_labels = jnp.asarray(rng.integers(0, 20, (n_img, h, w)))
    pvalid = points.valid_mask()
    fvalid = fov_points.valid_mask()
    weights = [1.0, 1.0, 0.5, 0.5, 1.0]
    loss = (
        weights[1] * crit(out["logits"], labels, pvalid)
        + weights[4] * crit(
            out["fusion_logits"], labels, pvalid & out["overlap"]
        )
        + weights[2] * crit(out["image_point_logits"], fov_labels, fvalid)
        + weights[3] * crit(
            out["image_logits"].reshape(-1, 20),
            img_labels.reshape(-1),
            jnp.ones(n_img * h * w, bool),
        )
        + weights[0] * crit(out["fov_point_logits"], fov_labels, fvalid)
    )
    assert np.isfinite(float(loss))
