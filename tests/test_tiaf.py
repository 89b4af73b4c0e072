"""TIAF tests: frustum projection, image-window selection, dilation, and
the multi-modal model forward with all five loss terms."""

import pytest
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

pytestmark = pytest.mark.slow


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


def test_tiaf_train_step_loss_terms_nonzero():
    """The TIAF SPMD step through the loader: all five reference loss
    terms (minkunet_ms_mm.py:517-535) are finite and the supervised ones
    nonzero; frozen main branch gets zero updates when masked."""
    from taseg_tpu.data import build_dataloader
    from taseg_tpu.engine import Trainer
    from taseg_tpu.optim import build_optimizer
    from taseg_tpu.parallel import TrainState, make_mesh
    from taseg_tpu.parallel.tiaf import make_tiaf_train_step
    from taseg_tpu.utils.config import Config

    cfg = Config.wrap({
        "DATASET": "synthetic_ms_mm", "LENGTH": 8, "N_RAW_POINTS": 1200,
        "VOXEL_SIZE": 0.25, "NUM_POINTS": 4096, "FOV_NUM_POINTS": 2048,
        "IN_FEATURE_DIM": 5, "N_IMAGES": 2, "IMG_H": 16, "IMG_W": 32,
    })
    n = len(jax.devices())
    loader = build_dataloader(cfg, training=True, n_shards=n,
                              scans_per_shard=1)
    from taseg_tpu.models.voxel.minkunet_mm import MinkUNetMsMm
    from taseg_tpu.models.voxel.backbone_context import UNetCapacities
    from taseg_tpu.parallel.tiaf import _unpack
    from taseg_tpu.loss import Losses

    mesh = make_mesh()
    caps = UNetCapacities.for_points(loader.point_capacity)
    fov_caps = UNetCapacities.for_points(loader.fov_capacity)
    model = MinkUNetMsMm(num_classes=20, in_dim=5, cr=0.125, fov_cr=0.125,
                         image_base=8, axis_name="data")
    arrays, _ = next(iter(loader))
    from taseg_tpu.engine import batch_from_arrays
    from taseg_tpu.parallel.tiaf import TiafBatch

    tb = TiafBatch(
        main=batch_from_arrays(arrays["main"]),
        fov=batch_from_arrays(arrays["fov"]),
        fov_rowcol=jnp.asarray(arrays["fov_rowcol"]),
        images=jnp.asarray(arrays["images"]),
        image_labels=jnp.asarray(arrays["image_labels"]),
    )
    tb1 = jax.tree_util.tree_map(lambda x: x[:1], tb)
    main, topo, fov, fov_topo, fov_devox = _unpack(tb1, caps, fov_caps)
    v = model.init({"params": jax.random.PRNGKey(0)}, main, topo, fov,
                   fov_topo, fov_devox, tb.images[0], tb.fov_rowcol[0],
                   False)
    tx = build_optimizer(
        {"OPTIMIZER": "sgd", "LR": 0.02, "WEIGHT_DECAY": 1e-4,
         "MOMENTUM": 0.9, "SCHEDULER": "linear_warmup_with_cosdecay",
         "WARMUP_EPOCH": 1}, 4, 1,
    )
    crit = Losses(["CELoss", "LovLoss"], [1.0, 1.0], ignore_index=0)
    state = TrainState(params=v["params"], batch_stats=v["batch_stats"],
                       opt_state=tx.init(v["params"]), step=jnp.int32(0))
    step = make_tiaf_train_step(model, crit, tx, caps, fov_caps, mesh,
                                donate=False)
    state, metrics = step(state, tb, jax.random.PRNGKey(1))
    for key in ("loss", "loss_fusion", "loss_image_s", "loss_image_d",
                "loss_image_lidar", "loss_lidar"):
        assert np.isfinite(float(metrics[key])), key
    for key in ("loss_fusion", "loss_image_s", "loss_image_d",
                "loss_image_lidar"):
        assert float(metrics[key]) > 0, key
