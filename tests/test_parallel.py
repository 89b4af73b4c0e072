"""SPMD data-parallel train/eval step tests on the 8-device CPU mesh.

Verifies what the reference never could without GPUs (SURVEY.md §4):
gradient pmean correctness (DP loss decreases), replicated-parameter
invariants, and the psum-ed confusion-histogram eval.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from taseg_tpu.loss import Losses
from taseg_tpu.models import MinkUNet, UNetCapacities, build_unet_topology
from taseg_tpu.optim import build_optimizer
from taseg_tpu.ops import PointSet
from taseg_tpu.parallel import (
    Batch,
    TrainState,
    make_eval_step,
    make_mesh,
    make_train_step,
)
from taseg_tpu.utils.metrics import miou_from_hist

pytestmark = pytest.mark.slow

NUM_CLASSES = 8
CAP = 512


def make_batch(rng, n_shards):
    coords = np.zeros((n_shards, CAP, 4), np.float32)
    feats = np.zeros((n_shards, CAP, 4), np.float32)
    labels = np.zeros((n_shards, CAP), np.int32)
    nums = np.zeros((n_shards, 1), np.int32)
    for r in range(n_shards):
        pts = np.unique(
            np.concatenate(
                [
                    np.floor(rng.uniform(0, 16, size=(400, 3))),
                    rng.integers(0, 2, size=(400, 1)),
                ],
                axis=1,
            ).astype(np.float32),
            axis=0,
        )
        n = len(pts)
        coords[r, :n] = pts
        feats[r, :n] = rng.normal(size=(n, 4))
        # learnable labels: deterministic function of position
        labels[r, :n] = 1 + (pts[:, 0].astype(np.int32) % (NUM_CLASSES - 1))
        nums[r, 0] = n
    return Batch(
        point_coords=jnp.asarray(coords),
        point_feats=jnp.asarray(feats),
        labels=jnp.asarray(labels),
        num_points=jnp.asarray(nums),
    )


@pytest.fixture(scope="module")
def dp_setup():
    mesh = make_mesh()
    n = len(jax.devices())
    assert n == 8
    rng = np.random.default_rng(0)
    batch = make_batch(rng, n)

    caps = UNetCapacities.for_points(CAP)
    model = MinkUNet(
        num_classes=NUM_CLASSES, cr=0.125, num_layer=(1, 1, 1, 1, 1, 1, 1, 1),
        axis_name="data", dropout_p=0.0,
    )
    points = PointSet(
        coords=batch.point_coords[0],
        feats=batch.point_feats[0],
        num=batch.num_points[0, 0],
    )
    topo = build_unet_topology(points.coords, points.num, caps)
    variables = model.init({"params": jax.random.PRNGKey(0)}, points, topo, False)

    optim_cfg = {
        "OPTIMIZER": "sgd",
        "LR": 0.05,
        "WEIGHT_DECAY": 0.0001,
        "MOMENTUM": 0.9,
        "SCHEDULER": "linear_warmup_with_cosdecay",
        "WARMUP_EPOCH": 1,
    }
    tx = build_optimizer(optim_cfg, iters_per_epoch=10, total_epochs=4)
    state = TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        step=jnp.int32(0),
    )
    criterion = Losses(["CELoss", "LovLoss"], [1.0, 1.0], ignore_index=0)
    train_step = make_train_step(model, criterion, tx, caps, mesh, donate=False)
    eval_step = make_eval_step(model, caps, mesh, NUM_CLASSES)
    return mesh, batch, model, state, train_step, eval_step


def test_dp_train_loss_decreases(dp_setup):
    mesh, batch, model, state, train_step, eval_step = dp_setup
    rng = jax.random.PRNGKey(42)
    losses = []
    for i in range(8):
        state, metrics = train_step(state, batch, jax.random.fold_in(rng, i))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    # params stay replicated: step advanced once per call
    assert int(state.step) == 8

    hist, logits, level_nums = eval_step(state.params, state.batch_stats, batch)
    assert np.asarray(level_nums).shape[-1] == 5  # overflow telemetry
    hist = np.asarray(hist)
    assert hist.sum() > 0
    miou = miou_from_hist(hist, ignore_index=0)
    assert 0.0 <= miou <= 100.0
    # 8 SGD steps on a tiny net: just require a sane, nonzero accuracy
    # (loss decrease above is the real learning signal)
    acc = np.diag(hist).sum() / hist.sum()
    assert acc > 0.03, acc
