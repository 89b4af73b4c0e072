"""Range-modality SPMD training through the loader + step functions."""
import pytest
import numpy as np
import jax
import jax.numpy as jnp

from taseg_tpu.data import build_dataloader
from taseg_tpu.loss.range import semkitti_class_weights
from taseg_tpu.models.range2d import SalsaNext
from taseg_tpu.optim import build_optimizer
from taseg_tpu.parallel import TrainState, make_mesh
from taseg_tpu.parallel.range_step import (
    RangeBatch, make_range_eval_step, make_range_train_step,
)
from taseg_tpu.utils.config import Config

pytestmark = pytest.mark.slow


def test_range_train_and_eval_steps():
    mesh = make_mesh()
    n = len(jax.devices())
    cfg = Config.wrap({
        "DATASET": "synthetic", "LENGTH": n, "N_RAW_POINTS": 3000,
        "H": 16, "W": 128,
    })
    loader = build_dataloader(
        cfg, training=True, n_shards=n, scans_per_shard=1, modality="range"
    )
    arrays, meta = next(iter(loader))
    assert arrays["scan"].shape == (n, 1, 16, 128, 6)
    batch = RangeBatch(
        scan=jnp.asarray(arrays["scan"].reshape(n, 1, 16, 128, 6)),
        label=jnp.asarray(arrays["label"]),
        mask=jnp.asarray(arrays["mask"]),
    )
    model = SalsaNext(num_classes=20, base=8)
    v = model.init({"params": jax.random.PRNGKey(0)}, batch.scan[0], False)
    tx = build_optimizer(
        {"OPTIMIZER": "sgd", "LR": 0.05, "WEIGHT_DECAY": 1e-4,
         "MOMENTUM": 0.9, "SCHEDULER": "linear_warmup_with_cosdecay",
         "WARMUP_EPOCH": 1}, 10, 2,
    )
    state = TrainState(
        params=v["params"], batch_stats=v["batch_stats"],
        opt_state=tx.init(v["params"]), step=jnp.int32(0),
    )
    step = make_range_train_step(
        model, tx, mesh, jnp.asarray(semkitti_class_weights()), donate=False
    )
    losses = []
    for i in range(4):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]

    ev = make_range_eval_step(model, mesh, 20)
    hist, logits = ev(state.params, state.batch_stats, batch)
    assert np.asarray(hist).sum() > 0
    assert logits.shape[0] == n


def test_range_point_eval_through_trainer(tmp_path):
    """Range raw-point evaluation: pixel logits -> points via proj_x/y +
    KNN cleanup, through the Trainer (round-1: range configs could not
    drive point eval at all)."""
    from taseg_tpu.data import build_dataloader
    from taseg_tpu.engine import Trainer
    from taseg_tpu.utils.config import Config

    cfg = Config.wrap({
        "MODALITY": "range",
        "DATA": {"DATASET": "synthetic", "LENGTH": 8, "N_RAW_POINTS": 2000,
                 "H": 16, "W": 128},
        "MODEL": {"NAME": "SalsaNext", "IN_FEATURE_DIM": 6,
                  "NUM_CLASS": 20, "IGNORE_LABEL": 0, "IF_DIST": True},
        "OPTIM": {"BATCH_SIZE_PER_GPU": 1, "NUM_EPOCHS": 1,
                  "OPTIMIZER": "sgd", "LR_PER_SAMPLE": 0.01,
                  "WEIGHT_DECAY": 1e-4, "MOMENTUM": 0.9,
                  "SCHEDULER": "linear_warmup_with_cosdecay",
                  "WARMUP_EPOCH": 1},
    })
    n = len(jax.devices())
    tr_loader = build_dataloader(cfg.DATA, training=True, n_shards=n,
                                 scans_per_shard=1, modality="range")
    ev_loader = build_dataloader(cfg.DATA, training=False, n_shards=n,
                                 scans_per_shard=1, modality="range")
    tr = Trainer(cfg, tr_loader, ev_loader, output_dir=tmp_path)
    res = tr.evaluate_points(save_path=str(tmp_path / "preds"))
    assert 0.0 <= res["miou"] <= 100.0
    assert list((tmp_path / "preds").rglob("*.label"))
