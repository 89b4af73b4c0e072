"""Range-modality SPMD training through the loader + step functions."""
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
