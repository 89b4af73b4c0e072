"""End-to-end harness tests: Trainer on synthetic data, checkpoint/resume,
raw-point eval, TTA voting, and submission file round-trips."""

import json

import numpy as np
import jax
import pytest

from taseg_tpu.data import build_dataloader
from taseg_tpu.engine import Trainer
from taseg_tpu.parallel import make_mesh
from taseg_tpu.utils.config import Config
from taseg_tpu.utils.submission import remap_label_files

pytestmark = pytest.mark.slow


def tiny_cfg(dataset="synthetic"):
    return Config.wrap(
        {
            "TAG": "tiny",
            "SEED": 0,
            "DATA": {
                "DATASET": dataset,
                "LENGTH": 16,
                "N_RAW_POINTS": 4000,
                "VOXEL_SIZE": 0.2,
                "NUM_POINTS": 4096,
            },
            "MODEL": {
                "NAME": "MinkUNet" if dataset == "synthetic" else "MinkUNetMs",
                "IN_FEATURE_DIM": 4 if dataset == "synthetic" else 5,
                "NUM_CLASS": 20,
                "IGNORE_LABEL": 0,
                "BLOCK": "ResBlock",
                "NUM_LAYER": [1, 1, 1, 1, 1, 1, 1, 1],
                "cr": 0.125,
                "DROPOUT_P": 0.0,
                "IF_DIST": True,
            },
            "OPTIM": {
                "BATCH_SIZE_PER_GPU": 1,
                "NUM_EPOCHS": 1,
                "OPTIMIZER": "sgd",
                "LR_PER_SAMPLE": 0.01,
                "WEIGHT_DECAY": 0.0001,
                "MOMENTUM": 0.9,
                "SCHEDULER": "linear_warmup_with_cosdecay",
                "WARMUP_EPOCH": 1,
            },
        }
    )


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    out = tmp_path_factory.mktemp("out")
    cfg = tiny_cfg()
    mesh = make_mesh()
    n = len(jax.devices())
    train_loader = build_dataloader(
        cfg.DATA, training=True, n_shards=n, scans_per_shard=1,
        point_capacity=4096,
    )
    val_loader = build_dataloader(
        cfg.DATA, training=False, n_shards=n, scans_per_shard=1,
        point_capacity=4096,
    )
    tr = Trainer(
        cfg, train_loader, val_loader, output_dir=out, mesh=mesh,
        total_epochs=1,
    )
    tr.train(eval_interval=0)
    return tr, out


def test_train_and_checkpoint_resume(trained):
    tr, out = trained
    step_before = int(tr.state.step)
    assert step_before > 0
    assert tr.resume_latest()  # resumes from its own checkpoint
    assert int(tr.state.step) == step_before


def test_point_eval_and_tta_submission(trained, tmp_path):
    tr, out = trained
    res = tr.evaluate_points()
    assert 0.0 <= res["miou"] <= 100.0
    assert res["hist"].sum() > 0

    save = tmp_path / "preds"
    res_tta = tr.evaluate_points(tta_votes=2, save_path=save)
    assert 0.0 <= res_tta["miou"] <= 100.0
    files = sorted(save.glob("sequences/*/predictions/*.label"))
    assert len(files) == 16  # every val scan written once
    raw = np.fromfile(files[0], dtype=np.uint32)
    assert raw.size == 4000
    # predictions are raw ids (benchmark format)
    assert set(np.unique(raw)).issubset(
        {0, 10, 11, 15, 18, 20, 30, 31, 32, 40, 44, 48, 49, 50, 51, 70, 71,
         72, 80, 81}
    )
    # remap round trip: raw -> train ids for pseudo-mask use
    n_files = remap_label_files(save, direction="raw_to_train")
    assert n_files == 16
    train_ids = np.fromfile(files[0], dtype=np.uint32)
    assert train_ids.max() < 20


def test_pretrained_partial_load(trained, tmp_path):
    tr, out = trained
    ckpts = sorted((out / "ckpt").glob("checkpoint_epoch_*"))
    assert ckpts
    tr.load_pretrained(str(ckpts[-1]))  # full match loads everything


def test_capacity_overflow_telemetry(tmp_path):
    """Round-1 review item 10: an undersized voxel capacity must surface a
    loud warning, not silently truncate the topology."""
    import logging

    import numpy as np

    from taseg_tpu.data import build_dataloader
    from taseg_tpu.engine import Trainer
    from taseg_tpu.utils.config import Config

    cfg = Config.wrap({
        "MODALITY": "voxel",
        "DATA": {"DATASET": "synthetic", "LENGTH": 8, "N_RAW_POINTS": 1000,
                 "VOXEL_SIZE": 0.01, "NUM_POINTS": 1024},
        "MODEL": {"NAME": "MinkUNet", "IN_FEATURE_DIM": 4, "NUM_CLASS": 20,
                  "IGNORE_LABEL": 0, "BLOCK": "ResBlock",
                  "NUM_LAYER": [1] * 8, "cr": 0.125, "DROPOUT_P": 0.0,
                  "IF_DIST": True},
        "OPTIM": {"BATCH_SIZE_PER_GPU": 1, "NUM_EPOCHS": 1,
                  "OPTIMIZER": "sgd", "LR_PER_SAMPLE": 0.01,
                  "WEIGHT_DECAY": 1e-4, "MOMENTUM": 0.9,
                  "SCHEDULER": "linear_warmup_with_cosdecay",
                  "WARMUP_EPOCH": 1},
    })
    import jax
    n = len(jax.devices())
    loader = build_dataloader(cfg.DATA, training=True, n_shards=n,
                              scans_per_shard=1)
    # ~1000 unique voxels at 0.01 m exceed the L0 level capacity
    # (0.85 x 1024) while fitting the 1024 point capacity
    logger = logging.getLogger("cap_test")
    records = []
    handler = logging.Handler()
    handler.emit = lambda r: records.append(r.getMessage())
    logger.addHandler(handler)
    tr = Trainer(cfg, loader, None, output_dir=tmp_path, logger=logger)
    tr.train_one_epoch(0, jax.random.PRNGKey(0))
    assert tr._capacity_overflows > 0
    assert any("CAPACITY OVERFLOW" in m for m in records)


def test_load_matching_params_wrapper_scope():
    """Staged recipes: an FSA backbone checkpoint must load into the TIAF
    model's `main/...` subtree by suffix matching (the reference remaps
    checkpoint keys for the same purpose)."""
    import jax.numpy as jnp

    from taseg_tpu.engine import load_matching_params

    src = {
        "stem_0": {"kernel": jnp.ones((3, 4))},
        "classifier": {"kernel": jnp.full((4, 2), 2.0)},
    }
    dst = {
        "main": {
            "stem_0": {"kernel": jnp.zeros((3, 4))},
            "classifier": {"kernel": jnp.zeros((4, 2))},
        },
        "image_backbone": {"conv": {"kernel": jnp.zeros((5, 5))}},
    }
    out = load_matching_params(dst, src)
    assert float(out["main"]["stem_0"]["kernel"][0, 0]) == 1.0
    assert float(out["main"]["classifier"]["kernel"][0, 0]) == 2.0
    # unmatched leaves keep their values
    assert float(out["image_backbone"]["conv"]["kernel"][0, 0]) == 0.0
    # exact-path matches still win
    out2 = load_matching_params(src, src)
    assert float(out2["stem_0"]["kernel"][0, 0]) == 1.0
