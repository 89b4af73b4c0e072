"""Mask-distillation (KD) stage tests: host voxel alignment, pair collate,
and the teacher/student SPMD train step."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from taseg_tpu.data.synthetic import SyntheticMsKittiReader
from taseg_tpu.data.voxel_dataset import (
    MsKdVoxelPipeline,
    collate_kd_batch,
)
from taseg_tpu.loss import Losses
from taseg_tpu.models import MinkUNet, UNetCapacities
from taseg_tpu.optim import build_optimizer
from taseg_tpu.parallel import Batch, TrainState, make_mesh
from taseg_tpu.parallel.kd import KdBatch, make_kd_train_step

pytestmark = pytest.mark.slow


def kd_sample(reader, i):
    s = reader[i]
    # synthesize the GT-mask cloud as a differently-thinned fused cloud
    rng = np.random.default_rng(1000 + i)
    keep = rng.random(len(s["xyzret_ms"])) < 0.8
    keep[: len(s["xyzret"])] = True  # current frame always kept
    s["xyzret_ms_gt"] = s["xyzret_ms"][keep]
    s["labels_ms_gt"] = s["labels_ms"][keep]
    return s


def test_kd_alignment_and_train_step():
    mesh = make_mesh()
    n_shards = len(jax.devices())
    reader = SyntheticMsKittiReader(length=n_shards, n_points=1500, history=2)
    pipe = MsKdVoxelPipeline(voxel_size=0.3, training=True, max_voxel=256,
                             if_jitter=False)
    samples = [pipe(kd_sample(reader, i)) for i in range(n_shards)]

    # alignment correctness: matched coords are identical
    k = samples[0]
    s_coords = k.student.fused.coords[k.pair_student]
    t_coords = k.teacher.coords[k.pair_teacher]
    np.testing.assert_array_equal(s_coords, t_coords)
    assert len(k.pair_student) > 50

    cap, tcap, mv = 4096, 4096, 256
    arrays, meta = collate_kd_batch(
        [[s] for s in samples], cap, tcap, mv
    )
    kb = KdBatch(
        student=Batch(
            point_coords=jnp.asarray(arrays["student"]["point_coords"]),
            point_feats=jnp.asarray(arrays["student"]["point_feats"]),
            labels=jnp.asarray(arrays["student"]["labels"]),
            num_points=jnp.asarray(arrays["student"]["num_points"]),
        ),
        teacher=Batch(
            point_coords=jnp.asarray(arrays["teacher"]["point_coords"]),
            point_feats=jnp.asarray(arrays["teacher"]["point_feats"]),
            labels=jnp.asarray(arrays["teacher"]["labels"]),
            num_points=jnp.asarray(arrays["teacher"]["num_points"]),
        ),
        kd_student_idx=jnp.asarray(arrays["kd_student_idx"]),
        kd_teacher_idx=jnp.asarray(arrays["kd_teacher_idx"]),
        kd_mask=jnp.asarray(arrays["kd_mask"]),
    )

    caps = UNetCapacities.for_points(cap)
    model = MinkUNet(
        num_classes=20, in_dim=5, cr=0.125, num_layer=(1,) * 8,
        dropout_p=0.0, axis_name="data",
    )
    from taseg_tpu.models.voxel.backbone_context import build_unet_topology
    from taseg_tpu.ops import PointSet

    pts0 = PointSet(
        coords=kb.student.point_coords[0],
        feats=kb.student.point_feats[0],
        num=kb.student.num_points[0, 0],
    )
    topo0 = build_unet_topology(pts0.coords, pts0.num, caps)
    variables = model.init({"params": jax.random.PRNGKey(0)}, pts0, topo0, False)
    teacher_vars = model.init(
        {"params": jax.random.PRNGKey(1)}, pts0, topo0, False
    )

    tx = build_optimizer(
        {"OPTIMIZER": "sgd", "LR": 0.01, "WEIGHT_DECAY": 0.0,
         "MOMENTUM": 0.9, "SCHEDULER": "linear_warmup_with_cosdecay",
         "WARMUP_EPOCH": 1},
        iters_per_epoch=5, total_epochs=2,
    )
    state = TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        step=jnp.int32(0),
    )
    criterion = Losses(["CELoss"], [1.0], ignore_index=0)
    step = make_kd_train_step(
        model, criterion, tx, caps, caps, mesh,
        feat_kd_weight=10.0, donate=False,
    )
    t_params = teacher_vars["params"]
    t_stats = teacher_vars["batch_stats"]
    losses_kd = []
    for i in range(3):
        state, metrics = step(
            state, t_params, t_stats, kb, jax.random.PRNGKey(i)
        )
        assert np.isfinite(float(metrics["loss"]))
        losses_kd.append(float(metrics["loss_feat_kd"]))
    # KD loss is nonzero (different init) and the student moves toward the
    # teacher's features
    assert losses_kd[0] > 0
    assert losses_kd[-1] < losses_kd[0]
