"""EQLv2 / GroupSoftmax losses + parameter-freezing helper tests."""
import numpy as np
import jax
import jax.numpy as jnp
import optax

from taseg_tpu.loss.eqlv2 import EqlV2State, eqlv2_loss, group_softmax_loss
from taseg_tpu.utils.param_groups import freeze_except, trainable_mask


def test_eqlv2_state_evolves_and_reweights():
    rng = np.random.default_rng(0)
    n, c = 400, 23
    logits = jnp.asarray(rng.normal(size=(n, c)).astype(np.float32))
    labels = jnp.asarray(rng.integers(1, c, n))
    valid = jnp.ones(n, bool)
    state = EqlV2State.init(c)
    loss0, state1 = eqlv2_loss(logits, labels, valid, state)
    assert np.isfinite(float(loss0)) and float(loss0) > 0
    assert float(state1.pos_grad.sum()) > 0
    assert float(state1.neg_grad.sum()) > 0
    # with evolved statistics the weighting (and hence loss) changes
    loss1, _ = eqlv2_loss(logits, labels, valid, state1)
    assert float(loss1) != float(loss0)
    # gradient flows
    g = jax.grad(lambda x: eqlv2_loss(x, labels, valid, state1)[0])(logits)
    assert np.isfinite(np.asarray(g)).all()


def test_group_softmax_basic():
    rng = np.random.default_rng(1)
    n, c = 300, 20
    logits = jnp.asarray(rng.normal(size=(n, c)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, c, n))
    valid = jnp.asarray(rng.random(n) > 0.1)
    groups = [[1, 2, 3, 4, 5], [6, 7, 8], [9, 10, 11, 12],
              [13, 14], [15, 16, 17, 18, 19]]
    loss = group_softmax_loss(logits, labels, valid, groups)
    assert np.isfinite(float(loss)) and float(loss) > 0
    # perfect logits for the right group slot reduce the loss
    strong = jnp.asarray(
        jax.nn.one_hot(labels, c) * 20.0 + rng.normal(size=(n, c)) * 0.01
    )
    assert float(group_softmax_loss(strong, labels, valid, groups)) < float(loss)


def test_freeze_except_zeroes_frozen_updates():
    params = {
        "stem": {"kernel": jnp.ones((3, 3))},
        "classifier_fusion": {"kernel": jnp.ones((3, 3))},
    }
    tx = freeze_except(optax.sgd(0.1), params, ["classifier_fusion"])
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    assert float(jnp.abs(updates["stem"]["kernel"]).sum()) == 0.0
    assert float(jnp.abs(updates["classifier_fusion"]["kernel"]).sum()) > 0

    mask = trainable_mask(params, ["classifier_fusion"])
    assert mask["classifier_fusion"]["kernel"] is True
    assert mask["stem"]["kernel"] is False


def test_train_step_threads_eqlv2_state():
    import jax
    import jax.numpy as jnp
    from taseg_tpu.loss.eqlv2 import EqlV2State, eqlv2_loss
    from taseg_tpu.models import MinkUNet, UNetCapacities
    from taseg_tpu.models.voxel.backbone_context import build_unet_topology
    from taseg_tpu.optim import build_optimizer
    from taseg_tpu.ops import PointSet
    from taseg_tpu.parallel import Batch, TrainState, make_mesh, make_train_step

    mesh = make_mesh()
    n = len(jax.devices())
    rng = np.random.default_rng(0)
    cap = 512
    coords = np.zeros((n, cap, 4), np.float32)
    feats = np.zeros((n, cap, 4), np.float32)
    labels = np.zeros((n, cap), np.int32)
    nums = np.zeros((n, 1), np.int32)
    for r in range(n):
        pts = np.unique(np.concatenate(
            [np.floor(rng.uniform(0, 12, (400, 3))),
             np.zeros((400, 1))], 1).astype(np.float32), axis=0)
        m = len(pts)
        coords[r, :m] = pts
        feats[r, :m] = rng.normal(size=(m, 4))
        labels[r, :m] = rng.integers(1, 20, m)
        nums[r, 0] = m
    batch = Batch(
        point_coords=jnp.asarray(coords), point_feats=jnp.asarray(feats),
        labels=jnp.asarray(labels), num_points=jnp.asarray(nums),
    )
    caps = UNetCapacities.for_points(cap)
    model = MinkUNet(num_classes=20, cr=0.125, num_layer=(1,) * 8,
                     dropout_p=0.0, axis_name="data")
    pts0 = PointSet(coords=batch.point_coords[0], feats=batch.point_feats[0],
                    num=batch.num_points[0, 0])
    topo = build_unet_topology(pts0.coords, pts0.num, caps)
    v = model.init({"params": jax.random.PRNGKey(0)}, pts0, topo, False)
    tx = build_optimizer(
        {"OPTIMIZER": "sgd", "LR": 0.01, "WEIGHT_DECAY": 0.0, "MOMENTUM": 0.9,
         "SCHEDULER": "linear_warmup_with_cosdecay", "WARMUP_EPOCH": 1}, 5, 2)

    def criterion(logits, labels, valid, state):
        return eqlv2_loss(logits, labels, valid & (labels != 0), state,
                          axis_name="data")

    state = TrainState(
        params=v["params"], batch_stats=v["batch_stats"],
        opt_state=tx.init(v["params"]), step=jnp.int32(0),
        loss_state=EqlV2State.init(20),
    )
    step = make_train_step(model, criterion, tx, caps, mesh, donate=False)
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert float(state.loss_state.pos_grad.sum()) > 0  # stats accumulated
    s1 = float(state.loss_state.pos_grad.sum())
    state, _ = step(state, batch, jax.random.PRNGKey(1))
    assert float(state.loss_state.pos_grad.sum()) > s1  # keeps accumulating


def test_eqlv2_through_trainer_state():
    """VERDICT item 8: LOSS_TYPES [EQLv2] flows Losses -> TrainState.
    loss_state -> SPMD step; gradient statistics update and are identical
    across shards (the psum happens inside the loss)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from taseg_tpu.loss import Losses
    from taseg_tpu.models import MinkUNet, UNetCapacities
    from taseg_tpu.optim import build_optimizer
    from taseg_tpu.parallel import (
        Batch, TrainState, make_mesh, make_train_step,
    )
    from taseg_tpu.models.voxel.backbone_context import build_unet_topology
    from taseg_tpu.ops import PointSet
    from taseg_tpu.data.synthetic import synthetic_scan
    from taseg_tpu.data.voxel_dataset import VoxelPipeline, collate_batch

    mesh = make_mesh()
    n = len(jax.devices())
    pipe = VoxelPipeline(voxel_size=0.3, training=False)
    rng = np.random.default_rng(0)
    shards = []
    for r in range(n):
        pts, labels = synthetic_scan(rng, 1200)
        ring = np.zeros((len(pts), 1), np.float32)
        shards.append([pipe({"xyzret": np.concatenate([pts, ring], 1),
                             "labels": labels})])
    cap = 2048
    arrays, _ = collate_batch(shards, cap)
    batch = Batch(
        point_coords=jnp.asarray(arrays["point_coords"]),
        point_feats=jnp.asarray(arrays["point_feats"]),
        labels=jnp.asarray(arrays["labels"]),
        num_points=jnp.asarray(arrays["num_points"]),
    )
    caps = UNetCapacities.for_points(cap)
    model = MinkUNet(num_classes=20, cr=0.125, num_layer=(1,) * 8,
                     dropout_p=0.0, axis_name="data")
    pts0 = PointSet(coords=batch.point_coords[0],
                    feats=batch.point_feats[0],
                    num=batch.num_points[0, 0])
    topo = build_unet_topology(pts0.coords, pts0.num, caps)
    v = model.init({"params": jax.random.PRNGKey(0)}, pts0, topo, False)
    tx = build_optimizer(
        {"OPTIMIZER": "sgd", "LR": 0.02, "WEIGHT_DECAY": 1e-4,
         "MOMENTUM": 0.9, "SCHEDULER": "linear_warmup_with_cosdecay",
         "WARMUP_EPOCH": 1}, 4, 1,
    )
    crit = Losses(["EQLv2"], [1.0], ignore_index=0, axis_name="data")
    state = TrainState(
        params=v["params"], batch_stats=v["batch_stats"],
        opt_state=tx.init(v["params"]), step=jnp.int32(0),
        loss_state=crit.init_state(20),
    )
    step = make_train_step(model, crit, tx, caps, mesh, donate=False)
    s0 = np.asarray(state.loss_state.pos_grad).copy()
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    s1 = np.asarray(state.loss_state.pos_grad)
    assert (s1 != s0).any(), "EQLv2 gradient statistics did not update"
    state, _ = step(state, batch, jax.random.PRNGKey(2))
    s2 = np.asarray(state.loss_state.pos_grad)
    assert (s2 != s1).any()
