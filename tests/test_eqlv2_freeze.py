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
