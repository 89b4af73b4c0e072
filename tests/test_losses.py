"""Loss-layer golden tests: CE family vs torch (CPU), Lovász vs a numpy
oracle implementing the published Lovász-softmax algorithm."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from taseg_tpu.loss import Losses, cross_entropy, wce_weights
from taseg_tpu.loss.lovasz import lovasz_softmax


def rand_case(rng, n=200, c=20, pad=40):
    logits = rng.normal(size=(n, c)).astype(np.float32)
    labels = rng.integers(0, c, size=n).astype(np.int32)
    valid = np.ones(n, bool)
    valid[-pad:] = False
    labels[valid][:3]  # some ignore-class labels among the valid rows
    labels[5:15] = 0
    return logits, labels, valid


def test_ce_matches_torch_with_ignore_and_smoothing():
    rng = np.random.default_rng(0)
    logits, labels, valid = rand_case(rng)
    for smoothing in (0.0, 0.1):
        ours = cross_entropy(
            jnp.asarray(logits),
            jnp.asarray(labels),
            jnp.asarray(valid) & (jnp.asarray(labels) != 0),
            label_smoothing=smoothing,
        )
        # torch on the valid subset with ignore_index=0
        t = F.cross_entropy(
            torch.tensor(logits[valid]),
            torch.tensor(labels[valid]).long(),
            ignore_index=0,
            label_smoothing=smoothing,
        )
        np.testing.assert_allclose(float(ours), float(t), rtol=1e-5, atol=1e-6)


def test_wce_matches_torch_weighted():
    rng = np.random.default_rng(1)
    logits, labels, valid = rand_case(rng)
    cls_num = rng.integers(100, 10000, size=20).astype(np.float64)
    w = wce_weights(cls_num, ignore_index=0)
    ours = cross_entropy(
        jnp.asarray(logits),
        jnp.asarray(labels),
        jnp.asarray(valid) & (jnp.asarray(labels) != 0),
        class_weight=jnp.asarray(w),
    )
    t = F.cross_entropy(
        torch.tensor(logits[valid]),
        torch.tensor(labels[valid]).long(),
        weight=torch.tensor(w),
        ignore_index=0,
    )
    np.testing.assert_allclose(float(ours), float(t), rtol=1e-5, atol=1e-6)


def lovasz_oracle(probs, labels, ignore=0):
    """Numpy Lovász-softmax (flat, classes='present')."""
    keep = labels != ignore
    probs, labels = probs[keep], labels[keep]
    c = probs.shape[1]
    losses = []
    for ci in range(c):
        fg = (labels == ci).astype(np.float64)
        if fg.sum() == 0:
            continue
        errors = np.abs(fg - probs[:, ci])
        order = np.argsort(-errors)
        e_s, fg_s = errors[order], fg[order]
        gts = fg_s.sum()
        inter = gts - np.cumsum(fg_s)
        union = gts + np.cumsum(1 - fg_s)
        jac = 1.0 - inter / union
        jac[1:] = jac[1:] - jac[:-1]
        losses.append((e_s * jac).sum())
    return np.mean(losses)


def test_lovasz_matches_oracle():
    rng = np.random.default_rng(2)
    logits, labels, valid = rand_case(rng, n=300, c=8, pad=50)
    ours = lovasz_softmax(
        jnp.asarray(logits),
        jnp.asarray(labels),
        jnp.asarray(valid) & (jnp.asarray(labels) != 0),
    )
    probs = np.exp(logits - logits.max(1, keepdims=True))
    probs /= probs.sum(1, keepdims=True)
    ref = lovasz_oracle(probs[valid].astype(np.float64), labels[valid])
    np.testing.assert_allclose(float(ours), ref, rtol=1e-4, atol=1e-5)


def test_losses_combinator_default_config():
    rng = np.random.default_rng(3)
    logits, labels, valid = rand_case(rng)
    crit = Losses(["CELoss", "LovLoss"], [1.0, 1.0], ignore_index=0)
    total = crit(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(valid))
    assert np.isfinite(float(total))
    # ignoring more points must change the loss
    valid2 = valid.copy()
    valid2[:50] = False
    total2 = crit(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(valid2))
    assert float(total) != float(total2)


def test_focal_and_dice_finite():
    rng = np.random.default_rng(4)
    logits, labels, valid = rand_case(rng)
    crit = Losses(
        ["FocalLoss", "DiceLossV0"], [1.0, 1.0], ignore_index=0
    )
    total = crit(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(valid))
    assert np.isfinite(float(total)) and float(total) > 0


def test_geo_loss_weights_boundaries():
    """geo_loss (reference pcseg/loss/geo_loss.py): points whose neighbors
    disagree get higher weight -> a boundary-heavy prediction error costs
    more than an interior one."""
    import jax.numpy as jnp

    from taseg_tpu.loss.eqlv2 import geo_loss

    rng = np.random.default_rng(0)
    n, c = 512, 4
    xyz = rng.uniform(0, 10, (n, 3)).astype(np.float32)
    labels = (xyz[:, 0] > 5).astype(np.int32) + 1  # plane boundary at x=5
    logits = np.full((n, c), -2.0, np.float32)
    logits[np.arange(n), labels] = 2.0
    # corrupt 20 boundary points vs 20 interior points
    boundary = np.argsort(np.abs(xyz[:, 0] - 5))[:20]
    interior = np.argsort(-np.abs(xyz[:, 0] - 5))[:20]
    lb = logits.copy()
    lb[boundary] = -lb[boundary]
    li = logits.copy()
    li[interior] = -li[interior]
    valid = jnp.ones(n, bool)
    l_b = float(geo_loss(jnp.asarray(lb), jnp.asarray(labels), valid,
                         jnp.asarray(xyz), max_points=512))
    l_i = float(geo_loss(jnp.asarray(li), jnp.asarray(labels), valid,
                         jnp.asarray(xyz), max_points=512))
    assert l_b > l_i
