"""EQLv2 — equalization loss v2 with explicit gradient-statistics state.

Functional re-design of the reference (`pcseg/loss/eqlv2.py:8-130`):
per-class sigmoid BCE whose positive/negative weights are driven by the
RUNNING ratio of accumulated positive to negative gradient magnitude
(gamma-sigmoid mapped).  The reference keeps that ratio as mutable module
state updated with `dist.all_reduce` each step; in JAX the statistics are
an explicit `EqlV2State` pytree the caller threads through the train step
(carry it in TrainState; `psum` it over the mesh axis when data-parallel).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from .util import label_lp


class EqlV2State(NamedTuple):
    pos_grad: jnp.ndarray  # (C-1,) accumulated |grad| on positives
    neg_grad: jnp.ndarray  # (C-1,) accumulated |grad| on negatives

    @staticmethod
    def init(num_classes: int) -> "EqlV2State":
        return EqlV2State(
            pos_grad=jnp.zeros((num_classes - 1,), jnp.float32),
            neg_grad=jnp.zeros((num_classes - 1,), jnp.float32),
        )


def eqlv2_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    valid: jnp.ndarray,
    state: EqlV2State,
    *,
    gamma: float = 12.0,
    mu: float = 0.8,
    alpha: float = 4.0,
    axis_name: Optional[str] = None,
) -> tuple[jnp.ndarray, EqlV2State]:
    """Returns (loss, updated state).  Class 0 (ignore/undefined) keeps
    unit weights, matching the reference's [1:] slicing."""
    n, c = logits.shape
    x = logits.astype(jnp.float32)
    labels_c = jnp.clip(labels, 0, c - 1)
    target = jax.nn.one_hot(labels_c, c, dtype=jnp.float32)
    m = valid.astype(jnp.float32)[:, None]

    pos_neg = state.pos_grad / (state.neg_grad + 1e-10)
    mapped = 1.0 / (1.0 + jnp.exp(-gamma * (pos_neg - mu)))
    neg_w_c = jnp.concatenate([jnp.ones((1,), jnp.float32), mapped])
    pos_w_c = 1.0 + alpha * (1.0 - neg_w_c)
    weight = pos_w_c[None, :] * target + neg_w_c[None, :] * (1.0 - target)

    bce = jnp.maximum(x, 0) - x * target + jnp.log1p(jnp.exp(-jnp.abs(x)))
    loss = jnp.sum(bce * weight * m) / (jnp.sum(m[:, 0]) + 1e-10)

    prob = jax.nn.sigmoid(jax.lax.stop_gradient(x))
    grad = jnp.abs(target * (prob - 1.0) + (1.0 - target) * prob)
    pos_g = jnp.sum(grad * target * weight * m, axis=0)[1:]
    neg_g = jnp.sum(grad * (1.0 - target) * weight * m, axis=0)[1:]
    if axis_name is not None:
        pos_g = jax.lax.psum(pos_g, axis_name)
        neg_g = jax.lax.psum(neg_g, axis_name)
    new_state = EqlV2State(
        pos_grad=state.pos_grad + pos_g, neg_grad=state.neg_grad + neg_g
    )
    return loss, new_state


def group_softmax_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    valid: jnp.ndarray,
    groups: list,
    *,
    beta: float = 8.0,
) -> jnp.ndarray:
    """GroupSoftmax (long-tail grouping; reference
    `pcseg/loss/group_softmax.py:14-195` 'fine-grained' version): classes
    are partitioned into groups; each group gets its own softmax over
    [others, members...], where 'others' collects every out-of-group class,
    sampled down by keeping each negative with weight 1/beta (we use the
    expectation weight instead of Bernoulli sampling — same mean, no RNG).

    `groups`: list of lists of class ids (a partition of 1..C-1; class 0
    handled as its own group).
    """
    n, c = logits.shape
    x = logits.astype(jnp.float32)
    labels_c = jnp.clip(labels, 0, c - 1)
    m = valid.astype(jnp.float32)
    total = jnp.float32(0.0)
    denom = jnp.float32(0.0)
    for group in [[0]] + list(groups):
        gids = jnp.asarray(group, jnp.int32)
        in_group = jnp.isin(labels_c, gids)
        # group logits: [others, members...]; 'others' = logsumexp of the
        # complement scaled by the 1/beta sampling expectation
        member_logits = x[:, gids]  # (N, |g|)
        comp_mask = jnp.ones((c,), bool).at[gids].set(False)
        others = jax.nn.logsumexp(
            jnp.where(comp_mask[None, :], x, -jnp.inf), axis=1
        ) + jnp.log(1.0 / beta)
        glogits = jnp.concatenate([others[:, None], member_logits], axis=1)
        # target: members get their slot; out-of-group valid points hit
        # the 'others' slot
        member_slot = jnp.argmax(
            (labels_c[:, None] == gids[None, :]).astype(jnp.int32), axis=1
        ) + 1
        gtarget = jnp.where(in_group, member_slot, 0)
        lp = jax.nn.log_softmax(glogits, axis=1)
        nll = -label_lp(lp, gtarget)
        w = m * jnp.where(in_group, 1.0, 1.0 / beta)
        total = total + jnp.sum(nll * w)
        denom = denom + jnp.sum(w)
    return total / jnp.maximum(denom, 1e-8)


def group_softmax_fgbg_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    valid: jnp.ndarray,
    groups: list,
    fg_classes: list,
    *,
    beta: float = 8.0,
) -> jnp.ndarray:
    """GroupSoftmax with an extra foreground/background binary group
    (reference `pcseg/loss/group_softmax_fgbg_2.py`, the 'fg bg' slot pair
    in `group_softmax.py:62-67`): the per-group losses are as in
    `group_softmax_loss`, plus a 2-way softmax where every valid point is
    labeled by membership of `fg_classes`."""
    base = group_softmax_loss(logits, labels, valid, groups, beta=beta)
    n, c = logits.shape
    x = logits.astype(jnp.float32)
    labels_c = jnp.clip(labels, 0, c - 1)
    m = valid.astype(jnp.float32)
    fg_ids = jnp.asarray(list(fg_classes), jnp.int32)
    fg_mask_c = jnp.zeros((c,), bool).at[fg_ids].set(True)
    is_fg = fg_mask_c[labels_c]
    fg_logit = jax.nn.logsumexp(
        jnp.where(fg_mask_c[None, :], x, -jnp.inf), axis=1
    )
    bg_logit = jax.nn.logsumexp(
        jnp.where((~fg_mask_c)[None, :], x, -jnp.inf), axis=1
    )
    pair = jnp.stack([bg_logit, fg_logit], axis=1)
    lp = jax.nn.log_softmax(pair, axis=1)
    nll = -label_lp(lp, is_fg.astype(jnp.int32))
    fgbg = jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1e-8)
    return base + fgbg


def geo_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    valid: jnp.ndarray,
    xyz: jnp.ndarray,
    *,
    nsample: int = 10,
    max_points: int = 4096,
    lam: float = 1.0,
    alpha: float = 0.5,
    rng_key=None,
) -> jnp.ndarray:
    """Local-geometric-anisotropy weighted NLL (reference
    `pcseg/loss/geo_loss.py`): each point's CE is reweighted by the
    fraction of its K nearest neighbors with a DIFFERENT label —
    boundary points weigh more.  The reference runs pointops.knnquery
    over every point; here the loss is evaluated on a fixed-size subset
    (static shapes) with a brute-force distance matrix, which matches in
    expectation at a fraction of the cost."""
    n, c = logits.shape
    idx = jnp.arange(n)
    if rng_key is not None:
        idx = jax.random.permutation(rng_key, n)
    sub = idx[:max_points]
    sv = valid[sub]
    sl = jnp.clip(labels[sub], 0, c - 1)
    sx = xyz[sub]
    d2 = jnp.sum((sx[:, None, :] - sx[None, :, :]) ** 2, axis=-1)
    d2 = jnp.where(sv[None, :], d2, jnp.inf)
    d2 = d2.at[jnp.arange(len(sub)), jnp.arange(len(sub))].set(jnp.inf)
    _, nn = jax.lax.top_k(-d2, nsample)
    knn_labels = sl[nn]  # (S, nsample)
    lga = jnp.sum(knn_labels != sl[:, None], axis=1).astype(jnp.float32)
    w = (lam + alpha * lga) / nsample
    m = sv.astype(jnp.float32)
    w = w / (jnp.sum(w * m) / jnp.maximum(jnp.sum(m), 1.0))
    lp = jax.nn.log_softmax(logits[sub].astype(jnp.float32), axis=1)
    nll = -label_lp(lp, sl)
    return jnp.sum(nll * w * m) / jnp.maximum(jnp.sum(m), 1.0)
