"""Loss combinator — masked static-shape re-designs of `pcseg/loss/*`.

The reference filters ignored points by boolean indexing (dynamic shapes);
every loss here instead takes an explicit validity mask so the whole loss
stack jits with static shapes.  `Losses` mirrors the reference combinator
API (`pcseg/loss/__init__.py:15-137`): a list of loss-type names + weights
summed together, ignore_index semantics included in the mask.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .lovasz import lovasz_softmax
from .util import label_lp

__all__ = ["Losses", "cross_entropy", "lovasz_softmax", "wce_weights"]


def _log_softmax(logits: jnp.ndarray) -> jnp.ndarray:
    x = logits.astype(jnp.float32)
    x = x - jnp.max(x, axis=-1, keepdims=True)
    return x - jnp.log(jnp.sum(jnp.exp(x), axis=-1, keepdims=True))


def cross_entropy(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    valid: jnp.ndarray,
    *,
    label_smoothing: float = 0.0,
    class_weight: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Masked CE with torch semantics: mean over valid points, optional
    per-class weights (weighted mean uses the sum of sample weights as the
    denominator, as torch CrossEntropyLoss does)."""
    n, c = logits.shape
    lp = _log_softmax(logits)
    labels_c = jnp.clip(labels, 0, c - 1)
    nll = -label_lp(lp, labels_c)
    if label_smoothing > 0.0:
        smooth = -jnp.mean(lp, axis=-1)
        nll = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    w = valid.astype(jnp.float32)
    if class_weight is not None:
        w = w * class_weight[labels_c]
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1e-8)


def focal_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    valid: jnp.ndarray,
    *,
    gamma: float = 0.5,
) -> jnp.ndarray:
    """Focal loss, reference `pcseg/loss/focalloss.py:6-45` (gamma 0.5,
    sum/valid-count normalization)."""
    c = logits.shape[-1]
    lp = _log_softmax(logits)
    labels_c = jnp.clip(labels, 0, c - 1)
    logpt = label_lp(lp, labels_c)
    # pt is detached in the reference (Variable(logpt.data.exp()))
    pt = jnp.exp(jax.lax.stop_gradient(logpt))
    loss = -((1.0 - pt) ** gamma) * logpt
    m = valid.astype(jnp.float32)
    return jnp.sum(loss * m) / (jnp.sum(m) + 1e-5)


def dice_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    valid: jnp.ndarray,
    *,
    ignore_index: int = 0,
    smooth: float = 1.0,
    exponent: float = 2.0,
) -> jnp.ndarray:
    """Per-class binary dice over softmax probs, averaged over classes
    (reference `pcseg/loss/dice_loss_v0.py`), masked instead of filtered."""
    c = logits.shape[-1]
    probs = jnp.exp(_log_softmax(logits))
    m = valid.astype(jnp.float32)[:, None]
    onehot = (
        jnp.arange(c)[None, :] == jnp.clip(labels, 0, c - 1)[:, None]
    ).astype(jnp.float32) * m
    p = probs * m
    num = 2.0 * jnp.sum(p * onehot, axis=0) + smooth
    den = jnp.sum(p**exponent + onehot**exponent, axis=0) + smooth
    per_class = 1.0 - num / den
    keep = jnp.ones((c,), bool).at[ignore_index].set(False)
    return jnp.sum(jnp.where(keep, per_class, 0.0)) / c


def wce_weights(
    cls_num_pts: Sequence[float], ignore_index: int = 0, normalize: bool = True
) -> np.ndarray:
    """1/sqrt(freq) class weights with the reference's double normalization
    (`pcseg/loss/wce_loss.py:16-26`)."""
    n = np.asarray(cls_num_pts, np.float64)
    f = n / n.sum()
    w = 1.0 / np.sqrt(np.maximum(f, 1e-12))
    w[ignore_index] = 0.0
    if normalize:
        w = w / w.sum() * len(n)
    w = w / ((w * n).sum() / n.sum())
    return w.astype(np.float32)


class Losses:
    """Weighted sum of named losses over masked per-point logits.

    Call signature: losses(logits (N, C), labels (N,), point_valid (N,)).
    Points with label == ignore_index or point_valid == False contribute
    nothing (matching torch ignore_index + our padding semantics).
    """

    def __init__(
        self,
        loss_types: Sequence[str],
        loss_weights: Sequence[float],
        *,
        ignore_index: int = 0,
        label_smoothing: float = 0.0,
        cls_num_pts: Optional[Sequence[float]] = None,
        class_weight=None,
        knn: int = 10,
        gs_groups=None,
        gs_fg_classes=None,
        axis_name=None,
    ):
        assert len(loss_types) == len(loss_weights)
        self.loss_types = list(loss_types)
        self.loss_weights = list(loss_weights)
        self.ignore_index = ignore_index
        self.label_smoothing = label_smoothing
        self.class_weight = (
            jnp.asarray(class_weight) if class_weight is not None else None
        )
        self.wce_w = (
            jnp.asarray(wce_weights(cls_num_pts, ignore_index))
            if cls_num_pts is not None
            else None
        )
        self.ell_weight = (
            jnp.asarray(wce_weights(cls_num_pts, ignore_index, normalize=False))
            if cls_num_pts is not None else None
        )
        self.gs_groups = gs_groups
        self.gs_fg_classes = gs_fg_classes
        self.axis_name = axis_name
        self.stateful = "EQLv2" in self.loss_types
        unknown = set(self.loss_types) - {
            "CELoss", "LovLoss", "WCELoss", "FocalLoss", "DiceLossV0",
            "DiceLossV1", "ELLLoss", "EQLv2", "GroupSoftmax",
            "GroupSoftmax_fgbg_2",
        }
        if unknown:
            raise NotImplementedError(f"loss types not yet built: {unknown}")

    def init_state(self, num_classes: int):
        """Initial stateful-loss statistics (EQLv2 gradient accumulators,
        reference pcseg/loss/eqlv2.py:8-46) or None for stateless stacks;
        carried through TrainState.loss_state by the train step."""
        if not self.stateful:
            return None
        from .eqlv2 import EqlV2State

        return EqlV2State.init(num_classes)

    def __call__(
        self,
        logits: jnp.ndarray,
        labels: jnp.ndarray,
        point_valid: jnp.ndarray,
        loss_state=None,
    ):
        """Returns the scalar loss; for stateful stacks (EQLv2) returns
        (loss, new_loss_state) — the SPMD step threads the state through
        TrainState.loss_state (parallel/__init__.py:113-120)."""
        valid = point_valid & (labels != self.ignore_index)
        total = jnp.float32(0.0)
        new_state = loss_state
        for name, w in zip(self.loss_types, self.loss_weights):
            if name == "CELoss":
                l = cross_entropy(
                    logits, labels, valid,
                    label_smoothing=self.label_smoothing,
                    class_weight=self.class_weight,
                )
            elif name == "WCELoss":
                assert self.wce_w is not None, "WCELoss needs cls_num_pts"
                l = cross_entropy(
                    logits, labels, valid,
                    label_smoothing=self.label_smoothing,
                    class_weight=self.wce_w,
                )
            elif name == "LovLoss":
                l = lovasz_softmax(logits, labels, valid)
            elif name == "FocalLoss":
                l = focal_loss(logits, labels, valid)
            elif name == "DiceLossV0":
                l = dice_loss(logits, labels, valid, ignore_index=self.ignore_index)
            elif name == "DiceLossV1":
                l = dice_loss_v1(
                    logits, labels, valid, ignore_index=self.ignore_index
                )
            elif name == "ELLLoss":
                l = ell_loss(
                    logits, labels, valid, ignore_index=self.ignore_index,
                    cls_weight=self.ell_weight,
                )
            elif name == "EQLv2":
                from .eqlv2 import eqlv2_loss

                assert loss_state is not None, (
                    "EQLv2 needs loss_state (Losses.init_state)"
                )
                l, new_state = eqlv2_loss(
                    logits, labels, valid, loss_state,
                    axis_name=self.axis_name,
                )
            elif name == "GroupSoftmax":
                from .eqlv2 import group_softmax_loss

                assert self.gs_groups, "GroupSoftmax needs gs_groups"
                l = group_softmax_loss(
                    logits, labels, valid, self.gs_groups
                )
            elif name == "GroupSoftmax_fgbg_2":
                from .eqlv2 import group_softmax_fgbg_loss

                assert self.gs_groups and self.gs_fg_classes, (
                    "GroupSoftmax_fgbg_2 needs gs_groups + gs_fg_classes"
                )
                l = group_softmax_fgbg_loss(
                    logits, labels, valid, self.gs_groups,
                    self.gs_fg_classes,
                )
            else:  # pragma: no cover — guarded in __init__
                raise KeyError(name)
            total = total + w * l
        if self.stateful:
            return total, new_state
        return total


def dice_loss_v1(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    valid: jnp.ndarray,
    *,
    ignore_index: int = 0,
    smooth: float = 1.0,
) -> jnp.ndarray:
    """Soft multiclass dice over valid points (reference
    `pcseg/loss/dice_loss_v1.py` semantics: per-class soft dice on softmax
    probabilities, averaged over non-ignored classes)."""
    c = logits.shape[-1]
    probs = jnp.exp(_log_softmax(logits))
    m = valid.astype(jnp.float32)[:, None]
    onehot = (
        jnp.arange(c)[None, :] == jnp.clip(labels, 0, c - 1)[:, None]
    ).astype(jnp.float32) * m
    p = probs * m
    num = 2.0 * jnp.sum(p * onehot, axis=0) + smooth
    den = jnp.sum(p + onehot, axis=0) + smooth
    per_class = 1.0 - num / den
    keep = jnp.ones((c,), bool).at[ignore_index].set(False)
    return jnp.sum(jnp.where(keep, per_class, 0.0)) / jnp.maximum(
        jnp.sum(keep), 1
    )


def ell_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    valid: jnp.ndarray,
    *,
    ignore_index: int = 0,
    cls_weight: Optional[jnp.ndarray] = None,
    w_dice: float = 0.8,
    w_cross: float = 0.2,
    gamma_dice: float = 1.0,
    gamma_cross: float = 1.0,
    smooth: float = 1.0,
    exponent: float = 2.0,
) -> jnp.ndarray:
    """Exponential-logarithmic dice/CE hybrid (reference
    `pcseg/loss/ell_loss.py:36-90`):
    w_dice * E[(-ln Dice_c)^g] + w_cross * E[w_l * (-ln p_gt)^g].

    Deviation (documented): the reference subsamples ~3x-positives worth of
    negatives per class at random when computing the dice coefficient; we
    weight all negatives by min(1, 3*n_pos/n_neg) instead — the same
    expectation without a host RNG in the loss.
    """
    c = logits.shape[-1]
    lp = _log_softmax(logits)
    probs = jnp.exp(lp)
    m = valid.astype(jnp.float32)
    onehot = (
        jnp.arange(c)[None, :] == jnp.clip(labels, 0, c - 1)[:, None]
    ).astype(jnp.float32) * m[:, None]

    n_pos = jnp.sum(onehot, axis=0)  # (C,)
    n_neg = jnp.maximum(jnp.sum(m) - n_pos, 1.0)
    neg_w = jnp.minimum(1.0, 3.0 * n_pos / n_neg)  # expected sampling rate
    sample_w = onehot + (m[:, None] - onehot) * neg_w[None, :]

    p = probs * m[:, None]
    num = 2.0 * jnp.sum(p * onehot * sample_w, axis=0) + smooth
    den = jnp.sum((p**exponent + onehot) * sample_w, axis=0) + smooth
    dice_c = jnp.clip(num / den, 1e-6, 1.0)
    keep = jnp.ones((c,), bool).at[ignore_index].set(False)
    l_dice = jnp.sum(
        jnp.where(keep, (-jnp.log(dice_c)) ** gamma_dice, 0.0)
    ) / c

    labels_c = jnp.clip(labels, 0, c - 1)
    logpt = label_lp(lp, labels_c)
    wl = cls_weight[labels_c] if cls_weight is not None else 1.0
    l_cross = jnp.sum(
        wl * ((-logpt) ** gamma_cross) * m
    ) / jnp.maximum(jnp.sum(m), 1e-8)
    return w_dice * l_dice + w_cross * l_cross
