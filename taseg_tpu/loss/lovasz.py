"""Lovász-Softmax loss, masked static-shape formulation.

Re-derivation of the flat Lovász-softmax of the reference
(`tools/utils/common/lovasz_losses.py`, `lovasz_softmax_flat`): for each
class c present in the labels, sort the per-point errors |fg_c - p_c|
descending and take the dot product with the Lovász extension gradient of
the Jaccard index.  The reference filters ignored points by boolean
indexing (dynamic shape); here invalid points get error 0 and fg 0, which
sorts them to the tail where the gradient weight contribution vanishes —
an exact, fully static reformulation (sorts are cheap on TPU).
"""

from __future__ import annotations

import jax.numpy as jnp
from .util import permute_rows


def _lovasz_grad(gt_sorted: jnp.ndarray) -> jnp.ndarray:
    """Gradient of the Lovász extension w.r.t. sorted errors (per class).

    gt_sorted: (C, N) 0/1 ground-truth indicators in descending error order.
    """
    n = gt_sorted.shape[-1]
    gts = jnp.sum(gt_sorted, axis=-1, keepdims=True)
    cum = jnp.cumsum(gt_sorted, axis=-1)
    intersection = gts - cum
    union = gts + jnp.cumsum(1.0 - gt_sorted, axis=-1)
    jaccard = 1.0 - intersection / jnp.maximum(union, 1e-9)
    # difference along the sorted axis: grad[0] = jaccard[0]
    grad = jnp.concatenate(
        [jaccard[..., :1], jaccard[..., 1:] - jaccard[..., :-1]], axis=-1
    )
    return grad


def lovasz_softmax(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    valid: jnp.ndarray,
    *,
    classes: str = "present",
) -> jnp.ndarray:
    """Masked Lovász-softmax over (N, C) logits.

    valid: (N,) bool — False rows (padding or ignore-class) contribute
    nothing.  `classes='present'` averages only over classes that appear in
    the valid labels, matching the reference default.
    """
    n, c = logits.shape
    probs = jnp.exp(
        logits.astype(jnp.float32)
        - jnp.max(logits, -1, keepdims=True).astype(jnp.float32)
    )
    probs = probs / jnp.sum(probs, -1, keepdims=True)

    labels = jnp.clip(labels, 0, c - 1)
    fg = (jnp.arange(c)[None, :] == labels[:, None]).astype(jnp.float32)
    fg = fg * valid[:, None].astype(jnp.float32)  # (N, C)
    errors = jnp.abs(fg - probs.astype(jnp.float32))
    errors = errors * valid[:, None]  # invalid rows -> 0, sort to tail

    # sort errors descending per class; the permutation gathers route
    # through permute_rows so their VJP is the inverse-permutation gather
    # instead of the scatter take_along_axis autodiffs into (TPU scatters
    # are pathologically slow, see loss/util.py)
    order = jnp.argsort(-errors, axis=0)  # (N, C)
    inv = jnp.argsort(order, axis=0)
    errors_sorted = permute_rows(errors, order, inv).T  # (C, N)
    fg_sorted = permute_rows(fg, order, inv).T  # (C, N)

    grad = _lovasz_grad(fg_sorted)
    per_class = jnp.sum(errors_sorted * grad, axis=-1)  # (C,)

    if classes == "present":
        present = jnp.sum(fg, axis=0) > 0
        return jnp.sum(jnp.where(present, per_class, 0.0)) / jnp.maximum(
            jnp.sum(present.astype(jnp.float32)), 1.0
        )
    return jnp.mean(per_class)
