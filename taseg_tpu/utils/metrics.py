"""Segmentation metrics: confusion histogram + per-class IoU.

Replaces the reference's `fast_hist`/`fast_hist_crop`/`per_class_iu`
(train.py:35-52) and the pickle-tmpdir distributed merge
(`common_utils.py:200-221`): the histogram is computed on device and merged
with a single `psum` over the mesh — no filesystem barriers.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def confusion_hist(
    pred: jnp.ndarray,
    label: jnp.ndarray,
    valid: jnp.ndarray,
    num_classes: int,
) -> jnp.ndarray:
    """(C, C) histogram hist[gt, pred] over valid points.

    Computed as a one-hot contraction on the MXU ((C, N) x (N, C) matmul)
    instead of a scatter-add — scatters are pathologically slow on TPU."""
    ok = valid & (label >= 0) & (label < num_classes)
    cls = jnp.arange(num_classes, dtype=jnp.int32)
    gt_onehot = (label[:, None] == cls[None, :]) & ok[:, None]
    pred_onehot = jnp.clip(pred, 0, num_classes - 1)[:, None] == cls[None, :]
    hist = jnp.einsum(
        "ng,np->gp",
        gt_onehot.astype(jnp.float32),
        pred_onehot.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    return hist.astype(jnp.int32)


def per_class_iou(hist: np.ndarray) -> np.ndarray:
    hist = np.asarray(hist, np.float64)
    tp = np.diag(hist)
    denom = hist.sum(1) + hist.sum(0) - tp
    with np.errstate(divide="ignore", invalid="ignore"):
        return tp / denom


def miou_from_hist(hist: np.ndarray, ignore_index: int = 0) -> float:
    """Mean IoU over non-ignored classes, NaN-skipping like the reference
    (train.py:577-596 drops the ignore class then averages)."""
    iou = per_class_iou(np.asarray(hist))
    keep = np.ones(len(iou), bool)
    keep[ignore_index] = False
    vals = iou[keep]
    return float(np.nanmean(vals) * 100.0)


def format_confusion(hist, names, max_cols: int = 26) -> str:
    """Row-normalized confusion-matrix table (reference train.py:588-609,
    PrettyTable replaced with plain fixed-width text)."""
    import numpy as np

    h = np.asarray(hist, np.float64)
    rows = h / np.maximum(h.sum(axis=1, keepdims=True), 1.0)
    n = min(len(names), max_cols)
    short = [str(nm)[:6] for nm in names[:n]]
    head = " " * 12 + " ".join(f"{s:>6s}" for s in short)
    lines = [head]
    for i in range(n):
        vals = " ".join(f"{100 * rows[i, j]:6.1f}" for j in range(n))
        lines.append(f"{short[i]:>10s}: {vals}")
    return "\n".join(lines)
