"""Range-view (dense 2D) losses.

Equivalents of the reference range-branch loss stack
(`pcseg/model/segmentor/range/utils.py`, `salsanext.py:211-224, 251-270`):
weighted CE with the SemanticKITTI inverse-frequency table, optional top-k
pixel OHEM, image Lovász, and the Bokhovkin boundary loss (max-pool based
boundary maps).  All masked static-shape.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .lovasz import lovasz_softmax
from .util import label_lp

# SemanticKITTI per-class pixel frequencies (dataset statistics; the same
# constants as reference range/utils.py:344-367 ClassWeightSemikitti)
_KITTI_PIXEL_FREQ = np.array(
    [
        0.0,
        0.040818519255974316 + 0.001789309418528068,
        0.00016609538710764618,
        0.00039838616015114444,
        0.0020633612104619787 + 0.00010157861367183268,
        2.7879693665067774e-05 + 0.0016218197275284021
        + 0.00011351574470342043 + 4.3840131989471124e-05,
        0.00017698551338515307 + 0.00016059776092534436,
        1.1065903904919655e-08 + 0.00012709999297008662,
        5.532951952459828e-09 + 3.745553104802113e-05,
        0.1987493871255525 + 4.7084144280367186e-05,
        0.014717169549888214,
        0.14392298360372,
        0.0039048553037472045,
        0.1326861944777486,
        0.0723592229456223,
        0.26681502148037506,
        0.006035012012626033,
        0.07814222006271769,
        0.002855498193863172,
        0.0006155958086189918,
    ]
)


def semkitti_class_weights() -> np.ndarray:
    w = 1.0 / (_KITTI_PIXEL_FREQ + 0.001)
    w[0] = 0.0
    return w.astype(np.float32)


def range_class_weights(
    dataset: str, num_class: int, override=None
) -> np.ndarray:
    """Per-dataset WCE weights for the range branch.

    The reference hardcodes ClassWeightSemikitti for every range config —
    including its nuScenes CENet recipe (`cenet.py:211`), where the KITTI
    frequencies are simply wrong.  Here: KITTI inverse-frequency weights
    for the SemanticKITTI family, uniform weights (ignore class 0) for
    datasets without measured pixel frequencies, and an explicit
    `MODEL.LOSS_CONFIG.CLASS_WEIGHT` list override for anything else."""
    if override is not None:
        w = np.asarray(override, np.float32)
        if len(w) != num_class:
            raise ValueError(
                f"CLASS_WEIGHT has {len(w)} entries, model has {num_class}"
            )
        return w
    if str(dataset).startswith(("semantickitti", "scribblekitti", "synthetic")):
        return semkitti_class_weights()[:num_class]
    w = np.ones(num_class, np.float32)
    w[0] = 0.0
    return w


def weighted_ce_image(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    valid: jnp.ndarray,
    *,
    class_weight: jnp.ndarray,
    top_k_percent: float = 1.0,
) -> jnp.ndarray:
    """Per-pixel weighted CE, optionally keeping only the top-k hardest
    pixels (OHEM, reference salsanext.py:251-259).  logits (..., C)."""
    c = logits.shape[-1]
    flat_logits = logits.reshape(-1, c).astype(jnp.float32)
    flat_labels = jnp.clip(labels.reshape(-1), 0, c - 1)
    flat_valid = valid.reshape(-1)
    lp = jax.nn.log_softmax(flat_logits, axis=-1)
    nll = -label_lp(lp, flat_labels)
    w = class_weight[flat_labels] * flat_valid.astype(jnp.float32)
    pixel_losses = nll * w
    if top_k_percent >= 1.0:
        return jnp.sum(pixel_losses) / jnp.maximum(jnp.sum(w), 1e-8)
    k = max(1, int(top_k_percent * pixel_losses.shape[0]))
    top, _ = jax.lax.top_k(pixel_losses, k)
    return jnp.mean(top)


def boundary_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    valid: jnp.ndarray,
    *,
    theta0: int = 3,
) -> jnp.ndarray:
    """Boundary F1 loss (Bokhovkin et al.; reference range/utils.py:665-720):
    boundary maps via max-pool of (1 - onehot/prob), precision/recall over
    boundary pixels, loss = 1 - F1 averaged over classes."""
    n, h, w, c = logits.shape
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    onehot = jax.nn.one_hot(jnp.clip(labels, 0, c - 1), c, dtype=jnp.float32)
    onehot = onehot * valid[..., None].astype(jnp.float32)

    def boundary(x):
        pooled = jax.lax.reduce_window(
            1.0 - x,
            -jnp.inf,
            jax.lax.max,
            (1, theta0, theta0, 1),
            (1, 1, 1, 1),
            "SAME",
        )
        return pooled - (1.0 - x)

    gt_b = boundary(onehot).reshape(n, -1, c)
    pr_b = boundary(probs).reshape(n, -1, c)
    inter = jnp.sum(pr_b * gt_b, axis=1)
    precision = inter / (jnp.sum(pr_b, axis=1) + 1e-7)
    recall = inter / (jnp.sum(gt_b, axis=1) + 1e-7)
    f1 = 2 * precision * recall / (precision + recall + 1e-7)
    return jnp.mean(1.0 - f1)


def salsanext_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    valid: jnp.ndarray,
    *,
    class_weight: jnp.ndarray,
    top_k_percent: float = 1.0,
    ls_weight: float = 3.0,
    bd_weight: float = 1.0,
) -> jnp.ndarray:
    """1.0*WCE + 3.0*Lovasz + 1.0*Boundary (reference salsanext.py:270)."""
    loss = weighted_ce_image(
        logits, labels, valid,
        class_weight=class_weight, top_k_percent=top_k_percent,
    )
    if ls_weight:
        c = logits.shape[-1]
        loss = loss + ls_weight * lovasz_softmax(
            logits.reshape(-1, c),
            labels.reshape(-1),
            valid.reshape(-1) & (labels.reshape(-1) != 0),
        )
    if bd_weight:
        loss = loss + bd_weight * boundary_loss(logits, labels, valid)
    return loss
