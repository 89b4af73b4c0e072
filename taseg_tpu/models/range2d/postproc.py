"""Range-view post-processing: KNN label cleanup (device, JAX).

Equivalent of the reference GPU KNN
(`pcseg/model/segmentor/range/rangenet/postproc/KNN.py:36-142`): for each
point, look at a (ks x ks) window of range-image pixels around its
projected location, take the k nearest by |pixel range - point range|
(optionally gaussian-weighted), and majority-vote their predicted labels.
Static shapes: the window unfold is a stack of shifted images; the vote is
a one-hot matmul instead of a scatter.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def knn_postprocess(
    proj_range: jnp.ndarray,  # (H, W) projected range image
    unproj_range: jnp.ndarray,  # (P,) per-point range
    proj_argmax: jnp.ndarray,  # (H, W) int32 predicted labels
    px: jnp.ndarray,  # (P,) point -> column
    py: jnp.ndarray,  # (P,) point -> row
    *,
    num_classes: int,
    k: int = 5,
    kernel_size: int = 5,
    sigma: float = 1.0,
    cutoff: float = 1.0,
) -> jnp.ndarray:
    """Returns (P,) cleaned per-point labels."""
    h, w = proj_range.shape
    half = kernel_size // 2

    # inverse gaussian distance penalty per window offset (KNN.py:71-82)
    xs = np.arange(-half, half + 1)
    g = np.exp(-(xs[:, None] ** 2 + xs[None, :] ** 2) / (2 * sigma**2))
    inv_gauss = (1.0 - g.reshape(-1)).astype(np.float32)  # (ks*ks,)

    # unfold: (ks*ks, H, W) shifted copies, out-of-image -> +inf range
    shifted_r = []
    shifted_l = []
    big = jnp.float32(1e9)
    padded_r = jnp.pad(
        proj_range, ((half, half), (half, half)), constant_values=1e9
    )
    padded_l = jnp.pad(proj_argmax, ((half, half), (half, half)))
    for dy in range(kernel_size):
        for dx in range(kernel_size):
            shifted_r.append(
                jax.lax.dynamic_slice(padded_r, (dy, dx), (h, w))
            )
            shifted_l.append(
                jax.lax.dynamic_slice(padded_l, (dy, dx), (h, w))
            )
    win_range = jnp.stack(shifted_r)  # (K2, H, W)
    win_label = jnp.stack(shifted_l)

    # per-point windows
    pr = win_range[:, py, px]  # (K2, P)
    pl = win_label[:, py, px]
    dist = jnp.abs(pr - unproj_range[None, :])
    dist = dist * jnp.asarray(inv_gauss)[:, None] + dist  # gaussian weighting
    # k nearest per point
    neg_top, top_idx = jax.lax.top_k(-dist.T, k)  # (P, k)
    knn_dist = -neg_top
    knn_label = jnp.take_along_axis(pl.T, top_idx, axis=1)  # (P, k)
    # range cutoff: votes farther than cutoff are mapped to class 0 weight 0
    ok = knn_dist <= cutoff if cutoff > 0 else jnp.ones_like(knn_dist, bool)
    votes = jax.nn.one_hot(knn_label, num_classes) * ok[..., None]
    counts = jnp.sum(votes, axis=1)  # (P, C)
    counts = counts.at[:, 0].set(-1.0)  # never vote the ignore class
    voted = jnp.argmax(counts, axis=-1).astype(jnp.int32)
    # fall back to the direct pixel label when no valid votes
    direct = proj_argmax[py, px]
    has_vote = jnp.sum(jnp.sum(votes, axis=1), axis=-1) > 0
    return jnp.where(has_vote, voted, direct)


def border_mask(
    label_img: jnp.ndarray,
    *,
    border_size: int = 1,
    kern_conn: int = 4,
    background_class: int | None = 0,
) -> jnp.ndarray:
    """(H, W) int labels -> (H, W) bool border pixels.

    Capability match of the reference borderMask module
    (`range/rangenet/postproc/borderMask.py:92-195`): a pixel is border
    when erosion (min over the 4- or 8-connected neighborhood, repeated
    `border_size` times) changes its class region; the background class is
    excluded so label/unlabeled transitions do not double-count."""
    lab = label_img
    if background_class is not None:
        # dilate real classes over the background first (reference :151)
        for _ in range(border_size):
            neigh = _neighbor_stack(lab, kern_conn)
            fill = jnp.max(neigh, axis=0)
            lab = jnp.where(lab == background_class, fill, lab)
    eroded = lab
    for _ in range(border_size):
        neigh = _neighbor_stack(eroded, kern_conn)
        same = jnp.all(neigh == eroded[None], axis=0)
        eroded = jnp.where(same, eroded, -1)
    border = eroded != lab
    if background_class is not None:
        border = border & (label_img != background_class)
    return border


def _neighbor_stack(x: jnp.ndarray, kern_conn: int) -> jnp.ndarray:
    offs = [(-1, 0), (1, 0), (0, -1), (0, 1)]
    if kern_conn == 8:
        offs += [(-1, -1), (-1, 1), (1, -1), (1, 1)]
    return jnp.stack(
        [jnp.roll(jnp.roll(x, dy, 0), dx, 1) for dy, dx in offs]
    )


def crf_refine(
    prob: jnp.ndarray,
    xyz: jnp.ndarray,
    mask: jnp.ndarray,
    *,
    iters: int = 3,
    win_h: int = 3,
    win_w: int = 5,
    sigma_xyz: float = 0.7,
    compat: float = 1.0,
) -> jnp.ndarray:
    """Locally-connected CRF refinement over the range image.

    Capability match of the reference CRF post-processor
    (`range/rangenet/postproc/CRF.py:12-140`): each iteration computes a
    gaussian-in-xyz weighted neighborhood average of the class scores
    (the LocallyConnectedXYZLayer) and sharpens the unaries against it.
    prob: (H, W, C) softmax scores; xyz: (H, W, 3); mask: (H, W)."""
    m = mask.astype(prob.dtype)[..., None]
    p = prob * m
    offs = [
        (dy, dx)
        for dy in range(-(win_h // 2), win_h // 2 + 1)
        for dx in range(-(win_w // 2), win_w // 2 + 1)
        if not (dy == 0 and dx == 0)
    ]
    for _ in range(iters):
        msg = jnp.zeros_like(p)
        for dy, dx in offs:
            sx = jnp.roll(jnp.roll(xyz, dy, 0), dx, 1)
            sp = jnp.roll(jnp.roll(p, dy, 0), dx, 1)
            d2 = jnp.sum((xyz - sx) ** 2, axis=-1, keepdims=True)
            w = jnp.exp(-d2 / (2.0 * sigma_xyz**2))
            msg = msg + w * sp
        logit = jnp.log(jnp.clip(p, 1e-8, 1.0)) + compat * msg
        p = jax.nn.softmax(logit, axis=-1) * m
    return p
