"""RPVNet (fusion modality) SPMD train/eval steps.

The per-shard image stack keeps scans in a true batch dimension
(B, H, W, C) through the 2D range branch — 2D convs/pools must not bleed
features across scan boundaries — while the point<->range tables index
the row-major stacked (B*H, W) canvas (pxpy rows are pre-offset per scan
by the collate).  Mirrors the reference drive path (`rpvnet.py:632-716`
consuming `range_image`/`range_pxpy` from
`semantickitti_fusion.py:205-207`).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import struct
from jax.sharding import Mesh, PartitionSpec as P

from ..models.fusion.rpvnet import build_rpv_context
from ..models.voxel.backbone_context import UNetCapacities, build_unet_topology
from ..ops import PointSet
from ..utils.metrics import confusion_hist
from . import DATA_AXIS, Batch, TrainState, batch_pspec, optax_global_norm


@struct.dataclass
class FusionBatch:
    points: Batch
    range_image: jnp.ndarray  # (R, B, H, W, C)
    range_pxpy: jnp.ndarray  # (R, P, 2) float32, rows offset per scan


def fusion_batch_pspec() -> FusionBatch:
    return FusionBatch(
        points=batch_pspec(),
        range_image=P(DATA_AXIS),
        range_pxpy=P(DATA_AXIS),
    )


def _unpack(fb: FusionBatch, caps):
    pts = PointSet(
        coords=fb.points.point_coords[0], feats=fb.points.point_feats[0],
        num=fb.points.num_points[0, 0],
    )
    topo = build_unet_topology(
        pts.coords, pts.num, caps, point_voxel_strides=(1, 4, 16)
    )
    img = fb.range_image[0]  # (B, H, W, C): scans stay in the batch dim
    b, h, w, c = img.shape
    rpv = build_rpv_context(
        fb.range_pxpy[0, :, 0], fb.range_pxpy[0, :, 1],
        pts.valid_mask(), h, w, batch=b,
    )
    return pts, topo, rpv, img


def make_fusion_train_step(
    model, criterion, tx, caps: UNetCapacities, mesh: Mesh,
    *, donate: bool = True,
) -> Callable:
    def local_step(state: TrainState, fb: FusionBatch, rng):
        pts, topo, rpv, canvas = _unpack(fb, caps)
        labels = fb.points.labels[0]
        pvalid = pts.valid_mask()
        shard_rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))

        def loss_fn(params):
            logits, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                pts, topo, rpv, canvas, True,
                rngs={"dropout": shard_rng}, mutable=["batch_stats"],
            )
            loss = criterion(logits, labels, pvalid)
            return loss, updates["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        grads = jax.lax.pmean(grads, DATA_AXIS)
        loss = jax.lax.pmean(loss, DATA_AXIS)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates
        )
        new_state = TrainState(
            params=new_params, batch_stats=new_stats,
            opt_state=new_opt, step=state.step + 1,
        )
        return new_state, {
            "loss": loss, "grad_norm": optax_global_norm(grads)
        }

    step = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), fusion_batch_pspec(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_fusion_eval_step(
    model, caps: UNetCapacities, mesh: Mesh, num_classes: int
) -> Callable:
    def local_eval(params, batch_stats, fb: FusionBatch):
        pts, topo, rpv, canvas = _unpack(fb, caps)
        labels = fb.points.labels[0]
        logits = model.apply(
            {"params": params, "batch_stats": batch_stats},
            pts, topo, rpv, canvas, False,
        )
        pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        valid = pts.valid_mask() & (labels != 0)
        hist = confusion_hist(pred, labels, valid, num_classes)
        hist = jax.lax.psum(hist, DATA_AXIS)
        return hist, logits[None]

    ev = jax.shard_map(
        local_eval, mesh=mesh,
        in_specs=(P(), P(), fusion_batch_pspec()),
        out_specs=(P(), P(DATA_AXIS)),
        check_vma=False,
    )
    return jax.jit(ev)
