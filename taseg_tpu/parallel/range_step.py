"""SPMD train/eval steps for range-view (dense 2D) segmentors.

The range branch is plain dense NHWC compute, so the steps are ordinary
shard_map data parallelism without sparse topology: images (R, B, H, W, C)
sharded on the leading mesh axis, grads `pmean`-ed, confusion histograms
`psum`-ed.  Losses follow the reference recipe (WCE(+top-k) + 3x Lovasz +
Boundary; CENet adds 1.25/1/1/1-weighted deep supervision,
cenet.py:248-283).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import struct
from jax.sharding import Mesh, PartitionSpec as P

from ..loss.range import salsanext_loss
from ..utils.metrics import confusion_hist
from . import DATA_AXIS, TrainState, optax_global_norm


@struct.dataclass
class RangeBatch:
    scan: jnp.ndarray  # (R, B, H, W, C)
    label: jnp.ndarray  # (R, B, H, W)
    mask: jnp.ndarray  # (R, B, H, W)


def range_batch_pspec() -> RangeBatch:
    return RangeBatch(scan=P(DATA_AXIS), label=P(DATA_AXIS), mask=P(DATA_AXIS))


def make_range_train_step(
    model,
    tx,
    mesh: Mesh,
    class_weight: jnp.ndarray,
    *,
    top_k_percent: float = 1.0,
    ls_weight: float = 3.0,
    bd_weight: float = 1.0,
    aux: bool = False,
    donate: bool = True,
) -> Callable:
    def local_step(state: TrainState, batch: RangeBatch, rng):
        scan = batch.scan[0]
        label = batch.label[0]
        valid = (batch.mask[0] > 0) & (batch.label[0] != 0)
        shard_rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))

        def loss_fn(params):
            out, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                scan, True,
                rngs={"dropout": shard_rng}, mutable=["batch_stats"],
            )
            if aux and isinstance(out, tuple):
                logits, aux_logits = out
                loss = 1.25 * salsanext_loss(
                    logits, label, valid, class_weight=class_weight,
                    top_k_percent=top_k_percent,
                    ls_weight=ls_weight, bd_weight=bd_weight,
                )
                for al in aux_logits:
                    loss = loss + salsanext_loss(
                        al, label, valid, class_weight=class_weight,
                        ls_weight=ls_weight, bd_weight=bd_weight,
                    )
            else:
                logits = out
                loss = salsanext_loss(
                    logits, label, valid, class_weight=class_weight,
                    top_k_percent=top_k_percent,
                    ls_weight=ls_weight, bd_weight=bd_weight,
                )
            return loss, updates["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
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
        local_step,
        mesh=mesh,
        in_specs=(P(), range_batch_pspec(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_range_eval_step(
    model, mesh: Mesh, num_classes: int
) -> Callable:
    def local_eval(params, batch_stats, batch: RangeBatch):
        scan = batch.scan[0]
        label = batch.label[0]
        valid = (batch.mask[0] > 0) & (label != 0)
        logits = model.apply(
            {"params": params, "batch_stats": batch_stats}, scan, False
        )
        pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        hist = confusion_hist(
            pred.reshape(-1), label.reshape(-1), valid.reshape(-1), num_classes
        )
        hist = jax.lax.psum(hist, DATA_AXIS)
        return hist, logits[None]

    ev = jax.shard_map(
        local_eval,
        mesh=mesh,
        in_specs=(P(), P(), range_batch_pspec()),
        out_specs=(P(), P(DATA_AXIS)),
        check_vma=False,
    )
    return jax.jit(ev)
