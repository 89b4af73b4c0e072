"""Mask-distillation (KD) training step — the TASeg teacher/student stage.

Capability match of the reference MinkUNetMsKd
(`pcseg/model/segmentor/voxel/minkunet/minkunet_ms_kd.py:532-640`): a
frozen teacher MinkUNet runs on the GT-mask-selected fused cloud, the
student on the pseudo-mask cloud; tri-scale point features of coordinate-
matched voxels are distilled with MSE x FEAT_KD_WEIGHT on <= MAX_VOXEL
sampled pairs per scan.

TPU-first differences: the voxel alignment (reference: sphashquery on
device per step, :613-615) is computed on the HOST at collate time — both
clouds are host-resident there, so the device receives a fixed-capacity
(kd_student_idx, kd_teacher_idx, kd_mask) pair table and only gathers.
Teacher parameters live outside the optimizer state (frozen by
construction, replacing `fix_part_param` + ckpt key remapping,
:680-722).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import struct
from jax.sharding import Mesh, PartitionSpec as P

from ..models.voxel.backbone_context import UNetCapacities, build_unet_topology
from ..ops import PointSet
from . import DATA_AXIS, Batch, TrainState, batch_pspec, optax_global_norm


@struct.dataclass
class KdBatch:
    student: Batch  # pseudo-mask fused clouds
    teacher: Batch  # GT-mask fused clouds
    kd_student_idx: jnp.ndarray  # (R, K) rows into the student point set
    kd_teacher_idx: jnp.ndarray  # (R, K) matching rows in the teacher set
    kd_mask: jnp.ndarray  # (R, K) bool — valid sampled pairs


def kd_batch_pspec() -> KdBatch:
    return KdBatch(
        student=batch_pspec(),
        teacher=batch_pspec(),
        kd_student_idx=P(DATA_AXIS),
        kd_teacher_idx=P(DATA_AXIS),
        kd_mask=P(DATA_AXIS),
    )


def make_kd_train_step(
    model,
    criterion,
    tx,
    caps: UNetCapacities,
    teacher_caps: UNetCapacities,
    mesh: Mesh,
    *,
    feat_kd_weight: float = 10.0,
    donate: bool = True,
) -> Callable:
    """Returns jitted fn(state, teacher_params, teacher_stats, batch, rng)."""

    def local_step(state: TrainState, t_params, t_stats, kb: KdBatch, rng):
        sb, tb = kb.student, kb.teacher
        s_points = PointSet(
            coords=sb.point_coords[0], feats=sb.point_feats[0],
            num=sb.num_points[0, 0],
        )
        t_points = PointSet(
            coords=tb.point_coords[0], feats=tb.point_feats[0],
            num=tb.num_points[0, 0],
        )
        s_topo = build_unet_topology(s_points.coords, s_points.num, caps)
        t_topo = build_unet_topology(
            t_points.coords, t_points.num, teacher_caps
        )
        labels = sb.labels[0]
        pvalid = s_points.valid_mask()
        s_idx = kb.kd_student_idx[0]
        t_idx = kb.kd_teacher_idx[0]
        kd_mask = kb.kd_mask[0]

        shard_rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))

        # frozen teacher forward (no grad, running stats only)
        _, t_feats = model.apply(
            {"params": t_params, "batch_stats": t_stats},
            t_points, t_topo, False, True,
        )
        t_feats = jax.lax.stop_gradient(t_feats)

        def loss_fn(params):
            (logits, s_feats), updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                s_points, s_topo, True, True,
                rngs={"dropout": shard_rng},
                mutable=["batch_stats"],
            )
            loss_seg = criterion(logits, labels, pvalid)
            fs = s_feats[jnp.clip(s_idx, 0)]
            ft = t_feats[jnp.clip(t_idx, 0)]
            m = kd_mask.astype(jnp.float32)[:, None]
            loss_kd = jnp.sum(((fs - ft) ** 2) * m) / jnp.maximum(
                jnp.sum(m) * fs.shape[-1], 1.0
            )
            loss = loss_seg + feat_kd_weight * loss_kd
            return loss, (updates["batch_stats"], loss_seg, loss_kd)

        (loss, (new_stats, loss_seg, loss_kd)), grads = jax.value_and_grad(
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
        metrics = {
            "loss": loss,
            "loss_seg": jax.lax.pmean(loss_seg, DATA_AXIS),
            "loss_feat_kd": jax.lax.pmean(loss_kd, DATA_AXIS),
            "grad_norm": optax_global_norm(grads),
        }
        return new_state, metrics

    step = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P(), P(), kd_batch_pspec(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(step, donate_argnums=(0,) if donate else ())
