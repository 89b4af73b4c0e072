"""TIAF (temporal image aggregation & fusion) SPMD train/eval steps.

Capability match of the reference MinkUNetMsMm training stage
(`minkunet_ms_mm.py:517-535` five-term loss; `fix_part_param` staged
freezing, :569-572): the main MinkUNet branch arrives pretrained from the
FSA stage and frozen; only the image backbone, the lidar-FOV backbone and
the fusion/FOV heads train.  Freezing is an optax mask over parameter
names (utils.param_groups.freeze_except) instead of requires_grad=False.

The fov->main interpolation tables (reference voxel_to_point_fov,
minkunet/utils.py:150-170) are built inside the jitted step from the FOV
topology and main point coords — zero host round trips.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import struct
from jax.sharding import Mesh, PartitionSpec as P

from ..models.voxel.backbone_context import UNetCapacities, build_unet_topology
from ..ops import PointSet, trilinear_table
from ..utils.metrics import confusion_hist
from . import DATA_AXIS, Batch, TrainState, batch_pspec, optax_global_norm


@struct.dataclass
class TiafBatch:
    main: Batch  # fused FSA clouds
    fov: Batch  # FOV-cropped fused clouds (same quantization origin)
    fov_rowcol: jnp.ndarray  # (R, P_fov, 2) int32
    images: jnp.ndarray  # (R, B_img, H, W, 3)
    image_labels: jnp.ndarray  # (R, B_img, H, W) int32


def tiaf_batch_pspec() -> TiafBatch:
    return TiafBatch(
        main=batch_pspec(),
        fov=batch_pspec(),
        fov_rowcol=P(DATA_AXIS),
        images=P(DATA_AXIS),
        image_labels=P(DATA_AXIS),
    )


def _unpack(tb: TiafBatch, caps, fov_caps):
    main = PointSet(
        coords=tb.main.point_coords[0], feats=tb.main.point_feats[0],
        num=tb.main.num_points[0, 0],
    )
    fov = PointSet(
        coords=tb.fov.point_coords[0], feats=tb.fov.point_feats[0],
        num=tb.fov.num_points[0, 0],
    )
    topo = build_unet_topology(main.coords, main.num, caps)
    fov_topo = build_unet_topology(fov.coords, fov.num, fov_caps)
    # FOV voxels -> MAIN raw points (zero outside FOV): trilinear tables
    # against the fov topology's level coords
    fov_devox = {}
    for s in (1, 4, 16):
        lvl = s.bit_length() - 1
        fov_devox[s] = trilinear_table(
            main.coords, main.valid_mask(),
            fov_topo.levels[lvl].coords, fov_topo.levels[lvl].num, s,
            fov_topo.bounds,
        )
    return main, topo, fov, fov_topo, fov_devox


def make_tiaf_train_step(
    model,
    criterion,
    tx,
    caps: UNetCapacities,
    fov_caps: UNetCapacities,
    mesh: Mesh,
    *,
    loss_weight=(0.0, 1.0, 0.5, 0.5, 1.0),
    donate: bool = True,
) -> Callable:
    """loss_weight order matches the reference LOSS_WEIGHT config:
    [lidar(main), fusion, image_sparse(FOV points), image_dense,
    image_lidar(FOV 3D head)] (minkunet_ms_mm.py:366, 517-535)."""
    w_lidar, w_fusion, w_img_s, w_img_d, w_img_lidar = loss_weight

    def local_step(state: TrainState, tb: TiafBatch, rng):
        main, topo, fov, fov_topo, fov_devox = _unpack(tb, caps, fov_caps)
        labels = tb.main.labels[0]
        fov_labels = tb.fov.labels[0]
        img_labels = tb.image_labels[0]
        rowcol = tb.fov_rowcol[0]
        images = tb.images[0]
        pvalid = main.valid_mask()
        fvalid = fov.valid_mask()
        shard_rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))

        def loss_fn(params):
            out, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                main, topo, fov, fov_topo, fov_devox, images, rowcol, True,
                rngs={"dropout": shard_rng},
                mutable=["batch_stats"],
            )
            nc = out["image_logits"].shape[-1]
            l_lidar = criterion(out["logits"], labels, pvalid)
            l_fusion = criterion(
                out["fusion_logits"], labels, pvalid & out["overlap"]
            )
            l_img_s = criterion(
                out["image_point_logits"], fov_labels, fvalid
            )
            l_img_d = criterion(
                out["image_logits"].reshape(-1, nc),
                img_labels.reshape(-1),
                jnp.ones(img_labels.size, bool),
            )
            l_img_lidar = criterion(
                out["fov_point_logits"], fov_labels, fvalid
            )
            loss = (
                w_lidar * l_lidar
                + w_fusion * l_fusion
                + w_img_s * l_img_s
                + w_img_d * l_img_d
                + w_img_lidar * l_img_lidar
            )
            aux = {
                "loss_lidar": l_lidar, "loss_fusion": l_fusion,
                "loss_image_s": l_img_s, "loss_image_d": l_img_d,
                "loss_image_lidar": l_img_lidar,
            }
            return loss, (updates["batch_stats"], aux)

        (loss, (new_stats, aux)), grads = jax.value_and_grad(
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
            "grad_norm": optax_global_norm(grads),
            **{k: jax.lax.pmean(v, DATA_AXIS) for k, v in aux.items()},
        }
        return new_state, metrics

    step = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), tiaf_batch_pspec(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_tiaf_eval_step(
    model, caps: UNetCapacities, fov_caps: UNetCapacities, mesh: Mesh,
    num_classes: int,
) -> Callable:
    """Replace-ensemble eval: fusion logits replace main logits on the
    overlap (minkunet_ms_mm.py:537-538 + ENSEMBLE_TYPE config)."""

    def local_eval(params, batch_stats, tb: TiafBatch):
        main, topo, fov, fov_topo, fov_devox = _unpack(tb, caps, fov_caps)
        labels = tb.main.labels[0]
        out = model.apply(
            {"params": params, "batch_stats": batch_stats},
            main, topo, fov, fov_topo, fov_devox,
            tb.images[0], tb.fov_rowcol[0], False,
        )
        logits = out["logits"]  # replace-ensemble applied in the model
        pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        valid = main.valid_mask() & (labels != 0)
        hist = confusion_hist(pred, labels, valid, num_classes)
        hist = jax.lax.psum(hist, DATA_AXIS)
        return hist, logits[None]

    ev = jax.shard_map(
        local_eval,
        mesh=mesh,
        in_specs=(P(), P(), tiaf_batch_pspec()),
        out_specs=(P(), P(DATA_AXIS)),
        check_vma=False,
    )
    return jax.jit(ev)
