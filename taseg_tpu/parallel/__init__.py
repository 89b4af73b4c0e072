"""SPMD data parallelism over a jax.sharding.Mesh.

The TPU-native replacement for the reference's DDP/NCCL stack
(`train.py:247-251`, `tools/utils/common/{common_utils,commu_utils}.py`):
one jitted program shard_map-ed over a ('data',) mesh axis — gradients are
`pmean`-ed over ICI, batch-norm statistics are `psum`-ed inside the model
(layers.MaskedBatchNorm), and eval confusion histograms are `psum`-ed
instead of the reference's pickle-tmpdir gather (common_utils.py:200-221).
Multi-host extends the same mesh over DCN via jax.distributed.initialize —
no launcher port-scanning (dist_train.sh:1-21) required.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import struct
from jax.sharding import Mesh, PartitionSpec as P

from ..models.voxel.backbone_context import UNetCapacities, build_unet_topology
from ..ops import PointSet
from ..utils.metrics import confusion_hist

DATA_AXIS = "data"


@struct.dataclass
class Batch:
    """One global batch, leading axis = data-parallel shards.

    Each shard row is an independently collated "super-sample": the points
    of its local scans concatenated with a batch-index column and padded to
    the static point capacity P.
    """

    point_coords: jnp.ndarray  # (R, P, 4) float32 — voxel-unit coords + batch
    point_feats: jnp.ndarray  # (R, P, C)
    labels: jnp.ndarray  # (R, P) int32
    num_points: jnp.ndarray  # (R, 1) int32


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray
    # optional stateful-loss statistics (e.g. EQLv2 gradient accumulators,
    # reference pcseg/loss/eqlv2.py keeps them as mutable module state);
    # None for stateless loss stacks
    loss_state: Any = None


def make_mesh(devices=None) -> Mesh:
    import os

    import numpy as np

    if devices is None:
        devices = jax.devices()
        # TASEG_NUM_DEVICES=n restricts the mesh to the first n local
        # devices (the single-process analogue of CUDA_VISIBLE_DEVICES in
        # the reference's launch scripts)
        n = int(os.environ.get("TASEG_NUM_DEVICES", "0"))
        if n > 0:
            devices = devices[:n]
    return Mesh(np.array(devices).reshape(-1), (DATA_AXIS,))


def make_global_batch(mesh: Mesh, batch_pytree):
    """Assemble per-process local shard arrays into global jax.Arrays.

    On multi-host, each process's loader produces only its local shards
    (leading axis = local device count); jitted shard_map over the global
    mesh requires globally-shaped `jax.Array`s whose addressable shards
    are the local data — `jax.make_array_from_process_local_data` builds
    exactly that.  Single-process: identity.  Replaces the reference's
    DistributedSampler + per-rank DataLoader pair (`common_utils.py:
    131-175`)."""
    if jax.process_count() == 1:
        return batch_pytree
    import numpy as np
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, P(DATA_AXIS))

    def conv(x):
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(x)
        )

    return jax.tree_util.tree_map(conv, batch_pytree)


def local_rows(x):
    """Per-process rows of a (R, ...) DATA_AXIS-sharded array as numpy,
    ordered by global shard index.  Single-process: plain np.asarray."""
    import numpy as np

    if jax.process_count() == 1:
        return np.asarray(x)
    shards = sorted(
        x.addressable_shards, key=lambda s: s.index[0].start or 0
    )
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


def batch_pspec() -> Batch:
    return Batch(
        point_coords=P(DATA_AXIS),
        point_feats=P(DATA_AXIS),
        labels=P(DATA_AXIS),
        num_points=P(DATA_AXIS),
    )


def make_train_step(
    model,
    criterion,
    tx,
    caps: UNetCapacities,
    mesh: Mesh,
    *,
    donate: bool = True,
    topo_kwargs: Optional[dict] = None,
    topology_fn: Optional[Callable] = None,
) -> Callable:
    """Build the jitted SPMD training step.

    Per shard: build sparse topology from local coords, forward + loss,
    grad; then `pmean` grads/loss over the mesh axis and apply the optax
    update identically on every shard (params stay replicated).
    `topology_fn(coords, num) -> topo` overrides the default UNet topology
    (e.g. Cylinder3D's asymmetric-kernel builder)."""

    def local_step(state: TrainState, batch: Batch, rng):
        # shard_map delivers local blocks with the leading shard axis of
        # size 1 — squeeze to the per-device view.
        coords = batch.point_coords[0]
        feats = batch.point_feats[0]
        labels = batch.labels[0]
        num_points = batch.num_points[0, 0]

        points = PointSet(coords=coords, feats=feats, num=num_points)
        if topology_fn is not None:
            topo = topology_fn(coords, num_points)
        else:
            topo = build_unet_topology(
                coords, num_points, caps, **(topo_kwargs or {})
            )
        pvalid = points.valid_mask()

        shard_rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))

        def loss_fn(params):
            logits, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                points,
                topo,
                True,
                rngs={"dropout": shard_rng},
                mutable=["batch_stats"],
            )
            if state.loss_state is not None:
                loss, new_loss_state = criterion(
                    logits, labels, pvalid, state.loss_state
                )
            else:
                loss = criterion(logits, labels, pvalid)
                new_loss_state = None
            return loss, (updates["batch_stats"], new_loss_state)

        (loss, (new_stats, new_loss_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        grads = jax.lax.pmean(grads, DATA_AXIS)
        loss = jax.lax.pmean(loss, DATA_AXIS)
        # BN stats were psum-ed inside the model -> identical across shards
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates
        )
        new_state = TrainState(
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
            step=state.step + 1,
            loss_state=new_loss_state,
        )
        metrics = {"loss": loss, "grad_norm": optax_global_norm(grads)}
        # capacity telemetry: true per-level voxel counts (pre-clipping);
        # the engine compares them against caps.voxels and warns — silent
        # capacity truncation must never masquerade as a model-quality
        # problem (round-1 review item 10)
        if hasattr(topo, "levels"):
            nums = jnp.stack([l.num for l in topo.levels])
            metrics["level_nums"] = jax.lax.pmax(nums, DATA_AXIS)
        return new_state, metrics

    step = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), batch_pspec(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def optax_global_norm(tree) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(l)) for l in leaves))


def make_eval_step(
    model, caps: UNetCapacities, mesh: Mesh, num_classes: int,
    *, topo_kwargs: Optional[dict] = None,
    topology_fn: Optional[Callable] = None,
    return_logits: bool = True,
) -> Callable:
    """Jitted SPMD eval step: per-point argmax -> confusion histogram,
    psum-ed over the mesh (replaces merge_results_dist,
    common_utils.py:200-221).  `return_logits=False` skips the (large)
    device->host logits transfer for plain mIoU eval — the reference also
    only materializes predictions when saving (train.py:539-540)."""

    def local_eval(params, batch_stats, batch: Batch):
        coords = batch.point_coords[0]
        feats = batch.point_feats[0]
        labels = batch.labels[0]
        num_points = batch.num_points[0, 0]
        points = PointSet(coords=coords, feats=feats, num=num_points)
        if topology_fn is not None:
            topo = topology_fn(coords, num_points)
        else:
            topo = build_unet_topology(
                coords, num_points, caps, devox_pairs=False,
                **(topo_kwargs or {}),
            )
        logits = model.apply(
            {"params": params, "batch_stats": batch_stats}, points, topo, False
        )
        pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        valid = points.valid_mask() & (labels != 0)
        hist = confusion_hist(pred, labels, valid, num_classes)
        hist = jax.lax.psum(hist, DATA_AXIS)
        # capacity telemetry for eval too (ADVICE r2): true per-level
        # voxel counts so trimmed schedules can never silently truncate
        if hasattr(topo, "levels"):
            nums = jnp.stack([l.num for l in topo.levels])
            nums = jax.lax.pmax(nums, DATA_AXIS)
        else:
            nums = jnp.zeros((0,), jnp.int32)
        out = logits[None] if return_logits else pred[None]
        return hist, out, nums  # (1,P,C) -> stacked (R,P,C) globally

    ev = jax.shard_map(
        local_eval,
        mesh=mesh,
        in_specs=(P(), P(), batch_pspec()),
        out_specs=(P(), P(DATA_AXIS), P()),
        check_vma=False,
    )
    return jax.jit(ev)
