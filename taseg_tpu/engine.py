"""Trainer / Evaluator — the harness around the SPMD step functions.

Capability match of the reference `train.py:128-668` Trainer: epoch loop
with step timing, LR scaling (`LR = shards x scans/shard x LR_PER_SAMPLE`,
train.py:285), checkpoint save/resume with old-checkpoint pruning
(train.py:326-362, 627), periodic evaluation with per-class IoU tables, and
metric logging.  Differences by design: AMP GradScaler is unnecessary
(bf16 on TPU needs no loss scaling); DDP wrap is replaced by the jitted
shard_map step; eval histogram merge is a psum instead of pickle files.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from .loss import Losses
from .models import build_segmentor
from .models.voxel.backbone_context import UNetCapacities
from .optim import build_optimizer
from .parallel import (
    Batch,
    TrainState,
    local_rows,
    make_eval_step,
    make_global_batch,
    make_mesh,
    make_train_step,
)
from .utils import storage
from .utils.common import StepTimer, create_logger
from .utils.metrics import format_confusion, miou_from_hist, per_class_iou
from .utils.tb import MetricsWriter


def batch_from_arrays(arrays: dict) -> Batch:
    return Batch(
        point_coords=jnp.asarray(arrays["point_coords"]),
        point_feats=jnp.asarray(arrays["point_feats"]),
        labels=jnp.asarray(arrays["labels"]),
        num_points=jnp.asarray(arrays["num_points"]),
    )


def _path_str(path) -> str:
    return "/".join(
        str(getattr(p, "key", getattr(p, "idx", p))) for p in path
    )


def load_matching_params(dst, src, *, strict: bool = False, logger=None):
    """Name+shape partial load with wrapper-scope tolerance: a dst leaf
    matches the src leaf with the identical path, or — when scopes differ
    (e.g. TIAF wraps the backbone under `main/`) — the unique src leaf
    whose path is a suffix of the dst path (or vice versa) with the same
    shape."""
    flat_src = {
        _path_str(p): v
        for p, v in jax.tree_util.tree_flatten_with_path(src)[0]
    }
    flat_dst, treedef = jax.tree_util.tree_flatten_with_path(dst)
    by_suffix: dict = {}
    for k, v in flat_src.items():
        parts = k.split("/")
        for i in range(len(parts)):
            by_suffix.setdefault("/".join(parts[i:]), []).append((k, v))
    new_leaves, loaded, skipped = [], 0, 0
    for path_k, leaf in flat_dst:
        key = _path_str(path_k)
        cand = flat_src.get(key)
        if cand is None:
            # wrapper-scope match: dst suffix must identify ONE src leaf
            parts = key.split("/")
            for i in range(1, len(parts)):
                hits = by_suffix.get("/".join(parts[i:]), [])
                hits = [v for _, v in hits if np.shape(v) == np.shape(leaf)]
                if len(hits) == 1:
                    cand = hits[0]
                    break
        if cand is not None and np.shape(cand) == np.shape(leaf):
            new_leaves.append(jnp.asarray(cand))
            loaded += 1
        else:
            if strict:
                raise KeyError(f"missing/mismatched param {key}")
            new_leaves.append(leaf)
            skipped += 1
    if logger is not None:
        logger.info(f"pretrained load: {loaded} matched, {skipped} kept")
    return jax.tree_util.tree_unflatten(treedef, new_leaves)



def _allreduce_hist(hist: np.ndarray) -> np.ndarray:
    """Sum per-process confusion histograms on multi-host (replaces the
    reference's pickle-tmpdir gather, common_utils.py:200-221)."""
    if jax.process_count() == 1:
        return hist
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(hist)).sum(0)


def _allreduce_mean_scalars(vals: tuple[float, ...]) -> tuple[float, ...]:
    """Mean of host-side scalar meters across processes (reference
    train.py:421-423 average-reduces the d/f/b step timers so every rank
    logs the fleet-wide timing, not its own)."""
    if jax.process_count() == 1:
        return vals
    from jax.experimental import multihost_utils

    stacked = np.asarray(
        multihost_utils.process_allgather(np.asarray(vals, np.float64))
    )
    return tuple(stacked.mean(0).tolist())


class Trainer:
    def __init__(
        self,
        cfg,
        train_loader,
        val_loader=None,
        *,
        output_dir: str = "output",
        logger=None,
        mesh=None,
        total_epochs: int | None = None,
    ):
        self.cfg = cfg
        self.logger = logger or create_logger()
        self.mesh = mesh or make_mesh()
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.output_dir = Path(output_dir)
        # checkpoints route through the storage backend so an `s3://`
        # CKPT_DIR works end-to-end (reference saves/prunes checkpoints on
        # Ceph the same way, train.py:319-324 + ceph.py:52-200); local
        # dirs keep the orbax layout
        ckpt_root = str(cfg.get("CKPT_DIR", "") or "")
        if storage.is_remote(ckpt_root):
            self.ckpt_dir = ckpt_root.rstrip("/")
        else:
            self.ckpt_dir = (
                Path(ckpt_root) if ckpt_root else self.output_dir / "ckpt"
            ).absolute()
            self.ckpt_dir.mkdir(parents=True, exist_ok=True)

        n_shards = train_loader.n_shards
        self.total_epochs = total_epochs or int(cfg.OPTIM.NUM_EPOCHS)
        iters_per_epoch = max(len(train_loader), 1)

        num_class = int(cfg.MODEL.get("NUM_CLASS", 20))
        self.num_class = num_class
        self.model = build_segmentor(cfg.MODEL, num_class)

        # modality x model dispatch (reference train.py builds everything
        # through the same CLI for every family, docs/TASeg_Sem.md:3-37)
        name = cfg.MODEL["NAME"]
        modality = str(cfg.get("MODALITY", "voxel"))
        if modality == "range":
            self.kind = "range"
        elif name in ("MinkUNetMsMm", "MinkUNetMsMmNus"):
            self.kind = "tiaf"
        elif name == "MinkUNetMsKd":
            self.kind = "kd"
        elif name == "Cylinder_TS":
            self.kind = "cylinder"
        elif name == "RPVNet":
            self.kind = "fusion"
        else:
            self.kind = "voxel"

        # linear LR scaling over the GLOBAL batch (reference train.py:285
        # LR = n_gpu x bs/gpu x lr_per_sample; on multi-host the global
        # batch spans every process)
        lr_per_sample = float(cfg.OPTIM.LR_PER_SAMPLE)
        scans_per_batch = getattr(
            train_loader, "global_scans_per_batch",
            train_loader.scans_per_batch,
        )
        lr = lr_per_sample * scans_per_batch
        optim_cfg = dict(cfg.OPTIM)
        optim_cfg["LR"] = lr
        self.tx = build_optimizer(
            optim_cfg, iters_per_epoch, self.total_epochs,
            clip_grad_norm=float(cfg.OPTIM.get("GRAD_NORM_CLIP", 10.0)),
        )

        loss_cfg = cfg.MODEL.get(
            "LOSS_CONFIG",
            {"LOSS_TYPES": ["CELoss", "LovLoss"], "LOSS_WEIGHTS": [1.0, 1.0]},
        )
        self.criterion = Losses(
            loss_cfg.get("LOSS_TYPES", ["CELoss", "LovLoss"]),
            loss_cfg.get("LOSS_WEIGHTS", [1.0, 1.0]),
            ignore_index=int(cfg.MODEL.get("IGNORE_LABEL", 0)),
            label_smoothing=float(cfg.MODEL.get("LABEL_SMOOTHING", 0.0)),
            gs_groups=loss_cfg.get("GS_GROUPS"),
            gs_fg_classes=loss_cfg.get("GS_FG_CLASSES"),
            axis_name="data" if cfg.MODEL.get("IF_DIST", False) else None,
        )

        # MODEL.CAPACITY_SCHEDULE: per-level voxel-capacity fractions of
        # the point capacity (tighter schedules cut padding waste on every
        # gather/sort/matmul; overflow telemetry on train AND eval steps
        # backstops them)
        self.caps = UNetCapacities.for_points(
            train_loader.point_capacity,
            schedule=cfg.MODEL.get("CAPACITY_SCHEDULE"),
        )
        # model-specific topology extras (e.g. SPVCNN's point branch)
        self.topo_kwargs = (
            {"point_voxel_strides": (1, 4, 16)}
            if cfg.MODEL["NAME"] in ("SPVCNN", "RPVNet")
            else {}
        )
        # host pipelines that emit key-sorted scans (VoxelPipeline and
        # subclasses) let the level-0 unique skip its device-side sort
        if getattr(
            getattr(train_loader, "pipeline", None), "sorted_points", False
        ):
            self.topo_kwargs["assume_sorted_points"] = True
        if self.kind == "tiaf":
            self.fov_caps = UNetCapacities.for_points(
                train_loader.fov_capacity or train_loader.point_capacity
            )
        self.state = self._init_state()
        # staged-recipe freezing (reference fix_part_param,
        # minkunet_ms_mm.py:569-572): train only the listed module
        # prefixes, freeze the rest via an optax mask
        if cfg.MODEL.get("FIX_PART_PARAM", False):
            from .utils.param_groups import freeze_except

            trainable = list(
                cfg.MODEL.get(
                    "TRAINABLE_PREFIXES",
                    ["image_backbone", "lidar_backbone",
                     "classifier_fusion", "classifier_fov"],
                )
            )
            self.tx = freeze_except(self.tx, self.state.params, trainable)
            self.state = self.state.replace(
                opt_state=self.tx.init(self.state.params)
            )
            self.logger.info(f"fix_part_param: training only {trainable}")
        self._build_steps()
        self.start_epoch = 0
        self._capacity_overflows = 0
        self.ckptr = storage.CheckpointIO()
        self.writer = MetricsWriter(self.output_dir / "metrics")

    # ------------- modality / model step dispatch -------------------------
    def _build_steps(self):
        """Wire the SPMD train/eval steps for this config's modality+model
        (reference: one CLI drives every family, train.py:128-268)."""
        cfg, num_class = self.cfg, self.num_class
        if self.kind == "voxel":
            self.train_step = make_train_step(
                self.model, self.criterion, self.tx, self.caps, self.mesh,
                topo_kwargs=self.topo_kwargs,
            )
            self.eval_step = make_eval_step(
                self.model, self.caps, self.mesh, num_class,
                topo_kwargs=self.topo_kwargs,
            )
        elif self.kind == "cylinder":
            from .models.voxel.cylinder3d import build_cylinder_topology

            grid = tuple(cfg.DATA.get("GRID_SIZE", (480, 360, 32)))

            def topo_fn(coords, num):
                return build_cylinder_topology(coords, num, self.caps)

            self.train_step = make_train_step(
                self.model, self.criterion, self.tx, self.caps, self.mesh,
                topology_fn=topo_fn,
            )
            self.eval_step = make_eval_step(
                self.model, self.caps, self.mesh, num_class,
                topology_fn=topo_fn,
            )
            del grid
        elif self.kind == "kd":
            from .parallel.kd import make_kd_train_step

            teacher_caps = UNetCapacities.for_points(
                self.train_loader.teacher_capacity
                or self.train_loader.point_capacity
            )
            kd_step = make_kd_train_step(
                self.model, self.criterion, self.tx, self.caps,
                teacher_caps, self.mesh,
                feat_kd_weight=float(
                    cfg.MODEL.get("FEAT_KD_WEIGHT", 10.0)
                ),
            )
            self.teacher_params = None
            self.teacher_stats = None

            def step(state, batch, rng):
                assert self.teacher_params is not None, (
                    "KD stage needs MODEL.TEACHER_CKPT (or call "
                    "set_teacher) before training"
                )
                return kd_step(
                    state, self.teacher_params, self.teacher_stats,
                    batch, rng,
                )

            self.train_step = step
            # eval runs the student alone on its fused cloud
            self.eval_step = make_eval_step(
                self.model, self.caps, self.mesh, num_class,
            )
        elif self.kind == "tiaf":
            from .parallel.tiaf import (
                make_tiaf_eval_step,
                make_tiaf_train_step,
            )

            fov_caps = self.fov_caps
            self.train_step = make_tiaf_train_step(
                self.model, self.criterion, self.tx, self.caps, fov_caps,
                self.mesh,
                loss_weight=tuple(
                    cfg.MODEL.get("LOSS_WEIGHT", (0.0, 1.0, 0.5, 0.5, 1.0))
                ),
            )
            self.eval_step = make_tiaf_eval_step(
                self.model, self.caps, fov_caps, self.mesh, num_class
            )
        elif self.kind == "fusion":
            from .parallel.fusion_step import (
                make_fusion_eval_step,
                make_fusion_train_step,
            )

            self.train_step = make_fusion_train_step(
                self.model, self.criterion, self.tx, self.caps, self.mesh,
            )
            self.eval_step = make_fusion_eval_step(
                self.model, self.caps, self.mesh, num_class
            )
        elif self.kind == "range":
            from .loss.range import range_class_weights
            from .parallel.range_step import (
                make_range_eval_step,
                make_range_train_step,
            )

            lw = cfg.MODEL.get("LOSS_CONFIG", {})
            class_w = range_class_weights(
                str(cfg.DATA.get("DATASET", "semantickitti")),
                self.num_class,
                override=lw.get("CLASS_WEIGHT"),
            )
            self.train_step = make_range_train_step(
                self.model, self.tx, self.mesh,
                jnp.asarray(class_w),
                top_k_percent=float(lw.get("TOP_K_PERCENT", 1.0)),
                ls_weight=float(lw.get("LS_WEIGHT", 3.0)),
                bd_weight=float(lw.get("BD_WEIGHT", 1.0)),
                aux=bool(cfg.MODEL.get("IF_AUX", False)),
            )
            self.eval_step = make_range_eval_step(
                self.model, self.mesh, num_class
            )
        else:
            raise NotImplementedError(self.kind)

    def set_teacher(self, params, batch_stats):
        """Install frozen teacher variables for the KD stage (replaces the
        reference's ckpt key remapping stem->stem_gt..., minkunet_ms_kd.py:
        680-717 — here the teacher is simply a second parameter tree)."""
        self.teacher_params = params
        self.teacher_stats = batch_stats

    def load_teacher(self, path: str):
        # the KD teacher shares the student architecture (reference loads
        # the student ckpt into `*_gt` teacher keys, minkunet_ms_kd.py:
        # 689-714) so the live state serves as the restore template
        payload = self.ckptr.restore(
            path, item={"state": jax.device_get(self.state), "epoch": 0}
        )
        restored = payload["state"]
        self.set_teacher(restored.params, restored.batch_stats)
        self.logger.info(f"loaded frozen KD teacher from {path}")

    def _to_batch(self, arrays: dict):
        """arrays dict -> the step function's batch pytree, per kind.
        On multi-host the local shard arrays are assembled into global
        jax.Arrays over the mesh (parallel.make_global_batch)."""
        return make_global_batch(self.mesh, self._to_local_batch(arrays))

    def _to_local_batch(self, arrays: dict):
        if self.kind == "range":
            from .parallel.range_step import RangeBatch

            return RangeBatch(
                scan=jnp.asarray(arrays["scan"]),
                label=jnp.asarray(arrays["label"]),
                mask=jnp.asarray(arrays["mask"]),
            )
        if self.kind == "fusion" and "range_image" in arrays:
            from .parallel.fusion_step import FusionBatch

            vox = {k: arrays[k] for k in
                   ("point_coords", "point_feats", "labels", "num_points")}
            return FusionBatch(
                points=batch_from_arrays(vox),
                range_image=jnp.asarray(arrays["range_image"]),
                range_pxpy=jnp.asarray(arrays["range_pxpy"]),
            )
        if self.kind == "tiaf" and "main" in arrays:
            from .parallel.tiaf import TiafBatch

            return TiafBatch(
                main=batch_from_arrays(arrays["main"]),
                fov=batch_from_arrays(arrays["fov"]),
                fov_rowcol=jnp.asarray(arrays["fov_rowcol"]),
                images=jnp.asarray(arrays["images"]),
                image_labels=jnp.asarray(arrays["image_labels"]),
            )
        if self.kind == "kd" and "student" in arrays:
            from .parallel.kd import KdBatch

            return KdBatch(
                student=batch_from_arrays(arrays["student"]),
                teacher=batch_from_arrays(arrays["teacher"]),
                kd_student_idx=jnp.asarray(arrays["kd_student_idx"]),
                kd_teacher_idx=jnp.asarray(arrays["kd_teacher_idx"]),
                kd_mask=jnp.asarray(arrays["kd_mask"]),
            )
        return batch_from_arrays(arrays)

    def _to_eval_batch(self, arrays: dict):
        if self.kind == "kd" and "student" in arrays:
            return make_global_batch(
                self.mesh, batch_from_arrays(arrays["student"])
            )
        return self._to_batch(arrays)

    def _init_state(self) -> TrainState:
        loader = self.train_loader
        if len(loader) == 0:
            raise ValueError(
                f"empty train loader: {len(loader.reader)} scans < one "
                f"global batch of {loader.global_scans_per_batch} "
                f"(n_shards x scans_per_shard x processes) — lower "
                f"--batch_size or OPTIM.BATCH_SIZE_PER_GPU"
            )
        arrays, _ = next(iter(loader))
        rng = {"params": jax.random.PRNGKey(int(self.cfg.get("SEED", 0)))}

        if self.kind == "range":
            scan = jnp.asarray(arrays["scan"][0])
            variables = jax.jit(
                lambda s: self.model.init(rng, s, False)
            )(scan)
        elif self.kind == "fusion":
            from .parallel.fusion_step import _unpack as _unpack_f

            fb = self._to_local_batch(arrays)

            def _initf(fb):
                pts, topo, rpv, canvas = _unpack_f(fb, self.caps)
                return self.model.init(rng, pts, topo, rpv, canvas, False)

            variables = jax.jit(_initf)(
                jax.tree_util.tree_map(lambda x: x[:1], fb)
            )
        elif self.kind == "tiaf":
            from .parallel.tiaf import _unpack

            tb = self._to_local_batch(arrays)

            def _init(tb):
                main, topo, fov, fov_topo, fov_devox = _unpack(
                    tb, self.caps, self.fov_caps
                )
                return self.model.init(
                    rng, main, topo, fov, fov_topo, fov_devox,
                    tb.images[0], tb.fov_rowcol[0], False,
                )

            variables = jax.jit(_init)(
                jax.tree_util.tree_map(lambda x: x[:1], tb)
            )
        else:
            # init on shard-local shapes
            from .ops import PointSet
            from .models.voxel.backbone_context import build_unet_topology

            if self.kind == "kd" and "student" in arrays:
                arrays = arrays["student"]
            coords = jnp.asarray(arrays["point_coords"][0])
            feats = jnp.asarray(arrays["point_feats"][0])
            num = jnp.asarray(arrays["num_points"][0, 0])

            # jit the whole init: eager init dispatches hundreds of
            # individual ops (minutes through the device tunnel); one
            # compiled program is orders of magnitude faster and hits the
            # persistent cache
            def _init(coords, feats, num):
                points = PointSet(coords=coords, feats=feats, num=num)
                if self.kind == "cylinder":
                    from .models.voxel.cylinder3d import (
                        build_cylinder_topology,
                    )

                    topo = build_cylinder_topology(coords, num, self.caps)
                else:
                    topo = build_unet_topology(
                        coords, num, self.caps, **self.topo_kwargs
                    )
                return self.model.init(rng, points, topo, False)

            variables = jax.jit(_init)(coords, feats, num)
        params = variables["params"]
        n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
        self.logger.info(f"model parameters: {n_params / 1e6:.2f} M")
        return TrainState(
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=self.tx.init(params),
            step=jnp.int32(0),
            # stateful-loss statistics (EQLv2 gradient accumulators) ride
            # in the train state and are psum-synced inside the loss
            loss_state=self.criterion.init_state(self.num_class),
        )

    # ---------------- checkpointing (reference train.py:326-362) ---------
    def save_checkpoint(self, epoch: int, max_keep: int = 30):
        """Save + prune through the storage backend, so a local dir and an
        `s3://` CKPT_DIR behave identically (reference train.py:319-324
        torch.saves to its Petrel client and prunes remote keys)."""
        path = f"{str(self.ckpt_dir).rstrip('/')}/checkpoint_epoch_{epoch}"
        payload = {
            "state": jax.device_get(self.state),
            "epoch": epoch,
        }
        self.ckptr.save(path, payload)
        kept = self.ckptr.list_epochs(self.ckpt_dir)
        for _, old in kept[:-max_keep]:
            self.ckptr.remove(old)
        self.logger.info(f"saved checkpoint {path}")

    def resume_latest(self) -> bool:
        """Auto-resume from the newest checkpoint (train.py:232-242)."""
        found = self.ckptr.list_epochs(self.ckpt_dir)
        if not found:
            return False
        payload = self.ckptr.restore(
            found[-1][1],
            item={"state": jax.device_get(self.state), "epoch": 0},
        )
        restored = payload["state"]
        self.state = TrainState(
            params=restored.params,
            batch_stats=restored.batch_stats,
            opt_state=restored.opt_state,
            step=jnp.asarray(restored.step),
            loss_state=getattr(restored, "loss_state", None),
        )
        self.start_epoch = int(payload["epoch"]) + 1
        self.logger.info(
            f"resumed from {found[-1][1]} (epoch {self.start_epoch - 1})"
        )
        return True

    def load_pretrained(self, path: str, strict: bool = False):
        """Partial name+shape-matched parameter load (reference
        base_segmentors.py:16-26).  Also matches across wrapper scopes so
        staged recipes work: an FSA MinkUNet checkpoint loads into the
        TIAF model's `main/...` subtree (the reference remaps ckpt keys
        for the same purpose, minkunet_ms_kd.py:689-714)."""
        payload = self.ckptr.restore(path)
        src = payload["state"] if "state" in payload else payload
        stats_src = None
        if hasattr(src, "params"):  # restored TrainState object (remote)
            stats_src = getattr(src, "batch_stats", None)
            src = src.params
        elif isinstance(src, dict) and "params" in src:
            # local orbax state dict, or a converted reference checkpoint
            # (convert_torchsparse_ckpt.py)
            stats_src = src.get("batch_stats")
            src = src["params"]
        new_stats = self.state.batch_stats
        if stats_src:
            new_stats = load_matching_params(
                new_stats, stats_src, strict=False, logger=self.logger
            )
        self.state = self.state.replace(
            params=load_matching_params(
                self.state.params, src, strict=strict, logger=self.logger
            ),
            batch_stats=new_stats,
        )

    # ---------------- loops ---------------------------------------------
    def _check_capacity(self, level_nums: np.ndarray):
        """Surface sparse-capacity overflow (LevelTopo.num > capacity):
        rulebook rows beyond a level's static capacity are dropped, so an
        undersized capacity silently degrades mIoU — log it loudly and
        keep a counter for the epoch summary."""
        caps = self.caps.voxels
        for l, num in enumerate(level_nums.reshape(-1)[: len(caps)]):
            if int(num) > caps[l]:
                self._capacity_overflows += 1
                if self._capacity_overflows <= 5 or (
                    self._capacity_overflows % 100 == 0
                ):
                    self.logger.warning(
                        f"CAPACITY OVERFLOW level {l}: {int(num)} voxels > "
                        f"capacity {caps[l]} — excess voxels are dropped; "
                        f"raise UNetCapacities schedule or NUM_POINTS "
                        f"({self._capacity_overflows} total overflows)"
                    )

    def train_one_epoch(self, epoch: int, rng) -> dict:
        import contextlib
        import os

        # structured tracing: TASEG_PROFILE_DIR=<dir> captures a JAX
        # profiler trace of the first epoch (xprof-compatible; the TPU
        # analogue of the reference's torch.autograd.profiler usage in
        # ts!examples/performance.py)
        prof_dir = os.environ.get("TASEG_PROFILE_DIR")
        ctx = (
            jax.profiler.trace(prof_dir)
            if prof_dir and epoch == self.start_epoch
            else contextlib.nullcontext()
        )
        with ctx:
            return self._train_one_epoch_inner(epoch, rng)

    def _train_one_epoch_inner(self, epoch: int, rng) -> dict:
        timer = StepTimer()
        losses = []
        for it, (arrays, _meta) in enumerate(self.train_loader):
            batch = self._to_batch(arrays)
            timer.data_done()
            self.state, metrics = self.train_step(
                self.state, batch, jax.random.fold_in(rng, it)
            )
            loss = float(metrics["loss"])
            timer.step_done()
            losses.append(loss)
            if "level_nums" in metrics:
                self._check_capacity(np.asarray(metrics["level_nums"]))
            step = int(self.state.step)
            self.writer.scalar("train/loss", loss, step)
            for k, v in metrics.items():
                if k in ("loss", "level_nums"):
                    continue
                try:
                    self.writer.scalar(f"train/{k}", float(v), step)
                except (TypeError, ValueError):
                    pass
            if it % max(len(self.train_loader) // 4, 1) == 0:
                d_avg, f_avg, b_avg = _allreduce_mean_scalars(
                    (timer.d_time.avg, timer.f_time.avg, timer.b_time.avg)
                )
                self.logger.info(
                    f"epoch {epoch} it {it}/{len(self.train_loader)} "
                    f"loss {loss:.4f} "
                    f"d_time {d_avg:.3f}s "
                    f"f_time {f_avg:.3f}s "
                    f"b_time {b_avg:.3f}s"
                )
        return {"loss": float(np.mean(losses)) if losses else float("nan")}

    def train(self, *, eval_interval: int = 0, rng=None):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        for epoch in range(self.start_epoch, self.total_epochs):
            stats = self.train_one_epoch(epoch, jax.random.fold_in(rng, epoch))
            self.logger.info(f"epoch {epoch} mean loss {stats['loss']:.4f}")
            self.save_checkpoint(epoch)
            if (
                eval_interval
                and self.val_loader is not None
                and (epoch + 1) % eval_interval == 0
            ):
                self.evaluate()

    # ------------- raw-point evaluation / TTA / submission ---------------
    def _map_shard_to_points(self, logits_r, meta_r):
        """Map one shard's voxel logits back to raw points (reference
        minkunet.py:436-455 eval loop, host side).  Yields
        (sample, point_logits (N_raw, C))."""
        offsets = meta_r["offsets"]
        padded = meta_r.get("padded")
        for b, s in enumerate(meta_r["samples"]):
            if padded and padded[b]:
                # final-partial-batch repeat: count each scan exactly once
                continue
            rows = logits_r[offsets[b]: offsets[b + 1]]
            pt_logits = rows[s.inverse_map]
            ms = getattr(s, "ms_pair", None)
            if ms is not None:
                # FSA: keep only current-frame raw points (point_mask
                # semantics, semantickitti_voxel_ms.py:204-210)
                pt_logits = pt_logits[: ms.num_frame_points]
                yield ms.frame, pt_logits
            else:
                yield s, pt_logits

    def _save_scan(self, save_path, sample, pred, logits=None):
        """Write one scan's predictions in the dataset's submission format
        (SemanticKITTI .label files or nuScenes uint8 _lidarseg.bin,
        reference train.py:476-559)."""
        if getattr(sample, "token", None) is not None:
            from .utils.submission import (
                save_nuscenes_predictions,
                write_nuscenes_submission_json,
            )

            save_nuscenes_predictions(save_path, sample.token, pred)
            write_nuscenes_submission_json(save_path)
            return
        from .utils.submission import save_logits, save_predictions

        if logits is not None:
            save_logits(save_path, sample.name, logits)
        save_predictions(save_path, sample.name, pred)

    def _run_eval_step(self, batch):
        """Invoke the family's eval step; newer voxel steps also return
        per-level voxel counts (capacity telemetry, checked here so a
        trimmed CAPACITY_SCHEDULE can never silently truncate at eval)."""
        out = self.eval_step(
            self.state.params, self.state.batch_stats, batch
        )
        if len(out) == 3:
            h, logits, nums = out
            nums = np.asarray(nums)
            if nums.size:
                self._check_capacity(nums)
            return h, logits
        return out

    def evaluate_points(
        self,
        *,
        tta_votes: int = 0,
        save_path=None,
        save_score: bool = False,
        class_names=None,
    ) -> dict:
        """Per-raw-point evaluation; with tta_votes > 0, deterministic
        rotation votes are softmax-summed per scan (reference
        train.py:452-611) and predictions can be written as submission /
        pseudo-mask label files."""
        if self.kind == "range":
            return self._evaluate_points_range(save_path=save_path)
        loader = self.val_loader
        hist = np.zeros((self.num_class, self.num_class), np.int64)
        n_scans = 0

        def accumulate(sample, pt_logits, votes_acc):
            key = sample.name
            prob = jax.nn.softmax(jnp.asarray(pt_logits), axis=-1)
            if key in votes_acc:
                votes_acc[key] = votes_acc[key] + np.asarray(prob)
            else:
                votes_acc[key] = np.asarray(prob)

        if tta_votes <= 0:
            for arrays, meta in loader:
                batch = self._to_eval_batch(arrays)
                _, logits = self._run_eval_step(batch)
                logits = local_rows(logits)
                for r, meta_r in enumerate(meta):
                    for sample, pt_logits in self._map_shard_to_points(
                        logits[r], meta_r
                    ):
                        n = sample.num_raw_points
                        pred = pt_logits[:n].argmax(-1)
                        labels = sample.raw_labels[:n]
                        keep = labels != 0
                        hist += np.bincount(
                            labels[keep] * self.num_class
                            + np.clip(pred[keep], 0, self.num_class - 1),
                            minlength=self.num_class**2,
                        ).reshape(self.num_class, self.num_class)
                        if save_path is not None:
                            self._save_scan(
                                save_path, sample, pred,
                                pt_logits[:n] if save_score else None,
                            )
                        n_scans += 1
        else:
            # scan-major through the loader's public deterministic-votes
            # API: all votes of one batch of scans are accumulated and
            # finalized before moving on, bounding memory to one batch
            for per_vote in loader.iter_tta(tta_votes):
                votes_acc: dict = {}
                scan_meta: dict = {}
                for arrays, meta in per_vote:
                    batch = self._to_eval_batch(arrays)
                    _, logits = self._run_eval_step(batch)
                    logits = local_rows(logits)
                    for r, meta_r in enumerate(meta):
                        for sample, pt_logits in self._map_shard_to_points(
                            logits[r], meta_r
                        ):
                            accumulate(sample, pt_logits, votes_acc)
                            scan_meta[sample.name] = sample
                for name, prob in votes_acc.items():
                    sample = scan_meta[name]
                    n = sample.num_raw_points
                    pred = prob[:n].argmax(-1)
                    labels = sample.raw_labels[:n]
                    keep = labels != 0
                    hist += np.bincount(
                        labels[keep] * self.num_class
                        + np.clip(pred[keep], 0, self.num_class - 1),
                        minlength=self.num_class**2,
                    ).reshape(self.num_class, self.num_class)
                    if save_path is not None:
                        self._save_scan(save_path, sample, pred, None)
                    n_scans += 1

        hist = _allreduce_hist(hist)
        miou = miou_from_hist(hist, ignore_index=0)
        self.logger.info(f"point-eval mIoU {miou:.2f} over {n_scans} scans")
        return {"miou": miou, "hist": hist}

    def _evaluate_points_range(self, *, save_path=None) -> dict:
        """Raw-point eval for the range modality: per-pixel argmax mapped
        back to points through the stored (proj_x, proj_y) + the KNN
        range-consistency cleanup (reference range/utils.py:209-273,
        rangenet/postproc/KNN.py:36-142)."""
        import jax.numpy as jnp

        from .models.range2d.postproc import knn_postprocess

        hist = np.zeros((self.num_class, self.num_class), np.int64)
        n_scans = 0
        for arrays, meta in self.val_loader:
            batch = self._to_eval_batch(arrays)
            _, logits = self._run_eval_step(batch)
            logits = local_rows(logits)  # (R_local, B, H, W, C)
            scans = np.asarray(arrays["scan"])
            for r, meta_r in enumerate(meta):
                padded = meta_r.get("padded")
                for b, s in enumerate(meta_r["samples"]):
                    if padded and padded[b]:
                        continue
                    pix_argmax = logits[r, b].argmax(-1).astype(np.int32)
                    proj_range = scans[r, b, :, :, 4] * 80.0
                    pred = np.asarray(knn_postprocess(
                        jnp.asarray(proj_range),
                        jnp.asarray(s.unproj_range),
                        jnp.asarray(pix_argmax),
                        jnp.asarray(s.proj_x),
                        jnp.asarray(s.proj_y),
                        num_classes=self.num_class,
                    ))
                    labels = s.point_labels
                    keep = labels != 0
                    hist += np.bincount(
                        labels[keep] * self.num_class
                        + np.clip(pred[keep], 0, self.num_class - 1),
                        minlength=self.num_class**2,
                    ).reshape(self.num_class, self.num_class)
                    if save_path is not None:
                        from .utils.submission import save_predictions

                        save_predictions(save_path, s.name, pred)
                    n_scans += 1
        hist = _allreduce_hist(hist)
        miou = miou_from_hist(hist, ignore_index=0)
        self.logger.info(
            f"range point-eval (KNN) mIoU {miou:.2f} over {n_scans} scans"
        )
        return {"miou": miou, "hist": hist}

    def evaluate(self, class_names=None) -> dict:
        hist = np.zeros((self.num_class, self.num_class), np.int64)
        t0 = time.perf_counter()
        n_batches = 0
        for arrays, _meta in self.val_loader:
            batch = self._to_eval_batch(arrays)
            h, _logits = self._run_eval_step(batch)
            hist += np.asarray(h, np.int64)
            n_batches += 1
        dt = time.perf_counter() - t0
        iou = per_class_iou(hist)
        miou = miou_from_hist(hist, ignore_index=0)
        self.writer.scalar("eval/miou", miou, int(self.state.step))
        names = class_names or [f"class_{i}" for i in range(self.num_class)]
        lines = [
            f"  {names[i]:<20s} IoU {100 * iou[i]:6.2f}"
            for i in range(1, self.num_class)
            if np.isfinite(iou[i])
        ]
        self.logger.info(
            "eval per-class IoU:\n" + "\n".join(lines) + f"\nmIoU {miou:.2f} "
            f"({n_batches} batches, {dt:.1f}s)"
        )
        self.logger.info(
            "row-normalized confusion matrix:\n"
            + format_confusion(hist, names)
        )
        return {"miou": miou, "hist": hist, "iou": iou}
