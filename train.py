#!/usr/bin/env python
"""Train/eval CLI.

Mirrors the reference CLI surface (`train.py:55-125`): --cfg_file YAML with
MODALITY/DATA/MODEL/OPTIM blocks, --set dotted overrides, --eval,
--pretrained_model, batch-size/epoch overrides.  Launchers are unnecessary:
one process drives the whole ('data',) mesh (single- or multi-chip); on
multi-host, jax.distributed.initialize extends the same program over DCN —
replacing dist_train.sh / slurm_train.sh port scanning + NCCL init.
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path

# JAX_PLATFORMS=cpu in the env hangs PJRT plugin discovery on hosts whose
# interpreter pins a tunneled TPU platform; force CPU the config way
# instead (same pattern as tests/conftest.py)
_FORCE_CPU = os.environ.get("JAX_PLATFORMS") == "cpu"
if _FORCE_CPU:
    os.environ.pop("JAX_PLATFORMS", None)

import jax

if _FORCE_CPU:
    jax.config.update("jax_platforms", "cpu")

from taseg_tpu.data import build_dataloader
from taseg_tpu.engine import Trainer
from taseg_tpu.parallel import make_mesh
from taseg_tpu.utils.common import create_logger
from taseg_tpu.utils.config import apply_overrides, load_config


def parse_args():
    p = argparse.ArgumentParser(description="taseg_tpu train/eval")
    p.add_argument("--cfg_file", required=True, help="YAML config path")
    p.add_argument("--extra_tag", default="default", help="experiment tag")
    p.add_argument("--set", dest="set_cfgs", nargs=argparse.REMAINDER,
                   default=[], help="dotted-path config overrides")
    p.add_argument("--eval", action="store_true", help="evaluate only")
    p.add_argument("--seq", type=int, default=None,
                   help="restrict eval to one sequence (11-21 selects the "
                        "label-free test split for benchmark submissions)")
    p.add_argument("--tta", action="store_true", help="rotation-vote TTA")
    p.add_argument("--votes_min", type=int, default=0)
    p.add_argument("--votes_max", type=int, default=10)
    p.add_argument("--save_path", default=None,
                   help="write predictions (submission/pseudo-mask format)")
    p.add_argument("--save_score", action="store_true",
                   help="also write float logits per scan")
    p.add_argument("--pretrained_model", default=None)
    p.add_argument("--fix_random_seed", action="store_true")
    p.add_argument("--batch_size", type=int, default=None,
                   help="scans per shard (per-device batch)")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--eval_interval", type=int, default=1)
    p.add_argument("--distributed", action="store_true",
                   help="multi-host: call jax.distributed.initialize first")
    return p.parse_args()


def main():
    args = parse_args()
    if args.distributed:
        jax.distributed.initialize()

    cfg = load_config(args.cfg_file)
    if args.set_cfgs:
        cfg = apply_overrides(cfg, args.set_cfgs)
    if args.seq is not None:
        # per-sequence submission eval (reference train.py:75-76): test
        # sequences 11-21 are label-free, the eval loader serves them via
        # DATA.EVAL_SPLIT + DATA.SEQUENCES
        cfg.DATA["SEQUENCES"] = [args.seq]
        cfg.DATA["EVAL_SPLIT"] = "test" if args.seq >= 11 else "val"

    out_dir = Path("output") / cfg.TAG / args.extra_tag
    out_dir.mkdir(parents=True, exist_ok=True)
    logger = create_logger(out_dir / "log.txt")
    logger.info(f"devices: {jax.devices()}")

    mesh = make_mesh()
    # loaders produce PROCESS-LOCAL shards; on multi-host the engine
    # assembles them into global arrays (parallel.make_global_batch) and
    # each process reads a distinct slice of the global epoch order
    n_local = len([d for d in mesh.devices.flat if d.process_index ==
                   jax.process_index()])
    n_shards = n_local or jax.local_device_count()
    scans_per_shard = args.batch_size or int(
        cfg.OPTIM.get("BATCH_SIZE_PER_GPU", 2)
    )
    proc_kw = dict(
        process_index=jax.process_index(), process_count=jax.process_count()
    )

    # MODALITY x MODEL dispatch (reference pcseg/data/__init__.py:73-121 +
    # docs/TASeg_Sem.md staged pipeline: every family drives through here)
    modality = str(cfg.get("MODALITY", "voxel"))
    if cfg.MODEL["NAME"] == "Cylinder_TS":
        pipeline_kind = "cylinder"
    elif cfg.MODEL["NAME"] == "RPVNet":
        pipeline_kind = "fusion"
    else:
        pipeline_kind = None
    train_loader = build_dataloader(
        cfg.DATA, training=True, n_shards=n_shards,
        scans_per_shard=scans_per_shard,
        modality=modality, pipeline_kind=pipeline_kind, **proc_kw,
    )
    val_loader = build_dataloader(
        cfg.DATA, training=False, n_shards=n_shards,
        scans_per_shard=scans_per_shard,
        point_capacity=train_loader.point_capacity,
        modality=modality, pipeline_kind=pipeline_kind, **proc_kw,
    )

    trainer = Trainer(
        cfg, train_loader, val_loader,
        output_dir=out_dir, logger=logger, mesh=mesh,
        total_epochs=args.epochs,
    )
    if args.pretrained_model:
        trainer.load_pretrained(args.pretrained_model)
    if cfg.MODEL.get("TEACHER_CKPT"):
        trainer.load_teacher(cfg.MODEL["TEACHER_CKPT"])
    resumed = trainer.resume_latest()

    if args.eval:
        if not resumed and not args.pretrained_model:
            logger.warning(
                "--eval with no checkpoint in %s and no "
                "--pretrained_model: evaluating RANDOM weights",
                trainer.ckpt_dir,
            )
        if args.tta or args.save_path:
            trainer.evaluate_points(
                tta_votes=(args.votes_max - args.votes_min) if args.tta else 0,
                save_path=args.save_path,
                save_score=args.save_score,
            )
        else:
            trainer.evaluate_points()
    else:
        trainer.train(eval_interval=args.eval_interval)


if __name__ == "__main__":
    main()
