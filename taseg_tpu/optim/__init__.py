"""Optimizer & LR-schedule factory (optax).

Mirrors the reference factory surface (`pcseg/optim/__init__.py:13-168`):
optimizers sgd / sgd_fc (10x LR on the classifier head) / adam / adamW /
adam_onecycle, and the four warmup-decay schedule families plus onecycle.
Schedules are pure step->scale functions (identical math to the reference's
LambdaLR lambdas), composed with the optimizer via optax.scale_by_schedule,
so the whole update is a jittable pytree transform — no mutable scheduler
object, no `.step()` ordering hazards.
"""

from __future__ import annotations

import math
from typing import Callable

import optax


def linear_warmup_with_cosdecay(
    warmup_steps: int, total_steps: int, min_scale: float = 1e-5
) -> Callable[[int], float]:
    def f(step):
        import jax.numpy as jnp

        warm = (1 - min_scale) * step / max(warmup_steps, 1) + min_scale
        ratio = (step - warmup_steps) / max(total_steps, 1)
        decay = (1 - min_scale) * 0.5 * (1 + jnp.cos(jnp.pi * ratio)) + min_scale
        return jnp.where(step < warmup_steps, warm, decay)

    return f


def cos_warmup_with_cosdecay(
    warmup_steps: int, total_steps: int, min_scale: float = 1e-5
) -> Callable[[int], float]:
    def f(step):
        import jax.numpy as jnp

        warm = (
            (1 - min_scale)
            * (1 - jnp.cos(jnp.pi * step / max(warmup_steps, 1)))
            / 2
            + min_scale
        )
        ratio = (step - warmup_steps) / max(total_steps, 1)
        decay = (1 - min_scale) * 0.5 * (1 + jnp.cos(jnp.pi * ratio)) + min_scale
        return jnp.where(step < warmup_steps, warm, decay)

    return f


def linear_warmup_with_stepdecay(
    warmup_steps: int, decay_steps: list, decay_scales: list
) -> Callable[[int], float]:
    def f(step):
        import jax.numpy as jnp

        scale = jnp.float32(1.0)
        for ds, sc in zip(decay_steps, decay_scales):
            scale = scale * jnp.where(step >= ds, sc, 1.0)
        warm = step / max(warmup_steps, 1)
        return jnp.where(step < warmup_steps, warm, scale)

    return f


def coswarmup_with_stepdecay(
    warmup_steps: int, decay_steps: list, decay_scales: list
) -> Callable[[int], float]:
    def f(step):
        import jax.numpy as jnp

        scale = jnp.float32(1.0)
        for ds, sc in zip(decay_steps, decay_scales):
            scale = scale * jnp.where(step >= ds, sc, 1.0)
        warm = (1 - jnp.cos(jnp.pi * step / max(warmup_steps, 1))) / 2
        return jnp.where(step < warmup_steps, warm, scale)

    return f


def _annealing_cos(start, end, pct):
    import jax.numpy as jnp

    return end + (start - end) / 2 * (jnp.cos(jnp.pi * pct) + 1)


def fastai_onecycle(
    total_steps: int, lr_max: float, moms, div_factor: float,
    pct_start: float,
):
    """fastai OneCycle LR + momentum schedules (reference
    `learning_schedules_fastai.py:60-78`): cos-anneal lr/div_factor ->
    lr_max over pct_start, then lr_max -> lr/div_factor/1e4; momentum
    anneals moms[0] -> moms[1] and back.  Returns (lr_fn, mom_fn)."""
    a1 = max(int(total_steps * pct_start), 1)
    a2 = max(total_steps - a1, 1)
    low = lr_max / div_factor

    def lr_fn(step):
        import jax.numpy as jnp

        up = _annealing_cos(low, lr_max, step / a1)
        down = _annealing_cos(lr_max, low / 1e4, (step - a1) / a2)
        return jnp.where(step < a1, up, down)

    def mom_fn(step):
        import jax.numpy as jnp

        up = _annealing_cos(moms[0], moms[1], step / a1)
        down = _annealing_cos(moms[1], moms[0], (step - a1) / a2)
        return jnp.where(step < a1, up, down)

    return lr_fn, mom_fn


def build_schedule(optim_cfg, iters_per_epoch: int, total_epochs: int):
    """Step -> LR-scale schedule from an OPTIM config block."""
    warmup_steps = int(optim_cfg.get("WARMUP_EPOCH", 1)) * iters_per_epoch
    total_steps = total_epochs * iters_per_epoch
    name = optim_cfg.get("SCHEDULER", "linear_warmup_with_cosdecay")
    if name == "linear_warmup_with_cosdecay":
        return linear_warmup_with_cosdecay(warmup_steps, total_steps)
    if name == "cos_warmup_with_cosdecay":
        return cos_warmup_with_cosdecay(warmup_steps, total_steps)
    if name in ("linear_warmup_with_stepdecay", "coswarmup_with_stepdecay"):
        decay_steps = [int(x) * iters_per_epoch for x in optim_cfg["DECAY_EPOCHS"]]
        scales = list(optim_cfg["DECAY_SCALES"])
        assert len(scales) == len(decay_steps)
        fn = (
            linear_warmup_with_stepdecay
            if name.startswith("linear")
            else coswarmup_with_stepdecay
        )
        return fn(warmup_steps, decay_steps, scales)
    if name == "onecycle":
        lr = float(optim_cfg.get("LEARNING_RATE", optim_cfg["LR"]))
        sched = optax.cosine_onecycle_schedule(
            transition_steps=total_steps,
            peak_value=1.0,
            pct_start=0.2,
            div_factor=25.0,
            final_div_factor=100.0,
        )
        del lr  # peak LR is applied by the optimizer's base LR
        return sched
    raise NotImplementedError(f"Not Supported SCHEDULER: {name}")


def build_optimizer(
    optim_cfg,
    iters_per_epoch: int,
    total_epochs: int,
    *,
    clip_grad_norm: float = 10.0,
) -> optax.GradientTransformation:
    """Optimizer chain: clip-by-global-norm(10) (reference train.py:413)
    -> optimizer -> LR schedule."""
    name = optim_cfg.get("OPTIMIZER", "sgd")
    lr = float(optim_cfg["LR"])
    wd = float(optim_cfg.get("WEIGHT_DECAY", 0.0))
    momentum = float(optim_cfg.get("MOMENTUM", 0.9))
    nesterov = bool(optim_cfg.get("NESTEROV", False))
    if name == "adam_onecycle":
        # reference adam_onecycle drives the fastai OneCycle from
        # OPTIM.MOMS / DIV_FACTOR / PCT_START (`pcseg/optim/__init__.py:
        # 113-116`) rather than the SCHEDULER key
        total_steps = max(iters_per_epoch * total_epochs, 1)
        moms = tuple(float(m) for m in optim_cfg.get("MOMS", (0.95, 0.85)))
        lr_fn, mom_fn = fastai_onecycle(
            total_steps, lr, moms,
            float(optim_cfg.get("DIV_FACTOR", 10.0)),
            float(optim_cfg.get("PCT_START", 0.4)),
        )
        tx = optax.chain(
            optax.add_decayed_weights(wd) if wd else optax.identity(),
            optax.inject_hyperparams(optax.adam)(
                learning_rate=lr_fn, b1=mom_fn, b2=0.99
            ),
        )
        return optax.chain(optax.clip_by_global_norm(clip_grad_norm), tx)
    schedule = build_schedule(optim_cfg, iters_per_epoch, total_epochs)

    def lr_schedule(step):
        return lr * schedule(step)

    if name == "sgd":
        # torch SGD weight_decay is L2 added to the gradient (not decoupled)
        tx = optax.chain(
            optax.add_decayed_weights(wd) if wd else optax.identity(),
            optax.sgd(
                learning_rate=lr_schedule, momentum=momentum,
                nesterov=nesterov,
            ),
        )
    elif name == "sgd_fc":
        base = optax.chain(
            optax.add_decayed_weights(wd) if wd else optax.identity(),
            optax.sgd(
                learning_rate=lr_schedule, momentum=momentum,
                nesterov=nesterov,
            ),
        )
        head = optax.chain(
            optax.add_decayed_weights(wd) if wd else optax.identity(),
            optax.sgd(
                learning_rate=lambda s: 10.0 * lr_schedule(s),
                momentum=momentum, nesterov=nesterov,
            ),
        )

        def label_fn(params):
            import jax

            return jax.tree_util.tree_map_with_path(
                lambda path, _: "head"
                if any("classifier" in str(p) for p in path)
                else "base",
                params,
            )

        tx = optax.multi_transform({"base": base, "head": head}, label_fn)
    elif name == "adam":
        tx = optax.chain(
            optax.add_decayed_weights(wd) if wd else optax.identity(),
            optax.adam(learning_rate=lr_schedule),
        )
    elif name == "adamW":
        tx = optax.adamw(learning_rate=lr_schedule, weight_decay=wd)
    else:
        raise NotImplementedError(name)

    return optax.chain(optax.clip_by_global_norm(clip_grad_norm), tx)
