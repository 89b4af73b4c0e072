"""Parameter freezing / grouping helpers (optax masks).

Replaces the reference's `fix_part_param` + requires_grad mutation
(train.py:202-207, minkunet_ms_mm.py:569-572 freezes everything except the
image/lidar-fov/fusion modules for the staged TIAF recipe) with an optax
`masked` transform: frozen parameters get zero updates, trainable ones the
real optimizer — one jitted program, no mutable flags.
"""

from __future__ import annotations

from typing import Sequence

import jax
import optax


def path_matches(path, prefixes: Sequence[str]) -> bool:
    keys = [getattr(p, "key", str(p)) for p in path]
    joined = "/".join(str(k) for k in keys)
    return any(joined.startswith(p) or f"/{p}" in f"/{joined}" for p in prefixes)


def trainable_mask(params, trainable_prefixes: Sequence[str]):
    """Pytree of bools: True where the parameter path matches one of the
    prefixes (e.g. ['image_backbone', 'lidar_backbone',
    'classifier_fusion'] for the TIAF stage)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: path_matches(path, trainable_prefixes), params
    )


def freeze_except(
    tx: optax.GradientTransformation,
    params,
    trainable_prefixes: Sequence[str],
) -> optax.GradientTransformation:
    """Optimizer that updates only parameters under `trainable_prefixes`;
    everything else is frozen (zero updates)."""
    mask = trainable_mask(params, trainable_prefixes)
    return optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()},
        jax.tree_util.tree_map(lambda t: "train" if t else "freeze", mask),
    )
