"""YAML config system.

Preserves the reference schema and ergonomics
(`tools/utils/train/config.py:15-84`): top-level MODALITY / DATA / MODEL /
OPTIM blocks, recursive `_BASE_CONFIG_` inheritance, and dotted-path
`--set KEY.SUBKEY value` CLI overrides — implemented over a lightweight
attribute-dict (easydict is not a dependency here).
"""

from __future__ import annotations

import ast
from pathlib import Path

import yaml


class Config(dict):
    """dict with attribute access, recursively applied."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v

    @staticmethod
    def wrap(obj):
        if isinstance(obj, dict):
            return Config({k: Config.wrap(v) for k, v in obj.items()})
        if isinstance(obj, list):
            return [Config.wrap(v) for v in obj]
        return obj


def _merge(base: dict, new: dict) -> dict:
    """Recursive merge; `new` wins.  Handles nested `_BASE_CONFIG_`."""
    if "_BASE_CONFIG_" in new:
        base_path = new.pop("_BASE_CONFIG_")
        with open(base_path) as f:
            inherited = yaml.safe_load(f) or {}
        base = _merge(base, inherited)
    out = dict(base)
    for k, v in new.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _merge(out[k], v)
        else:
            out[k] = v
    return out


def load_config(path: str | Path) -> Config:
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    merged = _merge({}, raw)
    cfg = Config.wrap(merged)
    cfg.TAG = Path(path).stem
    return cfg


def _parse_value(s: str):
    try:
        return ast.literal_eval(s)
    except (ValueError, SyntaxError):
        return s


def apply_overrides(cfg: Config, kv_list) -> Config:
    """Apply ['KEY.SUB', 'value', ...] pairs (reference `cfg_from_list`,
    config.py:15-47)."""
    assert len(kv_list) % 2 == 0, "--set expects KEY VALUE pairs"
    for key, raw in zip(kv_list[0::2], kv_list[1::2]):
        parts = key.split(".")
        node = cfg
        for p in parts[:-1]:
            if p not in node:
                node[p] = Config()
            node = node[p]
        leaf = parts[-1]
        val = _parse_value(raw)
        if leaf in node and node[leaf] is not None and not isinstance(
            node[leaf], (dict, list)
        ):
            val = type(node[leaf])(val) if not isinstance(val, bool) else val
        node[leaf] = val
    return cfg
