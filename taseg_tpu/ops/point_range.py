"""Point <-> range-image transforms (the range_lib equivalents).

TPU-native replacements for the reference's CUDA kernels:
  * `point_to_range` ~ range_lib `map_count` + `denselize`
    (`map_count_gpu.cu:5-18`, `denselize_gpu.cu:5-42`): scatter-mean of
    point features onto H x W pixels — expressed as a sorted segment mean
    over linearized pixel ids (reusing the voxelize machinery; exact
    gradient via its custom VJP).
  * `range_to_point` ~ `F.grid_sample` on normalized (px, py)
    (reference rpvnet.py:32-44): bilinear interpolation as 4 gathers,
    differentiable through autodiff on the gathered corners (backward is
    gathers + segment sums — no XLA scatter).
"""

from __future__ import annotations

import jax.numpy as jnp

from .voxelize import (
    DevoxTable,
    SegmentTables,
    build_segment_tables,
    devoxelize,
    voxelize_avg,
)


def pixel_ids(px: jnp.ndarray, py: jnp.ndarray, valid, h: int, w: int):
    """Linearized pixel id per point; -1 for invalid points."""
    ids = py.astype(jnp.int32) * w + px.astype(jnp.int32)
    ok = valid & (px >= 0) & (px < w) & (py >= 0) & (py < h)
    return jnp.where(ok, ids, -1)


def point_to_range_tables(
    px: jnp.ndarray, py: jnp.ndarray, valid, h: int, w: int
) -> tuple[jnp.ndarray, SegmentTables]:
    ids = pixel_ids(px, py, valid, h, w)
    return ids, build_segment_tables(ids, h * w)


def point_to_range(
    point_feats: jnp.ndarray,
    ids: jnp.ndarray,
    tables: SegmentTables,
    h: int,
    w: int,
) -> jnp.ndarray:
    """(P, C) -> (H, W, C) per-pixel mean (range_lib denselize semantics)."""
    mean = voxelize_avg(point_feats, ids, tables)  # (H*W, C)
    return mean.reshape(h, w, point_feats.shape[-1])


def range_sample_table(
    pxf: jnp.ndarray, pyf: jnp.ndarray, valid, h: int, w: int
) -> DevoxTable:
    """Bilinear sampling table: 4 corner pixel ids + weights per point.

    Expressed as a DevoxTable so `devoxelize` provides the scatter-free
    custom-VJP sampling (the backward is a sorted segment sum over the
    corner pairs, exactly like the trilinear case)."""
    x = jnp.clip(pxf, 0.0, w - 1.000001)
    y = jnp.clip(pyf, 0.0, h - 1.000001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    fx = (x - x0).astype(jnp.float32)
    fy = (y - y0).astype(jnp.float32)
    idx = jnp.stack(
        [y0 * w + x0, y0 * w + x1, y1 * w + x0, y1 * w + x1]
    )
    idx = jnp.where(valid[None, :], idx, -1)
    weights = jnp.stack(
        [(1 - fx) * (1 - fy), fx * (1 - fy), (1 - fx) * fy, fx * fy]
    )
    weights = jnp.where(idx >= 0, weights, 0.0)
    pairs = build_segment_tables(idx.reshape(-1), h * w)
    return DevoxTable(idx=idx, weights=weights, pairs=pairs)


def range_to_point(
    image: jnp.ndarray, table: DevoxTable
) -> jnp.ndarray:
    """Sample (H, W, C) at the table's per-point corners -> (P, C)
    (reference rpvnet.py:32-44 grid_sample path)."""
    h, w, c = image.shape
    return devoxelize(image.reshape(-1, c), table)
