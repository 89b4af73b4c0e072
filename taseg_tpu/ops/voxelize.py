"""Point↔voxel transforms — scatter-free, custom-VJP formulations.

TPU-native equivalents of torchsparse's atomic scatter kernels
(`backend/voxelize/voxelize_cuda.cu:13-80`,
`backend/devoxelize/devoxelize_cuda.cu:11-98`).  XLA scatters are
erratically slow on TPU (measured), so both directions of both ops are
expressed as sorts + prefix sums + gathers:

  * voxelize (segment mean): points pre-sorted by voxel id (the permutation
    and segment starts come from the topology builder) -> cumulative sum ->
    per-segment boundary differences.  Backward: each point's gradient is a
    gather of its voxel's gradient / count.
  * devoxelize (8-corner trilinear): forward is 8 masked gathers + weighted
    sum; backward sums each voxel's incoming (corner, point) contributions
    via the same sorted-pair + prefix-sum trick over a pair table built
    once per step.

Precision note: segment sums via prefix differences accumulate fp32
rounding ~eps * prefix-magnitude; inputs are mean-centered per feature
before the cumsum to keep prefixes small.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .coords import GridBounds
from .join import query_coords
from .rulebook import kernel_offsets


class SegmentTables(NamedTuple):
    """Sorted-segment layout for scatter-free segment reductions.

    perm:   (N,) int32 — row order grouping members by segment id
            (members of segment u occupy perm[starts[u]:starts[u+1]]).
    starts: (V+1,) int32 — exclusive prefix of segment sizes.
    counts: (V,) int32 — segment sizes.
    """

    perm: jnp.ndarray
    starts: jnp.ndarray
    counts: jnp.ndarray


def build_segment_tables(ids: jnp.ndarray, num_segments: int) -> SegmentTables:
    """ids: (N,) int32 segment id per row; out-of-range (e.g. -1) = drop.

    One sentinel row per segment is appended internally so every segment is
    non-empty — segment starts then align with segment ids directly (no
    scatter, no gap bookkeeping).  Consumers pad their value rows with
    `num_segments` zero rows (see `_segment_sum_sorted`), which leave sums
    untouched; `counts` excludes the sentinels.
    """
    n_in = ids.shape[0]
    ids_aug = jnp.concatenate(
        [ids, jnp.arange(num_segments, dtype=jnp.int32)]
    )
    n = n_in + num_segments
    in_range = (ids_aug >= 0) & (ids_aug < num_segments)
    key = jnp.where(in_range, ids_aug, jnp.int32(num_segments))
    sorted_ids, perm = jax.lax.sort(
        (key, jnp.arange(n, dtype=jnp.int32)), num_keys=1
    )
    total_valid = jnp.sum(in_range.astype(jnp.int32))

    # first row of each segment: every segment is present, so compacting
    # the boundary positions yields starts indexed by segment id
    pos = jnp.arange(n, dtype=jnp.int32)
    is_first = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_ids[1:] != sorted_ids[:-1]]
    ) & (sorted_ids < num_segments)
    comp_key = jnp.where(is_first, sorted_ids, jnp.int32(2**30))
    _, first_pos = jax.lax.sort((comp_key, pos), num_keys=1)
    starts = jnp.concatenate(
        [first_pos[:num_segments], total_valid[None]]
    )
    counts = starts[1:] - starts[:-1] - 1  # minus the sentinel row
    return SegmentTables(perm=perm, starts=starts, counts=counts)


def _segment_sum_sorted(
    values: jnp.ndarray, tables: SegmentTables
) -> jnp.ndarray:
    """Sum rows per segment: zero-pad to the sentinel-augmented length,
    gather to sorted order, mean-centered cumsum, boundary differences.
    (V, C) output; no scatter."""
    v = tables.counts.shape[0]
    pad = tables.perm.shape[0] - values.shape[0]
    vals = jnp.concatenate(
        [values, jnp.zeros((pad,) + values.shape[1:], values.dtype)]
    )
    sorted_vals = vals[tables.perm].astype(jnp.float32)
    center = jnp.mean(sorted_vals, axis=0, keepdims=True)
    centered = sorted_vals - center
    cum = jnp.cumsum(centered, axis=0)
    cum = jnp.concatenate([jnp.zeros_like(cum[:1]), cum], axis=0)
    seg = cum[tables.starts[1:]] - cum[tables.starts[:v]]
    # each segment carries exactly (count + 1) centered rows (incl sentinel)
    return seg + (tables.counts + 1)[:, None].astype(jnp.float32) * center


@jax.custom_vjp
def voxelize_avg(
    point_feats: jnp.ndarray,
    inverse: jnp.ndarray,
    tables: SegmentTables,
) -> jnp.ndarray:
    """Average point features per voxel (reference `spvoxelize`).

    inverse: (P,) voxel id per point or -1; tables from
    `build_segment_tables(inverse, V)`.
    """
    sums = _segment_sum_sorted(point_feats, tables)
    mean = sums / jnp.maximum(tables.counts, 1)[:, None].astype(jnp.float32)
    return mean.astype(point_feats.dtype)


def _voxelize_fwd(point_feats, inverse, tables):
    return voxelize_avg(point_feats, inverse, tables), (inverse, tables)


def _voxelize_bwd(res, g):
    inverse, tables = res
    counts = jnp.maximum(tables.counts, 1).astype(g.dtype)
    scaled = g / counts[:, None]
    safe = jnp.clip(inverse, 0)
    d_points = jnp.where(
        (inverse >= 0)[:, None], scaled[safe], 0
    )
    return d_points, None, None


voxelize_avg.defvjp(_voxelize_fwd, _voxelize_bwd)


def point_to_voxel_index(
    point_coords: jnp.ndarray,
    point_valid: jnp.ndarray,
    voxel_coords: jnp.ndarray,
    num_voxels: jnp.ndarray,
    stride: int,
    bounds: GridBounds,
) -> jnp.ndarray:
    """Index of the stride-`stride` voxel containing each float point
    (reference minkunet/utils.py:41-58)."""
    xyz = (jnp.floor(point_coords[:, :3] / stride) * stride).astype(jnp.int32)
    q = jnp.concatenate([xyz, point_coords[:, 3:4].astype(jnp.int32)], axis=1)
    return query_coords(q, point_valid, voxel_coords, num_voxels, bounds)


class DevoxTable(NamedTuple):
    """Trilinear interpolation table + its transpose structure.

    idx:     (8, P) int32 voxel index per corner, -1 missing.
    weights: (8, P) float32 normalized trilinear weights.
    pairs:   SegmentTables over the flattened (8P,) corner->voxel ids,
             used for the scatter-free backward.
    """

    idx: jnp.ndarray
    weights: jnp.ndarray
    pairs: SegmentTables


def trilinear_table(
    point_coords: jnp.ndarray,
    point_valid: jnp.ndarray,
    voxel_coords: jnp.ndarray,
    num_voxels: jnp.ndarray,
    stride: int,
    bounds: GridBounds,
    with_pairs: bool = True,
    corner_idx: jnp.ndarray | None = None,
) -> DevoxTable:
    """8-corner indices + weights (reference `voxel_to_point` /
    `calc_ti_weights`, minkunet/utils.py:69-105 + torchsparse
    nn/functional/devoxelize.py:10-48), plus the transposed pair layout.

    `corner_idx` (8, P) skips the 8P-row sort-join when the caller already
    derived the corner rows (e.g. from the parent chain + k3 rulebook,
    backbone_context.build_unet_topology)."""
    p = point_coords[:, :3].astype(jnp.float32)
    s = jnp.float32(stride)
    pf = jnp.floor(p / s) * s

    if corner_idx is not None:
        idx = corner_idx
    else:
        offs = kernel_offsets(2, stride=stride)  # (8, 3); k = 4dx+2dy+dz
        corner = (
            pf[None, :, :].astype(jnp.int32) + jnp.asarray(offs)[:, None, :]
        )
        b = jnp.broadcast_to(
            point_coords[None, :, 3:4].astype(jnp.int32),
            (8,) + point_coords[:, :1].shape,
        )
        q = jnp.concatenate([corner, b], axis=-1)
        q_valid = jnp.broadcast_to(point_valid[None, :], (8, p.shape[0]))
        idx = query_coords(q, q_valid, voxel_coords, num_voxels, bounds)

    frac = (p - pf) / s
    one = 1.0 - frac
    # corner bit pattern (k = 4*jx + 2*jy + jz), valid for both branches
    d = jnp.asarray(
        [[(k >> 2) & 1, (k >> 1) & 1, k & 1] for k in range(8)], jnp.float32
    )
    w = jnp.prod(
        jnp.where(d[:, None, :] > 0, frac[None, :, :], one[None, :, :]),
        axis=-1,
    )
    w = jnp.where(idx >= 0, w, 0.0)
    w = w / (jnp.sum(w, axis=0, keepdims=True) + 1e-8)

    # the transposed pair layout is only needed for the backward pass;
    # inference topologies skip its (8P)-row sort
    pairs = (
        build_segment_tables(idx.reshape(-1), voxel_coords.shape[0])
        if with_pairs else None
    )
    return DevoxTable(idx=idx, weights=w, pairs=pairs)


class IdentityDevoxTable(NamedTuple):
    """Degenerate trilinear table for integer points at stride 1.

    When the input points are host-deduped integer voxel coords (the voxel
    pipeline contract), floor(p/1) == p, so the trilinear weights collapse
    to 1 on the containing voxel: devoxelization is a single gather by the
    point->voxel inverse map, and its VJP is a segment SUM through the
    already-built point tables — zero extra topology cost.
    """

    inverse: jnp.ndarray  # (P,) point -> voxel id (-1 invalid)
    tables: SegmentTables  # segment tables over `inverse`


@jax.custom_vjp
def _devoxelize_identity(voxel_feats: jnp.ndarray, table: IdentityDevoxTable):
    safe = jnp.clip(table.inverse, 0)
    return jnp.where(
        (table.inverse >= 0)[:, None], voxel_feats[safe], 0
    )


def _devox_id_fwd(voxel_feats, table):
    return _devoxelize_identity(voxel_feats, table), table


def _devox_id_bwd(table, g):
    d_vox = _segment_sum_sorted(g, table.tables).astype(g.dtype)
    return (d_vox, None)


_devoxelize_identity.defvjp(_devox_id_fwd, _devox_id_bwd)


@jax.custom_vjp
def _devoxelize_trilinear(voxel_feats: jnp.ndarray, table: DevoxTable) -> jnp.ndarray:
    """Interpolate (V, C) voxel feats to (P, C) points (reference
    `spdevoxelize`).

    Per-corner multiply-accumulate instead of one (8, P, C) einsum: the
    weight product fuses into each gather's consumer and the 8x-wide
    intermediate (GBs at head widths) never reaches HBM."""
    idx, w = table.idx, table.weights
    out = None
    for k in range(idx.shape[0]):
        g = jnp.where(
            (idx[k] >= 0)[:, None], voxel_feats[jnp.clip(idx[k], 0), :], 0
        )
        c = g * w[k][:, None].astype(voxel_feats.dtype)
        out = c if out is None else out + c
    return out


def _devox_fwd(voxel_feats, table):
    return _devoxelize_trilinear(voxel_feats, table), table


def _devox_bwd(table, g):
    # d_vox[v] = sum over (corner, point) pairs mapping to v of w * g[point]
    k = table.idx.shape[0]
    contrib = table.weights.reshape(-1, 1).astype(g.dtype) * jnp.tile(
        g, (k, 1)
    )
    d_vox = _segment_sum_sorted(contrib, table.pairs).astype(g.dtype)
    return (d_vox, None)


_devoxelize_trilinear.defvjp(_devox_fwd, _devox_bwd)


def devoxelize(voxel_feats: jnp.ndarray, table) -> jnp.ndarray:
    """Interpolate (V, C) voxel feats to (P, C) points (reference
    `spdevoxelize`); dispatches on the table type."""
    if isinstance(table, IdentityDevoxTable):
        return _devoxelize_identity(voxel_feats, table)
    return _devoxelize_trilinear(voxel_feats, table)
