"""Point↔voxel transforms: average voxelization and trilinear devoxelization.

TPU-native equivalents of torchsparse's atomic scatter kernels:
  * `voxelize_avg`     ~ `spvoxelize` (backend/voxelize/voxelize_cuda.cu:13-80)
    as a segment-sum — sorted segment reductions instead of atomicAdd.
  * `trilinear_table` + `devoxelize` ~ `calc_ti_weights` + `spdevoxelize`
    (nn/functional/devoxelize.py:10-98) as an 8-corner gather with masked
    weights; the backward is autodiff (a segment scatter), replacing the
    atomic backward kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .coords import GridBounds
from .join import query_coords
from .rulebook import kernel_offsets


def voxelize_avg(
    point_feats: jnp.ndarray,
    inverse: jnp.ndarray,
    capacity: int,
    counts: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Average point features per voxel. inverse: (P,) voxel id or -1."""
    seg = jnp.where(inverse >= 0, inverse, capacity)
    summed = jax.ops.segment_sum(
        jnp.where((inverse >= 0)[:, None], point_feats, 0.0),
        seg,
        num_segments=capacity + 1,
    )[:capacity]
    if counts is None:
        counts = jax.ops.segment_sum(
            (inverse >= 0).astype(jnp.int32), seg, num_segments=capacity + 1
        )[:capacity]
    return summed / jnp.maximum(counts, 1).astype(point_feats.dtype)[:, None]


def point_to_voxel_index(
    point_coords: jnp.ndarray,
    point_valid: jnp.ndarray,
    voxel_coords: jnp.ndarray,
    num_voxels: jnp.ndarray,
    stride: int,
    bounds: GridBounds,
) -> jnp.ndarray:
    """Index of the stride-`stride` voxel containing each float point.

    Mirrors `point_to_voxel`'s hash query (reference
    `pcseg/model/segmentor/voxel/minkunet/utils.py:41-58`):
    floor(p / s) * s joined against the voxel coord set.
    """
    xyz = (jnp.floor(point_coords[:, :3] / stride) * stride).astype(jnp.int32)
    q = jnp.concatenate([xyz, point_coords[:, 3:4].astype(jnp.int32)], axis=1)
    return query_coords(q, point_valid, voxel_coords, num_voxels, bounds)


def trilinear_table(
    point_coords: jnp.ndarray,
    point_valid: jnp.ndarray,
    voxel_coords: jnp.ndarray,
    num_voxels: jnp.ndarray,
    stride: int,
    bounds: GridBounds,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """8-corner indices and trilinear weights for voxel→point interpolation.

    Semantics match `voxel_to_point` (reference minkunet/utils.py:69-105):
    corners at floor(p/s)*s + {0, s}^3 (z-fastest ordering, matching the
    even-kernel offset enumeration) and `calc_ti_weights`
    (torchsparse nn/functional/devoxelize.py:10-48) including the
    idx==-1 masking and sum-normalization.

    Returns idx (8, P) int32 (-1 = missing corner) and weights (8, P) f32.
    """
    p = point_coords[:, :3].astype(jnp.float32)
    s = jnp.float32(stride)
    pf = jnp.floor(p / s) * s

    offs = kernel_offsets(2, stride=stride)  # (8, 3), z-fastest: k = 4dx+2dy+dz
    corner = pf[None, :, :].astype(jnp.int32) + jnp.asarray(offs)[:, None, :]
    b = jnp.broadcast_to(
        point_coords[None, :, 3:4].astype(jnp.int32), (8,) + point_coords[:, :1].shape
    )
    q = jnp.concatenate([corner, b], axis=-1)
    q_valid = jnp.broadcast_to(point_valid[None, :], (8, p.shape[0]))
    idx = query_coords(q, q_valid, voxel_coords, num_voxels, bounds)

    frac = (p - pf) / s  # in [0, 1)
    one = 1.0 - frac
    # weight of corner (dx,dy,dz): prod over axes of (1-frac) if d==0 else frac
    d = (jnp.asarray(offs) // max(stride, 1)).astype(jnp.float32)  # (8,3) in {0,1}
    w = jnp.prod(
        jnp.where(d[:, None, :] > 0, frac[None, :, :], one[None, :, :]), axis=-1
    )
    w = jnp.where(idx >= 0, w, 0.0)
    w = w / (jnp.sum(w, axis=0, keepdims=True) + 1e-8)
    return idx, w


def devoxelize(
    voxel_feats: jnp.ndarray, idx: jnp.ndarray, weights: jnp.ndarray
) -> jnp.ndarray:
    """Interpolate (V, C) voxel feats to (P, C) points via an (8, P) table."""
    gathered = jnp.where(
        (idx >= 0)[:, :, None], voxel_feats[jnp.clip(idx, 0), :], 0.0
    )
    return jnp.einsum(
        "kpc,kp->pc", gathered, weights.astype(voxel_feats.dtype),
        preferred_element_type=voxel_feats.dtype,
    )
