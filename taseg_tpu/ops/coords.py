"""Coordinate key packing for sparse voxel grids.

Replaces the reference's 64-bit FNV-1a hash + GPU cuckoo hash map
(torchsparse `backend/hash/hash_cuda.cu:11-55`, `backend/hashmap/
hashmap_cuda.cu:8-212`) with an exact, collision-free two-part int32
lexicographic key.  TPUs have fast sorts and no atomics, so all joins are
done by sorting / binary search over these keys (see `join.py`).

A key is the pair (hi, lo):
    hi = batch * extent_z + (z - origin_z)
    lo = (x - origin_x) * extent_y + (y - origin_y)
where origin/extent come from a per-batch `GridBounds` computed once per
forward pass with a safety margin that covers every kernel offset at every
stride level.  Both parts stay well inside int32 for LiDAR-scale grids
(xy extent up to ~46k voxels); `compute_bounds` asserts nothing on device —
overflow limits are documented and checked host-side by the data pipeline.

Padding rows and out-of-bounds queries map to sentinels that (a) sort after
all valid keys and (b) can never equal a valid reference key.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct

# Sentinel for invalid rows in a *reference* set (padding voxels): sorts last.
# Host-side numpy constants: creating jnp scalars at module scope would
# initialize the default device backend on package import (device-free tools
# like tta_remap.py must stay importable when no accelerator is reachable).
REF_SENTINEL_HI = np.int32(2**31 - 1)
# Sentinel for invalid/out-of-bounds *query* keys: also sorts after all valid
# keys but is distinct from REF_SENTINEL so a padded reference row can never
# be "found" by an invalid query.
QUERY_SENTINEL_HI = np.int32(2**31 - 2)


@struct.dataclass
class GridBounds:
    """Axis-aligned integer bounding box (with margin) of a voxel grid."""

    origin: jnp.ndarray  # (3,) int32 — min corner minus margin
    extent: jnp.ndarray  # (3,) int32 — per-axis size including both margins


def compute_bounds(coords: jnp.ndarray, valid: jnp.ndarray, margin: int = 64) -> GridBounds:
    """Bounds of the valid stride-1 coords, padded by `margin` voxels.

    `margin` must be >= the largest kernel offset used at any stride level
    (MinkUNet: dilation * (ks // 2) * stride <= 16 for ks=3 at stride 16,
    so the default 64 is ample).
    """
    xyz = coords[:, :3].astype(jnp.int32)
    big = jnp.int32(2**24)
    mn = jnp.min(jnp.where(valid[:, None], xyz, big), axis=0) - margin
    mx = jnp.max(jnp.where(valid[:, None], xyz, -big), axis=0) + margin
    return GridBounds(origin=mn, extent=(mx - mn + 1).astype(jnp.int32))


def pack_keys(
    coords: jnp.ndarray,
    bounds: GridBounds,
    valid: jnp.ndarray,
    *,
    is_query: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pack (N, 4) int coords (x, y, z, batch) into (hi, lo) int32 key pairs.

    Rows with `valid == False`, coords outside `bounds`, or batch < 0 map to
    the appropriate sentinel.
    """
    coords = coords.astype(jnp.int32)
    xyz = coords[:, :3] - bounds.origin
    b = coords[:, 3]
    in_bounds = (
        valid
        & (b >= 0)
        & jnp.all(xyz >= 0, axis=1)
        & jnp.all(xyz < bounds.extent, axis=1)
    )
    hi = b * bounds.extent[2] + xyz[:, 2]
    lo = xyz[:, 0] * bounds.extent[1] + xyz[:, 1]
    sent_hi = QUERY_SENTINEL_HI if is_query else REF_SENTINEL_HI
    # sentinel lo stays 0: join_keys fuses a tag into lo's low bit, so lo
    # must remain < 2^30 for every row (including sentinels); the distinct
    # hi sentinels alone already separate refs from queries
    hi = jnp.where(in_bounds, hi, sent_hi)
    lo = jnp.where(in_bounds, lo, 0)
    return hi, lo
