"""Static-capacity sparse tensor pytrees.

The reference's `SparseTensor`/`PointTensor` (torchsparse `tensor.py:10-105`)
are dynamically sized COO containers with mutable cmaps/kmaps caches.  The
TPU-native analogue is a frozen pytree with a fixed row capacity, valid rows
packed first (key-sorted), and a scalar count; topology caches live in an
explicit `context` structure built once per forward (see
`models/voxel/backbone_context.py`) rather than hidden mutable state.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class SparseGrid:
    """A batch of sparse voxels at one stride level.

    coords: (V, 4) int32 (x, y, z, batch); rows past `num` are zero padding.
    feats:  (V, C)
    num:    () int32 — number of valid rows (valid rows come first).
    stride: static int — tensor stride (voxel edge length in stride-1 units).
    """

    coords: jnp.ndarray
    feats: jnp.ndarray
    num: jnp.ndarray
    stride: int = struct.field(pytree_node=False, default=1)

    @property
    def capacity(self) -> int:
        return self.coords.shape[0]

    def valid_mask(self) -> jnp.ndarray:
        return jnp.arange(self.capacity, dtype=jnp.int32) < self.num

    def with_feats(self, feats: jnp.ndarray) -> "SparseGrid":
        return self.replace(feats=feats)


@struct.dataclass
class PointSet:
    """A padded batch of points (pre-voxelization / interpolation targets).

    coords: (P, 4) float32 (x, y, z, batch) in stride-1 voxel units.
    feats:  (P, C)
    num:    () int32 — number of valid rows.
    """

    coords: jnp.ndarray
    feats: jnp.ndarray
    num: jnp.ndarray

    @property
    def capacity(self) -> int:
        return self.coords.shape[0]

    def valid_mask(self) -> jnp.ndarray:
        return jnp.arange(self.capacity, dtype=jnp.int32) < self.num
