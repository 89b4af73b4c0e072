"""Global pooling + BEV projection ops over static-capacity sparse grids.

Functional equivalents of torchsparse's auxiliary spnn surface —
`nn/functional/pooling.py` (global_avg_pool / global_max_pool) and the
ToBEV module family (`nn/modules/bev.py:18-210`) — re-designed for static
shapes:

  * pools are masked one-hot matmuls / sorted segment maxes over the
    batch column (no per-batch Python loops over dynamic slices);
  * the BEV scatter is a `segment_sum` onto a static (B*H*W[,D]) flat
    grid (out-of-range = padding rows dropped by XLA's scatter);
  * dense BEV outputs are NHWC (TPU-native layout) rather than the
    reference's NCHW.

None of the TASeg recipes consume these (they are part of the engine's
module surface, used by e.g. torchsparse's classification examples), so
they favor clarity over peak throughput.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .coords import GridBounds
from .join import unique_coords
from .sparse_tensor import SparseGrid
from .voxelize import build_segment_tables, voxelize_avg


def global_avg_pool(grid: SparseGrid, batch_size: int) -> jnp.ndarray:
    """(B, C) per-batch mean over valid voxels (ts `pooling.py:9-17`)."""
    valid = grid.valid_mask()
    bid = jnp.where(valid, grid.coords[:, 3], batch_size)
    onehot = (
        bid[:, None] == jnp.arange(batch_size, dtype=jnp.int32)[None, :]
    ).astype(jnp.float32)  # (V, B)
    sums = onehot.T @ grid.feats.astype(jnp.float32)  # (B, C)
    counts = jnp.maximum(onehot.sum(axis=0), 1.0)
    return (sums / counts[:, None]).astype(grid.feats.dtype)


def global_max_pool(grid: SparseGrid, batch_size: int) -> jnp.ndarray:
    """(B, C) per-batch max over valid voxels (ts `pooling.py:20-28`).

    Empty batches yield 0 (the reference would return -inf slices; no
    reference config ever pools an empty batch)."""
    valid = grid.valid_mask()
    bid = jnp.where(valid, grid.coords[:, 3], batch_size)
    out = jax.ops.segment_max(
        grid.feats.astype(jnp.float32),
        bid,
        num_segments=batch_size,
        indices_are_sorted=False,
    )
    return jnp.where(jnp.isfinite(out), out, 0.0).astype(grid.feats.dtype)


def bev_reduction(
    grid: SparseGrid, bounds: GridBounds, dim: int = 2
) -> SparseGrid:
    """Collapse axis `dim` and average duplicate columns — the sparse BEV
    mean of ts `ToBEVReduction` (bev.py:18-37; the reference's
    ones-column / to_dense trick is a dynamic-shape duplicate-mean).

    The output keeps the input capacity; `num` is the true column count
    (overflow impossible: collapsing can only merge rows).
    """
    coords = grid.coords.at[:, dim].set(0)
    valid = grid.valid_mask()
    uc, num, inverse, _counts = unique_coords(
        coords, valid, bounds, grid.capacity
    )
    tables = build_segment_tables(inverse, grid.capacity)
    mean = voxelize_avg(grid.feats, inverse, tables)
    return SparseGrid(coords=uc, feats=mean, num=num, stride=grid.stride)


def _slice_kernel_matmul(
    feats: jnp.ndarray,
    coords: jnp.ndarray,
    kernel: jnp.ndarray,
    stride: int,
    dim: int,
) -> jnp.ndarray:
    """Per-row FC with the kernel slice picked by the row's `dim`
    coordinate (ts bev.py:96-100, 147-151): out[v] = feats[v] @
    kernel[coords[v, dim] // stride]."""
    n_kernels = kernel.shape[0]
    zidx = jnp.clip(coords[:, dim] // jnp.int32(stride), 0, n_kernels - 1)
    kv = kernel[zidx].astype(feats.dtype)  # (V, C_in, C_out)
    return jnp.einsum(
        "vi,vio->vo", feats, kv, preferred_element_type=jnp.float32
    ).astype(feats.dtype)


def to_dense_bev(
    grid: SparseGrid,
    feats: jnp.ndarray,
    batch_size: int,
    bev_shape: tuple[int, int],
    *,
    offset: tuple[int, int, int] = (0, 0, 0),
    dim: int = 2,
) -> jnp.ndarray:
    """Scatter-add per-voxel features onto a dense (B, H, W, C) BEV map
    (the aggregation inside ts `ToDenseBEVConvolution.forward`,
    bev.py:96-110).  NHWC; rows outside the map or past `num` are dropped
    (flat id pushed out of range — XLA scatter semantics)."""
    h, w = bev_shape
    stride = jnp.int32(grid.stride)
    bev_dims = [i for i in range(3) if i != dim]
    off = jnp.asarray(offset, jnp.int32)
    cu = (grid.coords[:, bev_dims[0]] - off[bev_dims[0]]) // stride
    cv = (grid.coords[:, bev_dims[1]] - off[bev_dims[1]]) // stride
    b = grid.coords[:, 3]
    ok = (
        grid.valid_mask()
        & (cu >= 0) & (cu < h)
        & (cv >= 0) & (cv < w)
    )
    flat = jnp.where(ok, (b * h + cu) * w + cv, batch_size * h * w)
    dense = jax.ops.segment_sum(
        feats.astype(jnp.float32), flat, num_segments=batch_size * h * w
    )
    return dense.reshape(batch_size, h, w, -1).astype(feats.dtype)


def bev_height_compression(
    grid: SparseGrid,
    batch_size: int,
    shape: tuple[int, int, int],
    *,
    offset: tuple[int, int, int] = (0, 0, 0),
    dim: int = 2,
) -> jnp.ndarray:
    """Flatten the `dim` axis into channels: (B, H, W, D*C) with D =
    shape[dim] (ts `ToBEVHeightCompression`, bev.py:163-210).  The height
    index is clamped into range like the reference (:200); NHWC output."""
    shape = tuple(int(s) for s in shape)
    bev_dims = [i for i in range(3) if i != dim]
    h, w, d = shape[bev_dims[0]], shape[bev_dims[1]], shape[dim]
    stride = jnp.int32(grid.stride)
    off = jnp.asarray(offset, jnp.int32)
    cu = (grid.coords[:, bev_dims[0]] - off[bev_dims[0]]) // stride
    cv = (grid.coords[:, bev_dims[1]] - off[bev_dims[1]]) // stride
    cz = jnp.clip((grid.coords[:, dim] - off[dim]) // stride, 0, d - 1)
    b = grid.coords[:, 3]
    ok = (
        grid.valid_mask()
        & (cu >= 0) & (cu < h)
        & (cv >= 0) & (cv < w)
    )
    flat = jnp.where(
        ok, ((b * h + cu) * w + cv) * d + cz, batch_size * h * w * d
    )
    dense = jax.ops.segment_sum(
        grid.feats.astype(jnp.float32),
        flat,
        num_segments=batch_size * h * w * d,
    )
    c = grid.feats.shape[-1]
    return (
        dense.reshape(batch_size, h, w, d * c).astype(grid.feats.dtype)
    )


def bev_sparse_conv(
    grid: SparseGrid,
    kernel: jnp.ndarray,
    bounds: GridBounds,
    *,
    out_stride: int = 1,
    dim: int = 2,
    bias: jnp.ndarray | None = None,
) -> SparseGrid:
    """Sparse-output BEV convolution (ts `ToBEVConvolution`, bev.py:113-160):
    per-slice FC by height, collapse `dim`, SUM duplicate columns (the
    reference's sparse_coo/to_dense duplicate semantics), optional extra
    `out_stride` snap of the planar coords."""
    feats = _slice_kernel_matmul(
        grid.feats, grid.coords, kernel, grid.stride, dim
    )
    if bias is not None:
        feats = feats + bias.astype(feats.dtype)
    ratio = grid.stride * out_stride
    coords = grid.coords.at[:, dim].set(0)
    if out_stride > 1:
        planar = (coords[:, :3] // jnp.int32(ratio)) * jnp.int32(ratio)
        coords = jnp.concatenate([planar, coords[:, 3:]], axis=1)
    valid = grid.valid_mask()
    uc, num, inverse, _counts = unique_coords(
        coords, valid, bounds, grid.capacity
    )
    tables = build_segment_tables(inverse, grid.capacity)
    mean = voxelize_avg(feats, inverse, tables)  # mean * count = sum
    sums = mean * jnp.maximum(tables.counts, 1)[:, None].astype(mean.dtype)
    return SparseGrid(coords=uc, feats=sums, num=num, stride=ratio)
