"""spnn auxiliary modules: global pools + the ToBEV family (flax).

Module-level counterparts of `torchsparse/nn/modules/pooling.py` and
`torchsparse/nn/modules/bev.py` over the static-capacity `SparseGrid`.
Parameterized modules use the reference's uniform(-1/sqrt(C_in)) kernel
init (bev.py:84-86, 134-136) so converted checkpoints line up.  Dense
outputs are NHWC (TPU-native) instead of the reference's NCHW.

No TASeg recipe instantiates these; they complete the engine surface
(torchsparse's classification / BEV-detection examples use them).
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp

from ..ops.bev import (
    bev_height_compression,
    bev_reduction,
    bev_sparse_conv,
    global_avg_pool,
    global_max_pool,
    to_dense_bev,
    _slice_kernel_matmul,
)
from ..ops.coords import GridBounds
from ..ops.sparse_tensor import SparseGrid


def _kernel_init(c_in: int):
    std = 1.0 / math.sqrt(c_in)

    def init(key, shape, dtype=jnp.float32):
        import jax

        return jax.random.uniform(key, shape, dtype, -std, std)

    return init


class GlobalAvgPool(nn.Module):
    """(B, C) batch-mean pool (ts `modules/pooling.py:11-14`)."""

    batch_size: int

    @nn.compact
    def __call__(self, grid: SparseGrid) -> jnp.ndarray:
        return global_avg_pool(grid, self.batch_size)


class GlobalMaxPool(nn.Module):
    """(B, C) batch-max pool (ts `modules/pooling.py:17-20`)."""

    batch_size: int

    @nn.compact
    def __call__(self, grid: SparseGrid) -> jnp.ndarray:
        return global_max_pool(grid, self.batch_size)


class ToBEVReduction(nn.Module):
    """Sparse BEV mean over the collapsed axis (ts bev.py:18-37)."""

    dim: int = 2

    @nn.compact
    def __call__(self, grid: SparseGrid, bounds: GridBounds) -> SparseGrid:
        return bev_reduction(grid, bounds, dim=self.dim)


class ToDenseBEVConvolution(nn.Module):
    """Height-sliced FC + dense BEV scatter-sum → (B, H, W, C_out)
    (ts bev.py:40-110; NHWC here)."""

    in_channels: int
    out_channels: int
    shape: tuple[int, int, int]
    offset: tuple[int, int, int] = (0, 0, 0)
    dim: int = 2
    use_bias: bool = False
    batch_size: int = 1

    @nn.compact
    def __call__(self, grid: SparseGrid) -> jnp.ndarray:
        n_kernels = int(self.shape[self.dim])
        bev_dims = [i for i in range(3) if i != self.dim]
        kernel = self.param(
            "kernel",
            _kernel_init(self.in_channels),
            (n_kernels, self.in_channels, self.out_channels),
        )
        feats = _slice_kernel_matmul(
            grid.feats, grid.coords, kernel, grid.stride, self.dim
        )
        if self.use_bias:
            feats = feats + self.param(
                "bias", nn.initializers.zeros, (self.out_channels,)
            ).astype(feats.dtype)
        return to_dense_bev(
            grid,
            feats,
            self.batch_size,
            (int(self.shape[bev_dims[0]]), int(self.shape[bev_dims[1]])),
            offset=self.offset,
            dim=self.dim,
        )


class ToBEVConvolution(nn.Module):
    """Height-sliced FC + sparse column sum (ts bev.py:113-160)."""

    in_channels: int
    out_channels: int
    n_kernels: int
    stride: int = 1
    dim: int = 2
    use_bias: bool = False

    @nn.compact
    def __call__(self, grid: SparseGrid, bounds: GridBounds) -> SparseGrid:
        kernel = self.param(
            "kernel",
            _kernel_init(self.in_channels),
            (self.n_kernels, self.in_channels, self.out_channels),
        )
        bias = (
            self.param(
                "bias", nn.initializers.zeros, (self.out_channels,)
            )
            if self.use_bias
            else None
        )
        return bev_sparse_conv(
            grid, kernel, bounds,
            out_stride=self.stride, dim=self.dim, bias=bias,
        )


class ToBEVHeightCompression(nn.Module):
    """Flatten height into channels → (B, H, W, D*C) (ts bev.py:163-210)."""

    channels: int
    shape: tuple[int, int, int]
    offset: tuple[int, int, int] = (0, 0, 0)
    dim: int = 2
    batch_size: int = 1

    @nn.compact
    def __call__(self, grid: SparseGrid) -> jnp.ndarray:
        return bev_height_compression(
            grid, self.batch_size, self.shape,
            offset=self.offset, dim=self.dim,
        )
