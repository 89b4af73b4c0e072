"""taseg_tpu.ops — the `tpusparse` core.

TPU-native re-implementation of the torchsparse v1.4.0 + range_lib kernel
surface (SURVEY.md §2.5): coordinate hashing → sort-based joins, cuckoo hash
map → binary search, gather-GEMM-scatter conv → dense-rulebook gather +
batched MXU matmul, atomic voxelize/devoxelize → segment reductions.
"""

from .coords import GridBounds, compute_bounds, pack_keys
from .join import lex_search, query_coords, unique_coords
from .quantize import quantize_coords, sparse_quantize
from .rulebook import (
    build_rulebook,
    invert_rulebook,
    kernel_offsets,
    make_ntuple,
    spdownsample,
)
from .sparse_conv import sparse_conv_apply
from .sparse_tensor import PointSet, SparseGrid
from .voxelize import (
    devoxelize,
    point_to_voxel_index,
    trilinear_table,
    voxelize_avg,
)

__all__ = [
    "GridBounds",
    "PointSet",
    "SparseGrid",
    "build_rulebook",
    "compute_bounds",
    "devoxelize",
    "invert_rulebook",
    "kernel_offsets",
    "lex_search",
    "make_ntuple",
    "pack_keys",
    "point_to_voxel_index",
    "quantize_coords",
    "query_coords",
    "sparse_conv_apply",
    "sparse_quantize",
    "spdownsample",
    "trilinear_table",
    "unique_coords",
    "voxelize_avg",
]
