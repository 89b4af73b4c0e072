"""taseg_tpu.ops — the `tpusparse` core.

TPU-native re-implementation of the torchsparse v1.4.0 + range_lib kernel
surface (SURVEY.md §2.5): coordinate hashing -> sort-based joins, cuckoo
hash map -> sort-merge with cumulative maxima, gather-GEMM-scatter conv ->
dense-rulebook gather + batched MXU matmul with scatter-free custom VJPs,
atomic voxelize/devoxelize -> sorted prefix-sum segment reductions.
"""

from .bev import (
    bev_height_compression,
    bev_reduction,
    bev_sparse_conv,
    global_avg_pool,
    global_max_pool,
    to_dense_bev,
)
from .coords import GridBounds, compute_bounds, pack_keys
from .join import join_keys, lex_search, query_coords, unique_coords
from .point_range import (
    pixel_ids,
    point_to_range,
    point_to_range_tables,
    range_sample_table,
    range_to_point,
)
from .quantize import quantize_coords, sparse_quantize
from .rulebook import (
    build_reverse_rulebook,
    build_rulebook,
    build_rulebook_k3,
    kernel_offsets,
    make_ntuple,
    spdownsample,
)
from .sparse_conv import flip_rulebook, sparse_conv_apply, sparse_matmul
from .strided_conv import (
    StridedTables,
    build_strided_tables,
    downsample_conv_apply,
    upsample_conv_apply,
)
from .sparse_tensor import PointSet, SparseGrid
from .voxelize import (
    DevoxTable,
    IdentityDevoxTable,
    SegmentTables,
    build_segment_tables,
    devoxelize,
    point_to_voxel_index,
    trilinear_table,
    voxelize_avg,
)

__all__ = [
    "DevoxTable",
    "GridBounds",
    "IdentityDevoxTable",
    "PointSet",
    "SegmentTables",
    "SparseGrid",
    "StridedTables",
    "bev_height_compression",
    "bev_reduction",
    "bev_sparse_conv",
    "build_reverse_rulebook",
    "build_rulebook",
    "build_rulebook_k3",
    "build_segment_tables",
    "build_strided_tables",
    "compute_bounds",
    "devoxelize",
    "downsample_conv_apply",
    "flip_rulebook",
    "global_avg_pool",
    "global_max_pool",
    "join_keys",
    "kernel_offsets",
    "lex_search",
    "make_ntuple",
    "pack_keys",
    "pixel_ids",
    "point_to_range",
    "point_to_range_tables",
    "range_sample_table",
    "range_to_point",
    "point_to_voxel_index",
    "quantize_coords",
    "query_coords",
    "sparse_conv_apply",
    "sparse_matmul",
    "sparse_quantize",
    "spdownsample",
    "to_dense_bev",
    "trilinear_table",
    "unique_coords",
    "upsample_conv_apply",
    "voxelize_avg",
]
