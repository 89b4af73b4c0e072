"""taseg_tpu — a TPU-native LiDAR semantic segmentation framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
LittlePey/TASeg (CVPR 2024): sparse-voxel / range-view / fusion segmentors,
temporal LiDAR aggregation (TLAD/FSA), mask distillation, temporal image
aggregation (TIAF), and a config-driven train/eval harness.

Design pillars (see SURVEY.md §7):
  * static shapes everywhere — sparse structures carry a configured capacity
    plus a "valid rows first" packing and a scalar count;
  * sort-based coordinate joins instead of GPU hash maps — TPUs have fast
    sorts and no atomics;
  * topology/feature split — all integer work (unique voxels, rulebooks,
    trilinear tables) is precomputed once per step in a non-differentiable
    context builder, so the hot differentiable path is pure gather/matmul;
  * SPMD data parallelism via jax.sharding.Mesh + shard_map, gradient psum
    over ICI (replacing torch DDP/NCCL).
"""

__version__ = "0.1.0"
