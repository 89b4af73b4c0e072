"""Per-step topology precomputation for sparse UNet backbones.

The reference threads mutable `cmaps`/`kmaps` caches through SparseTensors
(torchsparse `tensor.py:34-35`, `nn/functional/conv.py:144-176`), building
hash maps lazily inside the forward.  On TPU we split topology from
features: every integer structure — unique voxel sets per stride level,
dense forward AND reverse rulebooks (the reverse tables double as the
gradient path, keeping the backward pass scatter-free), and point↔voxel
interpolation/segment tables — is built ONCE per step by
`build_unet_topology` from the input coordinates alone.  The
differentiable forward then touches only gathers, prefix sums, and
matmuls.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from flax import struct

from ...ops import (
    GridBounds,
    IdentityDevoxTable,
    build_rulebook,
    build_rulebook_k3,
    build_segment_tables,
    compute_bounds,
    kernel_offsets,
    point_to_voxel_index,
    spdownsample,
    trilinear_table,
    unique_coords,
)
from ...ops.strided_conv import build_strided_tables
from ...ops.tgf import build_tgf_tables


@dataclass(frozen=True)
class UNetCapacities:
    """Static row capacities. `points` bounds the padded input point count;
    `voxels[l]` bounds the unique voxel count at stride 2**l.  Derived from
    dataset statistics (SURVEY.md §7 'Design stance'); overflow is detected
    host-side via LevelTopo.num > capacity."""

    points: int
    voxels: tuple[int, ...]

    # measured stride-level occupancy fractions on raycast-LiDAR clouds
    # relative to the padded point capacity (120k points -> 92k voxels
    # @0.05m): [0.71, 0.49, 0.18, 0.072, 0.026]; schedule adds ~15-20%
    # headroom per level.  Level 0 stays at 1.0 — dedup can never produce
    # more voxels than points, so overflow there is impossible by
    # construction (eval paths carry no overflow telemetry).  Deeper
    # levels' overflow (LevelTopo.num > capacity) is surfaced as telemetry
    # by the engine, never silently ignored.
    DEFAULT_SCHEDULE = (1.0, 0.60, 0.22, 0.09, 0.035)

    @staticmethod
    def for_points(
        points: int, num_levels: int = 5, schedule=None
    ) -> "UNetCapacities":
        sched = schedule or UNetCapacities.DEFAULT_SCHEDULE
        # capacities are rounded to 256 (gather/matmul tile alignment)
        voxels = tuple(
            max(
                512,
                (int(points * sched[min(l, len(sched) - 1)]) + 255)
                // 256
                * 256,
            )
            for l in range(num_levels)
        )
        return UNetCapacities(points=points, voxels=voxels)

    @staticmethod
    def fit(
        points: int, level_nums, margin: float = 1.15
    ) -> "UNetCapacities":
        """Capacities fitted to MEASURED per-level voxel counts + margin.

        Gather/sort/matmul row counts all scale with capacity, so padding
        waste is paid on every op of every step; fitting to dataset
        statistics (max observed count x margin, 256-aligned) instead of
        a generic schedule is the static-shape analogue of the
        reference's exactly-sized dynamic tensors.  Overflow telemetry
        (train + eval) backstops the margin."""
        voxels = tuple(
            min(
                max(512, (int(n * margin) + 255) // 256 * 256),
                (points + 255) // 256 * 256,
            )
            for n in level_nums
        )
        return UNetCapacities(points=points, voxels=voxels)


def _rb_k3(coords, num, stride, bounds):
    """Same-level 3^3 rulebook — grouped floor-join build by default
    (9V join rows instead of 27V, exactly equivalent); the dense 27-query
    build stays available as a fallback/oracle via TASEG_NO_GROUPED_RB."""
    import os

    if os.environ.get("TASEG_NO_GROUPED_RB"):
        return build_rulebook(
            coords, num, coords, num, kernel_offsets(3, stride=stride), bounds
        )
    return build_rulebook_k3(coords, num, stride, bounds)


@struct.dataclass
class LevelTopo:
    coords: jnp.ndarray  # (V_l, 4) int32, key-sorted valid-first
    num: jnp.ndarray  # () int32
    rb_k3: jnp.ndarray  # (27, V_l) same-level 3^3 rulebook
    # parent relation between this level and the 2x-finer one: serves the
    # ks=2/stride=2 down conv INTO this level and the transposed conv back
    # out of it (ops.strided_conv) — replaces the dense rb_down/rb_up
    # 8-offset rulebooks and their sort-joins; None at level 0
    strided: object = None
    # TGF gather plans (ops.tgf) for rb_k3 and its flip — 9 row gathers
    # instead of 27 for narrow-channel convs
    tgf: object = None
    tgf_bwd: object = None


@struct.dataclass
class UNetTopology:
    levels: tuple  # tuple[LevelTopo, ...] — strides 1, 2, 4, ..., 2^(L-1)
    point_inverse: jnp.ndarray  # (P,) point -> level-0 voxel id (-1 invalid)
    point_tables: object  # SegmentTables for initial average voxelization
    devox: dict  # stride (int) -> DevoxTable | IdentityDevoxTable
    bounds: GridBounds
    num_points: jnp.ndarray  # () int32
    # stride -> (inverse (P,), SegmentTables): point_to_voxel at coarser
    # strides (SPVCNN's point branch; reference minkunet/utils.py:41-64);
    # empty unless built with point_voxel_strides
    point_vox: dict = struct.field(default_factory=dict)


def build_unet_topology(
    point_coords: jnp.ndarray,
    num_points: jnp.ndarray,
    caps: UNetCapacities,
    *,
    num_levels: int = 5,
    devox_strides: tuple[int, ...] = (1, 4, 16),
    integral_points: bool = True,
    point_voxel_strides: tuple[int, ...] = (),
    devox_pairs: bool = True,
    assume_sorted_points: bool = False,
) -> UNetTopology:
    """Build the full MinkUNet topology from float point coords (P, 4).

    Mirrors the lazily-built structures of the reference forward
    (initial_voxelize at minkunet/utils.py:11-36; per-stride kmap builds at
    conv.py:156-176; voxel_to_point tables at utils.py:69-105) as one
    explicit pass.
    """
    p = point_coords.shape[0]
    valid = jnp.arange(p, dtype=jnp.int32) < num_points
    vox0 = jnp.concatenate(
        [
            jnp.floor(point_coords[:, :3]).astype(jnp.int32),
            point_coords[:, 3:4].astype(jnp.int32),
        ],
        axis=1,
    )
    bounds = compute_bounds(vox0, valid, margin=64)

    # assume_sorted_points: the host pipeline pre-sorted every scan by
    # the device key order (VoxelPipeline.sorted_points), so the level-0
    # unique skips its main sort + inverse back-sort (ops/join.py)
    coords0, num0, inverse, _counts = unique_coords(
        vox0, valid, bounds, caps.voxels[0],
        assume_sorted=assume_sorted_points,
    )
    point_tables = build_segment_tables(inverse, caps.voxels[0])

    def _tgf_pair(rb, coords, num, stride):
        # the flipped tables only serve the gradient path; inference
        # topologies (devox_pairs=False) skip them like the devox pairs
        return (
            build_tgf_tables(rb, coords, num, stride, bounds),
            build_tgf_tables(
                jnp.flip(rb, axis=0), coords, num, stride, bounds,
                flipped=True,
            ) if devox_pairs else None,
        )

    levels = []
    rb_k3 = _rb_k3(coords0, num0, 1, bounds)
    tgf0, tgf0_b = _tgf_pair(rb_k3, coords0, num0, 1)
    levels.append(
        LevelTopo(
            coords=coords0, num=num0, rb_k3=rb_k3,
            tgf=tgf0, tgf_bwd=tgf0_b,
        )
    )

    prev_coords, prev_num = coords0, num0
    for l in range(1, num_levels):
        s_prev = 2 ** (l - 1)
        s = 2**l
        coords_l, num_l, parent, counts, perm = spdownsample(
            prev_coords, prev_num, 2, s_prev, bounds, caps.voxels[l],
            return_inverse=True,
        )
        # the strided down/up conv pair needs no rulebook at all — the
        # parent relation from the downsample unique covers both
        # directions (ops.strided_conv)
        strided = build_strided_tables(
            prev_coords, prev_num, parent, counts, perm, s_prev
        )
        rb_k3 = _rb_k3(coords_l, num_l, s, bounds)
        tgf_l, tgf_l_b = _tgf_pair(rb_k3, coords_l, num_l, s)
        levels.append(
            LevelTopo(
                coords=coords_l, num=num_l, rb_k3=rb_k3, strided=strided,
                tgf=tgf_l, tgf_bwd=tgf_l_b,
            )
        )
        prev_coords, prev_num = coords_l, num_l

    # point->coarse-voxel corner lookups WITHOUT joins: chase the parent
    # chain, then read the 8 trilinear corners out of the level's k3
    # rulebook — every corner is within +-s of the ancestor, incl. the
    # floor!=trunc cases at negative coords.  Replaces two ~1M-row
    # sort-joins (trilinear_table) per forward.
    #
    # All of it runs per LEVEL-0 VOXEL, not per point: floor(x/s) ==
    # floor(floor(x)/s) for positive integer s, so a point's stride-s
    # corner set depends only on its deduped integer level-0 voxel.  The
    # chain/pattern/rulebook-select work shrinks from P rows to V0 rows
    # (~2/3), and the per-point table is one narrow (P, 8) row-gather of
    # the (V0, 8) result through `inverse`.
    anc_cache = {0: jnp.arange(coords0.shape[0], dtype=jnp.int32)}

    def _ancestor(l: int) -> jnp.ndarray:
        """(V0,) stride-2^l ancestor row of every level-0 voxel."""
        if l in anc_cache:
            return anc_cache[l]
        prev = _ancestor(l - 1)
        parent = levels[l].strided.parent
        a = jnp.where(prev >= 0, parent[jnp.clip(prev, 0)], -1)
        anc_cache[l] = a
        return a

    corner_cache: dict = {}

    def _corner_v(l: int) -> jnp.ndarray:
        """(V0, 8) rulebook corner rows per level-0 voxel (-1 absent).

        delta0 = (floor - trunc) ancestor mismatch per axis, each
        component in {-1, 0} — so only 8 column patterns exist, which
        lets the corner lookups be STATIC column slices selected by
        `lax.select_n` instead of a dynamic axis-1 gather (measured 2.4x
        on chip: 14.8 -> 6.2 ms per devox stride, scratch/an_devox2.py)."""
        if l in corner_cache:
            return corner_cache[l]
        s = 2**l
        anc = _ancestor(l)
        c0 = coords0[:, :3]
        pf = (c0 // s) * s  # int floor-div: exact at negative coords
        t = levels[l].coords[jnp.clip(anc, 0), :3]
        delta0 = (pf - t) // jnp.int32(s)  # {-1, 0} per axis
        pat = (-delta0[:, 0]) * 4 + (-delta0[:, 1]) * 2 + (-delta0[:, 2])
        pat = jnp.clip(pat, 0, 7)  # garbage rows (anc<0) masked below
        block = levels[l].rb_k3.T[jnp.clip(anc, 0)]  # (V0, 27)
        cases = [block[:, _pattern_cols(m, 8)] for m in range(8)]
        sel = pat[:, None] * jnp.ones((1, 8), jnp.int32)
        cv = jax.lax.select_n(sel, *cases)
        cv = jnp.where((anc >= 0)[:, None], cv, -1)
        corner_cache[l] = cv
        return cv

    def _pattern_cols(m: int, corners: int):
        """Rulebook columns of the first `corners` trilinear corners under
        delta0 pattern m; corner k = 4*jx + 2*jy + jz (kernel_offsets(2)
        enumeration), column = x-fastest (o+1) with o = delta0 + j."""
        d0 = (-((m >> 2) & 1), -((m >> 1) & 1), -(m & 1))
        return [
            (d0[0] + ((k >> 2) & 1) + 1)
            + 3 * (d0[1] + ((k >> 1) & 1) + 1)
            + 9 * (d0[2] + (k & 1) + 1)
            for k in range(corners)
        ]

    devox = {}
    corner_strides = [
        s for s in devox_strides if not (s == 1 and integral_points)
    ]
    corner_idx_by_stride = {}
    if corner_strides:
        # ONE (P,)-row gather for every devox stride's corner rows: the
        # per-stride (V0, 8) tables are concatenated along columns and
        # pulled through `inverse` together (one launch instead of one
        # per stride; chip-measured ~0.4 ms off the topology stage —
        # int32 gathers stay bytes-bound at this width, so the win is
        # the launch, not the rows).
        cat = jnp.concatenate(
            [_corner_v(s.bit_length() - 1) for s in corner_strides], axis=1
        )
        g = cat[jnp.clip(inverse, 0)]  # (P, 8*K)
        ok = (inverse >= 0) & valid
        g = jnp.where(ok[:, None], g, -1)
        for i, s in enumerate(corner_strides):
            corner_idx_by_stride[s] = g[:, 8 * i : 8 * (i + 1)].T  # (8, P)

    for s in devox_strides:
        if s == 1 and integral_points:
            # host-deduped integer points: trilinear at stride 1 collapses
            # to the identity gather through the existing inverse map
            devox[s] = IdentityDevoxTable(
                inverse=inverse, tables=point_tables
            )
            continue
        l = s.bit_length() - 1
        devox[s] = trilinear_table(
            point_coords, valid, levels[l].coords, levels[l].num, s, bounds,
            with_pairs=devox_pairs,
            corner_idx=corner_idx_by_stride[s],
        )

    point_vox = {}
    for s in point_voxel_strides:
        if s == 1:
            point_vox[s] = (inverse, point_tables)
            continue
        l = s.bit_length() - 1
        # the containing (floor) voxel is corner j=(0,0,0)
        inv_s = _corner_v(l)[jnp.clip(inverse, 0), 0]
        inv_s = jnp.where((inverse >= 0) & valid, inv_s, -1)
        point_vox[s] = (
            inv_s, build_segment_tables(inv_s, levels[l].coords.shape[0])
        )

    return UNetTopology(
        levels=tuple(levels),
        point_inverse=inverse,
        point_tables=point_tables,
        devox=devox,
        bounds=bounds,
        num_points=num_points,
        point_vox=point_vox,
    )
