"""Cylinder3D (torchsparse variant) — polar-grid asymmetric sparse UNet.

Capability match of the reference Cylinder_TS
(`pcseg/model/segmentor/voxel/cylinder3d/cylinder_ts.py:24-590`):

  * point MLP pre-net (PPmodel BN/Linear stack to 256) + 16ch compression,
    max-pooled initial voxelization (initial_voxelize_max, :24-43 — a
    segment MAX instead of mean);
  * asymmetric-kernel blocks: context/residual blocks alternate (1,3,3)
    and (3,1,3) convs; ReconBlock gates with sigmoid branches of
    (3,1,1)/(1,3,1)/(1,1,3) convs (:337-385);
  * anisotropic downsampling: the last two stages pool only in (rho, phi)
    — strides (2,2,1) — keeping height resolution (height_pooling flag);
  * decoder mirrors with transposed convs; ReconBlock output is
    concatenated with the last up feature and a 3^3 conv head emits
    per-voxel logits; optional point refinement head.

Topology comes from `build_cylinder_topology`, a generalized builder with
per-level anisotropic strides and per-kernel-shape rulebooks.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
from flax import struct

from ...ops import (
    PointSet,
    build_reverse_rulebook,
    build_rulebook,
    build_segment_tables,
    compute_bounds,
    flip_rulebook,
    kernel_offsets,
    sparse_conv_apply,
    spdownsample,
    unique_coords,
)
from ..layers import MaskedBatchNorm, SparseConv
from .backbone_context import UNetCapacities

# per-level tensor strides: last two stages pool only rho/phi
CYL_STRIDES = ((1, 1, 1), (2, 2, 2), (4, 4, 4), (8, 8, 4), (16, 16, 4))
ASYM_KERNELS = ((1, 3, 3), (3, 1, 3))
RECON_KERNELS = ((3, 1, 1), (1, 3, 1), (1, 1, 3))


@struct.dataclass
class CylLevel:
    coords: jnp.ndarray
    num: jnp.ndarray
    rb_asym: tuple  # rulebooks for ASYM_KERNELS
    rb_down: jnp.ndarray | None
    rb_up: jnp.ndarray | None


@struct.dataclass
class CylTopology:
    levels: tuple
    rb_recon: tuple  # level-0 rulebooks for RECON_KERNELS
    rb_head: jnp.ndarray  # level-0 3^3 rulebook
    point_inverse: jnp.ndarray
    point_tables: object
    bounds: object
    num_points: jnp.ndarray


def build_cylinder_topology(
    point_coords: jnp.ndarray, num_points: jnp.ndarray, caps: UNetCapacities
) -> CylTopology:
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
    coords0, num0, inverse, _ = unique_coords(vox0, valid, bounds, caps.voxels[0])
    tables = build_segment_tables(inverse, caps.voxels[0])

    def asym_rbs(coords, num, stride):
        return tuple(
            build_rulebook(
                coords, num, coords, num,
                kernel_offsets(ks, stride=stride), bounds,
            )
            for ks in ASYM_KERNELS
        )

    levels = [
        CylLevel(
            coords=coords0, num=num0,
            rb_asym=asym_rbs(coords0, num0, CYL_STRIDES[0]),
            rb_down=None, rb_up=None,
        )
    ]
    prev_c, prev_n = coords0, num0
    for l in range(1, len(CYL_STRIDES)):
        s_prev = CYL_STRIDES[l - 1]
        step = tuple(
            CYL_STRIDES[l][d] // s_prev[d] for d in range(3)
        )  # (2,2,2) or (2,2,1)
        coords_l, num_l = spdownsample(
            prev_c, prev_n, step, s_prev, bounds, caps.voxels[l]
        )
        ks_down = step  # kernel = stride for the pooling conv
        offs = kernel_offsets(ks_down, stride=s_prev)
        rb_down = build_rulebook(coords_l, num_l, prev_c, prev_n, offs, bounds)
        rb_up = build_reverse_rulebook(
            prev_c, prev_n, coords_l, num_l, offs, bounds
        )
        levels.append(
            CylLevel(
                coords=coords_l, num=num_l,
                rb_asym=asym_rbs(coords_l, num_l, CYL_STRIDES[l]),
                rb_down=rb_down, rb_up=rb_up,
            )
        )
        prev_c, prev_n = coords_l, num_l

    rb_recon = tuple(
        build_rulebook(
            coords0, num0, coords0, num0,
            kernel_offsets(ks, stride=1), bounds,
        )
        for ks in RECON_KERNELS
    )
    rb_head = build_rulebook(
        coords0, num0, coords0, num0, kernel_offsets(3, stride=1), bounds
    )
    return CylTopology(
        levels=tuple(levels), rb_recon=rb_recon, rb_head=rb_head,
        point_inverse=inverse, point_tables=tables, bounds=bounds,
        num_points=num_points,
    )


class AsymResContext(nn.Module):
    """Two parallel (1,3,3)->(3,1,3) paths summed (cylinder_ts.py:88-156)."""

    features: int
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, rbs, mask, train):
        def path(x, order, name):
            h = x
            for i, rbi in enumerate(order):
                k = ASYM_KERNELS[rbi]
                h = SparseConv(self.features, int(np.prod(k)),
                               name=f"{name}_conv{i}")(h, (rbs[rbi], None))
                h = MaskedBatchNorm(axis_name=self.axis_name,
                                    name=f"{name}_bn{i}")(h, mask, train)
                h = nn.leaky_relu(h, 0.01)
            return h

        return path(x, (0, 1), "a") + path(x, (1, 0), "b")


class AsymResBlock(nn.Module):
    features: int
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, rbs, mask, train):
        h = AsymResContext(self.features, self.axis_name, name="res")(
            x, rbs, mask, train
        )
        if x.shape[-1] != self.features:
            x = SparseConv(self.features, 1, name="proj")(x)
        return h + x


class ReconBlock(nn.Module):
    """Sigmoid-gated sum of three 1-D asymmetric conv branches
    (cylinder_ts.py:337-385)."""

    features: int
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, rb_recon, mask, train):
        gate = None
        for i, rb in enumerate(rb_recon):
            h = SparseConv(self.features, 3, name=f"branch{i}")(x, (rb, None))
            h = MaskedBatchNorm(axis_name=self.axis_name, name=f"bn{i}")(
                h, mask, train
            )
            h = jax.nn.sigmoid(h)
            gate = h if gate is None else gate + h
        return gate * x


class CylinderTS(nn.Module):
    num_classes: int
    in_dim: int = 9
    init_size: int = 32
    axis_name: Optional[str] = None
    point_refinement: bool = True

    @nn.compact
    def __call__(self, points: PointSet, topo: CylTopology, train: bool = False):
        b = self.init_size
        pvalid = points.valid_mask()
        levels = topo.levels
        masks = [
            (jnp.arange(l.coords.shape[0], dtype=jnp.int32) < l.num)
            for l in levels
        ]

        # PPmodel point pre-net (cylinder_ts.py:401-418)
        h = points.feats[:, : self.in_dim]
        h = MaskedBatchNorm(axis_name=self.axis_name, name="pp_bn0")(
            h, pvalid, train
        )
        for i, width in enumerate((64, 128, 256)):
            h = nn.Dense(width, name=f"pp_fc{i}")(h)
            h = MaskedBatchNorm(axis_name=self.axis_name, name=f"pp_bn{i+1}")(
                h, pvalid, train
            )
            h = nn.relu(h)
        h = nn.Dense(256, name="pp_fc3")(h)
        h = nn.relu(nn.Dense(16, name="fea_compression")(h))

        # max-pooled initial voxelization (initial_voxelize_max)
        seg = jnp.where(topo.point_inverse >= 0, topo.point_inverse,
                        levels[0].coords.shape[0])
        x0 = jax.ops.segment_max(
            jnp.where(pvalid[:, None], h, -jnp.inf), seg,
            num_segments=levels[0].coords.shape[0] + 1,
            indices_are_sorted=False,
        )[:-1]
        x0 = jnp.where(jnp.isfinite(x0), x0, 0.0)

        x0 = AsymResContext(b, self.axis_name, name="downCntx")(
            x0, levels[0].rb_asym, masks[0], train
        )

        enc = [x0]
        x = x0
        widths = (2 * b, 4 * b, 8 * b, 16 * b)
        for l in range(1, 5):
            k_down = levels[l].rb_down.shape[0]
            x = SparseConv(widths[l - 1], k_down, name=f"pool{l}")(
                x, (levels[l].rb_down, levels[l].rb_up)
            )
            x = MaskedBatchNorm(axis_name=self.axis_name, name=f"pool_bn{l}")(
                x, masks[l], train
            )
            x = nn.leaky_relu(x, 0.01)
            x = AsymResBlock(widths[l - 1], self.axis_name, name=f"res{l+1}")(
                x, levels[l].rb_asym, masks[l], train
            )
            enc.append(x)

        up_widths = (16 * b, 8 * b, 4 * b, 2 * b)
        y = enc[4]
        for i, l in enumerate((4, 3, 2, 1)):
            k_up = levels[l].rb_up.shape[0]
            y = SparseConv(up_widths[i], k_up, transposed=True,
                           name=f"up{i}_deconv")(
                y, (levels[l].rb_up, levels[l].rb_down)
            )
            y = MaskedBatchNorm(axis_name=self.axis_name, name=f"up_bn{i}")(
                y, masks[l - 1], train
            )
            y = nn.leaky_relu(y, 0.01)
            y = jnp.concatenate([y, enc[l - 1]], axis=-1)
            y = AsymResBlock(up_widths[i], self.axis_name, name=f"up{i}_res")(
                y, levels[l - 1].rb_asym, masks[l - 1], train
            )

        recon = ReconBlock(2 * b, self.axis_name, name="ReconNet")(
            y, topo.rb_recon, masks[0], train
        )
        fused = jnp.concatenate([recon, y], axis=-1)
        voxel_logits = SparseConv(self.num_classes, 27, use_bias=True,
                                  name="logits")(fused, (topo.rb_head, None))

        # per-point logits: voxel logits gathered at each point's voxel
        safe = jnp.clip(topo.point_inverse, 0)
        point_logits = jnp.where(
            (topo.point_inverse >= 0)[:, None], voxel_logits[safe], 0.0
        )
        if self.point_refinement:
            pf = jnp.where((topo.point_inverse >= 0)[:, None], fused[safe], 0.0)
            pr = nn.Dense(256, name="change_dim")(pf)
            pr = MaskedBatchNorm(axis_name=self.axis_name, name="pr_bn")(
                pr, pvalid, train
            )
            pr = nn.leaky_relu(pr, 0.01)
            point_logits = point_logits + nn.Dense(
                self.num_classes, name="point_logits"
            )(pr)
        return point_logits.astype(jnp.float32)
