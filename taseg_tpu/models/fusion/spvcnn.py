"""SPVCNN — sparse point-voxel CNN (fusion family), TPU-native.

Architecture match of the reference
(`pcseg/model/segmentor/fusion/spvcnn/spvcnn.py:380-460`): the MinkUNet
voxel UNet interleaved with a per-point residual branch — after each
voxel_to_point, a Linear+BN+ReLU point MLP of the previous point features
is added, and the result is re-voxelized (point_to_voxel) to seed the next
voxel stage.  Topology requirements beyond MinkUNet: point->voxel segment
tables at strides 1/4/16 (`point_voxel_strides`) and a devox table at
stride 1 that returns real features (z0 is consumed here, unlike MinkUNet
where it is dead — minkunet.py:394 vs spvcnn.py:408-417).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import flax.linen as nn

from ...ops import PointSet, devoxelize, voxelize_avg
from ..layers import BLOCKS, ConvBNReLU, ConvPlan, MaskedBatchNorm
from ..voxel.backbone_context import UNetTopology


class PointTransform(nn.Module):
    """Linear -> BN -> ReLU over per-point features (spvcnn.py
    point_transforms)."""

    features: int
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, valid, train: bool):
        h = nn.Dense(self.features)(x)
        h = MaskedBatchNorm(axis_name=self.axis_name)(h, valid, train)
        return nn.relu(h)


class SPVCNN(nn.Module):
    num_classes: int
    in_dim: int = 4
    planes: Sequence[int] = (32, 32, 64, 128, 256, 256, 128, 96, 96)
    num_layer: Sequence[int] = (2, 3, 4, 6, 2, 2, 2, 2)
    block: str = "ResBlock"
    cr: float = 1.0
    dropout_p: float = 0.3
    multi_scale: str = "concat"
    axis_name: Optional[str] = None
    bn_momentum: float = 0.1
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(
        self, points: PointSet, topo: UNetTopology, train: bool = False
    ) -> jnp.ndarray:
        cs = [int(self.cr * x) for x in self.planes]
        blk = BLOCKS[self.block]
        exp = blk.expansion
        levels = topo.levels
        masks = [
            (jnp.arange(l.coords.shape[0], dtype=jnp.int32) < l.num)
            for l in levels
        ]
        pvalid = points.valid_mask()
        k3 = [
            ConvPlan(l.rb_k3, None, tgf=l.tgf, tgf_bwd=l.tgf_bwd)
            for l in levels
        ]

        def stack(x, out_ch, n, rbs, mask, name):
            for i in range(n):
                x = blk(
                    out_ch, axis_name=self.axis_name,
                    bn_momentum=self.bn_momentum, name=f"{name}_{i}",
                )(x, rbs, mask, train)
            return x

        feats = points.feats[:, : self.in_dim]
        x0 = voxelize_avg(feats, topo.point_inverse, topo.point_tables)
        x0 = x0.astype(self.compute_dtype)

        x0 = ConvBNReLU(
            cs[0], 27, axis_name=self.axis_name, name="stem_0"
        )(x0, k3[0], masks[0], train)
        x0 = ConvBNReLU(
            cs[0], 27, axis_name=self.axis_name, name="stem_1"
        )(x0, k3[0], masks[0], train)
        z0 = devoxelize(x0, topo.devox[1])

        # re-voxelize the point features and run the encoder
        inv1, tab1 = topo.point_vox[1]
        x = voxelize_avg(z0, inv1, tab1).astype(self.compute_dtype)
        enc = [x0]
        for l in range(1, 5):
            x = ConvBNReLU(
                x.shape[-1], 8, axis_name=self.axis_name, name=f"down{l}",
            )(x, levels[l].strided, masks[l], train)
            x = stack(x, cs[l], self.num_layer[l - 1], k3[l], masks[l],
                      f"stage{l}")
            enc.append(x)
        x1, x2, x3, x4 = enc[1], enc[2], enc[3], enc[4]

        z1 = devoxelize(x4, topo.devox[16])
        z1 = z1 + PointTransform(
            cs[4] * exp, axis_name=self.axis_name, name="point_transform_0"
        )(z0, pvalid, train)

        inv16, tab16 = topo.point_vox[16]
        y = voxelize_avg(z1, inv16, tab16).astype(self.compute_dtype)
        y = nn.Dropout(self.dropout_p)(y, deterministic=not train)

        def up(x, lvl, skip, out_ch, n_blocks, name):
            h = ConvBNReLU(
                out_ch, 8, transposed=True, axis_name=self.axis_name,
                name=f"{name}_deconv",
            )(x, levels[lvl].strided, masks[lvl - 1], train)
            h = jnp.concatenate([h, skip], axis=-1)
            return stack(h, out_ch, n_blocks, k3[lvl - 1], masks[lvl - 1],
                         f"{name}_blocks")

        y1 = up(y, 4, x3, cs[5], self.num_layer[4], "up1")
        y2 = up(y1, 3, x2, cs[6], self.num_layer[5], "up2")
        z2 = devoxelize(y2, topo.devox[4])
        z2 = z2 + PointTransform(
            cs[6] * exp, axis_name=self.axis_name, name="point_transform_1"
        )(z1, pvalid, train)

        inv4, tab4 = topo.point_vox[4]
        y = voxelize_avg(z2, inv4, tab4).astype(self.compute_dtype)
        y = nn.Dropout(self.dropout_p)(y, deterministic=not train)
        y3 = up(y, 2, x1, cs[7], self.num_layer[6], "up3")
        y4 = up(y3, 1, x0, cs[8], self.num_layer[7], "up4")
        z3 = devoxelize(y4, topo.devox[1])
        z3 = z3 + PointTransform(
            cs[8] * exp, axis_name=self.axis_name, name="point_transform_2"
        )(z2, pvalid, train)

        if self.multi_scale == "concat":
            z = jnp.concatenate([z1, z2, z3], axis=-1)
        else:
            z = z3
        return nn.Dense(self.num_classes, name="classifier")(
            z.astype(jnp.float32)
        )
