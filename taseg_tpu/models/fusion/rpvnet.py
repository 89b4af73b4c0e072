"""RPVNet — range + point + voxel three-branch fusion segmentor.

Capability match of the reference
(`pcseg/model/segmentor/fusion/rpvnet/rpvnet.py:632-716`): a MinkUNet-style
sparse voxel UNet and a SalsaNext-style range UNet run in parallel, with a
per-point MLP branch; features meet at four fusion points (after the stems,
after the encoders, mid-decoder, and at the end) where voxel_to_point +
range_to_point (bilinear) + point features are summed.  The reference's
range_lib CUDA kernels (`map_count`/`denselize`) and `F.grid_sample` are
the ops in `taseg_tpu.ops.point_range`.

Multi-scale head: 'concat' of the three fusion-point features (the
reference also offers sum/SE variants — concat is the config default).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax.numpy as jnp
import flax.linen as nn
from flax import struct

from ...ops import (
    DevoxTable,
    PointSet,
    SegmentTables,
    devoxelize,
    point_to_range,
    point_to_range_tables,
    range_sample_table,
    voxelize_avg,
)
from ..layers import BLOCKS, ConvBNReLU, MaskedBatchNorm
from ..range2d.blocks import ResContextBlock, SalsaResBlock, SalsaUpBlock
from ..voxel.backbone_context import UNetTopology
from .spvcnn import PointTransform


@struct.dataclass
class RpvContext:
    """Per-step point<->range tables at the scales the branches meet."""

    h: int = struct.field(pytree_node=False)
    w: int = struct.field(pytree_node=False)
    # full-resolution scatter (point -> pixel) tables
    pix_ids: jnp.ndarray
    pix_tables: SegmentTables
    # bilinear sample tables at scale 1 and the decoder meeting scales
    sample_s1: DevoxTable
    sample_s1b: DevoxTable  # same scale, reused at late fusion points


def build_rpv_context(
    pxf: jnp.ndarray, pyf: jnp.ndarray, valid, h: int, w: int
) -> RpvContext:
    ids, tables = point_to_range_tables(
        jnp.floor(pxf).astype(jnp.int32),
        jnp.floor(pyf).astype(jnp.int32),
        valid, h, w,
    )
    s1 = range_sample_table(pxf, pyf, valid, h, w)
    return RpvContext(
        h=h, w=w, pix_ids=ids, pix_tables=tables,
        sample_s1=s1, sample_s1b=s1,
    )


class RangeUNet(nn.Module):
    """SalsaNext-shaped range branch returning full-res feature maps after
    the stem and after the decoder (the two range fusion taps)."""

    base: int = 32

    @nn.compact
    def __call__(self, img, train: bool):
        b = self.base
        x = ResContextBlock(b)(img, train)
        x = ResContextBlock(b)(x, train)
        stem = x  # tap 0 (full res)
        d0c, d0b = SalsaResBlock(2 * b, pooling=True, drop_out=False)(x, train)
        d1c, d1b = SalsaResBlock(4 * b, pooling=True)(d0c, train)
        d2c, d2b = SalsaResBlock(8 * b, pooling=True)(d1c, train)
        d5c = SalsaResBlock(8 * b, pooling=False)(d2c, train)
        u3 = SalsaUpBlock(4 * b)(d5c, d2b, train)
        u2 = SalsaUpBlock(2 * b)(u3, d1b, train)
        u1 = SalsaUpBlock(b, drop_out=False)(u2, d0b, train)
        return stem, u1  # taps at scale 1


class RPVNet(nn.Module):
    num_classes: int
    in_dim: int = 4
    planes: Sequence[int] = (32, 32, 64, 128, 256, 256, 128, 96, 96)
    num_layer: Sequence[int] = (2, 3, 4, 6, 2, 2, 2, 2)
    block: str = "ResBlock"
    cr: float = 1.0
    dropout_p: float = 0.3
    axis_name: Optional[str] = None
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(
        self,
        points: PointSet,
        topo: UNetTopology,
        rpv: RpvContext,
        range_img: jnp.ndarray,  # (H, W, C_img) projected inputs
        train: bool = False,
    ) -> jnp.ndarray:
        cs = [int(self.cr * x) for x in self.planes]
        blk = BLOCKS[self.block]
        levels = topo.levels
        masks = [
            (jnp.arange(l.coords.shape[0], dtype=jnp.int32) < l.num)
            for l in levels
        ]
        pvalid = points.valid_mask()
        k3 = [(l.rb_k3, None) for l in levels]

        def stack(x, out_ch, n, rbs, mask, name):
            for i in range(n):
                x = blk(
                    out_ch, axis_name=self.axis_name, name=f"{name}_{i}"
                )(x, rbs, mask, train)
            return x

        feats = points.feats[:, : self.in_dim]

        # ---- stems ----
        x0 = voxelize_avg(feats, topo.point_inverse, topo.point_tables)
        x0 = x0.astype(self.compute_dtype)
        x0 = ConvBNReLU(cs[0], 27, axis_name=self.axis_name, name="v_stem0")(
            x0, k3[0], masks[0], train
        )
        x0 = ConvBNReLU(cs[0], 27, axis_name=self.axis_name, name="v_stem1")(
            x0, k3[0], masks[0], train
        )
        r_stem, r_out = RangeUNet(base=cs[0], name="range_branch")(
            range_img[None].astype(self.compute_dtype), train
        )

        # ---- fusion 0: voxel + range + point (rpvnet.py:649-651) ----
        z0 = (
            devoxelize(x0, topo.devox[1])
            + devoxelize(r_stem[0].reshape(-1, r_stem.shape[-1]), rpv.sample_s1)
            + PointTransform(cs[0], axis_name=self.axis_name, name="pt0")(
                feats, pvalid, train
            )
        )

        # ---- voxel encoder/decoder on fused point features ----
        inv1, tab1 = topo.point_vox[1]
        x = voxelize_avg(z0, inv1, tab1).astype(self.compute_dtype)
        enc = [x0]
        for l in range(1, 5):
            x = ConvBNReLU(
                x.shape[-1], 8, axis_name=self.axis_name, name=f"down{l}"
            )(x, (levels[l].rb_down, levels[l].rb_up), masks[l], train)
            x = stack(x, cs[l], self.num_layer[l - 1], k3[l], masks[l],
                      f"stage{l}")
            enc.append(x)
        x1, x2, x3, x4 = enc[1], enc[2], enc[3], enc[4]

        # ---- fusion 1: encoder outputs meet at points (rpvnet.py:665-668)
        z1 = devoxelize(x4, topo.devox[16]) + PointTransform(
            cs[4], axis_name=self.axis_name, name="pt1"
        )(z0, pvalid, train)

        inv16, tab16 = topo.point_vox[16]
        y = voxelize_avg(z1, inv16, tab16).astype(self.compute_dtype)
        y = nn.Dropout(self.dropout_p)(y, deterministic=not train)

        def up(x, lvl, skip, out_ch, n_blocks, name):
            h = ConvBNReLU(
                out_ch, 8, transposed=True, axis_name=self.axis_name,
                name=f"{name}_deconv",
            )(x, (levels[lvl].rb_up, levels[lvl].rb_down), masks[lvl - 1], train)
            h = jnp.concatenate([h, skip], axis=-1)
            return stack(h, out_ch, n_blocks, k3[lvl - 1], masks[lvl - 1],
                         f"{name}_blocks")

        y1 = up(y, 4, x3, cs[5], self.num_layer[4], "up1")
        y2 = up(y1, 3, x2, cs[6], self.num_layer[5], "up2")

        # ---- fusion 2: mid-decoder (rpvnet.py:683-686) ----
        z2 = devoxelize(y2, topo.devox[4]) + PointTransform(
            cs[6], axis_name=self.axis_name, name="pt2"
        )(z1, pvalid, train)

        inv4, tab4 = topo.point_vox[4]
        y = voxelize_avg(z2, inv4, tab4).astype(self.compute_dtype)
        y = nn.Dropout(self.dropout_p)(y, deterministic=not train)
        y3 = up(y, 2, x1, cs[7], self.num_layer[6], "up3")
        y4 = up(y3, 1, x0, cs[8], self.num_layer[7], "up4")

        # ---- fusion 3: final voxel + range decoder + point ----
        r3 = devoxelize(r_out[0].reshape(-1, r_out.shape[-1]), rpv.sample_s1b)
        r3 = nn.Dense(cs[8], name="range_proj3")(r3)  # match channel widths
        z3 = (
            devoxelize(y4, topo.devox[1])
            + r3
            + PointTransform(cs[8], axis_name=self.axis_name, name="pt3")(
                z2, pvalid, train
            )
        )

        z = jnp.concatenate([z1, z2, z3], axis=-1).astype(jnp.float32)
        return nn.Dense(self.num_classes, name="classifier")(z)
