"""RPVNet — range + point + voxel three-branch fusion segmentor.

Capability match of the reference
(`pcseg/model/segmentor/fusion/rpvnet/rpvnet.py:632-716`): the three
branches meet at FOUR fusion points and the information flow is
bidirectional — after every fusion the summed point features are
re-scattered INTO the next range-branch segment via `point_to_range`
(range_lib `map_count`+`denselize` semantics, :73-91), exactly as the
voxel branch is re-voxelized via point_to_voxel:

    stem_v(img->vox) ‖ stem_r(img)           -> fuse0 (z0)
    voxel enc(z0)    ‖ range enc(scatter z0)  -> fuse1 (z1)   [1/16 scale]
    voxel dec half(z1) ‖ range up1-2(scatter z1) -> fuse2 (z2) [1/4 scale]
    voxel dec rest(z2) ‖ range up3-4(scatter z2) -> fuse3 (z3) [full res]

`range_to_point` is the bilinear sample table (reference F.grid_sample
with normalized pxpy — scale-free, so each fusion scale gets its own
table), `point_to_range` the per-pixel segment mean.  Multi-scale head:
'concat' | 'sum' | 'se' over (z1, z2, z3) (reference :706-716).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import flax.linen as nn
from flax import struct

from ...ops import (
    PointSet,
    devoxelize,
    point_to_range,
    point_to_range_tables,
    range_sample_table,
    voxelize_avg,
)
from ..layers import BLOCKS, ConvBNReLU
from ..range2d.blocks import ResContextBlock, SalsaResBlock, SalsaUpBlock
from ..voxel.backbone_context import UNetTopology
from .spvcnn import PointTransform

FUSION_SCALES = (1, 4, 16)  # full res, after up2, encoder bottom


@struct.dataclass
class RpvContext:
    """Per-step point<->range tables at every fusion scale.

    `h`/`w` are PER-SCAN image dims; `b` is the scan count per shard.  The
    tables index the stacked-flat (b*hs, ws) canvas (row = scan*hs +
    y_local — exact because every fusion scale divides h), while the 2D
    conv branches see a true (b, hs, ws, C) batch so features never bleed
    across scan boundaries (reference keeps scans in the batch dim too)."""

    h: int = struct.field(pytree_node=False)
    w: int = struct.field(pytree_node=False)
    b: int = struct.field(pytree_node=False, default=1)
    scatter: dict = struct.field(default_factory=dict)  # s -> (ids, tables)
    sample: dict = struct.field(default_factory=dict)  # s -> DevoxTable


def build_rpv_context(
    pxf: jnp.ndarray, pyf: jnp.ndarray, valid, h: int, w: int,
    *, batch: int = 1,
) -> RpvContext:
    """pxf/pyf: float pixel coords in the STACKED full-res canvas (rows
    pre-offset by scan_index*h, `fusion_dataset.collate_fusion_batch`)."""
    scatter, sample = {}, {}
    band = jnp.clip(
        jnp.floor(pyf / max(h, 1)).astype(jnp.int32), 0, batch - 1
    )
    for s in FUSION_SCALES:
        hs, ws = max(h // s, 1), max(w // s, 1)
        pxs = pxf / s
        # clamp y inside the point's own scan band so bilinear corners
        # never land in a neighbouring scan's rows
        y_local = jnp.clip(pyf / s - band * hs, 0.0, hs - 1.000001)
        pys = band * hs + y_local
        scatter[s] = point_to_range_tables(
            jnp.floor(pxs).astype(jnp.int32),
            jnp.floor(pys).astype(jnp.int32),
            valid, batch * hs, ws,
        )
        sample[s] = range_sample_table(pxs, pys, valid, batch * hs, ws)
    return RpvContext(h=h, w=w, b=batch, scatter=scatter, sample=sample)


class RangeStem(nn.Module):
    base: int = 32

    @nn.compact
    def __call__(self, img, train: bool):
        x = ResContextBlock(self.base)(img, train)
        return ResContextBlock(self.base)(x, train)


class RangeEncoder(nn.Module):
    """Four pooled SalsaNext stages + an unpooled mid stage (reference
    range_branch.stage1-4 + mid_stage): full res -> 1/16."""

    base: int = 32
    mid: int = 256

    @nn.compact
    def __call__(self, x, train: bool):
        b = self.base
        x, s1 = SalsaResBlock(2 * b, pooling=True, drop_out=False)(x, train)
        x, s2 = SalsaResBlock(4 * b, pooling=True)(x, train)
        x, s3 = SalsaResBlock(8 * b, pooling=True)(x, train)
        x, s4 = SalsaResBlock(8 * b, pooling=True)(x, train)
        x = SalsaResBlock(self.mid, pooling=False)(x, train)
        return x, (s1, s2, s3, s4)


class RangeDecoderTop(nn.Module):
    """up1 + up2: 1/16 -> 1/4 (reference range_branch.up1/up2)."""

    c_up1: int
    c_up2: int

    @nn.compact
    def __call__(self, x, skips, train: bool):
        _, _, s3, s4 = skips
        x = SalsaUpBlock(self.c_up1)(x, s4, train)
        return SalsaUpBlock(self.c_up2)(x, s3, train)


class RangeDecoderBottom(nn.Module):
    """up3 + up4: 1/4 -> full res (reference range_branch.up3/up4)."""

    c_up3: int
    c_up4: int

    @nn.compact
    def __call__(self, x, skips, train: bool):
        s1, s2, _, _ = skips
        x = SalsaUpBlock(self.c_up3)(x, s2, train)
        return SalsaUpBlock(self.c_up4, drop_out=False)(x, s1, train)


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
    multi_scale: str = "concat"

    @nn.compact
    def __call__(
        self,
        points: PointSet,
        topo: UNetTopology,
        rpv: RpvContext,
        range_img: jnp.ndarray,  # (B, H, W, C_img) or (H, W, C_img)
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
        h, w = rpv.h, rpv.w
        dt = self.compute_dtype

        def stack(x, out_ch, n, rbs, mask, name):
            for i in range(n):
                x = blk(
                    out_ch, axis_name=self.axis_name, name=f"{name}_{i}"
                )(x, rbs, mask, train)
            return x

        def to_range(z, scale):
            ids, tables = rpv.scatter[scale]
            hs, ws = max(h // scale, 1), max(w // scale, 1)
            img = point_to_range(z, ids, tables, rpv.b * hs, ws)
            return img.reshape(rpv.b, hs, ws, -1).astype(dt)

        def to_point(img, scale):
            # (B, hs, ws, C) row-major flatten == stacked-canvas layout
            return devoxelize(
                img.reshape(-1, img.shape[-1]), rpv.sample[scale]
            )

        feats = points.feats[:, : self.in_dim]

        # ---- stems (rpvnet.py:645-647) ----
        x0 = voxelize_avg(feats, topo.point_inverse, topo.point_tables)
        x0 = x0.astype(dt)
        x0 = ConvBNReLU(cs[0], 27, axis_name=self.axis_name, name="v_stem0")(
            x0, k3[0], masks[0], train
        )
        x0 = ConvBNReLU(cs[0], 27, axis_name=self.axis_name, name="v_stem1")(
            x0, k3[0], masks[0], train
        )
        if range_img.ndim == 3:
            range_img = range_img[None]
        r_x0 = RangeStem(base=cs[0], name="range_stem")(
            range_img.astype(dt), train
        )

        # ---- fusion 0 (rpvnet.py:649-651) ----
        z0 = (
            devoxelize(x0, topo.devox[1])
            + to_point(r_x0, 1)
            + PointTransform(cs[0], axis_name=self.axis_name, name="pt0")(
                feats, pvalid, train
            )
        )

        # ---- encoders: voxel on point_to_voxel(z0), range on
        # point_to_range(z0) (rpvnet.py:653-664) ----
        inv1, tab1 = topo.point_vox[1]
        x = voxelize_avg(z0, inv1, tab1).astype(dt)
        enc = [x0]
        for l in range(1, 5):
            x = ConvBNReLU(
                x.shape[-1], 8, axis_name=self.axis_name, name=f"down{l}"
            )(x, levels[l].strided, masks[l], train)
            x = stack(x, cs[l], self.num_layer[l - 1], k3[l], masks[l],
                      f"stage{l}")
            enc.append(x)
        x1, x2, x3, x4 = enc[1], enc[2], enc[3], enc[4]
        r_x4, r_skips = RangeEncoder(
            base=cs[0], mid=cs[4], name="range_encoder"
        )(to_range(z0, 1), train)

        # ---- fusion 1 (rpvnet.py:665-668) ----
        z1 = (
            devoxelize(x4, topo.devox[16])
            + to_point(r_x4, 16)
            + PointTransform(cs[4], axis_name=self.axis_name, name="pt1")(
                z0, pvalid, train
            )
        )

        inv16, tab16 = topo.point_vox[16]
        y = voxelize_avg(z1, inv16, tab16).astype(dt)
        y = nn.Dropout(self.dropout_p)(y, deterministic=not train)

        def up(x, lvl, skip, out_ch, n_blocks, name):
            hh = ConvBNReLU(
                out_ch, 8, transposed=True, axis_name=self.axis_name,
                name=f"{name}_deconv",
            )(x, levels[lvl].strided, masks[lvl - 1], train)
            hh = jnp.concatenate([hh, skip], axis=-1)
            return stack(hh, out_ch, n_blocks, k3[lvl - 1], masks[lvl - 1],
                         f"{name}_blocks")

        y1 = up(y, 4, x3, cs[5], self.num_layer[4], "up1")
        y2 = up(y1, 3, x2, cs[6], self.num_layer[5], "up2")
        r_y2 = RangeDecoderTop(
            c_up1=cs[5], c_up2=cs[6], name="range_dec_top"
        )(to_range(z1, 16), r_skips, train)

        # ---- fusion 2 (rpvnet.py:683-686) ----
        z2 = (
            devoxelize(y2, topo.devox[4])
            + to_point(r_y2, 4)
            + PointTransform(cs[6], axis_name=self.axis_name, name="pt2")(
                z1, pvalid, train
            )
        )

        inv4, tab4 = topo.point_vox[4]
        y = voxelize_avg(z2, inv4, tab4).astype(dt)
        y = nn.Dropout(self.dropout_p)(y, deterministic=not train)
        y3 = up(y, 2, x1, cs[7], self.num_layer[6], "up3")
        y4 = up(y3, 1, x0, cs[8], self.num_layer[7], "up4")
        r_y4 = RangeDecoderBottom(
            c_up3=cs[7], c_up4=cs[8], name="range_dec_bottom"
        )(to_range(z2, 4), r_skips, train)

        # ---- fusion 3 (rpvnet.py:701-704) ----
        z3 = (
            devoxelize(y4, topo.devox[1])
            + to_point(r_y4, 1)
            + PointTransform(cs[8], axis_name=self.axis_name, name="pt3")(
                z2, pvalid, train
            )
        )

        zcat = jnp.concatenate([z1, z2, z3], axis=-1).astype(jnp.float32)
        if self.multi_scale == "sum":
            zsum = (
                nn.Dense(cs[8], name="l1")(z1.astype(jnp.float32))
                + nn.Dense(cs[8], name="l2")(z2.astype(jnp.float32))
                + z3.astype(jnp.float32)
            )
            return nn.Dense(self.num_classes, name="classifier")(zsum)
        if self.multi_scale == "se":
            attn = jnp.mean(
                jnp.where(pvalid[:, None], zcat, 0.0), axis=0
            ) / jnp.maximum(jnp.sum(pvalid), 1)
            attn = nn.sigmoid(
                nn.Dense(zcat.shape[-1], name="attn")(attn)
            )
            zcat = zcat * attn[None, :]
        return nn.Dense(self.num_classes, name="classifier")(zcat)
