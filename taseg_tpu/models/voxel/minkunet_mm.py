"""MinkUNetMsMm — TIAF: Temporal Image Aggregation & Fusion segmentor.

Capability match of the reference
(`pcseg/model/segmentor/voxel/minkunet/minkunet_ms_mm.py:341-572`):

  * UNet2D image branch (SalsaNext-shaped) over the stacked multi-frame
    camera images, trained with dense 2D CE (`loss_image_d`) and a sparse
    per-FOV-point CE at the gathered pixels (`loss_image_s`); it also
    yields per-FOV-point image features + logits via integer (row, col)
    gathering at two scales (reference unet2d.py:189-214);
  * UNet3D lidar-FOV branch over the FOV-cropped fused cloud, fed
    [lidar feats ‖ image features ‖ image logits], trained with its own
    point CE (`loss_image_lidar`) and tapped at three scales;
  * the main MinkUNet branch on the full fused cloud; its tri-scale point
    features are concatenated with the FOV branch's (zero outside FOV —
    `voxel_to_point_fov` semantics are our masked devoxelize) and fed to
    `classifier_fusion` on the FOV-overlap mask;
  * eval ENSEMBLE_TYPE 'replace': fusion logits overwrite main logits on
    the overlap (minkunet_ms_mm.py:537-538) — done with a static-shape
    `where`;
  * 5-term weighted loss (reference :517-535).

The staged-recipe freezing (`fix_part_param` trains only image/fov/fusion
modules) is realized by the harness with an optax mask over parameter
prefixes rather than requires_grad mutation.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import flax.linen as nn

from ...ops import PointSet, devoxelize, voxelize_avg
from ..layers import BLOCKS, ConvBNReLU, ConvPlan
from ..range2d.blocks import ResContextBlock, SalsaResBlock, SalsaUpBlock
from .backbone_context import UNetTopology
from .minkunet import MinkUNet


class UNet2D(nn.Module):
    """SalsaNext-shaped image UNet with per-point feature gathering
    (reference unet2d.py:154-216): returns image logits plus per-point
    [stem ‖ decoder] features and logits gathered at (row, col)."""

    num_classes: int
    base: int = 32

    @nn.compact
    def __call__(self, images, fov_rowcol, fov_valid, train: bool):
        """images (B, H, W, C); fov_rowcol (P, 2) int32 rows already offset
        by image index * H (the reference's img_batch convention)."""
        b_, h, w, _ = images.shape
        x = ResContextBlock(self.base)(images, train)
        x = ResContextBlock(self.base)(x, train)
        stem = x
        d0c, d0b = SalsaResBlock(2 * self.base, pooling=True, drop_out=False)(
            x, train
        )
        d1c, d1b = SalsaResBlock(4 * self.base, pooling=True)(d0c, train)
        d2c, d2b = SalsaResBlock(4 * self.base, pooling=True)(d1c, train)
        d5c = SalsaResBlock(4 * self.base, pooling=False)(d2c, train)
        u3 = SalsaUpBlock(4 * self.base)(d5c, d2b, train)
        u2 = SalsaUpBlock(2 * self.base)(u3, d1b, train)
        u1 = SalsaUpBlock(self.base, drop_out=False)(u2, d0b, train)
        logits = nn.Conv(self.num_classes, (1, 1), name="image_head")(
            u1.astype(jnp.float32)
        )

        # per-FOV-point gathers at integer coords (unet2d.py:189-214);
        # rows are stacked over the image batch: flat = row * W + col
        flat_stem = stem.reshape(-1, stem.shape[-1])
        flat_dec = u1.reshape(-1, u1.shape[-1])
        flat_logits = logits.reshape(-1, self.num_classes)
        idx = jnp.clip(
            fov_rowcol[:, 0] * w + fov_rowcol[:, 1], 0, flat_stem.shape[0] - 1
        )
        m = fov_valid[:, None]
        point_feats = jnp.where(
            m, jnp.concatenate([flat_stem[idx], flat_dec[idx]], -1), 0
        )
        point_logits = jnp.where(m, flat_logits[idx], 0)
        return logits, point_feats, point_logits


class SparseEncoderFov(nn.Module):
    """UNet3D FOV branch (reference unet3d.py:182-316): a compact sparse
    UNet over the FOV cloud tapped at strides 16/4/1 voxel features."""

    planes: Sequence[int] = (32, 32, 64, 128, 256, 256, 128, 96, 96)
    num_layer: Sequence[int] = (2, 3, 4, 6, 2, 2, 2, 2)
    block: str = "ResBlock"
    cr: float = 0.5
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, feats, topo: UNetTopology, train: bool):
        cs = [int(self.cr * x) for x in self.planes]
        blk = BLOCKS[self.block]
        levels = topo.levels
        masks = [
            (jnp.arange(l.coords.shape[0], dtype=jnp.int32) < l.num)
            for l in levels
        ]
        k3 = [
            ConvPlan(l.rb_k3, None, tgf=l.tgf, tgf_bwd=l.tgf_bwd)
            for l in levels
        ]

        def stack(x, out_ch, n, rbs, mask, name):
            for i in range(n):
                x = blk(out_ch, axis_name=self.axis_name, name=f"{name}_{i}")(
                    x, rbs, mask, train
                )
            return x

        x0 = voxelize_avg(feats, topo.point_inverse, topo.point_tables)
        x0 = ConvBNReLU(cs[0], 27, axis_name=self.axis_name, name="stem")(
            x0, k3[0], masks[0], train
        )
        enc = [x0]
        x = x0
        for l in range(1, 5):
            x = ConvBNReLU(
                x.shape[-1], 8, axis_name=self.axis_name, name=f"down{l}"
            )(x, levels[l].strided, masks[l], train)
            x = stack(x, cs[l], 1, k3[l], masks[l], f"stage{l}")
            enc.append(x)
        x4 = enc[4]

        def up(x, lvl, skip, out_ch, name):
            h = ConvBNReLU(
                out_ch, 8, transposed=True, axis_name=self.axis_name,
                name=f"{name}_deconv",
            )(x, levels[lvl].strided, masks[lvl - 1], train)
            h = jnp.concatenate([h, skip], axis=-1)
            return stack(h, out_ch, 1, k3[lvl - 1], masks[lvl - 1],
                         f"{name}_blocks")

        y1 = up(x4, 4, enc[3], cs[5], "up1")
        y2 = up(y1, 3, enc[2], cs[6], "up2")
        y3 = up(y2, 2, enc[1], cs[7], "up3")
        y4 = up(y3, 1, enc[0], cs[8], "up4")
        return x4, y2, y4  # voxel feature taps at strides 16 / 4 / 1


class MinkUNetMsMm(nn.Module):
    """TIAF model. Call with the main fused cloud + its topology, the FOV
    cloud + ITS topology, FOV->main alignment index, image stack, and
    per-FOV-point pixel coords."""

    num_classes: int
    in_dim: int = 5
    cr: float = 1.0
    fov_cr: float = 0.5
    image_base: int = 32
    axis_name: Optional[str] = None
    ensemble_type: str = "replace"

    @nn.compact
    def __call__(
        self,
        points: PointSet,  # main fused cloud
        topo: UNetTopology,
        fov_points: PointSet,  # FOV-cropped fused cloud
        fov_topo: UNetTopology,
        fov_devox: dict,  # stride -> DevoxTable mapping FOV voxels -> MAIN points
        images: jnp.ndarray,  # (B_img, H, W, C)
        fov_rowcol: jnp.ndarray,  # (P_fov, 2) int32 (row offset by img idx)
        train: bool = False,
    ):
        fov_valid = fov_points.valid_mask()

        # ---- image branch ----
        img_logits, img_point_feats, img_point_logits = UNet2D(
            self.num_classes, base=self.image_base, name="image_backbone"
        )(images, fov_rowcol, fov_valid, train)

        # ---- lidar-FOV branch: [lidar ‖ image feats ‖ image logits] ----
        fov_in = jnp.concatenate(
            [
                fov_points.feats[:, : self.in_dim - 1],
                img_point_feats,
                img_point_logits,
            ],
            axis=-1,
        )
        x4_fov, y2_fov, y4_fov = SparseEncoderFov(
            cr=self.fov_cr, axis_name=self.axis_name, name="lidar_backbone"
        )(fov_in, fov_topo, train)
        fov_tri = jnp.concatenate(
            [
                devoxelize(x4_fov, fov_topo.devox[16]),
                devoxelize(y2_fov, fov_topo.devox[4]),
                devoxelize(y4_fov, fov_topo.devox[1]),
            ],
            axis=-1,
        )
        img_lidar_logits = nn.Dense(
            self.num_classes, name="classifier_fov"
        )(fov_tri.astype(jnp.float32))

        # ---- main branch ----
        main_logits, main_tri = MinkUNet(
            num_classes=self.num_classes, in_dim=self.in_dim, cr=self.cr,
            axis_name=self.axis_name, name="main",
        )(points, topo, train, return_features=True)

        # FOV voxel features interpolated onto MAIN points; zero outside
        # FOV (voxel_to_point_fov, minkunet/utils.py:150-170)
        fov_on_main = jnp.concatenate(
            [
                devoxelize(x4_fov, fov_devox[16]),
                devoxelize(y2_fov, fov_devox[4]),
                devoxelize(y4_fov, fov_devox[1]),
            ],
            axis=-1,
        )
        overlap = jnp.sum(jnp.abs(fov_on_main), axis=-1) > 0
        fusion_in = jnp.concatenate([main_tri, fov_on_main], axis=-1)
        fusion_logits = nn.Dense(
            self.num_classes, name="classifier_fusion"
        )(fusion_in.astype(jnp.float32))

        if not train and self.ensemble_type == "replace":
            main_logits = jnp.where(
                overlap[:, None], fusion_logits, main_logits
            )
        return {
            "logits": main_logits,
            "fusion_logits": fusion_logits,
            "overlap": overlap,
            "image_logits": img_logits,
            "image_point_logits": img_point_logits,
            "fov_point_logits": img_lidar_logits,
        }


class MinkUNetMsMmNus(MinkUNetMsMm):
    """nuScenes 6-camera TIAF variant (reference minkunet_ms_mm_nus.py:190).

    The fusion architecture is identical to MinkUNetMsMm: `images` stacks
    the six cameras x selected sweeps as one (B_img, H, W, C) tensor and
    `fov_rowcol` rows arrive pre-offset by image index from the nuScenes
    multi-view reader, so multi-camera support needs no new modules."""
