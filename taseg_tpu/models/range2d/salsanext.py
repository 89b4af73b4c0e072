"""SalsaNext — range-view 2D UNet segmentor (flax, NHWC).

Architecture match of the reference
(`pcseg/model/segmentor/range/salsanext/model/semantic/salsanext.py:177-280`):
3 ResContext stems, 5 ResBlocks (4 pooled), 4 PixelShuffle up blocks with
skip connections, 1x1 logits head.  Channel plan 32/64/128/256.
Losses (WCE or CE+Dice with top-k OHEM, +Lovasz x3, +Boundary) live in
taseg_tpu/loss/range.py and are applied by the harness.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from .blocks import ResContextBlock, SalsaResBlock, SalsaUpBlock


class SalsaNext(nn.Module):
    num_classes: int
    in_channels: int = 6
    base: int = 32

    @nn.compact
    def __call__(self, scan: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """scan: (B, H, W, in_channels) -> logits (B, H, W, num_classes)."""
        b = self.base
        x = ResContextBlock(b)(scan, train)
        x = ResContextBlock(b)(x, train)
        x = ResContextBlock(b)(x, train)

        d0c, d0b = SalsaResBlock(2 * b, pooling=True, drop_out=False)(x, train)
        d1c, d1b = SalsaResBlock(4 * b, pooling=True)(d0c, train)
        d2c, d2b = SalsaResBlock(8 * b, pooling=True)(d1c, train)
        d3c, d3b = SalsaResBlock(8 * b, pooling=True)(d2c, train)
        d5c = SalsaResBlock(8 * b, pooling=False)(d3c, train)

        u4 = SalsaUpBlock(4 * b)(d5c, d3b, train)
        u3 = SalsaUpBlock(4 * b)(u4, d2b, train)
        u2 = SalsaUpBlock(2 * b)(u3, d1b, train)
        u1 = SalsaUpBlock(b, drop_out=False)(u2, d0b, train)

        return nn.Conv(self.num_classes, (1, 1), name="logits")(
            u1.astype(jnp.float32)
        )
