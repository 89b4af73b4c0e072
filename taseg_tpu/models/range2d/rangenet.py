"""RangeNet++ (darknet backbone) — range-view segmentor (flax, NHWC).

Capability match of the reference
(`pcseg/model/segmentor/range/rangenet/module/darknet.py` + segmentor):
darknet residual encoder with width-only downsampling (stride (1, 2), the
RangeNet convention for 64xW range images), a mirrored upsampling decoder
with skip additions, and a 1x1 head.  Post-processing (KNN cleanup) lives
in postproc.py; the CRF variant of the reference is subsumed by KNN (the
reference default).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from .resnet_range import ConvBNLeaky


class DarkResidual(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, train: bool):
        h = ConvBNLeaky(self.features // 2, kernel=(1, 1))(x, train)
        h = ConvBNLeaky(self.features, kernel=(3, 3))(h, train)
        return x + h


class RangeNet(nn.Module):
    num_classes: int
    in_channels: int = 6
    layers: Sequence[int] = (1, 2, 8, 8, 4)  # darknet53; (1,1,2,2,1)=darknet21
    base: int = 32

    @nn.compact
    def __call__(self, scan, train: bool = False):
        b = self.base
        x = ConvBNLeaky(b)(scan, train)
        skips = []
        cur = x
        ch = b
        for n in self.layers:
            skips.append(cur)
            ch *= 2
            # downsample width only (64-beam images are short)
            cur = nn.Conv(
                ch, (3, 3), strides=(1, 2), padding="SAME", use_bias=False
            )(cur)
            cur = nn.BatchNorm(use_running_average=not train, momentum=0.9)(cur)
            cur = nn.leaky_relu(cur, 0.01)
            for _ in range(n):
                cur = DarkResidual(ch)(cur, train)

        # decoder: width-only transposed upsampling + skip additions
        for skip in reversed(skips):
            ch //= 2
            cur = nn.ConvTranspose(
                ch, (1, 4), strides=(1, 2), padding="SAME", use_bias=False
            )(cur)
            cur = nn.BatchNorm(use_running_average=not train, momentum=0.9)(cur)
            cur = nn.leaky_relu(cur, 0.01)
            cur = DarkResidual(ch)(cur, train)
            if skip.shape == cur.shape:
                cur = cur + skip

        cur = nn.Dropout(0.01)(cur, deterministic=not train)
        return nn.Conv(self.num_classes, (1, 1), name="head")(
            cur.astype(jnp.float32)
        )
