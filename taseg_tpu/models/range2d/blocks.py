"""Shared 2D building blocks for range-view segmentors (flax, NHWC).

Re-designs of the reference SalsaNext block zoo
(`pcseg/model/segmentor/range/salsanext/model/semantic/salsanext.py:9-175`)
— conv -> LeakyReLU -> BN ordering, dilated parallel branches, AvgPool
downsampling, PixelShuffle upsampling — as idiomatic flax modules in NHWC
(the TPU-native conv layout).
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn


def pixel_shuffle(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """NHWC depth-to-space (torch PixelShuffle equivalent)."""
    n, h, w, c = x.shape
    r = factor
    x = x.reshape(n, h, w, r, r, c // (r * r))
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h * r, w * r, c // (r * r))


class ConvActBN(nn.Module):
    features: int
    kernel: tuple = (3, 3)
    dilation: int = 1
    use_bn: bool = True

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(
            self.features, self.kernel,
            kernel_dilation=(self.dilation, self.dilation), padding="SAME",
        )(x)
        x = nn.leaky_relu(x, 0.01)
        if self.use_bn:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        return x


class ResContextBlock(nn.Module):
    """1x1 shortcut + (3x3, 3x3 dil 2) residual (salsanext.py:9-37)."""

    features: int

    @nn.compact
    def __call__(self, x, train: bool):
        shortcut = nn.leaky_relu(nn.Conv(self.features, (1, 1))(x), 0.01)
        h = ConvActBN(self.features, (3, 3))(shortcut, train)
        h = ConvActBN(self.features, (3, 3), dilation=2)(h, train)
        return shortcut + h


class SalsaResBlock(nn.Module):
    """Three dilated branches concat -> 1x1 fuse + shortcut; optional
    AvgPool/2 (salsanext.py:40-115). Returns (pooled, pre-pool) when
    pooling, else the features."""

    features: int
    dropout_rate: float = 0.2
    pooling: bool = True
    drop_out: bool = True

    @nn.compact
    def __call__(self, x, train: bool):
        shortcut = nn.leaky_relu(nn.Conv(self.features, (1, 1))(x), 0.01)
        a1 = ConvActBN(self.features, (3, 3))(x, train)
        a2 = ConvActBN(self.features, (3, 3), dilation=2)(a1, train)
        a3 = ConvActBN(self.features, (2, 2), dilation=2)(a2, train)
        fused = ConvActBN(self.features, (1, 1))(
            jnp.concatenate([a1, a2, a3], axis=-1), train
        )
        res = shortcut + fused
        out = res
        if self.drop_out:
            out = nn.Dropout(self.dropout_rate)(out, deterministic=not train)
        if self.pooling:
            pooled = nn.avg_pool(
                out, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
            )
            return pooled, res
        return out


class SalsaUpBlock(nn.Module):
    """PixelShuffle x2 -> concat skip -> dilated branches -> 1x1 fuse
    (salsanext.py:117-175)."""

    features: int
    dropout_rate: float = 0.2
    drop_out: bool = True

    @nn.compact
    def __call__(self, x, skip, train: bool):
        up = pixel_shuffle(x, 2)
        if self.drop_out:
            up = nn.Dropout(self.dropout_rate)(up, deterministic=not train)
        h = jnp.concatenate([up, skip], axis=-1)
        if self.drop_out:
            h = nn.Dropout(self.dropout_rate)(h, deterministic=not train)
        e1 = ConvActBN(self.features, (3, 3))(h, train)
        e2 = ConvActBN(self.features, (3, 3), dilation=2)(e1, train)
        e3 = ConvActBN(self.features, (2, 2), dilation=2)(e2, train)
        out = ConvActBN(self.features, (1, 1))(
            jnp.concatenate([e1, e2, e3], axis=-1), train
        )
        if self.drop_out:
            out = nn.Dropout(self.dropout_rate)(out, deterministic=not train)
        return out
