"""CENet / FIDNet — ResNet-34-style range-view segmentors (flax, NHWC).

Architecture matches of the reference models:
  * CENet (`pcseg/model/segmentor/range/cenet/model/semantic/cenet.py:125-
    330`): 3-conv stem (64/128/128), four BasicBlock stages [3,4,6,3] at
    strides 1/2/2/2, bilinear-upsampled multi-scale concat (640ch) ->
    3x3 conv 256 -> 3x3 conv 128 -> 1x1 head, plus three auxiliary heads
    on the upsampled stage features for deep supervision (cenet.py:171-174,
    248-252).
  * FIDNet (`fidnet.py:197-340`): deeper stem into a 512ch trunk, same
    four 128ch stages, 1024ch multi-scale concat -> SemanticHead
    (1024->512->128->classes, fidnet.py:170-195).
Both share the backbone skeleton below.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn


def bilinear_resize(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[3]), "bilinear")


class ConvBNLeaky(nn.Module):
    features: int
    kernel: tuple = (3, 3)
    stride: int = 1
    relu: bool = True

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(
            self.features, self.kernel,
            strides=(self.stride, self.stride), padding="SAME", use_bias=False,
        )(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        if self.relu:
            x = nn.leaky_relu(x, 0.01)
        return x


class BasicBlock2d(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        h = ConvBNLeaky(self.features, stride=self.stride)(x, train)
        h = ConvBNLeaky(self.features, relu=False)(h, train)
        if self.stride != 1 or x.shape[-1] != self.features:
            x = ConvBNLeaky(
                self.features, kernel=(1, 1), stride=self.stride, relu=False
            )(x, train)
        return nn.leaky_relu(h + x, 0.01)


class MultiScaleResNetBackbone(nn.Module):
    """Stem + 4 BasicBlock stages + bilinear multi-scale concat."""

    stem_channels: Sequence[int]
    stage_channels: int = 128
    layers: Sequence[int] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, x, train: bool):
        for c in self.stem_channels:
            x = ConvBNLeaky(c)(x, train)
        h, w = x.shape[1], x.shape[2]

        feats = [x]
        cur = x
        for stage, (n, stride) in enumerate(
            zip(self.layers, (1, 2, 2, 2))
        ):
            for i in range(n):
                cur = BasicBlock2d(
                    self.stage_channels, stride=stride if i == 0 else 1
                )(cur, train)
            feats.append(cur)

        ups = [feats[0], feats[1]] + [
            bilinear_resize(f, h, w) for f in feats[2:]
        ]
        return jnp.concatenate(ups, axis=-1), ups


class CENet(nn.Module):
    """Returns logits; in train mode also 3 aux logits (deep supervision)."""

    num_classes: int
    in_channels: int = 6
    aux: bool = True

    @nn.compact
    def __call__(self, scan, train: bool = False):
        concat, ups = MultiScaleResNetBackbone(
            stem_channels=(64, 128, 128)
        )(scan, train)
        out = ConvBNLeaky(256)(concat, train)
        out = ConvBNLeaky(128)(out, train)
        logits = nn.Conv(self.num_classes, (1, 1), name="semantic_output")(
            out.astype(jnp.float32)
        )
        if self.aux:
            # params must exist regardless of mode; outputs only in train
            aux_logits = [
                nn.Conv(self.num_classes, (1, 1), name=f"aux_head{i+1}")(
                    ups[2 + i].astype(jnp.float32)
                )
                for i in range(3)
            ]
            if train:
                return logits, aux_logits
        return logits


class FIDNet(nn.Module):
    num_classes: int
    in_channels: int = 6

    @nn.compact
    def __call__(self, scan, train: bool = False):
        concat, _ = MultiScaleResNetBackbone(
            stem_channels=(64, 128, 256, 512)
        )(scan, train)
        h = ConvBNLeaky(512, kernel=(1, 1))(concat, train)
        h = ConvBNLeaky(128, kernel=(1, 1))(h, train)
        return nn.Conv(self.num_classes, (1, 1), name="semantic_output")(
            h.astype(jnp.float32)
        )
