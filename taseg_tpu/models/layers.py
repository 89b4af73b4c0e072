"""Sparse neural-net building blocks (flax).

Functional equivalents of `torchsparse.nn.modules` (conv.py:16-72, norm.py,
activation) and the block zoo in the reference MinkUNet
(`pcseg/model/segmentor/voxel/minkunet/minkunet.py:31-183`), re-designed for
static shapes: every module operates on a (V, C) feature matrix plus a
validity mask / rulebook, never on a dynamically sized tensor.

Cross-replica ("sync") batch norm is a `lax.psum` of masked statistics over
the data-parallel mesh axis — the TPU-native replacement for
`nn.SyncBatchNorm` (reference minkunet.py:23-25).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from flax import struct

from ..ops import flip_rulebook, sparse_conv_apply
from ..ops.strided_conv import (
    StridedTables,
    downsample_conv_apply,
    upsample_conv_apply,
)
from ..ops.f3conv import f3_conv_apply
from ..ops.tgf import tgf_conv_apply

# C_in at or below which the stride-1 27-point conv routes through the
# TGF 9-gather path (ops.tgf).  The old default (64) was tuned while a
# dtype-promotion bug ran the decoder in f32; with true-bf16 streams TGF
# wins at EVERY width (whole-model 9.875 vs 9.712 scans/s for f3-wide,
# v5e 2026-08-21), so the default routes all stride-1 k3 convs through
# TGF.  Override for A/B sweeps.
TGF_MAX_CIN = int(os.environ.get("TASEG_TGF_MAX_CIN", "9999"))
# formulation for stride-1 27-point convs ABOVE the TGF threshold:
# "f3" = lane-packed dy-window gathers (ops.f3conv, 9V rows instead of
# 27V; measured 9.27 vs 8.90 scans/s whole-model on v5e, 2026-08-19),
# "27" = per-offset gather+matmul (ops.sparse_conv)
WIDE_CONV = os.environ.get("TASEG_WIDE_CONV", "f3")


@struct.dataclass
class ConvPlan:
    """Rulebooks plus (optional) TGF gather plans.

    `rb_bwd=None` means "flip of rb_fwd" (stride-1 odd kernels).  When the
    TGF tables are present and C_in is at or below the routing threshold,
    SparseConv runs the 9-gather transform-first path (ops.tgf);
    otherwise the 27-gather XLA path (ops.sparse_conv)."""

    rb_fwd: object
    rb_bwd: object = None
    # TGF gather plans (ops.tgf) for the stride-1 27-point case; used for
    # convs whose C_in is at or below the TGF channel threshold
    tgf: object = None
    tgf_bwd: object = None
    # static: request int8 window gathers from the F3 path (models set
    # this on their eval-mode plans; see ops.f3conv._f3_quant_mode)
    quant: bool = struct.field(pytree_node=False, default=False)


def _conv_init(kernel_volume: int, fan: int):
    """Uniform(-std, std) with std = 1/sqrt(fan * K), matching torchsparse
    `nn/modules/conv.py:57-61` so checkpoints are exchangeable."""
    std = 1.0 / (fan * kernel_volume) ** 0.5

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -std, std)

    return init


class SparseConv(nn.Module):
    """Sparse conv over paired dense rulebooks; weights (K, C_in, C_out).

    `rulebooks` is (rb_fwd, rb_bwd) — the reverse table keeps the gradient
    path scatter-free (see ops.sparse_conv).  For stride-1 odd kernels pass
    rb_bwd=None and the flip of rb_fwd is used.
    """

    out_channels: int
    kernel_volume: int  # K = prod(kernel_size); 1 => plain matmul
    transposed: bool = False
    use_bias: bool = False

    @nn.compact
    def __call__(
        self,
        feats: jnp.ndarray,
        rulebooks=None,
    ) -> jnp.ndarray:
        c_in = feats.shape[-1]
        fan = self.out_channels if self.transposed else c_in
        if self.kernel_volume == 1:
            w = self.param(
                "kernel", _conv_init(1, fan), (c_in, self.out_channels)
            )
            # cast the kernel to the activation dtype: bf16 @ f32 would
            # silently promote the whole downstream tensor stream to f32
            # (doubling every later gather's bytes)
            out = feats @ w.astype(feats.dtype)
        else:
            w = self.param(
                "kernel",
                _conv_init(self.kernel_volume, fan),
                (self.kernel_volume, c_in, self.out_channels),
            )
            if isinstance(rulebooks, StridedTables):
                # ks=2/stride=2 pair via the parent relation — join- and
                # rulebook-free (ops.strided_conv); the transposed flag
                # picks the direction, weights stay (8, Ci, Co)
                apply = (
                    upsample_conv_apply
                    if self.transposed
                    else downsample_conv_apply
                )
                out = apply(feats, w, rulebooks)
                if self.use_bias:
                    b = self.param(
                        "bias",
                        _conv_init(self.kernel_volume, fan),
                        (self.out_channels,),
                    )
                    out = out + b
                return out
            if isinstance(rulebooks, ConvPlan):
                plan = rulebooks
            else:
                plan = ConvPlan(rb_fwd=rulebooks[0], rb_bwd=rulebooks[1])
            rb_fwd, rb_bwd = plan.rb_fwd, plan.rb_bwd
            c_out = self.out_channels
            if (
                plan.tgf is not None
                and rb_bwd is None  # stride-1 odd kernel, shared coords
                and self.kernel_volume == 27
                and c_in <= TGF_MAX_CIN
            ):
                out = tgf_conv_apply(
                    feats, w, plan.tgf, plan.tgf_bwd, rb_fwd
                )
                if self.use_bias:
                    b = self.param(
                        "bias",
                        _conv_init(self.kernel_volume, fan),
                        (self.out_channels,),
                    )
                    out = out + b
                return out
            if rb_bwd is None:
                rb_bwd = flip_rulebook(rb_fwd)
                if WIDE_CONV == "f3" and self.kernel_volume == 27:
                    out = f3_conv_apply(feats, w, rb_fwd, rb_bwd, plan.quant)
                    if self.use_bias:
                        b = self.param(
                            "bias",
                            _conv_init(self.kernel_volume, fan),
                            (self.out_channels,),
                        )
                        out = out + b
                    return out
            out = sparse_conv_apply(feats, w, rb_fwd, rb_bwd)
        if self.use_bias:
            b = self.param(
                "bias", _conv_init(self.kernel_volume, fan), (self.out_channels,)
            )
            out = out + b
        return out


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over valid rows only, with optional cross-replica stats.

    Padding rows must not pollute statistics, so mean/var are computed with
    a row mask.  When `axis_name` is set, counts and sums are psum-ed over
    the mesh axis — semantics of torch SyncBatchNorm without any NCCL.
    Running stats follow torch conventions (biased var for normalization,
    unbiased for the running average; torch momentum 0.1 == here 0.1).
    """

    momentum: float = 0.1
    epsilon: float = 1e-5
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, mask: jnp.ndarray, train: bool
    ) -> jnp.ndarray:
        c = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))

        if train:
            m = mask.astype(jnp.float32)[:, None]
            xf = x.astype(jnp.float32)
            cnt = jnp.sum(m)
            s = jnp.sum(xf * m, axis=0)
            ss = jnp.sum(xf * xf * m, axis=0)
            if self.axis_name is not None:
                cnt = jax.lax.psum(cnt, self.axis_name)
                s = jax.lax.psum(s, self.axis_name)
                ss = jax.lax.psum(ss, self.axis_name)
            cnt = jnp.maximum(cnt, 1.0)
            mean = s / cnt
            var = jnp.maximum(ss / cnt - mean * mean, 0.0)
            if not self.is_initializing():
                unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
                ra_mean.value = (
                    (1 - self.momentum) * ra_mean.value + self.momentum * mean
                )
                ra_var.value = (
                    (1 - self.momentum) * ra_var.value + self.momentum * unbiased
                )
        else:
            # inference: running stats are constants — collapse to one
            # fused-multiply-add (y = x*g + b) and skip the padding-row
            # reset: conv outputs at padding rows are never consumed (all
            # rulebook/devox entries point at valid rows only), and the
            # saved (V, C) where-pass per layer is measurable at eval
            g = (
                scale * jax.lax.rsqrt(ra_var.value + self.epsilon)
            ).astype(x.dtype)
            b = (bias - ra_mean.value * scale * jax.lax.rsqrt(
                ra_var.value + self.epsilon
            )).astype(x.dtype)
            return x * g + b

        y = (x - mean.astype(x.dtype)) * jax.lax.rsqrt(
            var.astype(x.dtype) + jnp.asarray(self.epsilon, x.dtype)
        )
        y = y * scale.astype(x.dtype) + bias.astype(x.dtype)
        return jnp.where(mask[:, None], y, 0.0)


class ConvBNReLU(nn.Module):
    """spnn.Conv3d → BatchNorm → ReLU (reference BasicConvolutionBlock /
    BasicDeconvolutionBlock, minkunet.py:31-80)."""

    out_channels: int
    kernel_volume: int
    transposed: bool = False
    axis_name: Optional[str] = None
    bn_momentum: float = 0.1

    @nn.compact
    def __call__(self, feats, rulebooks, mask, train: bool):
        h = SparseConv(
            self.out_channels, self.kernel_volume, transposed=self.transposed
        )(feats, rulebooks)
        h = MaskedBatchNorm(
            momentum=self.bn_momentum, axis_name=self.axis_name
        )(h, mask, train)
        return nn.relu(h)


class ResidualBlock(nn.Module):
    """Two 3x3x3 sparse convs + BN with identity/projected shortcut
    (reference minkunet.py:83-129). Stride is always 1 in MinkUNet blocks,
    so the shortcut projection is a plain 1x1x1 matmul."""

    out_channels: int
    kernel_volume: int = 27
    axis_name: Optional[str] = None
    bn_momentum: float = 0.1
    expansion: int = 1

    @nn.compact
    def __call__(self, feats, rulebooks, mask, train: bool):
        c_in = feats.shape[-1]
        h = SparseConv(self.out_channels, self.kernel_volume)(feats, rulebooks)
        h = MaskedBatchNorm(momentum=self.bn_momentum, axis_name=self.axis_name)(
            h, mask, train
        )
        h = nn.relu(h)
        h = SparseConv(self.out_channels, self.kernel_volume)(h, rulebooks)
        h = MaskedBatchNorm(momentum=self.bn_momentum, axis_name=self.axis_name)(
            h, mask, train
        )
        if c_in == self.out_channels:
            short = feats
        else:
            short = SparseConv(self.out_channels, 1)(feats)
            short = MaskedBatchNorm(
                momentum=self.bn_momentum, axis_name=self.axis_name
            )(short, mask, train)
        return nn.relu(h + short)


class Bottleneck(nn.Module):
    """1-3-1 bottleneck with expansion 4 (reference minkunet.py:132-183)."""

    out_channels: int
    kernel_volume: int = 27
    axis_name: Optional[str] = None
    bn_momentum: float = 0.1
    expansion: int = 4

    @nn.compact
    def __call__(self, feats, rulebooks, mask, train: bool):
        c_in = feats.shape[-1]
        c_exp = self.out_channels * self.expansion
        h = SparseConv(self.out_channels, 1)(feats)
        h = MaskedBatchNorm(momentum=self.bn_momentum, axis_name=self.axis_name)(
            h, mask, train
        )
        h = SparseConv(self.out_channels, self.kernel_volume)(h, rulebooks)
        h = MaskedBatchNorm(momentum=self.bn_momentum, axis_name=self.axis_name)(
            h, mask, train
        )
        h = SparseConv(c_exp, 1)(h)
        h = MaskedBatchNorm(momentum=self.bn_momentum, axis_name=self.axis_name)(
            h, mask, train
        )
        if c_in == c_exp:
            short = feats
        else:
            short = SparseConv(c_exp, 1)(feats)
            short = MaskedBatchNorm(
                momentum=self.bn_momentum, axis_name=self.axis_name
            )(short, mask, train)
        return nn.relu(h + short)


BLOCKS = {"ResBlock": ResidualBlock, "Bottleneck": Bottleneck}
