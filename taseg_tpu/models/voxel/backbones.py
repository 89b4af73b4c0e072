"""Generic torchsparse demo backbones — SparseResNet21D / SparseResUNet42.

TPU-native re-design of `ts!torchsparse/backbones/{resnet.py,unet.py}` and
their blocks (`backbones/modules/blocks.py`), the feature-extractor demos
shipped with the reference's kernel engine (exercised by
`ts!examples/backbones.py`).  The TASeg segmentors never consume these —
they exist so a torchsparse user migrating here finds the full backbone
surface — but the machinery they force is real: unlike MinkUNet's
kernel==stride==2 ladder, SparseResNet21D downsamples with kernel 3 /
stride 2 and finishes with an anisotropic (1, 3, 1) kernel at stride
(1, 2, 1), which exercises the GENERAL output-coordinate rule of
torchsparse (`ts!nn/functional/downsample.py:25-52`): candidates are every
input coordinate plus every kernel offset, kept when they land on the
sample-stride grid at or above the global coordinate minimum, then
deduplicated.  Here that is one masked `unique_coords` over the (K*V, 4)
candidate table — sort-based like every other topology op, no hashing.

Topology (stage coordinate sets + dense rulebooks) is precomputed by
`build_resnet_topology` outside the forward, the same split as
backbone_context.build_unet_topology.  SparseResUNet42 IS a
kernel-2/stride-2 UNet, so it rides the standard `UNetTopology`
(parent-relation strided convs, same-level 3^3 rulebooks) unchanged.

Weight layouts match torchsparse Conv3d (K, C_in, C_out) with the same
offset enumeration, so reference checkpoints translate 1:1
(tests/test_backbones.py runs both nets A/B against the reference's own
CPU backend with copied weights).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import flax.linen as nn
from flax import struct

from ...ops import (
    GridBounds,
    build_reverse_rulebook,
    build_rulebook,
    build_segment_tables,
    compute_bounds,
    kernel_offsets,
    make_ntuple,
    unique_coords,
)
from ..layers import ConvBNReLU, ResidualBlock
from .backbone_context import UNetTopology

# (num_blocks, out_channels, kernel_size, stride) per stage —
# ts!backbones/resnet.py:57-69
RESNET21D_BLOCKS = (
    (3, 16, 3, 1),
    (3, 32, 3, 2),
    (3, 64, 3, 2),
    (3, 128, 3, 2),
    (1, 128, (1, 3, 1), (1, 2, 1)),
)


def general_downsample(
    coords: jnp.ndarray,
    num: jnp.ndarray,
    kernel_size,
    stride,
    tensor_stride,
    bounds: GridBounds,
    capacity: int,
):
    """Output coordinates of a strided conv with kernel != stride
    (`ts!nn/functional/downsample.py:31-52`): dedup of {c + d} over all
    kernel offsets d, masked to multiples of stride*tensor_stride at or
    above the global per-axis input minimum.  Returns key-sorted coords
    padded to `capacity` plus the true count."""
    ks = make_ntuple(kernel_size)
    st = make_ntuple(stride)
    ts = make_ntuple(tensor_stride)
    offs = jnp.asarray(kernel_offsets(ks, stride=ts))  # (K, 3)
    k = offs.shape[0]
    v = coords.shape[0]
    valid = jnp.arange(v, dtype=jnp.int32) < num
    ss = jnp.asarray([st[i] * ts[i] for i in range(3)], jnp.int32)

    cmin = jnp.min(
        jnp.where(valid[:, None], coords[:, :3], jnp.int32(2**30)), axis=0
    )
    cand_xyz = coords[None, :, :3] + offs[:, None, :]  # (K, V, 3)
    cand = jnp.concatenate(
        [cand_xyz, jnp.broadcast_to(coords[None, :, 3:4], (k, v, 1))], -1
    )
    ok = (
        valid[None, :]
        & jnp.all(cand_xyz % ss == 0, axis=-1)
        & jnp.all(cand_xyz >= cmin, axis=-1)
    )
    out_coords, num_out, _, _ = unique_coords(
        cand.reshape(-1, 4), ok.reshape(-1), bounds, capacity
    )
    return out_coords, num_out


@struct.dataclass
class ResNetStageTopo:
    coords: jnp.ndarray  # (V_s, 4) int32, key-sorted valid-first
    num: jnp.ndarray  # () int32
    rb_entry: jnp.ndarray  # (K_e, V_s) entry-conv rulebook from prev stage
    rb_entry_bwd: jnp.ndarray  # (K_e, V_prev) reverse (gradient) table
    rb_res: Optional[jnp.ndarray] = None  # (27, V_s) for the ResBlocks


@struct.dataclass
class ResNetTopology:
    stages: tuple  # tuple[ResNetStageTopo, ...]
    bounds: GridBounds
    # input row -> stage-0 voxel row (-1 invalid) + its segment tables:
    # place input features with `voxelize_avg(feats, point_inverse,
    # point_tables)` (identity averaging when the input is pre-deduped)
    point_inverse: jnp.ndarray = None
    point_tables: object = None


def build_resnet_topology(
    coords: jnp.ndarray,
    num: jnp.ndarray,
    capacities: Sequence[int],
    blocks=RESNET21D_BLOCKS,
) -> ResNetTopology:
    """Stage coordinate sets + rulebooks for a SparseResNet ladder.

    `coords` are integer voxel coords (N, 4) with zero-row padding (the
    quantized SparseTensor input of `ts!examples/backbones.py:27-33`);
    they are deduplicated and key-sorted into stage 0 here (the join
    machinery requires sorted unique references) and `point_inverse` maps
    input rows to stage-0 rows.  `capacities[s]` bounds stage s's voxel
    count.  The entry rulebook of stage s queries stage s-1's coordinates
    at kernel offsets scaled by the INPUT tensor stride, matching the
    kmap rule of `ts!nn/functional/conv.py:156-176`."""
    assert len(capacities) == len(blocks)
    n = coords.shape[0]
    valid = jnp.arange(n, dtype=jnp.int32) < num
    bounds = compute_bounds(coords, valid, margin=64)
    coords0, num0, inverse, _ = unique_coords(
        coords, valid, bounds, capacities[0]
    )
    point_tables = build_segment_tables(inverse, capacities[0])

    stages = []
    prev_coords, prev_num = coords0, num0
    ts = (1, 1, 1)
    for s, ((_n, _c, ks, st), cap) in enumerate(zip(blocks, capacities)):
        ks_t, st_t = make_ntuple(ks), make_ntuple(st)
        if all(x == 1 for x in st_t):
            cur_coords, cur_num = prev_coords, prev_num
            ts_out = ts
        else:
            cur_coords, cur_num = general_downsample(
                prev_coords, prev_num, ks_t, st_t, ts, bounds, cap
            )
            ts_out = tuple(ts[i] * st_t[i] for i in range(3))
        offs = kernel_offsets(ks_t, stride=ts)
        rb_entry = build_rulebook(
            cur_coords, cur_num, prev_coords, prev_num, offs, bounds
        )
        rb_entry_bwd = build_reverse_rulebook(
            prev_coords, prev_num, cur_coords, cur_num, offs, bounds
        )
        rb_res = None
        if _n > 1:  # stages with ResBlocks: same-level 3^3 at ts_out
            rb_res = build_rulebook(
                cur_coords, cur_num, cur_coords, cur_num,
                kernel_offsets(3, stride=ts_out), bounds,
            )
        stages.append(
            ResNetStageTopo(
                coords=cur_coords, num=cur_num, rb_entry=rb_entry,
                rb_entry_bwd=rb_entry_bwd, rb_res=rb_res,
            )
        )
        prev_coords, prev_num, ts = cur_coords, cur_num, ts_out
    return ResNetTopology(
        stages=tuple(stages), bounds=bounds,
        point_inverse=inverse, point_tables=point_tables,
    )


class SparseResNet(nn.Module):
    """Strided sparse ResNet feature ladder (`ts!backbones/resnet.py:14-54`):
    per stage one strided conv block then kernel-3 residual blocks, emitting
    every stage's features.  Input features live at `topo.stages[0].coords`
    rows (stage 0 has stride 1, so those are the input voxels)."""

    blocks: tuple = RESNET21D_BLOCKS
    width_multiplier: float = 1.0
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, feats, topo: ResNetTopology, train: bool = False):
        outputs = []
        x = feats
        for s, (n_blocks, ch, ks, _st) in enumerate(self.blocks):
            ch = int(ch * self.width_multiplier)
            stage = topo.stages[s]
            mask = (
                jnp.arange(stage.coords.shape[0], dtype=jnp.int32) < stage.num
            )
            x = ConvBNReLU(
                ch, stage.rb_entry.shape[0], axis_name=self.axis_name,
                name=f"stage{s}_conv",
            )(x, (stage.rb_entry, stage.rb_entry_bwd), mask, train)
            for i in range(1, n_blocks):
                x = ResidualBlock(
                    ch, 27, axis_name=self.axis_name, name=f"stage{s}_res{i}"
                )(x, (stage.rb_res, None), mask, train)
            outputs.append(x)
        return outputs


class SparseResNet21D(SparseResNet):
    """4-stage isotropic stride-2 ladder + a (1, 3, 1)/(1, 2, 1) finisher
    (`ts!backbones/resnet.py:57-69`)."""


class SparseResUNet42(nn.Module):
    """Residual sparse UNet (`ts!backbones/unet.py:16-125`): 2-conv stem,
    four [strided conv + 2 ResBlocks] encoder stages, four [transposed
    conv + skip-concat + 2 ResBlocks] decoder stages; returns all nine
    stage outputs in the reference's recursive order [stem, enc1..enc4,
    dec1..dec4].  Rides the standard `UNetTopology` — every strided conv
    is kernel 2 / stride 2 (the parent relation), every ResBlock kernel 3.
    Input features live at `topo.levels[0].coords` rows."""

    stem_channels: int = 32
    encoder_channels: Sequence[int] = (32, 64, 128, 256)
    decoder_channels: Sequence[int] = (256, 128, 96, 96)
    width_multiplier: float = 1.0
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, feats, topo: UNetTopology, train: bool = False):
        nc = [
            int(self.width_multiplier * c)
            for c in (
                [self.stem_channels]
                + list(self.encoder_channels)
                + list(self.decoder_channels)
            )
        ]
        levels = topo.levels
        masks = [
            (jnp.arange(l.coords.shape[0], dtype=jnp.int32) < l.num)
            for l in levels
        ]
        k3 = [(l.rb_k3, None) for l in levels]

        x = ConvBNReLU(nc[0], 27, axis_name=self.axis_name, name="stem_0")(
            feats, k3[0], masks[0], train
        )
        x = ConvBNReLU(nc[0], 27, axis_name=self.axis_name, name="stem_1")(
            x, k3[0], masks[0], train
        )
        outs = [x]
        for k in range(4):
            x = ConvBNReLU(
                nc[k], 8, axis_name=self.axis_name, name=f"enc{k}_down"
            )(x, levels[k + 1].strided, masks[k + 1], train)
            for i in range(2):
                x = ResidualBlock(
                    nc[k + 1], 27, axis_name=self.axis_name,
                    name=f"enc{k}_res{i}",
                )(x, k3[k + 1], masks[k + 1], train)
            outs.append(x)

        y = outs[4]
        for k in range(4):
            lvl = 4 - k
            u = ConvBNReLU(
                nc[k + 5], 8, transposed=True, axis_name=self.axis_name,
                name=f"dec{k}_up",
            )(y, levels[lvl].strided, masks[lvl - 1], train)
            h = jnp.concatenate([u, outs[lvl - 1]], axis=-1)
            y = ResidualBlock(
                nc[k + 5], 27, axis_name=self.axis_name, name=f"dec{k}_fuse0"
            )(h, k3[lvl - 1], masks[lvl - 1], train)
            y = ResidualBlock(
                nc[k + 5], 27, axis_name=self.axis_name, name=f"dec{k}_fuse1"
            )(y, k3[lvl - 1], masks[lvl - 1], train)
            outs.append(y)
        return outs
