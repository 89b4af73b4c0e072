"""torchsparse demo backbones (SparseResNet21D / SparseResUNet42):
general-downsample rule, output structure, and slow-tier A/B parity against
the reference's own CPU backend with copied weights
(`ts!examples/backbones.py`)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from taseg_tpu.models.voxel.backbone_context import (
    UNetCapacities,
    build_unet_topology,
)
from taseg_tpu.models.voxel.backbones import (
    RESNET21D_BLOCKS,
    SparseResNet21D,
    SparseResUNet42,
    build_resnet_topology,
    general_downsample,
)
from taseg_tpu.ops import compute_bounds, kernel_offsets, voxelize_avg


def _unique_coords(rng, n, lo, hi):
    c = np.unique(rng.integers(lo, hi, (n, 3)).astype(np.int32), axis=0)
    return np.concatenate([c, np.zeros((len(c), 1), np.int32)], axis=1)


def _pad(coords, cap):
    out = np.zeros((cap, 4), np.int32)
    out[: len(coords)] = coords
    return jnp.asarray(out), jnp.int32(len(coords))


def _downsample_numpy(coords, kernel_size, stride, tensor_stride):
    """Brute-force port of the general branch of
    `ts!nn/functional/downsample.py:31-52`."""
    offs = kernel_offsets(kernel_size, stride=tensor_stride)
    ss = np.asarray(
        [stride[k] * tensor_stride[k] for k in range(3)], np.int64
    )
    cmin = coords[:, :3].min(0)
    cand = (coords[:, None, :3] + offs[None]).reshape(-1, 3)
    b = np.repeat(coords[:, 3], len(offs))
    ok = (cand % ss == 0).all(1) & (cand >= cmin).all(1)
    rows = np.concatenate([cand[ok], b[ok, None]], axis=1)
    return np.unique(rows, axis=0)


@pytest.mark.parametrize(
    "kernel_size,stride,tensor_stride",
    [(3, (2, 2, 2), (1, 1, 1)), ((1, 3, 1), (1, 2, 1), (4, 4, 4))],
)
def test_general_downsample_rule(kernel_size, stride, tensor_stride):
    rng = np.random.default_rng(0)
    ts = np.asarray(tensor_stride)
    coords = _unique_coords(rng, 600, -6, 6)
    coords[:, :3] *= ts  # live on the input tensor-stride grid
    want = _downsample_numpy(coords, kernel_size, stride, tensor_stride)

    cap = 1024
    c, num = _pad(coords, 4096)
    bounds = compute_bounds(c, jnp.arange(4096) < num, margin=64)
    got_c, got_n = jax.jit(
        general_downsample, static_argnums=(2, 3, 4, 6)
    )(c, num, kernel_size, stride, tensor_stride, bounds, cap)
    got_n = int(got_n)
    assert got_n == len(want)
    got = np.asarray(got_c)[:got_n]
    assert {tuple(r) for r in got.tolist()} == {
        tuple(r) for r in want.tolist()
    }


def test_resnet21d_structure():
    rng = np.random.default_rng(1)
    coords = _unique_coords(rng, 3000, 0, 32)
    caps = (4096, 8192, 8192, 4096, 4096)
    c, num = _pad(coords, 4096)
    topo = build_resnet_topology(c, num, caps)
    feats = jnp.asarray(rng.normal(size=(4096, 4)).astype(np.float32))
    x0 = voxelize_avg(feats, topo.point_inverse, topo.point_tables)

    model = SparseResNet21D()
    params = model.init(jax.random.PRNGKey(0), x0, topo, False)
    outs = jax.jit(lambda v, f: model.apply(v, f, topo, False))(params, x0)

    assert [o.shape[-1] for o in outs] == [16, 32, 64, 128, 128]
    nums = [int(s.num) for s in topo.stages]
    assert nums[0] == len(coords)
    # stage coords live on the output tensor-stride grid
    strides = [(1, 1, 1), (2, 2, 2), (4, 4, 4), (8, 8, 8), (8, 16, 8)]
    for s, st in zip(topo.stages, strides):
        xyz = np.asarray(s.coords)[: int(s.num), :3]
        assert (xyz % np.asarray(st) == 0).all()
    # no stage overflowed its capacity
    for s, cap in zip(topo.stages, caps):
        assert int(s.num) <= cap


def test_resunet42_structure():
    rng = np.random.default_rng(2)
    coords = _unique_coords(rng, 3000, 0, 48)
    cap = 4096
    c, num = _pad(coords, cap)
    caps = UNetCapacities.for_points(cap)
    topo = build_unet_topology(
        c.astype(jnp.float32), num, caps, devox_strides=()
    )
    feats = jnp.asarray(rng.normal(size=(cap, 4)).astype(np.float32))
    x0 = voxelize_avg(feats, topo.point_inverse, topo.point_tables)

    model = SparseResUNet42()
    params = model.init(jax.random.PRNGKey(0), x0, topo, False)
    outs = jax.jit(lambda v, f: model.apply(v, f, topo, False))(params, x0)

    assert [o.shape[-1] for o in outs] == [32, 32, 64, 128, 256, 256, 128, 96, 96]
    rows = [caps.voxels[l] for l in (0, 1, 2, 3, 4, 3, 2, 1, 0)]
    assert [o.shape[0] for o in outs] == rows


# ---------------------------------------------------------------------------
# A/B parity vs the reference's own torchsparse CPU backend
# ---------------------------------------------------------------------------

pytest.importorskip("torch")
import torch  # noqa: E402

from ts_oracle import load_torchsparse  # noqa: E402


@pytest.fixture(scope="module")
def torchsparse_mod():
    mod = load_torchsparse()
    if mod is None:
        pytest.skip("torchsparse CPU backend could not be built")
    return mod


def _set_conv(params, stats, flax_name, tmod, idx=("SparseConv_0", "MaskedBatchNorm_0")):
    """Copy a (conv, bn) torch pair into our ConvBNReLU params in place."""
    conv, bn = tmod
    k = jnp.asarray(conv.kernel.detach().numpy())
    params[flax_name][idx[0]]["kernel"] = k
    params[flax_name][idx[1]]["scale"] = jnp.asarray(bn.weight.detach().numpy())
    params[flax_name][idx[1]]["bias"] = jnp.asarray(bn.bias.detach().numpy())
    stats[flax_name][idx[1]]["mean"] = jnp.asarray(bn.running_mean.numpy())
    stats[flax_name][idx[1]]["var"] = jnp.asarray(bn.running_var.numpy())


def _set_resblock(params, stats, flax_name, tblock):
    """Copy a torchsparse SparseResBlock (main conv-bn-relu-conv-bn +
    optional 1x1 shortcut) into our ResidualBlock params."""
    _set_conv(params, stats, flax_name, (tblock.main[0], tblock.main[1]))
    _set_conv(
        params, stats, flax_name, (tblock.main[3], tblock.main[4]),
        idx=("SparseConv_1", "MaskedBatchNorm_1"),
    )
    if not isinstance(tblock.shortcut, torch.nn.Identity):
        _set_conv(
            params, stats, flax_name,
            (tblock.shortcut[0], tblock.shortcut[1]),
            idx=("SparseConv_2", "MaskedBatchNorm_2"),
        )


def _compare_stage(our_feats, our_coords, our_num, ref_tensor, atol):
    ref = {
        tuple(c.tolist()): f
        for c, f in zip(
            ref_tensor.C.numpy(), ref_tensor.F.detach().numpy()
        )
    }
    n = int(our_num)
    coords = np.asarray(our_coords)[:n]
    feats = np.asarray(our_feats)[:n]
    assert n == len(ref)
    for c, f in zip(coords, feats):
        np.testing.assert_allclose(
            f, ref[tuple(c.tolist())], atol=atol,
            err_msg=f"voxel {c}",
        )


@pytest.mark.slow
def test_resnet21d_parity(torchsparse_mod):
    from torchsparse import SparseTensor
    from torchsparse.backbones import SparseResNet21D as TorchNet

    tnet = TorchNet(in_channels=4).eval()
    rng = np.random.default_rng(3)
    coords = _unique_coords(rng, 2500, 0, 24)
    feats = rng.normal(size=(len(coords), 4)).astype(np.float32)
    with torch.no_grad():
        refs = tnet(
            SparseTensor(torch.from_numpy(feats), torch.from_numpy(coords))
        )

    caps = (4096, 8192, 8192, 4096, 4096)
    c, num = _pad(coords, 4096)
    topo = build_resnet_topology(c, num, caps)
    fpad = np.zeros((4096, 4), np.float32)
    fpad[: len(coords)] = feats
    x0 = voxelize_avg(
        jnp.asarray(fpad), topo.point_inverse, topo.point_tables
    )

    model = SparseResNet21D()
    variables = model.init(jax.random.PRNGKey(0), x0, topo, False)
    import flax

    params = flax.core.unfreeze(variables["params"])
    stats = flax.core.unfreeze(variables["batch_stats"])
    for s, (n_blocks, _c, _k, _st) in enumerate(RESNET21D_BLOCKS):
        stage = tnet[s]
        _set_conv(params, stats, f"stage{s}_conv", (stage[0][0], stage[0][1]))
        for i in range(1, n_blocks):
            _set_resblock(params, stats, f"stage{s}_res{i}", stage[i])

    outs = jax.jit(
        lambda v, f: model.apply(v, f, topo, False)
    )({"params": params, "batch_stats": stats}, x0)
    for out, stage, ref in zip(outs, topo.stages, refs):
        _compare_stage(out, stage.coords, stage.num, ref, atol=2e-3)


@pytest.mark.slow
def test_resunet42_parity(torchsparse_mod):
    from torchsparse import SparseTensor
    from torchsparse.backbones import SparseResUNet42 as TorchNet

    tnet = TorchNet(in_channels=4).eval()
    rng = np.random.default_rng(4)
    coords = _unique_coords(rng, 2500, 0, 32)
    feats = rng.normal(size=(len(coords), 4)).astype(np.float32)
    with torch.no_grad():
        refs = tnet(
            SparseTensor(torch.from_numpy(feats), torch.from_numpy(coords))
        )

    cap = 4096
    c, num = _pad(coords, cap)
    caps = UNetCapacities.for_points(cap)
    topo = build_unet_topology(
        c.astype(jnp.float32), num, caps, devox_strides=()
    )
    fpad = np.zeros((cap, 4), np.float32)
    fpad[: len(coords)] = feats
    x0 = voxelize_avg(
        jnp.asarray(fpad), topo.point_inverse, topo.point_tables
    )

    model = SparseResUNet42()
    variables = model.init(jax.random.PRNGKey(0), x0, topo, False)
    import flax

    params = flax.core.unfreeze(variables["params"])
    stats = flax.core.unfreeze(variables["batch_stats"])
    _set_conv(params, stats, "stem_0", (tnet.stem[0], tnet.stem[1]))
    _set_conv(params, stats, "stem_1", (tnet.stem[3], tnet.stem[4]))
    for k in range(4):
        enc = tnet.encoders[k]
        _set_conv(params, stats, f"enc{k}_down", (enc[0][0], enc[0][1]))
        _set_resblock(params, stats, f"enc{k}_res0", enc[1])
        _set_resblock(params, stats, f"enc{k}_res1", enc[2])
        dec = tnet.decoders[k]
        _set_conv(
            params, stats, f"dec{k}_up",
            (dec["upsample"][0], dec["upsample"][1]),
        )
        _set_resblock(params, stats, f"dec{k}_fuse0", dec["fuse"][0])
        _set_resblock(params, stats, f"dec{k}_fuse1", dec["fuse"][1])

    outs = jax.jit(
        lambda v, f: model.apply(v, f, topo, False)
    )({"params": params, "batch_stats": stats}, x0)
    level_of = (0, 1, 2, 3, 4, 3, 2, 1, 0)
    for out, lvl, ref in zip(outs, level_of, refs):
        lt = topo.levels[lvl]
        _compare_stage(out, lt.coords, lt.num, ref, atol=2e-3)
