"""select_conv (resident-window selection kernel) vs the XLA oracle.

Runs in Pallas interpret mode on the CPU test platform; on TPU the same
code path compiles to the Mosaic kernel.  Exactness is required: the
selection is a 0/1 one-hot matmul, so fwd results match sparse_conv_apply
to bf16 rounding.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from taseg_tpu.ops.select_conv import (
    TILE,
    build_select_tables,
    select_conv,
    supports,
)
from taseg_tpu.ops.sparse_conv import flip_rulebook, sparse_conv_apply


def _monotone_rulebook(rng, k, v_out, v_in, density=0.3, drift=200):
    """Realistic rulebook: per offset, strictly-increasing matched input
    indices with gaps (the structure rulebook.py produces by construction),
    plus occasional long-drift rows that overflow the 512-voxel window."""
    rb = np.full((k, v_out), -1, np.int32)
    for kk in range(k):
        base = rng.integers(-drift, drift)
        idx = np.clip(np.arange(v_out) + base, 0, v_in - 1)
        jitter = rng.integers(-3, 4, v_out).cumsum() // 7
        idx = np.clip(idx + jitter, 0, v_in - 1)
        m = rng.random(v_out) < density
        rb[kk] = np.where(m, idx, -1)
    # a few far-away matches to exercise the overflow fixup
    far = rng.integers(0, v_out, 5)
    rb[0, far] = rng.integers(0, v_in, 5)
    return jnp.asarray(rb)


@pytest.mark.parametrize(
    "c_in,c_out,k",
    [(32, 32, 27), (32, 64, 27), (64, 64, 27), (128, 128, 8), (16, 32, 8)],
)
def test_select_conv_matches_oracle(c_in, c_out, k):
    rng = np.random.default_rng(0)
    v_out, v_in = 2 * TILE, 2 * TILE
    rb = _monotone_rulebook(rng, k, v_out, v_in)
    feats = jnp.asarray(
        rng.standard_normal((v_in, c_in)), jnp.bfloat16
    )
    w = jnp.asarray(rng.standard_normal((k, c_in, c_out)) * 0.1, jnp.bfloat16)
    assert supports(c_in, v_out)

    tab = build_select_tables(rb, v_in, c_in)
    rb_bwd = flip_rulebook(rb) if k == 27 else rb  # pairing irrelevant fwd
    tab_bwd = build_select_tables(rb_bwd, v_out, c_out)

    got = select_conv(feats, w, tab, tab_bwd, rb)
    want = sparse_conv_apply(feats, w, rb, rb_bwd)
    np.testing.assert_allclose(
        np.asarray(got, np.float32),
        np.asarray(want, np.float32),
        rtol=0.05,
        atol=0.05,
    )


def test_select_conv_grads_match_oracle():
    rng = np.random.default_rng(1)
    c, k = 32, 27
    v = 2 * TILE
    rb = _monotone_rulebook(rng, k, v, v)
    rb_bwd = flip_rulebook(rb)
    feats = jnp.asarray(rng.standard_normal((v, c)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, c, c)) * 0.1, jnp.float32)
    tab = build_select_tables(rb, v, c)
    tab_bwd = build_select_tables(rb_bwd, v, c)

    def loss_sel(f, w):
        return jnp.sum(select_conv(f, w, tab, tab_bwd, rb) ** 2)

    def loss_ora(f, w):
        return jnp.sum(sparse_conv_apply(f, w, rb, rb_bwd) ** 2)

    gf1, gw1 = jax.grad(loss_sel, argnums=(0, 1))(feats, w)
    gf2, gw2 = jax.grad(loss_ora, argnums=(0, 1))(feats, w)
    np.testing.assert_allclose(
        np.asarray(gf1), np.asarray(gf2), rtol=0.08, atol=0.08
    )
    # the kernel's bf16 forward rounds the residual fed into d_W; allow
    # bf16-scale relative error on the (large-magnitude) weight grads
    np.testing.assert_allclose(
        np.asarray(gw1), np.asarray(gw2), rtol=0.1, atol=2.0
    )


def test_tables_overflow_counting():
    rng = np.random.default_rng(2)
    rb = _monotone_rulebook(rng, 27, 2 * TILE, 2 * TILE)
    tab = build_select_tables(rb, 2 * TILE, 32)
    n_ov = int(tab.has_overflow)
    n_valid = int((np.asarray(rb) >= 0).sum())
    assert 0 <= n_ov < n_valid
    # every valid rulebook entry is in exactly one of: primary window,
    # second (predicated) window, or the overflow fixup list
    ov = np.asarray(tab.overflow_rb)
    loc = np.asarray(tab.loc)  # (n_tiles, K_pad, T)
    loc2 = np.asarray(tab.loc2)
    rb_np = np.asarray(rb)
    k, v_out = rb_np.shape
    starts = np.asarray(tab.starts)
    starts2 = np.asarray(tab.starts2)
    for kk in range(k):
        for vv in range(v_out):
            if rb_np[kk, vv] < 0:
                continue
            t, r = divmod(vv, TILE)
            in_w1 = loc[t, kk, r] >= 0
            in_w2 = loc2[t, kk, r] >= 0
            in_ov = ov[kk, vv] >= 0
            assert int(in_w1) + int(in_w2) + int(in_ov) == 1
            if in_w1:
                assert (
                    starts[kk, t] * tab.gp + loc[t, kk, r] == rb_np[kk, vv]
                )
            if in_w2:
                assert starts2[kk, t] >= 0
                assert (
                    starts2[kk, t] * tab.gp + loc2[t, kk, r]
                    == rb_np[kk, vv]
                )


def test_minkunet_with_select_tables_matches_xla_path():
    """Full MinkUNet forward: selection-kernel path vs pure XLA path."""
    from taseg_tpu.models import MinkUNet, UNetCapacities, build_unet_topology
    from taseg_tpu.models.voxel.minkunet import unet_select_gps
    from taseg_tpu.ops import PointSet
    from taseg_tpu.data.synthetic import synthetic_scan
    from taseg_tpu.data.voxel_dataset import VoxelPipeline, collate_shard

    pipe = VoxelPipeline(voxel_size=0.05, training=False)
    rng = np.random.default_rng(0)
    pts, labels = synthetic_scan(rng, 3000)
    ring = np.zeros((len(pts), 1), np.float32)
    s = pipe({"xyzret": np.concatenate([pts, ring], 1), "labels": labels})
    cap = 4096
    arrays = collate_shard([s], cap)
    caps = UNetCapacities.for_points(cap)
    model = MinkUNet(num_classes=20, cr=0.5, num_layer=(1,) * 8)

    coords = jnp.asarray(arrays["point_coords"])
    feats = jnp.asarray(arrays["point_feats"])
    num = jnp.asarray(arrays["num_points"][0])
    points = PointSet(coords=coords, feats=feats, num=num)

    topo_plain = build_unet_topology(coords, num, caps)
    topo_sel = build_unet_topology(
        coords, num, caps, select_gps=unet_select_gps(cr=0.5)
    )
    n_tabs = sum(len(l.sel_k3) for l in topo_sel.levels)
    assert n_tabs > 0

    params = model.init(
        {"params": jax.random.PRNGKey(0)}, points, topo_plain, False
    )
    out_plain = model.apply(params, points, topo_plain, False)
    out_sel = model.apply(params, points, topo_sel, False)
    np.testing.assert_allclose(
        np.asarray(out_plain), np.asarray(out_sel), rtol=0.05, atol=0.05
    )
