"""Golden tests for rulebooks, sparse conv, voxelize/devoxelize.

The numpy oracle reproduces the reference semantics exactly:
  * conv: out[o] += in[i] @ W[k] for every pair with
    in_coords[i] == out_coords[o] + offsets[k]
    (torchsparse nn/functional/conv.py:69-79, the device-free fallback);
  * transposed conv: roles swapped (conv.py:73-78 with transposed=True);
  * voxelize: per-voxel feature mean (backend/voxelize/voxelize_cuda.cu);
  * devoxelize: 8-corner trilinear with -1 masking + renormalization
    (nn/functional/devoxelize.py:10-48).
Gradients are checked against finite differences (the custom VJPs replace
XLA's scatter-based autodiff).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from taseg_tpu.ops import (
    build_reverse_rulebook,
    build_rulebook,
    build_segment_tables,
    compute_bounds,
    devoxelize,
    flip_rulebook,
    kernel_offsets,
    sparse_conv_apply,
    spdownsample,
    trilinear_table,
    unique_coords,
    voxelize_avg,
)


def unique_np(coords):
    return np.unique(coords, axis=0)


def conv_oracle(in_coords, in_feats, out_coords, w, offsets, transposed=False):
    k = w.shape[0]
    if not transposed:
        lut = {tuple(c): i for i, c in enumerate(in_coords)}
        out = np.zeros((len(out_coords), w.shape[2]), np.float64)
        for kk in range(k):
            for o, oc in enumerate(out_coords):
                key = (
                    oc[0] + offsets[kk, 0],
                    oc[1] + offsets[kk, 1],
                    oc[2] + offsets[kk, 2],
                    oc[3],
                )
                i = lut.get(key)
                if i is not None:
                    out[o] += in_feats[i] @ w[kk]
        return out
    # transposed: pair (fine f, coarse c, k) with fine[f] == coarse[c] + d_k
    fine_coords, coarse_coords = out_coords, in_coords
    out = np.zeros((len(fine_coords), w.shape[2]), np.float64)
    lut_c = {tuple(c): i for i, c in enumerate(coarse_coords)}
    for kk in range(k):
        for f, fc in enumerate(fine_coords):
            key = (
                fc[0] - offsets[kk, 0],
                fc[1] - offsets[kk, 1],
                fc[2] - offsets[kk, 2],
                fc[3],
            )
            c = lut_c.get(key)
            if c is not None:
                out[f] += in_feats[c] @ w[kk]
    return out


def make_grid(rng, n=200, span=12, batches=2, cap=256, cin=8):
    coords = np.concatenate(
        [
            rng.integers(0, span, size=(n, 3)),
            rng.integers(0, batches, size=(n, 1)),
        ],
        axis=1,
    ).astype(np.int32)
    coords = unique_np(coords)
    feats = rng.normal(size=(len(coords), cin)).astype(np.float32)
    valid = np.ones(len(coords), bool)
    bounds = compute_bounds(jnp.asarray(coords), jnp.asarray(valid))
    ucoords, num, inverse, _ = unique_coords(
        jnp.asarray(coords), jnp.asarray(valid), bounds, cap
    )
    inv = np.asarray(inverse)
    feats_sorted = np.zeros((cap, cin), np.float32)
    feats_sorted[inv] = feats
    return coords, feats, ucoords, num, feats_sorted, bounds


@pytest.mark.parametrize("ks", [3, 1])
def test_sparse_conv_stride1_matches_oracle(ks):
    rng = np.random.default_rng(3)
    cin, cout, cap = 8, 16, 256
    coords, feats, ucoords, num, feats_sorted, bounds = make_grid(rng, cin=cin)
    offs = kernel_offsets(ks, stride=1)
    w = rng.normal(size=(len(offs), cin, cout)).astype(np.float32) * 0.1

    rb = build_rulebook(ucoords, num, ucoords, num, offs, bounds)
    out = np.asarray(
        sparse_conv_apply(
            jnp.asarray(feats_sorted), jnp.asarray(w), rb, flip_rulebook(rb)
        )
    )
    un = np.asarray(ucoords)[: int(num)]
    ref = conv_oracle(un, feats_sorted[: int(num)], un, w, offs)
    np.testing.assert_allclose(out[: int(num)], ref, rtol=1e-4, atol=1e-4)


def test_downsample_conv_and_transposed_match_oracle():
    rng = np.random.default_rng(4)
    cin, cout, cap, cap2 = 8, 16, 256, 256
    coords, feats, ucoords, num, feats_sorted, bounds = make_grid(rng, cin=cin)

    dcoords, dnum = spdownsample(ucoords, num, 2, 1, bounds, cap2)
    offs = kernel_offsets(2, stride=1)
    w = rng.normal(size=(len(offs), cin, cout)).astype(np.float32) * 0.1
    rb_down = build_rulebook(dcoords, dnum, ucoords, num, offs, bounds)
    rb_up = build_reverse_rulebook(ucoords, num, dcoords, dnum, offs, bounds)
    out = np.asarray(
        sparse_conv_apply(jnp.asarray(feats_sorted), jnp.asarray(w), rb_down, rb_up)
    )

    un = np.asarray(ucoords)[: int(num)]
    dn = np.asarray(dcoords)[: int(dnum)]
    ref_down = unique_np(
        np.concatenate(
            [np.trunc(un[:, :3] / 2).astype(np.int32) * 2, un[:, 3:]], axis=1
        )
    )
    assert {tuple(r) for r in dn} == {tuple(r) for r in ref_down}

    ref = conv_oracle(un, feats_sorted[: int(num)], dn, w, offs)
    np.testing.assert_allclose(out[: int(dnum)], ref, rtol=1e-4, atol=1e-4)

    # transposed conv back up: forward table rb_up, gradient table rb_down
    coarse_feats = rng.normal(size=(cap2, cout)).astype(np.float32)
    coarse_feats[int(dnum):] = 0
    wt = rng.normal(size=(len(offs), cout, cin)).astype(np.float32) * 0.1
    up = np.asarray(
        sparse_conv_apply(jnp.asarray(coarse_feats), jnp.asarray(wt), rb_up, rb_down)
    )
    ref_up = conv_oracle(
        dn, coarse_feats[: int(dnum)], un, wt, offs, transposed=True
    )
    np.testing.assert_allclose(up[: int(num)], ref_up, rtol=1e-4, atol=1e-4)


def test_voxelize_avg_matches_mean():
    rng = np.random.default_rng(5)
    p, cap, c = 300, 128, 6
    inverse = rng.integers(-1, 40, size=p).astype(np.int32)
    feats = rng.normal(size=(p, c)).astype(np.float32)
    tables = build_segment_tables(jnp.asarray(inverse), cap)
    out = np.asarray(voxelize_avg(jnp.asarray(feats), jnp.asarray(inverse), tables))
    for v in range(40):
        rows = feats[inverse == v]
        if len(rows):
            np.testing.assert_allclose(out[v], rows.mean(0), rtol=1e-4, atol=1e-4)
        else:
            np.testing.assert_allclose(out[v], 0.0, atol=1e-5)


def test_voxelize_grad_matches_fd():
    rng = np.random.default_rng(8)
    p, cap, c = 60, 32, 3
    inverse = rng.integers(-1, 10, size=p).astype(np.int32)
    feats = jnp.asarray(rng.normal(size=(p, c)).astype(np.float32))
    tables = build_segment_tables(jnp.asarray(inverse), cap)
    probe = jnp.asarray(rng.normal(size=(cap, c)).astype(np.float32))

    def loss(f):
        return jnp.sum(voxelize_avg(f, jnp.asarray(inverse), tables) * probe)

    g = jax.grad(loss)(feats)
    eps = 1e-3
    for (i, j) in [(0, 0), (5, 2), (59, 1)]:
        fp = feats.at[i, j].add(eps)
        fm = feats.at[i, j].add(-eps)
        fd = (loss(fp) - loss(fm)) / (2 * eps)
        np.testing.assert_allclose(g[i, j], fd, rtol=2e-2, atol=1e-3)


def test_trilinear_devoxelize_matches_oracle_and_grad():
    rng = np.random.default_rng(6)
    cap, c, p, stride = 256, 5, 100, 2
    coords, feats, ucoords, num, feats_sorted, bounds = make_grid(
        rng, n=150, span=8, cin=c
    )
    vc = np.asarray(ucoords)[: int(num)]
    vc2 = unique_np(np.concatenate([(vc[:, :3] // 2) * 2, vc[:, 3:]], axis=1))
    valid = np.ones(len(vc2), bool)
    uc2, num2, inv2, _ = unique_coords(
        jnp.asarray(vc2), jnp.asarray(valid), bounds, cap
    )
    vfeats = np.zeros((cap, c), np.float32)
    vfeats[np.asarray(inv2)] = rng.normal(size=(len(vc2), c)).astype(np.float32)

    pts = np.concatenate(
        [
            rng.uniform(0, 8, size=(p, 3)),
            rng.integers(0, 2, size=(p, 1)).astype(np.float64),
        ],
        axis=1,
    ).astype(np.float32)
    pvalid = np.ones(p, bool)
    table = trilinear_table(
        jnp.asarray(pts), jnp.asarray(pvalid), uc2, num2, stride, bounds
    )
    out = np.asarray(devoxelize(jnp.asarray(vfeats), table))

    lut = {tuple(cc): i for i, cc in enumerate(np.asarray(uc2)[: int(num2)])}
    s = float(stride)
    ref = np.zeros((p, c), np.float64)
    for i in range(p):
        x = pts[i, :3].astype(np.float64)
        b = int(pts[i, 3])
        pf = np.floor(x / s) * s
        ws, idxs = [], []
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    cnr = pf + np.array([dx, dy, dz]) * s
                    key = (int(cnr[0]), int(cnr[1]), int(cnr[2]), b)
                    j = lut.get(key, -1)
                    dd = np.array([dx, dy, dz], np.float64)
                    frac = (x - pf) / s
                    wgt = np.prod(np.where(dd > 0, frac, 1 - frac))
                    if j < 0:
                        wgt = 0.0
                    ws.append(wgt)
                    idxs.append(j)
        ws = np.array(ws)
        ws = ws / (ws.sum() + 1e-8)
        for j, wgt in zip(idxs, ws):
            if j >= 0:
                ref[i] += wgt * vfeats[j]
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)

    # gradient via the scatter-free pair-table backward vs finite diff
    vf = jnp.asarray(vfeats)
    probe = jnp.asarray(rng.normal(size=(p, c)).astype(np.float32))

    def loss(v):
        return jnp.sum(devoxelize(v, table) * probe)

    g = jax.grad(loss)(vf)
    eps = 1e-2
    for (i, j) in [(0, 0), (3, 4), (int(num2) - 1, 2)]:
        fd = (loss(vf.at[i, j].add(eps)) - loss(vf.at[i, j].add(-eps))) / (2 * eps)
        np.testing.assert_allclose(g[i, j], fd, rtol=3e-2, atol=2e-3)


def test_conv_gradients_match_fd():
    rng = np.random.default_rng(7)
    cin, cout = 4, 8
    coords, feats, ucoords, num, feats_sorted, bounds = make_grid(
        rng, n=80, span=6, cin=cin
    )
    offs = kernel_offsets(3, stride=1)
    w = jnp.asarray(rng.normal(size=(27, cin, cout)).astype(np.float32) * 0.1)
    rb = build_rulebook(ucoords, num, ucoords, num, offs, bounds)
    rbt = flip_rulebook(rb)
    f0 = jnp.asarray(feats_sorted)

    def loss(w, f):
        return jnp.sum(sparse_conv_apply(f, w, rb, rbt) ** 2)

    g_w, g_f = jax.grad(loss, argnums=(0, 1))(w, f0)
    eps = 1e-3
    for (kk, i, o) in [(13, 0, 0), (0, 1, 2), (26, 3, 7)]:
        fd = (loss(w.at[kk, i, o].add(eps), f0) -
              loss(w.at[kk, i, o].add(-eps), f0)) / (2 * eps)
        np.testing.assert_allclose(g_w[kk, i, o], fd, rtol=2e-2, atol=1e-2)
    # input gradient (exercises the reverse-rulebook path)
    for (i, j) in [(0, 0), (10, 3), (int(num) - 1, 1)]:
        fd = (loss(w, f0.at[i, j].add(eps)) -
              loss(w, f0.at[i, j].add(-eps))) / (2 * eps)
        np.testing.assert_allclose(g_f[i, j], fd, rtol=2e-2, atol=1e-2)


def test_tgf_conv_matches_reference_conv():
    """TGF (9-gather, transform-first) vs the 27-gather conv: exact parity
    in f32 on random grids, which exercise every (dy-1, dy0, dy+1)
    presence pattern incl. the stacked fallback variants (ops/tgf.py)."""
    from taseg_tpu.ops.tgf import build_tgf_tables, tgf_conv_apply

    for seed, n, span in ((3, 200, 12), (11, 60, 5), (23, 400, 9)):
        rng = np.random.default_rng(seed)
        cin, cout, cap = 8, 16, 512
        coords, feats, ucoords, num, feats_sorted, bounds = make_grid(
            rng, n=n, span=span, cap=cap, cin=cin
        )
        offs = kernel_offsets(3, stride=1)
        w = jnp.asarray(rng.normal(size=(27, cin, cout)).astype(np.float32) * 0.1)
        rb = build_rulebook(ucoords, num, ucoords, num, offs, bounds)
        tab = build_tgf_tables(rb, ucoords, num, 1, bounds)
        tab_b = build_tgf_tables(
            flip_rulebook(rb), ucoords, num, 1, bounds, flipped=True
        )
        f0 = jnp.asarray(feats_sorted)

        ref = sparse_conv_apply(f0, w, rb, flip_rulebook(rb))
        out = tgf_conv_apply(f0, w, tab, tab_b, rb)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4
        )

        # gradients: both are custom VJPs — must agree exactly in f32
        def loss_ref(w, f):
            return jnp.sum(sparse_conv_apply(f, w, rb, flip_rulebook(rb)) ** 2)

        def loss_tgf(w, f):
            return jnp.sum(tgf_conv_apply(f, w, tab, tab_b, rb) ** 2)

        gw_r, gf_r = jax.grad(loss_ref, argnums=(0, 1))(w, f0)
        gw_t, gf_t = jax.grad(loss_tgf, argnums=(0, 1))(w, f0)
        np.testing.assert_allclose(
            np.asarray(gf_t), np.asarray(gf_r), rtol=1e-4, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(gw_t), np.asarray(gw_r), rtol=1e-4, atol=1e-4
        )


def test_tgf_conv_unmerged_gather_path(monkeypatch):
    """TGF with TGF_MERGE_MAX_V=0 takes the per-group gather-accumulate
    branch (used at the large levels, where the merged 27V-row stack costs
    more HBM writes than the saved launches) — parity incl. gradients."""
    from taseg_tpu.ops import tgf as tgf_mod

    monkeypatch.setattr(tgf_mod, "TGF_MERGE_MAX_V", 0)
    rng = np.random.default_rng(7)
    cin, cout, cap = 8, 16, 512
    coords, feats, ucoords, num, feats_sorted, bounds = make_grid(
        rng, n=250, span=10, cap=cap, cin=cin
    )
    offs = kernel_offsets(3, stride=1)
    w = jnp.asarray(rng.normal(size=(27, cin, cout)).astype(np.float32) * 0.1)
    rb = build_rulebook(ucoords, num, ucoords, num, offs, bounds)
    tab = tgf_mod.build_tgf_tables(rb, ucoords, num, 1, bounds)
    tab_b = tgf_mod.build_tgf_tables(
        flip_rulebook(rb), ucoords, num, 1, bounds, flipped=True
    )
    f0 = jnp.asarray(feats_sorted)
    ref = sparse_conv_apply(f0, w, rb, flip_rulebook(rb))
    out = tgf_mod.tgf_conv_apply(f0, w, tab, tab_b, rb)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4
    )

    def loss_tgf(w, f):
        return jnp.sum(tgf_mod.tgf_conv_apply(f, w, tab, tab_b, rb) ** 2)

    def loss_ref(w, f):
        return jnp.sum(sparse_conv_apply(f, w, rb, flip_rulebook(rb)) ** 2)

    gw_r, gf_r = jax.grad(loss_ref, argnums=(0, 1))(w, f0)
    gw_t, gf_t = jax.grad(loss_tgf, argnums=(0, 1))(w, f0)
    np.testing.assert_allclose(np.asarray(gf_t), np.asarray(gf_r), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_t), np.asarray(gw_r), rtol=1e-4, atol=1e-4)


def test_tgf_conv_strided_level_keys():
    """At stride-s levels the y-neighbor key delta is s; verify TGF parity
    on a coarsened coordinate set (stride 2)."""
    from taseg_tpu.ops.tgf import build_tgf_tables, tgf_conv_apply

    rng = np.random.default_rng(5)
    cin, cout, cap = 8, 8, 256
    coords, feats, ucoords, num, feats_sorted, bounds = make_grid(
        rng, n=300, span=14, cin=cin
    )
    c2, n2 = spdownsample(ucoords, num, 2, 1, bounds, cap)
    offs = kernel_offsets(3, stride=2)
    w = jnp.asarray(rng.normal(size=(27, cin, cout)).astype(np.float32) * 0.1)
    rb = build_rulebook(c2, n2, c2, n2, offs, bounds)
    tab = build_tgf_tables(rb, c2, n2, 2, bounds)
    tab_b = build_tgf_tables(flip_rulebook(rb), c2, n2, 2, bounds, flipped=True)
    f = jnp.asarray(rng.normal(size=(cap, cin)).astype(np.float32))
    f = jnp.where((jnp.arange(cap) < n2)[:, None], f, 0)
    ref = sparse_conv_apply(f, w, rb, flip_rulebook(rb))
    out = tgf_conv_apply(f, w, tab, tab_b, rb)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4
    )


def test_topology_devox_matches_join_tables():
    """The parent-chain + rulebook corner derivation in
    build_unet_topology must reproduce the sort-join trilinear tables
    exactly — including negative coords, where floor() corner bases
    differ from the trunc() downsample ancestors."""
    from taseg_tpu.models.voxel.backbone_context import (
        UNetCapacities,
        build_unet_topology,
    )

    rng = np.random.default_rng(9)
    n, cap = 900, 1024
    # integer coords spanning negative territory, two batches
    pts = np.concatenate(
        [
            rng.integers(-40, 40, size=(n, 3)),
            rng.integers(0, 2, size=(n, 1)),
        ],
        axis=1,
    ).astype(np.float32)
    pts = np.unique(pts, axis=0)
    coords = np.zeros((cap, 4), np.float32)
    coords[: len(pts)] = pts
    num = jnp.int32(len(pts))
    # non-overflowing capacities: the dense random cloud exceeds the
    # LiDAR occupancy schedule at L2+, and under capacity overflow the
    # parent-chain derivation legitimately diverges (-1 for children of
    # dropped voxels, which is the telemetry-guarded error state)
    caps = UNetCapacities(points=cap, voxels=(cap, cap, cap, cap, cap))
    topo = build_unet_topology(
        jnp.asarray(coords), num, caps, point_voxel_strides=(4,)
    )
    valid = jnp.arange(cap) < num
    for s in (4, 16):
        l = s.bit_length() - 1
        ref = trilinear_table(
            jnp.asarray(coords), valid, topo.levels[l].coords,
            topo.levels[l].num, s, topo.bounds,
        )
        got = topo.devox[s]
        np.testing.assert_array_equal(np.asarray(got.idx), np.asarray(ref.idx))
        np.testing.assert_allclose(
            np.asarray(got.weights), np.asarray(ref.weights), atol=1e-6
        )
    # point->voxel at stride 4: floor-corner lookup vs the join query
    from taseg_tpu.ops import point_to_voxel_index

    ref_inv = point_to_voxel_index(
        jnp.asarray(coords), valid, topo.levels[2].coords,
        topo.levels[2].num, 4, topo.bounds,
    )
    np.testing.assert_array_equal(
        np.asarray(topo.point_vox[4][0]), np.asarray(ref_inv)
    )


def test_f3_conv_matches_reference_conv():
    """F3 (lane-packed dy-window, 9 row gathers) vs the 27-gather conv:
    f32 parity + gradient agreement on random grids that exercise every
    window presence pattern incl. center-absent pairs (ops/f3conv.py)."""
    from taseg_tpu.ops.f3conv import f3_conv_apply

    for seed, n, span in ((5, 200, 12), (13, 60, 5), (29, 400, 9)):
        rng = np.random.default_rng(seed)
        cin, cout, cap = 8, 16, 512
        coords, feats, ucoords, num, feats_sorted, bounds = make_grid(
            rng, n=n, span=span, cap=cap, cin=cin
        )
        offs = kernel_offsets(3, stride=1)
        w = jnp.asarray(
            rng.normal(size=(27, cin, cout)).astype(np.float32) * 0.1
        )
        rb = build_rulebook(ucoords, num, ucoords, num, offs, bounds)
        rbt = flip_rulebook(rb)
        f0 = jnp.asarray(feats_sorted)

        ref = sparse_conv_apply(f0, w, rb, rbt)
        out = f3_conv_apply(f0, w, rb, rbt)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4
        )

        def loss_ref(w, f):
            return jnp.sum(sparse_conv_apply(f, w, rb, rbt) ** 2)

        def loss_f3(w, f):
            return jnp.sum(f3_conv_apply(f, w, rb, rbt) ** 2)

        gw_r, gf_r = jax.grad(loss_ref, argnums=(0, 1))(w, f0)
        gw_f, gf_f = jax.grad(loss_f3, argnums=(0, 1))(w, f0)
        np.testing.assert_allclose(
            np.asarray(gf_f), np.asarray(gf_r), rtol=1e-4, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(gw_f), np.asarray(gw_r), rtol=1e-4, atol=1e-4
        )


def test_f3_conv_int8_quant_mode(monkeypatch):
    """TASEG_F3_QUANT=1 gathers the packed dy-window as int8 with exact
    per-channel dequant folded into the weights (ops/f3conv.py).  Only
    activation int8 rounding separates it from the bf16 path: outputs
    must agree within ~1% relative on bf16 inputs, and the knob must be
    a no-op for f32 inputs (training/parity paths)."""
    from taseg_tpu.ops.f3conv import f3_conv_apply

    rng = np.random.default_rng(11)
    cin, cout, cap = 16, 8, 512
    _, _, ucoords, num, feats_sorted, bounds = make_grid(
        rng, n=300, span=10, cap=cap, cin=cin
    )
    offs = kernel_offsets(3, stride=1)
    w = jnp.asarray(rng.normal(size=(27, cin, cout)).astype(np.float32) * 0.1)
    rb = build_rulebook(ucoords, num, ucoords, num, offs, bounds)
    rbt = flip_rulebook(rb)
    f_bf = jnp.asarray(feats_sorted).astype(jnp.bfloat16)
    f_32 = jnp.asarray(feats_sorted)

    ref_bf = np.asarray(f3_conv_apply(f_bf, w, rb, rbt)).astype(np.float32)
    ref_32 = np.asarray(f3_conv_apply(f_32, w, rb, rbt))
    monkeypatch.setenv("TASEG_F3_QUANT", "1")
    q_bf = np.asarray(f3_conv_apply(f_bf, w, rb, rbt)).astype(np.float32)
    q_32 = np.asarray(f3_conv_apply(f_32, w, rb, rbt))

    scale = np.abs(ref_bf).max() + 1e-9
    assert np.abs(q_bf - ref_bf).max() / scale < 0.02
    # f32 inputs bypass quantization entirely
    np.testing.assert_array_equal(q_32, ref_32)
