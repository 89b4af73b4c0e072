"""Round-3 regression tests: eval padding dedup, TRAINVAL gating,
submission-split plumbing, per-dataset range weights, fastai onecycle,
and the RPVNet per-scan range-branch isolation."""

import numpy as np
import pytest

from taseg_tpu.data import VoxelLoader, _as_padding
from taseg_tpu.data.synthetic import SyntheticKittiReader
from taseg_tpu.data.voxel_dataset import VoxelPipeline


def _loader(length, n_shards=2, scans_per_shard=1, drop_last=False):
    reader = SyntheticKittiReader(length=length, n_points=2000, seed=0)
    pipe = VoxelPipeline(voxel_size=0.3, training=False)
    return VoxelLoader(
        reader, pipe, n_shards=n_shards, scans_per_shard=scans_per_shard,
        point_capacity=4096, shuffle=False, drop_last=drop_last,
    )


def test_eval_padding_marked_and_label_zeroed():
    # 5 scans, batch of 2 -> final batch has 1 real + 1 padded sample
    loader = _loader(length=5)
    batches = list(loader)
    assert len(batches) == 3
    arrays, meta = batches[-1]
    flags = [m["padded"] for m in meta]
    assert flags[0] == [False] and flags[1] == [True]
    # the padded shard's collated labels are all ignore-class 0
    assert arrays["labels"][1].max() == 0
    # real shards keep their labels
    assert arrays["labels"][0].max() > 0
    # full batches carry all-False flags
    _, meta0 = batches[0]
    assert all(f == [False] for f in (m["padded"] for m in meta0))


def test_eval_point_mapping_skips_padding():
    from taseg_tpu.engine import Trainer

    loader = _loader(length=5)
    arrays, meta = list(loader)[-1]
    fake_logits = np.zeros((2, 4096, 20), np.float32)
    seen = []
    for r, meta_r in enumerate(meta):
        for sample, _pl in Trainer._map_shard_to_points(
            None, fake_logits[r], meta_r
        ):
            seen.append(sample.name)
    assert len(seen) == 1  # only the real sample of the final batch


def test_as_padding_handles_ms_pair_cycle():
    from taseg_tpu.data.voxel_dataset import MsVoxelSample, VoxelSample

    def mk():
        return VoxelSample(
            coords=np.zeros((4, 3), np.int32),
            feats=np.zeros((4, 4), np.float32),
            labels=np.arange(4, dtype=np.int32),
            inverse_map=np.zeros(8, np.int32),
            raw_labels=np.ones(8, np.int32),
            num_raw_points=8, name="x",
        )

    frame, fused = mk(), mk()
    ms = MsVoxelSample(frame=frame, fused=fused, num_frame_points=8)
    fused.ms_pair = ms  # the cycle the loader creates
    pad = _as_padding(fused)
    assert pad.labels.max() == 0 and pad.raw_labels.max() == 0
    assert pad.ms_pair.frame.labels.max() == 0
    # original untouched
    assert fused.labels.max() == 3


def test_trainval_enables_ms_mix_augment(tmp_path):
    """split='train_val' must keep the GlobalAugment mixing path in the
    multi-scan reader (ADVICE r2: it silently gated on split=='train')."""
    from taseg_tpu.data.semantickitti.reader_ms import MultiScanKittiReader

    # minimal one-seq tree
    root = tmp_path / "sequences"
    rng = np.random.default_rng(0)
    for seq in ("00", "08"):
        d = root / seq
        (d / "velodyne").mkdir(parents=True)
        (d / "labels").mkdir()
        tr = np.eye(4)
        lines = [f"{k}: " + " ".join(["0"] * 12) for k in ("P0", "P1", "P2", "P3")]
        lines.append("Tr: " + " ".join(str(v) for v in tr[:3].reshape(-1)))
        (d / "calib.txt").write_text("\n".join(lines))
        poses = [np.eye(4) for _ in range(3)]
        (d / "poses.txt").write_text(
            "\n".join(" ".join(str(v) for v in p[:3].reshape(-1)) for p in poses)
        )
        for t in range(3):
            pts = rng.uniform(-10, 10, (500, 4)).astype(np.float32)
            pts.tofile(d / "velodyne" / f"{t:06d}.bin")
            lab = rng.choice([10, 40, 48], 500).astype(np.uint32)
            lab.tofile(d / "labels" / f"{t:06d}.label")

    calls = {"n": 0}
    import taseg_tpu.data.semantickitti.reader_ms as rm

    orig = rm.lasermix

    def spy(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    rm.lasermix = spy
    try:
        r = MultiScanKittiReader(
            str(root), split="train_val", augment="GlobalAugment",
            multiscan=1, pseudo_mask="gt", flexible_steps=[0] + [1] * 19,
        )
        r.rng = np.random.default_rng(1)
        for i in range(min(len(r), 6)):
            r[i]
    finally:
        rm.lasermix = orig
    assert calls["n"] > 0  # mixing fired on the train_val split


def test_sequences_and_split_file_filters(tmp_path):
    from taseg_tpu.data.semantickitti.reader import SemanticKittiReader

    root = tmp_path / "sequences"
    rng = np.random.default_rng(0)
    for seq in ("11", "12"):
        d = root / seq / "velodyne"
        d.mkdir(parents=True)
        for t in range(4):
            rng.uniform(-10, 10, (100, 4)).astype(np.float32).tofile(
                d / f"{t:06d}.bin"
            )
    # test split is label-free and sequence-filterable
    r = SemanticKittiReader(
        str(root), split="test", augment="NoAug", sequences=["12"]
    )
    assert len(r) == 4
    assert all("/12/" in str(p) for p in r.scan_files)
    assert r[0]["labels"].max() == 0  # label-free

    # split_file filters the listing to the named frames
    sf = tmp_path / "mini_split.txt"
    sf.write_text(
        "/cluster/prefix/sequences/train/11/velodyne/000001.bin\n"
        "/cluster/prefix/sequences/train/12/velodyne/000002.bin\n"
    )
    r2 = SemanticKittiReader(
        str(root), split="test", augment="NoAug", split_file=str(sf)
    )
    names = {(p.parent.parent.name, p.name) for p in r2.scan_files}
    assert names == {("11", "000001.bin"), ("12", "000002.bin")}


def test_shipped_split_lists_parse():
    from pathlib import Path

    import taseg_tpu.data as d

    split_root = Path(d.__file__).parent / "split"
    for ds in ("semantickitti", "scribblekitti", "nuscenes"):
        files = sorted((split_root / ds).glob("*.txt"))
        assert len(files) == 4, f"{ds} should ship 1/10/20/50% lists"
    k = (split_root / "semantickitti" / "semantickitti_1pct.txt").read_text()
    lines = [l for l in k.splitlines() if l.strip()]
    assert len(lines) > 100
    assert all(l.endswith(".bin") for l in lines)


def test_range_class_weights_dispatch():
    from taseg_tpu.loss.range import (
        range_class_weights,
        semkitti_class_weights,
    )

    wk = range_class_weights("semantickitti", 20)
    np.testing.assert_allclose(wk, semkitti_class_weights()[:20])
    wn = range_class_weights("nuscenes", 17)
    assert wn[0] == 0.0 and (wn[1:] == 1.0).all()
    wo = range_class_weights("nuscenes", 3, override=[0.0, 2.0, 3.0])
    np.testing.assert_allclose(wo, [0.0, 2.0, 3.0])
    with pytest.raises(ValueError):
        range_class_weights("nuscenes", 4, override=[1.0])


def test_fastai_onecycle_schedule():
    from taseg_tpu.optim import fastai_onecycle

    total, lr_max, moms, div, pct = 100, 0.01, (0.95, 0.85), 10.0, 0.4
    lr_fn, mom_fn = fastai_onecycle(total, lr_max, moms, div, pct)
    a1 = int(total * pct)
    assert float(lr_fn(0)) == pytest.approx(lr_max / div)
    assert float(lr_fn(a1)) == pytest.approx(lr_max, rel=1e-3)
    assert float(lr_fn(total)) == pytest.approx(lr_max / div / 1e4, rel=1e-3)
    assert float(mom_fn(0)) == pytest.approx(moms[0])
    assert float(mom_fn(a1)) == pytest.approx(moms[1], rel=1e-3)
    assert float(mom_fn(total)) == pytest.approx(moms[0], rel=1e-3)


def test_adam_onecycle_optimizer_builds_and_steps():
    import jax
    import jax.numpy as jnp

    from taseg_tpu.optim import build_optimizer

    tx = build_optimizer(
        {"OPTIMIZER": "adam_onecycle", "LR": 0.01, "MOMS": [0.95, 0.85],
         "DIV_FACTOR": 10.0, "PCT_START": 0.4},
        iters_per_epoch=10, total_epochs=2,
    )
    params = {"w": jnp.ones((4, 4))}
    state = tx.init(params)
    grads = {"w": jnp.full((4, 4), 0.1)}
    updates, state = jax.jit(tx.update)(grads, state, params)
    assert np.isfinite(np.asarray(updates["w"])).all()
    assert float(jnp.abs(updates["w"]).max()) > 0


def test_waymo_trainval_uses_both_listings(tmp_path):
    from taseg_tpu.data.waymo.reader import WaymoReader

    root = tmp_path
    rng = np.random.default_rng(0)
    rows = []
    for split, n in (("train", 3), ("val", 2)):
        d = root / split / "first"
        d.mkdir(parents=True)
        for t in range(n):
            arr = np.zeros((50, 8), np.float32)
            arr[:, 3:6] = rng.uniform(-10, 10, (50, 3))
            arr[:, -1] = rng.integers(0, 22, 50)
            np.save(d / f"{t:04d}.npy", arr)
            rows.append(str(d / f"{t:04d}.npy"))
    (root / "train-0-31.txt").write_text("\n".join(rows[:3]))
    (root / "val-0-7.txt").write_text("\n".join(rows[3:]))
    r_train = WaymoReader(str(root), split="train")
    r_tv = WaymoReader(str(root), split="train_val")
    assert len(r_train) == 3 and len(r_tv) == 5


def test_rpv_context_band_isolation():
    """Bilinear corners of a point near its scan's bottom row must stay in
    that scan's rows of the stacked canvas (ADVICE r2: range-branch
    cross-scan bleed)."""
    import jax.numpy as jnp

    from taseg_tpu.models.fusion.rpvnet import build_rpv_context

    h, w, b = 16, 64, 2
    # one point per scan, both at the very bottom edge of their band
    pxf = jnp.asarray([5.0, 9.0])
    pyf = jnp.asarray([15.9, 16.0 + 15.9])  # scan0 row ~15.9, scan1 ~31.9
    valid = jnp.asarray([True, True])
    rpv = build_rpv_context(pxf, pyf, valid, h, w, batch=b)
    tab = rpv.sample[1]
    idx = np.asarray(tab.idx)  # (4, P) pixel ids in the (b*h, w) canvas
    rows = idx // w
    assert (rows[:, 0] <= 15).all()  # scan-0 corners stay in rows 0..15
    assert (16 <= rows[:, 1]).all() and (rows[:, 1] <= 31).all()


def test_strided_conv_matches_rulebook_conv():
    """Parent-relation strided convs (ops.strided_conv) == the dense
    8-offset rulebook path (ops.sparse_conv), both directions, values and
    gradients."""
    import jax
    import jax.numpy as jnp

    from taseg_tpu.ops import (
        build_reverse_rulebook, build_rulebook, compute_bounds,
        kernel_offsets, spdownsample, unique_coords,
    )
    from taseg_tpu.ops.sparse_conv import sparse_conv_apply
    from taseg_tpu.ops.strided_conv import (
        build_strided_tables, downsample_conv_apply, upsample_conv_apply,
    )

    rng = np.random.default_rng(7)
    for s_prev, hi in ((1, 40), (2, 80)):
        raw = np.unique(
            rng.integers(0, hi // s_prev, (3000, 3)) * s_prev, axis=0
        )
        n = len(raw)
        cap = 4096
        coords = np.zeros((cap, 4), np.int32)
        coords[:n, :3] = raw
        valid = jnp.arange(cap) < n
        bounds = compute_bounds(jnp.asarray(coords), valid)
        fine, num_f, _, _ = unique_coords(
            jnp.asarray(coords), valid, bounds, cap
        )
        ccap = 2048
        coarse, num_c, parent, counts, perm = spdownsample(
            fine, num_f, 2, s_prev, bounds, ccap, return_inverse=True
        )
        tables = build_strided_tables(
            fine, num_f, parent, counts, perm, s_prev
        )
        offs = kernel_offsets(2, stride=s_prev)
        rb_down = build_rulebook(coarse, num_c, fine, num_f, offs, bounds)
        rb_up = build_reverse_rulebook(
            fine, num_f, coarse, num_c, offs, bounds
        )

        ci, co = 8, 16
        f_fine = jnp.asarray(
            rng.normal(size=(cap, ci)).astype(np.float32)
        ) * (jnp.arange(cap) < num_f)[:, None]
        w = jnp.asarray(rng.normal(size=(8, ci, co)).astype(np.float32))

        ref_dn = sparse_conv_apply(f_fine, w, rb_down, rb_up)
        got_dn = downsample_conv_apply(f_fine, w, tables)
        vmask = (jnp.arange(ccap) < num_c)[:, None]
        np.testing.assert_allclose(
            np.asarray(got_dn * vmask), np.asarray(ref_dn * vmask),
            rtol=1e-4, atol=1e-4,
        )

        f_coarse = jnp.asarray(
            rng.normal(size=(ccap, ci)).astype(np.float32)
        ) * (jnp.arange(ccap) < num_c)[:, None]
        ref_up = sparse_conv_apply(f_coarse, w, rb_up, rb_down)
        got_up = upsample_conv_apply(f_coarse, w, tables)
        fmask = (jnp.arange(cap) < num_f)[:, None]
        np.testing.assert_allclose(
            np.asarray(got_up * fmask), np.asarray(ref_up * fmask),
            rtol=1e-4, atol=1e-4,
        )

        # gradients (targets only valid rows so padding rows don't leak)
        def loss_dn(fn, f, wk):
            return jnp.sum((fn(f, wk) * vmask) ** 2)

        g_ref = jax.grad(
            lambda f, wk: loss_dn(
                lambda a, b: sparse_conv_apply(a, b, rb_down, rb_up), f, wk
            ),
            argnums=(0, 1),
        )(f_fine, w)
        g_got = jax.grad(
            lambda f, wk: loss_dn(
                lambda a, b: downsample_conv_apply(a, b, tables), f, wk
            ),
            argnums=(0, 1),
        )(f_fine, w)
        np.testing.assert_allclose(
            np.asarray(g_got[0] * fmask), np.asarray(g_ref[0] * fmask),
            rtol=1e-3, atol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(g_got[1]), np.asarray(g_ref[1]),
            rtol=1e-3, atol=1e-3,
        )

        def loss_up(fn, f, wk):
            return jnp.sum((fn(f, wk) * fmask) ** 2)

        gu_ref = jax.grad(
            lambda f, wk: loss_up(
                lambda a, b: sparse_conv_apply(a, b, rb_up, rb_down), f, wk
            ),
            argnums=(0, 1),
        )(f_coarse, w)
        gu_got = jax.grad(
            lambda f, wk: loss_up(
                lambda a, b: upsample_conv_apply(a, b, tables), f, wk
            ),
            argnums=(0, 1),
        )(f_coarse, w)
        np.testing.assert_allclose(
            np.asarray(gu_got[0] * vmask), np.asarray(gu_ref[0] * vmask),
            rtol=1e-3, atol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(gu_got[1]), np.asarray(gu_ref[1]),
            rtol=1e-3, atol=1e-3,
        )
