"""Range-view branch tests: projection, augmentations, SalsaNext, losses,
KNN post-processing."""

import numpy as np
import jax
import jax.numpy as jnp

from taseg_tpu.data.range_dataset import (
    RangeViewPipeline,
    range_mix,
    range_paste,
    range_shift,
    range_union,
)
from taseg_tpu.data.semantickitti.laserscan import project_labels, project_scan
from taseg_tpu.loss.range import (
    boundary_loss,
    salsanext_loss,
    semkitti_class_weights,
    weighted_ce_image,
)
from taseg_tpu.models.range2d import SalsaNext, knn_postprocess


def fake_scan(rng, n=5000):
    r = rng.uniform(3, 50, n)
    yaw = rng.uniform(-np.pi, np.pi, n)
    pitch = rng.uniform(np.radians(-24), np.radians(2.5), n)
    pts = np.stack(
        [
            r * np.cos(pitch) * np.cos(yaw),
            -r * np.cos(pitch) * np.sin(yaw),
            r * np.sin(pitch),
        ],
        axis=1,
    ).astype(np.float32)
    rem = rng.uniform(0, 1, n).astype(np.float32)
    labels = rng.integers(0, 20, n).astype(np.int32)
    return pts, rem, labels


def test_projection_nearest_wins_and_indices():
    rng = np.random.default_rng(0)
    pts, rem, labels = fake_scan(rng)
    proj = project_scan(pts, rem, h=64, w=512)
    assert proj.range_img.shape == (64, 512)
    occ = proj.idx >= 0
    assert occ.sum() > 1000
    # each occupied pixel holds the NEAREST point mapping to it
    py, px = proj.proj_y, proj.proj_x
    depth = np.linalg.norm(pts, axis=1)
    for i in rng.integers(0, len(pts), 50):
        winner = proj.idx[py[i], px[i]]
        assert depth[winner] <= depth[i] + 1e-5
    lbl_img = project_labels(proj, labels)
    assert (lbl_img[occ] == labels[proj.idx[occ]]).all()


def test_range_augs():
    rng = np.random.default_rng(1)
    scan = rng.normal(size=(64, 512, 6)).astype(np.float32)
    label = rng.integers(0, 20, (64, 512)).astype(np.int32)
    mask = (rng.random((64, 512)) < 0.9).astype(np.float32)
    scan_b = rng.normal(size=(64, 512, 6)).astype(np.float32)
    label_b = np.full((64, 512), 2, np.int32)
    mask_b = np.ones((64, 512), np.float32)

    s, l, m = range_shift(scan, label, mask, 100)
    np.testing.assert_array_equal(l[:, :412], label[:, 100:])
    s, l, m = range_paste(scan, label, mask, scan_b, label_b, mask_b)
    assert (l == 2).all()  # whole second image is a paste class
    s, l, m = range_union(scan, label, mask, scan_b, label_b, mask_b)
    assert (m > 0).all()
    # range_mix returns BOTH mixed complements (reference MixTeacher
    # semantickitti_rv.py:368-380 hands back aux1 AND aux2)
    (sa, la, ma), (sb, lb, mb) = range_mix(
        scan, label, mask, scan_b, label_b, mask_b, 4, 1
    )
    assert (la[0:16] == label[0:16]).all() and (la[16:32] == 2).all()
    assert (lb[0:16] == 2).all() and (lb[16:32] == label[16:32]).all()
    # the two complements tile the pair exactly: A-cells + B-cells swap
    np.testing.assert_array_equal(sa[32:48], scan[32:48])
    np.testing.assert_array_equal(sb[32:48], scan_b[32:48])
    np.testing.assert_array_equal(sa[48:64], scan_b[48:64])
    np.testing.assert_array_equal(sb[48:64], scan[48:64])


def test_salsanext_forward_and_loss():
    rng = np.random.default_rng(2)
    model = SalsaNext(num_classes=20, base=8)
    scan = jnp.asarray(rng.normal(size=(1, 32, 128, 6)).astype(np.float32))
    label = jnp.asarray(rng.integers(0, 20, (1, 32, 128)).astype(np.int32))
    valid = jnp.asarray(np.ones((1, 32, 128), bool))
    variables = model.init({"params": jax.random.PRNGKey(0)}, scan, False)
    logits = model.apply(variables, scan, False)
    assert logits.shape == (1, 32, 128, 20)
    w = jnp.asarray(semkitti_class_weights())
    loss = salsanext_loss(
        logits, label, valid & (label != 0), class_weight=w,
        top_k_percent=0.5,
    )
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_weighted_ce_topk_selects_hardest():
    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.normal(size=(1, 8, 8, 5)).astype(np.float32))
    labels = jnp.asarray(rng.integers(1, 5, (1, 8, 8)).astype(np.int32))
    valid = jnp.ones((1, 8, 8), bool)
    w = jnp.ones((5,))
    full = weighted_ce_image(logits, labels, valid, class_weight=w)
    topk = weighted_ce_image(
        logits, labels, valid, class_weight=w, top_k_percent=0.2
    )
    assert float(topk) >= float(full)


def test_boundary_loss_prefers_correct_boundaries():
    # a two-region label field: perfect prediction beats a shifted one
    labels = jnp.zeros((1, 16, 16), jnp.int32).at[:, :, 8:].set(1)
    logits_good = jax.nn.one_hot(labels, 4) * 100.0
    shifted = jnp.zeros((1, 16, 16), jnp.int32).at[:, :, 11:].set(1)
    logits_bad = jax.nn.one_hot(shifted, 4) * 100.0
    valid = jnp.ones((1, 16, 16), bool)
    good = float(boundary_loss(logits_good, labels, valid))
    bad = float(boundary_loss(logits_bad, labels, valid))
    assert good < bad


def test_knn_postprocess_cleans_isolated_pixel():
    h, w = 16, 32
    proj_range = jnp.full((h, w), 10.0)
    proj_argmax = jnp.full((h, w), 3, jnp.int32)
    proj_argmax = proj_argmax.at[8, 16].set(7)  # isolated wrong label
    # two points projected at/near the bad pixel with matching range
    px = jnp.asarray([16, 17])
    py = jnp.asarray([8, 8])
    unproj = jnp.asarray([10.0, 10.0])
    out = knn_postprocess(
        proj_range, unproj, proj_argmax, px, py, num_classes=20, k=5,
        kernel_size=5,
    )
    assert int(out[0]) == 3  # neighborhood vote overrides the bad pixel
    assert int(out[1]) == 3


def test_cenet_fidnet_rangenet_forward():
    rng = np.random.default_rng(7)
    scan = jnp.asarray(rng.normal(size=(1, 16, 64, 6)).astype(np.float32))
    from taseg_tpu.models.range2d import CENet, FIDNet, RangeNet

    cenet = CENet(num_classes=20, aux=True)
    v = cenet.init({"params": jax.random.PRNGKey(0)}, scan, False)
    logits = cenet.apply(v, scan, False)
    assert logits.shape == (1, 16, 64, 20)
    out_train = cenet.apply(
        v, scan, True, rngs={"dropout": jax.random.PRNGKey(1)},
        mutable=["batch_stats"],
    )[0]
    main, aux = out_train
    assert len(aux) == 3 and all(a.shape == (1, 16, 64, 20) for a in aux)

    fid = FIDNet(num_classes=20)
    v = fid.init({"params": jax.random.PRNGKey(0)}, scan, False)
    assert fid.apply(v, scan, False).shape == (1, 16, 64, 20)

    rn = RangeNet(num_classes=20, layers=(1, 1, 2, 2, 1))
    v = rn.init({"params": jax.random.PRNGKey(0)}, scan, False)
    assert rn.apply(v, scan, False).shape == (1, 16, 64, 20)


def test_border_mask_and_crf():
    """borderMask + CRF post-processors (reference rangenet/postproc)."""
    import jax.numpy as jnp

    from taseg_tpu.models.range2d.postproc import border_mask, crf_refine

    lab = np.zeros((16, 16), np.int32)
    lab[:, 8:] = 2
    lab[4:12, 2:6] = 1
    b = np.asarray(border_mask(jnp.asarray(lab), background_class=None))
    assert b[4, 2] and b[11, 5]          # region boundary pixels
    assert not b[8, 4] and not b[2, 12]  # interior pixels
    assert 0 < b.sum() < lab.size // 2

    rng = np.random.default_rng(0)
    prob = jax.nn.softmax(
        jnp.asarray(rng.normal(size=(16, 16, 4)).astype(np.float32)), -1
    )
    xyz = jnp.asarray(rng.normal(size=(16, 16, 3)).astype(np.float32))
    mask = jnp.ones((16, 16))
    out = crf_refine(prob, xyz, mask, iters=2)
    o = np.asarray(out)
    assert o.shape == (16, 16, 4)
    assert np.isfinite(o).all()
    np.testing.assert_allclose(o.sum(-1), 1.0, atol=1e-3)
