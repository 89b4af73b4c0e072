"""Fidelity A/B against the reference's own kernel engine (VERDICT item 6).

Builds torchsparse 1.4.0's CPU backend from `/root/reference/package/`
(tests/ts_oracle.py) and asserts numerical parity:

  * one stride-1 sparse conv: our sort-join rulebook + wide-matmul conv
    vs torchsparse's hash-map rulebook + gather-GEMM-scatter;
  * the FULL reference MinkUNet vs our MinkUNet with the reference's
    weights translated through `utils.ckpt_convert` — per-raw-point
    logits on one synthetic scan (the 1:1 weight-layout claim, executed).
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

ts = pytest.importorskip("torch") and None  # torch needed for the oracle
import torch  # noqa: E402

from ts_oracle import (  # noqa: E402
    load_reference_class,
    load_reference_minkunet,
    load_torchsparse,
)


@pytest.fixture(scope="module")
def torchsparse_mod():
    mod = load_torchsparse()
    if mod is None:
        pytest.skip("torchsparse CPU backend could not be built")
    return mod


def _unique_coords(rng, n, lo, hi):
    c = np.unique(rng.integers(lo, hi, (n, 3)).astype(np.int32), axis=0)
    return np.concatenate([c, np.zeros((len(c), 1), np.int32)], axis=1)


def test_conv3d_stride1_parity(torchsparse_mod):
    import jax
    import jax.numpy as jnp
    import torchsparse.nn as spnn
    from torchsparse import SparseTensor

    from taseg_tpu.models.voxel.backbone_context import (
        UNetCapacities, build_unet_topology,
    )
    from taseg_tpu.ops.sparse_conv import flip_rulebook, sparse_conv_apply

    rng = np.random.default_rng(0)
    coords = _unique_coords(rng, 4000, 0, 24)
    n = len(coords)
    ci, co = 8, 16
    feats = rng.normal(size=(n, ci)).astype(np.float32)

    conv = spnn.Conv3d(ci, co, 3).eval()
    with torch.no_grad():
        y_ref = conv(
            SparseTensor(torch.from_numpy(feats), torch.from_numpy(coords))
        )
    ref_out = {
        tuple(c.tolist()): f
        for c, f in zip(y_ref.C.numpy(), y_ref.F.detach().numpy())
    }

    cap = 8192
    pc = np.zeros((cap, 4), np.float32)
    pc[:n] = coords
    caps = UNetCapacities.for_points(cap, num_levels=2)
    topo = build_unet_topology(
        jnp.asarray(pc), jnp.int32(n), caps, devox_strides=(1,),
        num_levels=2,
    )
    lt = topo.levels[0]
    f = np.zeros((cap, ci), np.float32)
    # features must live at the topology's (key-sorted) row order
    order = {tuple(c.tolist()): i for i, c in enumerate(coords)}
    lt_coords = np.asarray(lt.coords)[: n]
    for row, c in enumerate(lt_coords):
        f[row] = feats[order[tuple(c.tolist())]]
    w = jnp.asarray(conv.kernel.detach().numpy())
    out = np.asarray(
        sparse_conv_apply(
            jnp.asarray(f), w, lt.rb_k3, flip_rulebook(lt.rb_k3)
        )
    )
    for row, c in enumerate(lt_coords):
        np.testing.assert_allclose(
            out[row], ref_out[tuple(c.tolist())], atol=2e-4,
            err_msg=f"voxel {c}",
        )


def test_full_minkunet_logits_parity():
    import jax
    import jax.numpy as jnp

    M = load_reference_minkunet()
    if M is None:
        pytest.skip("reference MinkUNet could not be loaded")
    import torchsparse
    from torchsparse import SparseTensor

    from taseg_tpu.data.synthetic import synthetic_scan
    from taseg_tpu.data.voxel_dataset import VoxelPipeline
    from taseg_tpu.models import (
        MinkUNet, UNetCapacities, build_unet_topology,
    )
    from taseg_tpu.ops import PointSet
    from taseg_tpu.utils.ckpt_convert import translate_minkunet_state
    from taseg_tpu.utils.config import Config

    num_layer = [2, 3, 4, 6, 2, 2, 2, 2]
    cfg = Config(dict(
        NAME="MinkUNet", IN_FEATURE_DIM=4, NUM_LAYER=num_layer,
        PLANES=[32, 32, 64, 128, 256, 256, 128, 96, 96], cr=0.25,
        DROPOUT_P=0.0, LABEL_SMOOTHING=0.0, IF_DIST=False, IGNORE_LABEL=0,
        LOSS_CONFIG=Config(dict(
            LOSS_TYPES=["CELoss"], LOSS_WEIGHTS=[1.0], KNN=10,
        )),
        BLOCK="ResBlock",
    ))
    ref = M(cfg, 20).eval()

    rng = np.random.default_rng(3)
    pts, labels = synthetic_scan(rng, 20_000)
    ring = np.zeros((len(pts), 1), np.float32)
    pipe = VoxelPipeline(voxel_size=0.05, training=False)
    s = pipe({"xyzret": np.concatenate([pts, ring], 1), "labels": labels})
    n = len(s.coords)
    n_raw = s.num_raw_points

    coords4 = np.concatenate(
        [s.coords, np.zeros((n, 1), np.int32)], axis=1
    ).astype(np.int32)
    raw_c = np.zeros((n_raw, 4), np.int32)
    batch = {
        "lidar": SparseTensor(
            torch.from_numpy(s.feats.astype(np.float32)),
            torch.from_numpy(coords4),
        ),
        "inverse_map": SparseTensor(
            torch.from_numpy(s.inverse_map.astype(np.int64)),
            torch.from_numpy(raw_c),
        ),
        "targets_mapped": SparseTensor(
            torch.from_numpy(s.raw_labels.astype(np.int64)),
            torch.from_numpy(raw_c),
        ),
        "num_points": [n_raw],
        "name": ["scan0"],
    }
    with torch.no_grad():
        ref_out = ref(batch)
    ref_logits = np.asarray(ref_out["point_predict_logits"][0])
    assert ref_logits.shape == (n_raw, 20)

    params, stats = translate_minkunet_state(
        ref.state_dict(), num_layer=num_layer
    )
    cap = 32768
    pc = np.zeros((cap, 4), np.float32)
    pc[:n] = coords4
    fe = np.zeros((cap, 4), np.float32)
    fe[:n] = s.feats[:, :4]
    caps = UNetCapacities.for_points(cap)
    model = MinkUNet(
        num_classes=20, cr=0.25, num_layer=tuple(num_layer),
        block="ResBlock", dropout_p=0.0, compute_dtype="float32",
    )
    points = PointSet(
        coords=jnp.asarray(pc), feats=jnp.asarray(fe), num=jnp.int32(n)
    )
    topo = build_unet_topology(jnp.asarray(pc), jnp.int32(n), caps)
    logits = np.asarray(
        jax.jit(
            lambda v, p, t: model.apply(v, p, t, False)
        )({"params": params, "batch_stats": stats}, points, topo)
    )
    ours = logits[s.inverse_map]  # per raw point
    # identical math modulo op-order: tight tolerance
    np.testing.assert_allclose(ours, ref_logits, atol=5e-3, rtol=1e-3)
    agree = (ours.argmax(-1) == ref_logits.argmax(-1)).mean()
    assert agree > 0.999, f"argmax agreement {agree}"


# ------------- FSA / KD converted-weight parity (VERDICT r4 #7) ------------

NUM_LAYER = [2, 3, 4, 6, 2, 2, 2, 2]


def _ms_cfg(extra=None):
    from taseg_tpu.utils.config import Config

    d = dict(
        NAME="MinkUNetMs", IN_FEATURE_DIM=5, NUM_LAYER=NUM_LAYER,
        PLANES=[32, 32, 64, 128, 256, 256, 128, 96, 96], cr=0.25,
        DROPOUT_P=0.0, LABEL_SMOOTHING=0.0, IF_DIST=False, IGNORE_LABEL=0,
        LOSS_CONFIG=Config(dict(
            LOSS_TYPES=["CELoss"], LOSS_WEIGHTS=[1.0], KNN=10,
        )),
        BLOCK="ResBlock",
    )
    d.update(extra or {})
    return Config(d)


def _fused_sample():
    """One synthetic multi-scan sample through the coupled MS pipeline
    (current-frame raw points lead the fused cloud — the point_mask
    invariant, reference semantickitti_voxel_ms.py:189-212)."""
    from taseg_tpu.data.synthetic import SyntheticMsKittiReader
    from taseg_tpu.data.voxel_dataset import MsVoxelPipeline

    reader = SyntheticMsKittiReader(length=1, n_points=9000, history=2)
    pipe = MsVoxelPipeline(voxel_size=0.1, training=False)
    return pipe(reader[0])


def _ref_ms_batch(fused, n_frame_raw):
    """batch_dict for the reference MS eval path (minkunet_ms.py:436-458):
    fused cloud + inverse map + leading-point mask."""
    from torchsparse import SparseTensor

    n = len(fused.coords)
    n_ms_raw = fused.num_raw_points
    coords4 = np.concatenate(
        [fused.coords, np.zeros((n, 1), np.int32)], axis=1
    ).astype(np.int32)
    raw_c = np.zeros((n_ms_raw, 4), np.int32)
    frame_c = np.zeros((n_frame_raw, 4), np.int32)
    point_mask = torch.zeros(n_ms_raw, dtype=torch.bool)
    point_mask[:n_frame_raw] = True
    return {
        "lidar_ms": SparseTensor(
            torch.from_numpy(fused.feats.astype(np.float32)),
            torch.from_numpy(coords4),
        ),
        "inverse_map_ms": SparseTensor(
            torch.from_numpy(fused.inverse_map.astype(np.int64)),
            torch.from_numpy(raw_c),
        ),
        "targets_mapped": SparseTensor(
            torch.from_numpy(
                fused.raw_labels[:n_frame_raw].astype(np.int64)
            ),
            torch.from_numpy(frame_c),
        ),
        "point_mask": point_mask,
        "num_points_ms": [n_ms_raw],
        "num_points": [n_frame_raw],
        "name": ["scan0"],
    }, coords4


def _our_ms_logits(fused, coords4, params, stats):
    """Our MinkUNet(in_dim=5) on the same fused voxel cloud, mapped back
    to ms raw points."""
    import jax
    import jax.numpy as jnp

    from taseg_tpu.models import (
        MinkUNet, UNetCapacities, build_unet_topology,
    )
    from taseg_tpu.ops import PointSet

    n = len(fused.coords)
    cap = 16384
    assert n <= cap
    pc = np.zeros((cap, 4), np.float32)
    pc[:n] = coords4
    fe = np.zeros((cap, 5), np.float32)
    fe[:n] = fused.feats[:, :5]
    caps = UNetCapacities.for_points(cap)
    model = MinkUNet(
        num_classes=20, in_dim=5, cr=0.25, num_layer=tuple(NUM_LAYER),
        block="ResBlock", dropout_p=0.0, compute_dtype="float32",
    )
    points = PointSet(
        coords=jnp.asarray(pc), feats=jnp.asarray(fe), num=jnp.int32(n)
    )
    topo = build_unet_topology(jnp.asarray(pc), jnp.int32(n), caps)
    logits = np.asarray(
        jax.jit(
            lambda v, p, t: model.apply(v, p, t, False)
        )({"params": params, "batch_stats": stats}, points, topo)
    )
    return logits[fused.inverse_map]  # per ms raw point


def test_minkunet_ms_fused_cloud_parity():
    """FSA forward parity: the reference MinkUNetMs (fused multi-scan
    cloud, 5-dim feats, point-mask eval slice — minkunet_ms.py:385-458)
    vs our MinkUNet(in_dim=5) under translated weights."""
    M = load_reference_class("minkunet_ms", "MinkUNetMs")
    if M is None:
        pytest.skip("reference MinkUNetMs could not be loaded")

    from taseg_tpu.utils.ckpt_convert import translate_minkunet_state

    ref = M(_ms_cfg(), 20).eval()
    ms = _fused_sample()
    batch, coords4 = _ref_ms_batch(ms.fused, ms.num_frame_points)
    with torch.no_grad():
        ref_out = ref(batch)
    ref_logits = np.asarray(ref_out["point_predict_logits"][0])
    assert ref_logits.shape == (ms.num_frame_points, 20)

    params, stats = translate_minkunet_state(
        ref.state_dict(), num_layer=NUM_LAYER
    )
    ours = _our_ms_logits(ms.fused, coords4, params, stats)
    ours = ours[: ms.num_frame_points]  # leading current-frame raw points
    np.testing.assert_allclose(ours, ref_logits, atol=5e-3, rtol=1e-3)
    agree = (ours.argmax(-1) == ref_logits.argmax(-1)).mean()
    assert agree > 0.999, f"argmax agreement {agree}"


def test_minkunet_ms_kd_dual_tree_parity():
    """KD forward parity (minkunet_ms_kd.py:532-640): both trees of the
    reference MinkUNetMsKd — the plain student tree and the `_gt` teacher
    tree — translate through the same converter and match our
    MinkUNet(in_dim=5) forward per raw point."""
    M = load_reference_class("minkunet_ms_kd", "MinkUNetMsKd")
    Ms = load_reference_class("minkunet_ms", "MinkUNetMs")
    if M is None or Ms is None:
        pytest.skip("reference KD/MS models could not be loaded")

    from taseg_tpu.utils.ckpt_convert import translate_minkunet_state

    kd = M(
        _ms_cfg({"NAME": "MinkUNetMsKd", "SAMPLING_TYPE": "random",
                 "MAX_VOXEL": 512, "FEAT_KD": "mse",
                 "FEAT_KD_WEIGHT": 10.0}),
        20,
    ).eval()
    ms = _fused_sample()
    batch, coords4 = _ref_ms_batch(ms.fused, ms.num_frame_points)
    # teacher input: the KD eval pass consumes a GT-mask cloud; identical
    # clouds keep the comparison exact while exercising both trees
    batch["lidar_ms_gt"] = _ref_ms_batch(ms.fused, ms.num_frame_points)[0][
        "lidar_ms"
    ]
    with torch.no_grad():
        ref_out = kd(batch)
    ref_student = np.asarray(ref_out["point_predict_logits"][0])

    sd = kd.state_dict()
    student_sd = {
        k: v for k, v in sd.items()
        if not k.split(".", 1)[0].endswith("_gt")
    }
    teacher_sd = {}
    for k, v in sd.items():
        head, _, rest = k.partition(".")
        if head.endswith("_gt"):
            teacher_sd[f"{head[:-3]}.{rest}"] = v

    # student tree vs the KD eval output
    params, stats = translate_minkunet_state(student_sd, num_layer=NUM_LAYER)
    ours = _our_ms_logits(ms.fused, coords4, params, stats)
    ours = ours[: ms.num_frame_points]
    np.testing.assert_allclose(ours, ref_student, atol=5e-3, rtol=1e-3)

    # teacher tree: re-home the `_gt` weights into a reference MinkUNetMs
    # (same architecture) for an executable torch-side oracle
    teacher_ref = Ms(_ms_cfg(), 20).eval()
    missing, unexpected = teacher_ref.load_state_dict(
        teacher_sd, strict=False
    )
    assert not [k for k in missing if "criterion" not in k], missing
    with torch.no_grad():
        t_out = teacher_ref(batch)
    ref_teacher = np.asarray(t_out["point_predict_logits"][0])
    t_params, t_stats = translate_minkunet_state(
        teacher_sd, num_layer=NUM_LAYER
    )
    ours_t = _our_ms_logits(ms.fused, coords4, t_params, t_stats)
    ours_t = ours_t[: ms.num_frame_points]
    np.testing.assert_allclose(ours_t, ref_teacher, atol=5e-3, rtol=1e-3)
    # the two trees are genuinely different networks
    assert np.abs(ref_student - ref_teacher).max() > 1e-3
