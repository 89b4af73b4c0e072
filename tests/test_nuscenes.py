"""nuScenes reader tests on generated info-pkl + bin fixtures."""

import pickle

import numpy as np
import pytest

from taseg_tpu.data.nuscenes.labels import remap_labels
from taseg_tpu.data.nuscenes.reader import (
    NuscenesMsReader,
    NuscenesReader,
    quaternion_matrix,
    transform_between,
)

N_KEY = 4  # keyframes
SWEEPS_BETWEEN = 4


def yaw_quat(theta):
    return [np.cos(theta / 2), 0.0, 0.0, np.sin(theta / 2)]


@pytest.fixture(scope="module")
def nusc_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("nusc")
    (root / "samples").mkdir()
    (root / "sweeps").mkdir()
    rng = np.random.default_rng(0)

    infos, infos_sweep, gidx, lidx, scenes = [], [], [], [], []
    t0 = 1_000_000_000.0
    gi = 0
    for k in range(N_KEY):
        # ego moves 2 m per keyframe along x, sweeps every 0.5 m
        for s in range(SWEEPS_BETWEEN if k > 0 else 0):
            dist = (k - 1) * 2.0 + (s + 1) * 0.5
            path = f"sweeps/sweep_{k}_{s}.bin"
            pts = rng.uniform(-10, 10, (800, 5)).astype(np.float32)
            pts.tofile(root / path)
            infos_sweep.append(
                {
                    "data_path": str(root / path),
                    "sensor2lidar_rotation": np.eye(3),
                    "sensor2lidar_translation": np.array(
                        [dist - k * 2.0, 0.0, 0.0]
                    ),
                    "timestamp": t0 + (dist) * 1e5,
                    "sample_data_token": f"sw_{k}_{s}",
                }
            )
            lidx.append(k)
            scenes.append("scene0")
            gi += 1
        path = f"samples/key_{k}.bin"
        pts = rng.uniform(-10, 10, (1000, 5)).astype(np.float32)
        # plant some ego-box points
        pts[:20, 0] = rng.uniform(-0.5, 0.5, 20)
        pts[:20, 1] = rng.uniform(-1.0, 1.0, 20)
        pts.tofile(root / path)
        lbl_path = f"samples/key_{k}_lidarseg.bin"
        raw = rng.integers(0, 31, 1000).astype(np.uint8)
        raw.tofile(root / lbl_path)
        info = {
            "lidar_path": str(root / path),
            "lidarseg_path": str(root / lbl_path),
            "token": f"key_{k}",
            "timestamp": t0 + k * 2.0 * 1e5,
            "lidar2ego_rotation": yaw_quat(0.0),
            "lidar2ego_translation": [0.0, 0.0, 1.8],
            "ego2global_rotation": yaw_quat(0.05 * k),
            "ego2global_translation": [2.0 * k, 0.0, 0.0],
        }
        infos.append(info)
        sweep_info = dict(info)
        infos_sweep.append(sweep_info)
        gidx_key = gi
        lidx.append(k)
        scenes.append("scene0")
        gi += 1
        gidx.append(gidx_key)

    with open(root / "nuscenes_infos_val.pkl", "wb") as f:
        pickle.dump({"infos": infos}, f)
    with open(root / "nuscenes_infos_val_sweep.pkl", "wb") as f:
        pickle.dump(
            {
                "infos_sweep": infos_sweep,
                "global_indexes": gidx,
                "local_indexes": lidx,
                "scene_tokens": scenes,
            },
            f,
        )
    return root


def test_quaternion_matrix_matches_rotation():
    theta = 0.7
    r = quaternion_matrix(yaw_quat(theta))
    expect = np.array(
        [
            [np.cos(theta), -np.sin(theta), 0],
            [np.sin(theta), np.cos(theta), 0],
            [0, 0, 1],
        ]
    )
    np.testing.assert_allclose(r, expect, atol=1e-7)


def test_transform_roundtrip():
    info_a = {
        "lidar2ego_rotation": yaw_quat(0.1),
        "lidar2ego_translation": [0.5, 0.0, 1.8],
        "ego2global_rotation": yaw_quat(0.3),
        "ego2global_translation": [10.0, 5.0, 0.0],
    }
    info_b = {
        "lidar2ego_rotation": yaw_quat(-0.05),
        "lidar2ego_translation": [0.4, 0.1, 1.7],
        "ego2global_rotation": yaw_quat(0.8),
        "ego2global_translation": [14.0, 2.0, 0.0],
    }
    p = np.array([[3.0, -2.0, 0.5]])
    r_ab, t_ab = transform_between(info_a, info_b)
    r_ba, t_ba = transform_between(info_b, info_a)
    back = (p @ r_ab + t_ab) @ r_ba + t_ba
    np.testing.assert_allclose(back, p, atol=1e-6)


def test_reader_and_labels(nusc_root):
    r = NuscenesReader(str(nusc_root), split="val")
    assert len(r) == N_KEY
    s = r[0]
    assert s["xyzret"].shape == (1000, 5)
    assert s["labels"].max() <= 16


def test_ms_reader_distance_sweeps(nusc_root):
    r = NuscenesMsReader(
        str(nusc_root), split="val", multiscan=3, step=1.0,
    )
    s = r[N_KEY - 1]
    # ego-box points removed from the keyframe
    assert len(s["xyzret"]) < 1000
    # history sweeps were fused
    assert len(s["xyzret_ms"]) > len(s["xyzret"])
    # time-lag channel: current frame 0, history > 0
    n = len(s["xyzret"])
    assert np.allclose(s["xyzret_ms"][:n, 4], 0.0)
    assert (s["xyzret_ms"][n:, 4] > 0).all()


def test_remap_labels_uint8():
    raw = np.array([17, 24, 2, 31, 0], np.uint8)
    assert remap_labels(raw).tolist() == [4, 11, 7, 0, 0]


def test_waymo_reader(tmp_path):
    rng = np.random.default_rng(0)
    for sub in ("first", "second"):
        (tmp_path / "val" / sub).mkdir(parents=True)
    for t in range(3):
        for sub in ("first", "second"):
            n = 500
            arr = np.zeros((n, 7), np.float32)
            arr[:, 1:3] = rng.uniform(0, 3, (n, 2))
            arr[:, 3:6] = rng.uniform(-40, 40, (n, 3))
            arr[:, 6] = rng.integers(0, 23, n)
            np.save(tmp_path / "val" / sub / f"{t:06d}.npy", arr)
    from taseg_tpu.data.waymo import WaymoReader

    r = WaymoReader(str(tmp_path), split="val")
    assert len(r) == 3
    s = r[0]
    assert s["xyzret"].shape == (1000, 5)  # both returns concatenated
    assert np.abs(s["xyzret"][:, 3:5]).max() <= 1.0  # tanh-normalized
    assert s["labels"].max() < 23


def test_nuscenes_submission_roundtrip(tmp_path):
    """uint8 _lidarseg.bin + submission.json writer (reference
    train.py:508-559): bytes re-readable, zero labels remapped, json
    schema matches the challenge meta block."""
    import json

    import numpy as np

    from taseg_tpu.utils.submission import (
        NUSCENES_SUBMISSION_META,
        read_nuscenes_predictions,
        save_nuscenes_predictions,
        write_nuscenes_submission_json,
    )

    rng = np.random.default_rng(0)
    preds = rng.integers(0, 17, 1000).astype(np.int64)
    token = "abc123def456"
    p = save_nuscenes_predictions(tmp_path, token, preds)
    assert p.name == f"{token}_lidarseg.bin"
    back = read_nuscenes_predictions(tmp_path, token)
    assert back.dtype == np.uint8 and len(back) == 1000
    assert (back == 0).sum() == 0  # benchmark forbids ignore labels
    nz = preds != 0
    np.testing.assert_array_equal(back[nz], preds[nz].astype(np.uint8))

    j = write_nuscenes_submission_json(tmp_path)
    meta = json.load(open(j))["meta"]
    assert meta == NUSCENES_SUBMISSION_META


def test_nuscenes_tiaf_reader(nusc_root):
    """6-camera TIAF reader (reference nuscenes_ms_mm.py:72-73, 194+):
    camera records from the info pkl, per-camera frustum projection of
    the fused cloud, MM-pipeline contract."""
    pytest.importorskip("PIL")
    import pickle as pkl

    from PIL import Image

    from taseg_tpu.data.nuscenes.reader_mm import (
        CAMERAS,
        NuscenesTiafReader,
    )

    root = nusc_root
    # extend the fixture's keyframe infos with two camera records each
    info_path = root / "nuscenes_infos_val.pkl"
    data = pkl.load(open(info_path, "rb"))
    rng = np.random.default_rng(0)
    (root / "samples" / "CAM_FRONT").mkdir(exist_ok=True, parents=True)
    (root / "samples" / "CAM_BACK").mkdir(exist_ok=True, parents=True)
    k_int = np.array([[40.0, 0, 32], [0, 40.0, 24], [0, 0, 1]])
    for i, info in enumerate(data["infos"]):
        cams = {}
        for cam_name, fwd in (("CAM_FRONT", 1.0), ("CAM_BACK", -1.0)):
            img_file = root / "samples" / cam_name / f"{i:04d}.jpg"
            Image.fromarray(
                rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
            ).save(img_file)
            # camera at origin looking along +/-x: sensor2lidar rotation
            # maps camera axes (x right, y down, z forward) to lidar
            rot = np.array(
                [[0, 0, fwd], [-fwd, 0, 0], [0, -1, 0]], np.float64
            ).T
            cams[cam_name] = {
                "data_path": str(img_file),
                "sensor2lidar_rotation": rot,
                "sensor2lidar_translation": np.zeros(3),
                "cam_intrinsic": k_int,
                "width": 64,
                "height": 48,
            }
        info["cams"] = cams
    pkl.dump(data, open(info_path, "wb"))

    r = NuscenesTiafReader(
        str(root), split="val", multiscan=2, step=0.5,
        image_height=48, image_width=64, image_jitter=False,
    )
    out = r[2]
    n_img = out["images"].shape[0]
    assert out["images"].shape[1:] == (48, 64, 3)
    assert out["image_labels"].shape == (n_img, 48, 64)
    assert out["fov_mask"].sum() > 0
    rc = out["fov_rowcol"]
    assert rc.shape == (int(out["fov_mask"].sum()), 2)
    assert rc[:, 0].max() < n_img * 48 and rc[:, 1].max() < 64

    # pipeline integration
    from taseg_tpu.data.voxel_mm import MsMmVoxelPipeline

    pipe = MsMmVoxelPipeline(voxel_size=0.4, training=False,
                             in_feature_dim=5)
    mm = pipe(out)
    assert mm.fov_rowcol.shape == (len(mm.fov.coords), 2)
