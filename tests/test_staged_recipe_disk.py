"""Full staged TASeg recipe on a REAL-format on-disk SemanticKITTI tree
(VERDICT r2 item 5, reference docs/TASeg_Sem.md:3-37):

  single-frame train -> TTA pseudo-mask dump (--seq, raw-id .label files)
  -> FSA multi-scan train on the pseudo masks -> KD distillation ->
  TIAF multi-modal — every stage driven through the train.py CLI exactly
  as a user would, against .bin/.label/poses/calib/image_2 files.

The fixture writes a WORLD-consistent raycast scene sampled from a
moving sensor (per-frame pose inverse applied to the world points), so
pose-compensated multi-scan fusion genuinely reconstructs the scene and
the labels are geometry-derived (learnable).
"""

import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow

ROOT = Path(__file__).resolve().parents[1]
N_FRAMES = 6
PTS_PER_FRAME = 12_000


@pytest.fixture(scope="module")
def kitti_tree(tmp_path_factory):
    from PIL import Image

    from taseg_tpu.data.semantickitti.labels import train_to_raw
    from taseg_tpu.data.synthetic import synthetic_scan

    root = tmp_path_factory.mktemp("staged") / "sequences"
    for seq, seed in (("00", 0), ("08", 1)):
        d = root / seq
        (d / "velodyne").mkdir(parents=True)
        (d / "labels").mkdir()
        (d / "image_2").mkdir()
        # one world scene per sequence, denser than any single frame
        rng = np.random.default_rng(seed)
        world, wl = synthetic_scan(rng, 40_000)

        lines = [f"{k}: " + " ".join(["0"] * 12) for k in ("P0", "P1")]
        p2 = np.array(
            [[40.0, 0, 48, 0], [0, 40.0, 24, 0], [0, 0, 1, 0]]
        )
        lines.append("P2: " + " ".join(str(v) for v in p2.reshape(-1)))
        lines.append("P3: " + " ".join(["0"] * 12))
        tr = np.eye(4)
        lines.append("Tr: " + " ".join(str(v) for v in tr[:3].reshape(-1)))
        (d / "calib.txt").write_text("\n".join(lines))

        poses = []
        for t in range(N_FRAMES):
            th = 0.03 * t
            c, s = np.cos(th), np.sin(th)
            pose = np.eye(4)
            pose[:2, :2] = [[c, -s], [s, c]]
            pose[:3, 3] = [0.5 * t, 0.1 * t, 0.0]
            poses.append(pose)
        (root / seq / "poses.txt").write_text(
            "\n".join(
                " ".join(str(v) for v in p[:3].reshape(-1)) for p in poses
            )
        )
        (d / "times.txt").write_text(
            "\n".join(str(0.1 * t) for t in range(N_FRAMES))
        )

        for t, pose in enumerate(poses):
            pick = rng.choice(len(world), PTS_PER_FRAME, replace=False)
            xyz_w = world[pick, :3]
            inten = world[pick, 3:4]
            lab = wl[pick]
            # sensor-frame points: x_s = R^T (x_w - T)
            xyz_s = (xyz_w - pose[:3, 3]) @ pose[:3, :3]
            np.concatenate([xyz_s, inten], 1).astype(np.float32).tofile(
                d / "velodyne" / f"{t:06d}.bin"
            )
            raw = train_to_raw(lab).astype(np.uint32)
            raw.tofile(d / "labels" / f"{t:06d}.label")
            img = np.zeros((48, 96, 3), np.uint8)
            img[:] = (40 * (t + 1)) % 255
            Image.fromarray(img).save(d / "image_2" / f"{t:06d}.png")
    return root


def _run_cli(args, workdir):
    import importlib

    sys.path.insert(0, str(ROOT))
    sys.argv = ["train.py"] + args
    import train

    importlib.reload(train)
    cwd = Path.cwd()
    import os

    # 2-device mesh: the fixture has only 6 frames per split, which must
    # cover a full global batch (n_shards x batch_size)
    os.environ["TASEG_NUM_DEVICES"] = "2"
    os.chdir(workdir)
    try:
        train.main()
    finally:
        os.chdir(cwd)
        os.environ.pop("TASEG_NUM_DEVICES", None)


def _last_miou(workdir, tag):
    log = sorted((workdir / "output" / tag).rglob("log.txt"))[-1]
    lines = [
        line for line in log.read_text().splitlines()
        if "point-eval mIoU" in line or "mIoU" in line
    ]
    import re

    vals = []
    for line in lines:
        m = re.search(r"mIoU\s+([0-9.]+)", line)
        if m:
            vals.append(float(m.group(1)))
    assert vals, f"no mIoU in {log}"
    return vals[-1]


SMALL_MODEL = [
    "MODEL.cr", "0.25",
    "MODEL.NUM_LAYER", "[1,1,1,1,1,1,1,1]",
    "MODEL.IF_DIST", "False",
    "DATA.NUM_POINTS", "49152",
]


def test_staged_recipe(kitti_tree, tmp_path):
    work = tmp_path
    base = str(ROOT / "tools/cfgs/voxel/semantic_kitti")

    # ---- stage A: single-frame train + val eval --------------------------
    _run_cli(
        ["--cfg_file", f"{base}/minkunet_mk34_cr10.yaml",
         "--extra_tag", "stageA", "--epochs", "3", "--batch_size", "1",
         "--eval_interval", "0",
         "--set", "DATA.DATA_PATH", str(kitti_tree),
         "OPTIM.LR_PER_SAMPLE", "0.06", *SMALL_MODEL],
        work,
    )
    tag_a = "minkunet_mk34_cr10"
    _run_cli(
        ["--cfg_file", f"{base}/minkunet_mk34_cr10.yaml",
         "--extra_tag", "stageA", "--eval", "--batch_size", "1",
         "--set", "DATA.DATA_PATH", str(kitti_tree), *SMALL_MODEL],
        work,
    )
    miou_a = _last_miou(work, tag_a)
    assert miou_a > 20, f"single-frame stage failed to learn: {miou_a}"

    # ---- pseudo-mask dump over BOTH sequences via --seq ------------------
    pseudo = work / "pseudo"
    for seq in (0, 8):
        _run_cli(
            ["--cfg_file", f"{base}/minkunet_mk34_cr10.yaml",
             "--extra_tag", "stageA", "--eval", "--seq", str(seq),
             "--batch_size", "1", "--tta", "--votes_max", "2",
             "--save_path", str(pseudo),
             "--set", "DATA.DATA_PATH", str(kitti_tree), *SMALL_MODEL],
            work,
        )
    for seq in ("00", "08"):
        labels = sorted((pseudo / "sequences" / seq / "predictions").glob(
            "*.label"
        ))
        assert len(labels) == N_FRAMES, (seq, labels)
        raw = np.fromfile(labels[0], dtype=np.uint32)
        assert len(raw) == PTS_PER_FRAME
        assert set(np.unique(raw & 0xFFFF)) <= {
            0, 1, 10, 11, 13, 15, 16, 18, 20, 30, 31, 32, 40, 44, 48, 49,
            50, 51, 52, 60, 70, 71, 72, 80, 81, 99,
        }  # raw-id space

    # ---- stage B: FSA multi-scan on the pseudo masks ---------------------
    fsa_over = [
        "DATA.DATA_PATH", str(kitti_tree),
        "DATA.MULTISCAN", "3",
        "DATA.PSEUDO_MASK", "mink_notta",
        "DATA.PSEUDO_LABEL_ROOT", str(pseudo / "sequences"),
        "DATA.NUM_POINTS", "65536",
        "MODEL.cr", "0.25",
        "MODEL.NUM_LAYER", "[1,1,1,1,1,1,1,1]",
        "MODEL.IF_DIST", "False",
    ]
    _run_cli(
        ["--cfg_file", f"{base}/minkunet_mk34_cr10_fsa.yaml",
         "--extra_tag", "stageB", "--epochs", "3", "--batch_size", "1",
         "--eval_interval", "0",
         "--pretrained_model",
         str(sorted((work / "output" / tag_a / "stageA" / "ckpt").glob(
             "checkpoint_epoch_*"))[-1]),
         "--set", *fsa_over, "OPTIM.LR_PER_SAMPLE", "0.03"],
        work,
    )
    tag_b = "minkunet_mk34_cr10_fsa"
    _run_cli(
        ["--cfg_file", f"{base}/minkunet_mk34_cr10_fsa.yaml",
         "--extra_tag", "stageB", "--eval", "--batch_size", "1",
         "--set", *fsa_over],
        work,
    )
    miou_b = _last_miou(work, tag_b)
    assert miou_b > 20, f"FSA stage collapsed: {miou_b}"
    # staged aggregation must not lose the single-frame quality
    assert miou_b > miou_a - 10, (miou_a, miou_b)

    ckpt_b = str(sorted((work / "output" / tag_b / "stageB" / "ckpt").glob(
        "checkpoint_epoch_*"))[-1])

    # ---- stage C: KD distillation (teacher = stage-B ckpt) ---------------
    kd_over = list(fsa_over) + ["MODEL.TEACHER_CKPT", ckpt_b]
    _run_cli(
        ["--cfg_file", f"{base}/minkunet_mk34_cr10_fsa_kd.yaml",
         "--extra_tag", "stageC", "--epochs", "1", "--batch_size", "1",
         "--eval_interval", "0",
         "--pretrained_model", ckpt_b,
         "--set", *kd_over, "OPTIM.LR_PER_SAMPLE", "0.01"],
        work,
    )
    kd_log = sorted(
        (work / "output" / "minkunet_mk34_cr10_fsa_kd").rglob("log.txt")
    )[-1].read_text()
    assert "mean loss" in kd_log and "nan" not in kd_log.lower()

    # ---- stage D: TIAF multi-modal on disk images ------------------------
    tiaf_over = [
        "DATA.DATA_PATH", str(kitti_tree),
        "DATA.MULTISCAN", "2",
        "DATA.PSEUDO_MASK", "mink_notta",
        "DATA.PSEUDO_LABEL_ROOT", str(pseudo / "sequences"),
        "DATA.MULTISCAN_IMAGE", "2",
        "DATA.STEP_IMAGE", "1",
        "DATA.IMAGE_HEIGHT", "48",
        "DATA.IMAGE_WIDTH", "96",
        "DATA.NUM_POINTS", "32768",
        "MODEL.cr", "0.25",
        "MODEL.NUM_LAYER", "[1,1,1,1,1,1,1,1]",
        "MODEL.IF_DIST", "False",
    ]
    _run_cli(
        ["--cfg_file", f"{base}/minkunet_mk34_cr10_fsa_tiaf.yaml",
         "--extra_tag", "stageD", "--epochs", "1", "--batch_size", "1",
         "--eval_interval", "0",
         "--pretrained_model", ckpt_b,
         "--set", *tiaf_over, "OPTIM.LR_PER_SAMPLE", "0.01"],
        work,
    )
    tiaf_log = sorted(
        (work / "output" / "minkunet_mk34_cr10_fsa_tiaf").rglob("log.txt")
    )[-1].read_text()
    assert "mean loss" in tiaf_log and "nan" not in tiaf_log.lower()
