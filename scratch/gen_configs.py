"""One-shot generator: port the reference experiment-config surface
(tools/cfgs/**, 31 YAMLs) with exact hyperparameters into our schema."""
import os

ROOT = "/root/repo/tools/cfgs"

KITTI_FSA_STEPS = [0,0,2,2,2,2,2,2,2,0,4,4,4,0,4,0,2,4,2,2]
NUSC_FSA_STEPS = [0,1,1,1,3,1,1,3,1,3,3,0,1,1,1,1,1]

def num_class(ds):
    if ds.startswith("nuscenes"): return 17
    if ds.startswith("waymo"): return 23
    return 20

def sgd_optim(bs, ep, lr=0.02):
    return f"""OPTIM:
  BATCH_SIZE_PER_GPU: {bs}
  NUM_EPOCHS: {ep}
  OPTIMIZER: sgd
  LR_PER_SAMPLE: {lr}
  WEIGHT_DECAY: 0.0001
  MOMENTUM: 0.9
  NESTEROV: True
  GRAD_NORM_CLIP: 10.0
  SCHEDULER: linear_warmup_with_cosdecay
  WARMUP_EPOCH: 1
"""

def adamw_optim(bs):
    return f"""OPTIM:
  BATCH_SIZE_PER_GPU: {bs}
  NUM_EPOCHS: 50
  WARMUP_EPOCH: 10
  GRAD_NORM_CLIP: 10.0
  OPTIMIZER: adamW
  WEIGHT_DECAY: 0.01
  LR_PER_SAMPLE: 0.0025
  LEARNING_RATE: 0.0025
  SCHEDULER: onecycle
"""

def data_block(ds, np_, vs, extra=""):
    path = {
        "semantickitti": "/data/SemanticKITTI/dataset/sequences",
        "scribblekitti": "/data/ScribbleKITTI/dataset/sequences",
        "nuscenes": "/data/nuscenes",
        "waymo": "/data/waymo_preprocessed",
    }[ds.split("_")[0] if not ds.startswith("nuscenes") else "nuscenes"]
    s = f"""DATA:
  DATASET: {ds}
  DATA_PATH: {path}
"""
    if vs is not None:
        s += f"  VOXEL_SIZE: {vs}\n"
    if np_ is not None:
        s += f"  NUM_POINTS: {np_}\n"
    s += extra
    return s

def model_block(name, ifd, nl, cr, dp, ls, ds, mextra=""):
    s = f"""MODEL:
  NAME: {name}
  IN_FEATURE_DIM: {ifd}
  NUM_CLASS: {num_class(ds)}
  IGNORE_LABEL: 0
"""
    if nl is not None:
        s += f"""  BLOCK: ResBlock
  NUM_LAYER: [{', '.join(map(str, nl))}]
  PLANES: [32, 32, 64, 128, 256, 256, 128, 96, 96]
  cr: {cr}
"""
    s += f"""  DROPOUT_P: {dp}
  LABEL_SMOOTHING: {ls}
  IF_DIST: True
"""
    s += mextra
    s += """  LOSS_CONFIG:
    LOSS_TYPES: [CELoss, LovLoss]
    LOSS_WEIGHTS: [1.0, 1.0]
"""
    return s

def write(rel, header, modality, data, model, optim):
    path = os.path.join(ROOT, rel)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(f"# {header}\n# Hyperparameters match the reference config of "
                f"the same name (tools/cfgs/{rel}).\nMODALITY: {modality}\n\n"
                + data + "\n" + model + "\n" + optim)
    print("wrote", rel)

mk18 = [2]*8
mk34 = [2,3,4,6,2,2,2,2]

# ---- voxel / semantic_kitti ----
for (fn, nl, cr, ls, bs, ep) in [
    ("minkunet_mk18_cr10.yaml", mk18, 1.0, 0.1, 16, 36),
    ("minkunet_mk18_cr5.yaml", mk18, 0.5, 0.1, 1, 36),
    ("minkunet_mk34_cr10.yaml", mk34, 1.0, 0.1, 12, 36),
    ("minkunet_mk34_cr16.yaml", mk34, 1.6, 0.0, 12, 36),
]:
    write(f"voxel/semantic_kitti/{fn}",
          f"Single-frame MinkUNet ({fn.split('.')[0]})", "voxel",
          data_block("semantickitti", 1000000, 0.05),
          model_block("MinkUNet", 4, nl, cr, 0.0, ls, "semantickitti"),
          sgd_optim(bs, ep))

fsa_extra = f"""  IN_FEATURE_DIM: 5
  MULTISCAN: 16
  ONLY_HISTORY: True
  PSEUDO_MASK: mink_notta
  PSEUDO_LABEL_ROOT: output/minkunet_mk34_cr10/default/trainval_notta
  FLEXIBLE_STEPS: [{', '.join(map(str, KITTI_FSA_STEPS))}]
"""
write("voxel/semantic_kitti/minkunet_mk34_cr10_fsa.yaml",
      "TLAD/FSA multi-frame recipe: MULTISCAN 16 history-only fusion with "
      "per-class flexible steps over pseudo masks", "voxel",
      data_block("semantickitti_ms", 3000000, 0.05, fsa_extra),
      model_block("MinkUNetMs", 5, mk34, 1.0, 0.0, 0.1, "semantickitti"),
      sgd_optim(6, 12))

kd_extra = fsa_extra + f"""  FLEXIBLE_STEPS_GT: [{', '.join(map(str, KITTI_FSA_STEPS))}]
  MAX_VOXEL: 3000
"""
write("voxel/semantic_kitti/minkunet_mk34_cr10_fsa_kd.yaml",
      "Mask-distillation stage: frozen GT-mask teacher distills tri-scale "
      "features into the pseudo-mask student (set MODEL.TEACHER_CKPT)", "voxel",
      data_block("semantickitti_ms_kd", 3000000, 0.05, kd_extra),
      model_block("MinkUNetMsKd", 5, mk34, 1.0, 0.0, 0.1, "semantickitti",
                  "  MAX_VOXEL: 3000\n  FEAT_KD_WEIGHT: 10.0\n  TEACHER_CKPT: null\n"),
      sgd_optim(6, 12))

tiaf_extra = fsa_extra + """  MULTISCAN_IMAGE: 48
  STEP_IMAGE: 12
  IMAGE_ROOT: /data/SemanticKITTI/dataset/sequences
  SEMANTIC_MAP_ROOT: /data/SemanticKITTI/semantic_map_dilate
"""
write("voxel/semantic_kitti/minkunet_mk34_cr10_fsa_tiaf.yaml",
      "TIAF stage: 48-frame camera window fused with the FSA voxel branch "
      "(UNet2D + FOV UNet3D + fusion head; set MODEL.PRETRAINED)", "voxel",
      data_block("semantickitti_ms_mm", 3000000, 0.05, tiaf_extra),
      model_block("MinkUNetMsMm", 5, mk34, 1.0, 0.0, 0.1, "semantickitti",
                  "  LOSS_WEIGHT: [0, 1, 0.5, 0.5, 1]\n  ENSEMBLE_TYPE: replace\n"),
      sgd_optim(2, 12))

for (fn, isize, bs) in [("cylinder_cy480_cr10.yaml", 32, 12),
                        ("cylinder_cy480_cr5.yaml", 16, 16)]:
    write(f"voxel/semantic_kitti/{fn}",
          "Cylinder3D on the polar grid (asymmetric sparse kernels)",
          "cylinder",
          data_block("semantickitti", None, None,
                     "  GRID_SIZE: [480, 360, 32]\n"),
          model_block("Cylinder_TS", 9, None, None, 0.0, 0.0,
                      "semantickitti", f"  INIT_SIZE: {isize}\n"),
          sgd_optim(bs, 36))

# SMSA (26-class multi-scan task)
write("voxel/semantic_kitti_ms/minkunet_mk34_cr10_smsa.yaml",
      "SMSA: static-moving switch augmentation on the 26-class multi-scan "
      "task", "voxel",
      data_block("semantickitti_ms_ms", 3000000, 0.05, fsa_extra),
      model_block("MinkUNetMs", 5, mk34, 1.0, 0.0, 0.1, "semantickitti")
      .replace("NUM_CLASS: 20", "NUM_CLASS: 26"),
      sgd_optim(6, 12))

# ---- voxel / nuscenes ----
write("voxel/nuscenes/minkunet_mk34_cr10.yaml",
      "Single-sweep MinkUNet on nuScenes lidarseg", "voxel",
      data_block("nuscenes", 1000000, 0.1),
      model_block("MinkUNet", 4, mk34, 1.0, 0.0, 0.1, "nuscenes"),
      sgd_optim(12, 48, 0.005))
nus_fsa_extra = f"""  MULTISCAN: 15
  STEP: 1.0
  PSEUDO_MASK: mink_sweep_notta
  FLEXIBLE_STEPS: [{', '.join(map(str, NUSC_FSA_STEPS))}]
"""
write("voxel/nuscenes/minkunet_mk34_cr10_fsa.yaml",
      "nuScenes TLAD: distance-based sweep selection (1 m steps) with "
      "per-class flexible steps", "voxel",
      data_block("nuscenes_ms", 1000000, 0.1, nus_fsa_extra),
      model_block("MinkUNetMs", 4, mk34, 1.0, 0.0, 0.1, "nuscenes"),
      sgd_optim(12, 36, 0.005))
write("voxel/nuscenes/minkunet_mk34_cr10_fsa_tiaf.yaml",
      "nuScenes TIAF: 6-camera multi-frame image fusion over the FSA "
      "voxel branch", "voxel",
      data_block("nuscenes_ms_mm", 1000000, 0.1,
                 nus_fsa_extra + "  MULTISCAN_IMAGE: 0\n  STEP_IMAGE: 7\n"),
      model_block("MinkUNetMsMmNus", 4, mk34, 1.0, 0.0, 0.1, "nuscenes",
                  "  LOSS_WEIGHT: [0, 1, 0.5, 0.5, 1]\n  ENSEMBLE_TYPE: replace\n"),
      sgd_optim(2, 36, 0.005))

# ---- voxel / waymo ----
for (fn, nl, cr, ifd) in [
    ("minkunet_mk18_cr10.yaml", mk18, 1.0, 5),
    ("minkunet_mk34_cr10.yaml", mk34, 1.0, 5),
    ("minkunet_mk34_cr16.yaml", mk34, 1.6, 5),
    ("minkunet_mk34_cr16_xyz.yaml", mk34, 1.6, 3),
]:
    write(f"voxel/waymo/{fn}", "Waymo open dataset 3D semantic segmentation",
          "voxel",
          data_block("waymo", 1000000, 0.05),
          model_block("MinkUNet", ifd, nl, cr, 0.0, 0.1, "waymo"),
          sgd_optim(1, 12))
write("voxel/waymo/cylinder_cy480_cr10.yaml",
      "Cylinder3D on Waymo (10-dim polar features)", "cylinder",
      data_block("waymo", None, None, "  GRID_SIZE: [480, 360, 32]\n"),
      model_block("Cylinder_TS", 10, None, None, 0.0, 0.0, "waymo",
                  "  INIT_SIZE: 32\n"),
      sgd_optim(1, 36))

# ---- range ----
for (fn, name, ds, h, w, bs, mextra) in [
    ("salsanext_res34.yaml", "SalsaNext", "semantickitti", 64, 512, 30, ""),
    ("fidnet_res34.yaml", "FIDNet", "semantickitti", 64, 512, 30, ""),
    ("rangenet_darknet53.yaml", "RangeNet", "semantickitti", 64, 512, 30,
     "  IF_AUX: False\n"),
    ("cenet_res34.yaml", "CENet", "nuscenes", 32, 1920, 1, "  IF_AUX: True\n"),
]:
    sub = "semantic_kitti" if ds == "semantickitti" else "nuscenes"
    write(f"range/{sub}/{fn}",
          f"{name} range-view 2D segmentor", "range",
          data_block(ds, None, None,
                     f"  H: {h}\n  W: {w}\n  IF_RANGE_MIX: 0.9\n"
                     "  IF_RANGE_SHIFT: 0.9\n  IF_RANGE_PASTE: 0.9\n"
                     "  IF_RANGE_UNION: 0.0\n"),
          f"""MODEL:
  NAME: {name}
  IN_FEATURE_DIM: 6
  NUM_CLASS: {num_class(ds)}
  IGNORE_LABEL: 0
{mextra}  LOSS_CONFIG:
    TOP_K_PERCENT: 1.0
    LS_WEIGHT: 3.0
    BD_WEIGHT: 1.0
""",
          adamw_optim(bs))

# ---- fusion ----
for (sub, fn, name, nl, cr, ls, bs, ep, ifd) in [
    ("semantic_kitti", "spvcnn_mk18_cr10.yaml", "SPVCNN", mk18, 1.0, 0.1, 16, 36, 4),
    ("semantic_kitti", "spvcnn_mk18_cr5.yaml", "SPVCNN", mk18, 0.5, 0.1, 16, 36, 4),
    ("semantic_kitti", "spvcnn_mk34_cr10.yaml", "SPVCNN", mk34, 1.0, 0.0, 12, 36, 4),
    ("semantic_kitti", "spvcnn_mk34_cr16.yaml", "SPVCNN", mk34, 1.6, 0.0, 12, 36, 4),
    ("semantic_kitti", "rpvnet_mk18_cr10.yaml", "RPVNet", mk18, 1.0, 0.0, 16, 36, 4),
    ("semantic_kitti", "rpvnet_mk34_cr17_5.yaml", "RPVNet", mk34, 1.75, 0.0, 4, 36, 5),
    ("waymo", "spvcnn_mk18_cr10.yaml", "SPVCNN", mk18, 1.0, 0.1, 1, 12, 5),
    ("waymo", "spvcnn_mk34_cr16.yaml", "SPVCNN", mk34, 1.6, 0.0, 12, 36, 5),
    ("waymo", "rpvnet_mk18_cr10.yaml", "RPVNet", mk18, 1.0, 0.0, 4, 36, 5),
]:
    ds = "semantickitti" if sub == "semantic_kitti" else "waymo"
    write(f"fusion/{sub}/{fn}",
          f"{name} point-voxel(-range) fusion segmentor", "fusion",
          data_block(ds, 1000000, 0.05),
          model_block(name, ifd, nl, cr, 0.0, ls, ds),
          sgd_optim(bs, ep))
print("done")
