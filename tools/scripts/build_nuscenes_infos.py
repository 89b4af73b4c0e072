#!/usr/bin/env python
"""Generate the nuScenes info pickles consumed by taseg_tpu.data.nuscenes.

Produces `nuscenes_infos_{split}.pkl` ({'infos': [...]}) with per-keyframe
lidar paths, lidarseg label paths, lidar2ego/ego2global transforms and
timestamps, plus `nuscenes_infos_{split}_sweep.pkl` with the interleaved
keyframe+sweep stream (`infos_sweep` / `global_indexes` / `local_indexes`
/ `scene_tokens`) used by the distance-based TLAD reader.  Requires
nuscenes-devkit (NOT in this image) — imports are gated; the readers
themselves are devkit-free.
"""

from __future__ import annotations

import argparse
import pickle
from pathlib import Path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataroot", required=True)
    ap.add_argument("--version", default="v1.0-trainval")
    ap.add_argument("--split", default="train", choices=["train", "val", "test"])
    ap.add_argument("--out_dir", default=None)
    args = ap.parse_args()

    try:
        from nuscenes import NuScenes
        from nuscenes.utils import splits as nusc_splits
    except ImportError as e:
        raise SystemExit(
            f"build_nuscenes_infos requires nuscenes-devkit ({e}); run it in "
            "a preprocessing environment — training itself is devkit-free"
        )

    nusc = NuScenes(version=args.version, dataroot=args.dataroot, verbose=True)
    scene_names = getattr(nusc_splits, args.split)
    out_dir = Path(args.out_dir or args.dataroot)

    def pose_fields(sd_token):
        sd = nusc.get("sample_data", sd_token)
        cs = nusc.get("calibrated_sensor", sd["calibrated_sensor_token"])
        ep = nusc.get("ego_pose", sd["ego_pose_token"])
        return {
            "lidar2ego_rotation": cs["rotation"],
            "lidar2ego_translation": cs["translation"],
            "ego2global_rotation": ep["rotation"],
            "ego2global_translation": ep["translation"],
            "timestamp": sd["timestamp"],
        }

    infos, infos_sweep, gidx, lidx, scenes = [], [], [], [], []
    for scene in nusc.scene:
        if scene["name"] not in scene_names:
            continue
        sample_token = scene["first_sample_token"]
        local_index = len(infos)
        while sample_token:
            sample = nusc.get("sample", sample_token)
            sd_token = sample["data"]["LIDAR_TOP"]
            sd = nusc.get("sample_data", sd_token)
            info = {
                "lidar_path": sd["filename"],
                "token": sample["token"],
                "lidar_token": sd_token,
                **pose_fields(sd_token),
            }
            try:
                info["lidarseg_path"] = nusc.get("lidarseg", sd_token)["filename"]
            except KeyError:
                pass
            local_index = len(infos)
            infos.append(info)

            # the non-keyframe sweeps between this keyframe and the next
            sweep_token = sd["next"]
            pending = []
            while sweep_token:
                sw = nusc.get("sample_data", sweep_token)
                if sw["is_key_frame"]:
                    break
                cs = nusc.get(
                    "calibrated_sensor", sw["calibrated_sensor_token"]
                )
                import numpy as np
                from taseg_tpu.data.nuscenes.reader import quaternion_matrix

                pending.append(
                    {
                        "data_path": sw["filename"],
                        "sample_data_token": sweep_token,
                        "sensor2lidar_rotation": quaternion_matrix(
                            cs["rotation"]
                        ),
                        "sensor2lidar_translation": np.asarray(
                            cs["translation"]
                        ),
                        "timestamp": sw["timestamp"],
                    }
                )
                sweep_token = sw["next"]

            gidx.append(len(infos_sweep) + len(pending))
            for p in pending:
                infos_sweep.append(p)
                lidx.append(local_index)
                scenes.append(scene["token"])
            infos_sweep.append(dict(info))
            lidx.append(local_index)
            scenes.append(scene["token"])
            sample_token = sample["next"]

    with open(out_dir / f"nuscenes_infos_{args.split}.pkl", "wb") as f:
        pickle.dump({"infos": infos}, f)
    with open(out_dir / f"nuscenes_infos_{args.split}_sweep.pkl", "wb") as f:
        pickle.dump(
            {
                "infos_sweep": infos_sweep,
                "global_indexes": gidx,
                "local_indexes": lidx,
                "scene_tokens": scenes,
            },
            f,
        )
    print(f"{len(infos)} keyframes, {len(infos_sweep)} stream entries")


if __name__ == "__main__":
    main()
