"""Offline dataset prep: convert Hein et al. pickle dumps to LINEMOD layout.

Port of the reference's format-labels tools
(format-labels/pkl_to_formatted_txt.py, convert_train_test_val_labels.py):
takes per-frame pickle records from the syn/real colibri releases
(http://medicalaugmentedreality.org/handobject.html) and writes the
LINEMOD-style dataset ColibriDataset reads.

Per-frame pickle schema (as consumed by the reference):
    rgb: (H, W, 3) uint8 or path; mask: (H, W[, 3]) with the object in the
    red channel; affine_transform: (3, 4) or (4, 4) model-to-camera pose in
    meters; cam_calib / camera intrinsics (3, 3); coords_3d: (21, 3) hand
    joints; drill_tip_transform: (4,) homogeneous tip offset.

Conversions preserved from the reference:
* masks binarized from the red channel (pkl_to_formatted_txt.py:29-84);
* meters -> millimeters scaling for translations (':245-273');
* model re-centering offset (0.048, 0.1129, -0.0845) m applied to the pose
  (':193-218');
* per-fold gt_{fold}.yml / info_{fold}.yml plus split txt files.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, List, Optional, Sequence

import numpy as np
import yaml

from hmd_ego_pose_tpu.data.image import imwrite

# model re-centering offset in meters (reference pkl_to_formatted_txt.py:193-218)
MODEL_RECENTER_OFFSET_M = np.array([0.048, 0.1129, -0.0845])
M_TO_MM = 1000.0


def binarize_mask(mask: np.ndarray, threshold: int = 10) -> np.ndarray:
    """Object mask from the red channel -> {0, 255} uint8."""
    red = mask[..., 0] if mask.ndim == 3 else mask
    return np.where(red > threshold, 255, 0).astype(np.uint8)


def bbox_from_mask(mask: np.ndarray) -> Optional[np.ndarray]:
    ys, xs = np.where(mask > 0)
    if ys.size == 0:
        return None
    return np.array([xs.min(), ys.min(), xs.max() - xs.min(), ys.max() - ys.min()], np.int64)


def pose_from_affine(affine: np.ndarray, recenter_offset_m=MODEL_RECENTER_OFFSET_M):
    """(R, t_mm) from a meters-unit affine, applying the model re-centering."""
    affine = np.asarray(affine, np.float64)
    r = affine[:3, :3]
    t_m = affine[:3, 3]
    # shifting the model origin by o moves the translation by R @ o
    t_m = t_m + r @ recenter_offset_m
    return r, t_m * M_TO_MM


def convert_pickles(
    pickle_paths: Sequence[str],
    out_root: str,
    object_id: int = 1,
    fold: int = 0,
    splits: Optional[Dict[str, List[int]]] = None,
    skip_frames: Sequence[int] = (),
) -> str:
    """Convert a list of per-frame pickle files into the LINEMOD layout."""
    obj_dir = os.path.join(out_root, "data", f"{object_id:02d}")
    for sub in ("rgb", "mask", "hands"):
        os.makedirs(os.path.join(obj_dir, sub), exist_ok=True)

    gt: Dict[int, list] = {}
    info: Dict[int, dict] = {}
    frame_ids = []

    for frame_id, path in enumerate(pickle_paths):
        if frame_id in skip_frames:
            continue
        with open(path, "rb") as f:
            record = pickle.load(f)

        rgb = np.asarray(record["rgb"], np.uint8)
        mask = binarize_mask(np.asarray(record["mask"]))
        bb = bbox_from_mask(mask)
        if bb is None:
            # corrupt/empty frame — reference skips these (':110-112')
            continue

        rotation, translation_mm = pose_from_affine(record["affine_transform"])
        cam_k = np.asarray(record.get("cam_calib", record.get("camera_matrix")), np.float64)

        tip = np.asarray(record["drill_tip_transform"], np.float64).reshape(-1)
        if tip.shape[0] == 3:
            tip = np.concatenate([tip * M_TO_MM, [1.0]])
        elif abs(tip[3] - 1.0) < 1e-9 and np.abs(tip[:3]).max() < 10:
            # meters -> mm, keep homogeneous 1
            tip = np.concatenate([tip[:3] * M_TO_MM, [1.0]])

        imwrite(os.path.join(obj_dir, "rgb", f"{frame_id:06d}.png"), rgb)
        imwrite(os.path.join(obj_dir, "mask", f"{frame_id:06d}.png"), mask)
        coords = np.asarray(record["coords_3d"], np.float64)
        np.save(os.path.join(obj_dir, "hands", f"{frame_id:06d}_coords_3d.npy"), coords)

        gt[frame_id] = [
            {
                "cam_R_m2c": [float(x) for x in rotation.reshape(-1)],
                "cam_t_m2c": [float(x) for x in translation_mm],
                "obj_bb": [int(x) for x in bb],
                "obj_id": object_id,
                "drill_tip_transform": [float(x) for x in tip],
            }
        ]
        info[frame_id] = {"cam_K": [float(x) for x in cam_k.reshape(-1)], "depth_scale": 1.0}
        frame_ids.append(frame_id)

    with open(os.path.join(obj_dir, f"gt_{fold}.yml"), "w") as f:
        yaml.safe_dump(gt, f)
    with open(os.path.join(obj_dir, f"info_{fold}.yml"), "w") as f:
        yaml.safe_dump(info, f)

    if splits is None:
        n = len(frame_ids)
        splits = {
            "train": frame_ids[: int(n * 0.6)],
            "val": frame_ids[int(n * 0.6): int(n * 0.8)],
            "test": frame_ids[int(n * 0.8):],
        }
    for name, ids in splits.items():
        with open(os.path.join(obj_dir, f"{name}_{fold}.txt"), "w") as f:
            f.write("\n".join(f"{i:06d}" for i in ids) + "\n")

    return out_root
