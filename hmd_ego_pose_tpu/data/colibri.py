"""Colibri (syn/real) dataset reader — LINEMOD on-disk layout.

Re-implements the reference reader's behaviour
(pytorch-sandbox/generators/colibri.py:14-583) without cv2/plyfile:

* per-fold split files ``{train,val,test}_{fold}.txt``;
* ``gt_{fold}.yml``: per-frame ``cam_R_m2c`` (row-major 9-vector),
  ``cam_t_m2c`` (mm), ``obj_bb``, ``obj_id``, ``drill_tip_transform``;
* ``info_{fold}.yml``: per-frame ``cam_K`` intrinsics;
* ``models/obj_{id:02d}.ply`` 3-D model + ``models_info.yml`` (diameter);
* hand joints from ``hands/{frame}_coords_3d.npy``;
* 2-D bbox derived from the segmentation mask (colibri.py:411-412);
* object id 2 and name "none" are treated as symmetric (colibri.py:27).

Annotation schema (per frame, single object):
    labels (1,), bboxes (1, 4), rotations (1, 5) = [axis-angle, is_sym,
    class], translations (1, 3) mm, translations_x_y_2D (1, 2), coords_3d
    (1, 21, 3), drill_tip_transform (1, 4).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np
import yaml

from hmd_ego_pose_tpu.data.image import imread_rgb
from hmd_ego_pose_tpu.data.ply import load_ply_vertices
from hmd_ego_pose_tpu.ops.geometry import matrix_to_axis_angle


def get_bbox_from_mask(mask: np.ndarray, mask_value: Optional[int] = None):
    """2-D bbox of a mask region (colibri_common.py:536-560)."""
    if mask.ndim == 3:
        mask = mask[..., 0]
    sel = (mask != 0) if mask_value is None else (mask == mask_value)
    ys, xs = np.where(sel)
    if ys.size == 0:
        return np.zeros((4,), np.float32), False
    return np.array([xs.min(), ys.min(), xs.max(), ys.max()], np.float32), True


def project_origin_2d(rotation_vector, translation_vector, camera_matrix):
    """Project the object-frame origin to pixels (the translation centrepoint)."""
    # origin point: R @ 0 + t = t
    t = np.asarray(translation_vector, np.float64)
    u = camera_matrix[0, 0] * t[0] / t[2] + camera_matrix[0, 2]
    v = camera_matrix[1, 1] * t[1] / t[2] + camera_matrix[1, 2]
    return np.array([u, v], np.float64)


def subsample_model_points(points: np.ndarray, count: int) -> np.ndarray:
    """Deterministic stride subsample / zero-pad to ``count`` points.

    Must match the reference exactly (colibri_common.py:735-775): stride
    ``(num_points // count) - 1`` clamped at 1, then truncate.
    """
    num = points.shape[0]
    if num == count:
        return points.astype(np.float32)
    if num < count:
        out = np.zeros((count, 3), np.float32)
        out[:num] = points
        return out
    step = max((num // count) - 1, 1)
    return points[::step][:count].astype(np.float32)


class ColibriDataset:
    """Random-access reader for one object of a syn/real colibri fold+partition.

    ``object_ids`` (beyond the reference, whose colibri scenes are strictly
    single-object) reads a MULTI-OBJECT scene: all frames live under the
    first id's scene dir, ``gt_{fold}.yml`` carries one entry per object per
    frame, the shared mask encodes each object at its own pixel value
    (``mask_values.yml`` sidecar in the scene dir), and annotations get one
    row per object present (labels = class indices 0..C-1).
    """

    def __init__(
        self,
        dataset_path: str,
        fold: int = 0,
        object_id: int = 1,
        partition: str = "train",
        image_extension: str = ".png",
        symmetric_objects=frozenset({"none", 2}),
        rotation_parameter: int = 3,
        object_ids=None,
    ):
        self.dataset_path = dataset_path
        self.object_id = object_id if object_ids is None else object_ids[0]
        self.object_ids = list(object_ids) if object_ids is not None else [object_id]
        object_id = self.object_id
        self.partition = partition
        self.symmetric_objects = symmetric_objects
        self.rotation_parameter = rotation_parameter
        self.translation_parameter = 3

        data_dir = os.path.join(dataset_path, "data")
        model_dir = os.path.join(dataset_path, "models")
        object_path = os.path.join(data_dir, f"{object_id:02d}")
        if not os.path.isdir(object_path):
            # some layouts use unpadded ids
            object_path = os.path.join(data_dir, str(object_id))
        self.object_path = object_path

        split_file = os.path.join(object_path, f"{partition}_{fold}.txt")
        with open(split_file) as f:
            examples = {line.strip() for line in f if line.strip()}

        with open(os.path.join(object_path, f"gt_{fold}.yml")) as f:
            gt_dict = yaml.safe_load(f)
        with open(os.path.join(object_path, f"info_{fold}.yml")) as f:
            info_dict = yaml.safe_load(f)
        with open(os.path.join(model_dir, "models_info.yml")) as f:
            models_info = yaml.safe_load(f)

        self.models_info = [models_info[oid] for oid in self.object_ids]
        self.diameters = [float(mi["diameter"]) for mi in self.models_info]
        self.models_3d_points = [
            load_ply_vertices(os.path.join(model_dir, f"obj_{oid:02d}.ply"))
            for oid in self.object_ids
        ]
        # class-0 aliases (the single-object API the reference exposes)
        self.model_info = self.models_info[0]
        self.diameter = self.diameters[0]
        self.model_3d_points = self.models_3d_points[0]

        # per-object mask pixel values: single-object scenes follow the
        # colibri convention (everything nonzero is THE object); multi-object
        # scenes must say which pixel value is whose (mask_values.yml)
        if len(self.object_ids) == 1:
            self._mask_values = {self.object_ids[0]: 255}
        else:
            mv_path = os.path.join(object_path, "mask_values.yml")
            if not os.path.isfile(mv_path):
                raise FileNotFoundError(
                    f"multi-object scene needs {mv_path} (obj_id -> mask "
                    "pixel value); single-object layouts don't"
                )
            with open(mv_path) as f:
                self._mask_values = {int(k): int(v) for k, v in yaml.safe_load(f).items()}

        rgb_dir = os.path.join(object_path, "rgb")
        names = sorted(
            fn for fn in os.listdir(rgb_dir)
            if fn.endswith(image_extension) and fn[: -len(image_extension)] in examples
        )
        self.image_paths = [os.path.join(rgb_dir, fn) for fn in names]
        self.mask_paths = [p.replace("rgb", "mask") for p in self.image_paths]
        self.frame_ids = [int(fn.split(".")[0]) for fn in names]

        self.infos = []
        self.annotations = []
        multi = len(self.object_ids) > 1
        for frame_id, mask_path in zip(self.frame_ids, self.mask_paths):
            cam_k = np.reshape(np.asarray(info_dict[frame_id]["cam_K"], np.float64), (3, 3))
            self.infos.append(cam_k)
            mask = imread_rgb(mask_path)

            # one hand per frame (reference layout), replicated to every row
            hands_dir = os.path.join(os.path.dirname(os.path.dirname(mask_path)), "hands")
            hand = np.load(os.path.join(hands_dir, f"{frame_id:06d}_coords_3d.npy"))

            rows = []
            for cls, oid in enumerate(self.object_ids):
                gt = next(g for g in gt_dict[frame_id] if g["obj_id"] == oid)
                rot_mat = np.reshape(np.asarray(gt["cam_R_m2c"], np.float64), (3, 3))
                rotvec = matrix_to_axis_angle(rot_mat)
                trans = np.asarray(gt["cam_t_m2c"], np.float64)
                # single-object keeps the colibri convention (mask != 0 is
                # THE object); multi-object isolates this object's pixels
                bbox, ok = get_bbox_from_mask(
                    mask, self._mask_values[oid] if multi else None
                )
                if multi and not ok:
                    continue  # fully occluded / out of frame: drop the row
                tip = np.asarray(gt["drill_tip_transform"], np.float64)
                rows.append((cls, oid, rotvec, trans, bbox, tip))

            k = len(rows)
            anno = {
                "labels": np.zeros((k,), np.int64),
                "bboxes": np.zeros((k, 4), np.float64),
                "rotations": np.zeros((k, self.rotation_parameter + 2), np.float64),
                "translations": np.zeros((k, 3), np.float64),
                "translations_x_y_2D": np.zeros((k, 2), np.float64),
                "coords_3d": np.zeros((k, 21, 3), np.float64),
                "drill_tip_transform": np.zeros((k, 4), np.float64),
            }
            if multi:
                anno["mask_values"] = np.zeros((k,), np.int64)
            for r, (cls, oid, rotvec, trans, bbox, tip) in enumerate(rows):
                anno["labels"][r] = cls
                anno["bboxes"][r] = bbox
                anno["rotations"][r, :3] = rotvec
                anno["rotations"][r, 3] = float(self.is_symmetric_object(oid))
                anno["rotations"][r, 4] = float(cls)
                anno["translations"][r] = trans
                anno["translations_x_y_2D"][r] = project_origin_2d(rotvec, trans, cam_k)
                anno["coords_3d"][r] = hand
                anno["drill_tip_transform"][r] = tip
                if multi:
                    anno["mask_values"][r] = self._mask_values[oid]

            self.annotations.append(anno)

        if multi:
            self.class_to_name = {
                c: f"object_{oid:02d}" for c, oid in enumerate(self.object_ids)
            }
            self.class_labels_to_object_ids = dict(enumerate(self.object_ids))
        else:
            # single-class mappings (colibri.py:71-75)
            self.class_to_name = {0: "object"}
            self.class_labels_to_object_ids = {0: object_id}
        self.name_to_class = {n: c for c, n in self.class_to_name.items()}
        self.name_to_mask_value = {
            self.class_to_name[c]: self._mask_values[oid]
            for c, oid in enumerate(self.object_ids)
        }

    # -- protocol -----------------------------------------------------------------
    def __len__(self):
        return len(self.image_paths)

    size = __len__

    def num_classes(self) -> int:
        return len(self.object_ids)

    def has_label(self, label) -> bool:
        return label in self.class_to_name

    def is_symmetric_object(self, name_or_id) -> bool:
        return name_or_id in self.symmetric_objects

    def preload(self, budget_bytes: int = 8 << 30) -> bool:
        """Decode every image+mask once into a read-only in-memory cache.

        PNG decode dominates the per-example cost on a 1-core host (~6 ms of
        ~23 ms); the trainer's 10x-oversampled epochs re-decode each frame
        ~10 times per epoch without this.  Returns False (and caches nothing)
        if the decoded set would exceed ``budget_bytes``.
        """
        if getattr(self, "_image_cache", None) is not None:
            return True
        probe = imread_rgb(self.image_paths[0])
        mask_probe = imread_rgb(self.mask_paths[0])
        est = len(self.image_paths) * (probe.nbytes + mask_probe.nbytes)
        if est > budget_bytes:
            return False
        images, masks = [], []
        for ip, mp in zip(self.image_paths, self.mask_paths):
            im, mk = imread_rgb(ip), imread_rgb(mp)
            im.setflags(write=False)
            mk.setflags(write=False)
            images.append(im)
            masks.append(mk)
        self._image_cache, self._mask_cache = images, masks
        return True

    def load_image(self, i: int) -> np.ndarray:
        cache = getattr(self, "_image_cache", None)
        if cache is not None:
            return cache[i]
        return imread_rgb(self.image_paths[i])

    def load_mask(self, i: int) -> np.ndarray:
        cache = getattr(self, "_mask_cache", None)
        if cache is not None:
            return cache[i]
        return imread_rgb(self.mask_paths[i])

    def load_annotations(self, i: int) -> Dict[str, np.ndarray]:
        return {k: v.copy() for k, v in self.annotations[i].items()}

    def load_camera_matrix(self, i: int) -> np.ndarray:
        return self.infos[i].copy()

    def load_drill_tip_offset(self, i: int) -> np.ndarray:
        return self.annotations[i]["drill_tip_transform"].copy()

    # -- model points -------------------------------------------------------------
    def model_points_for_loss(self, count: int = 500) -> np.ndarray:
        """(num_classes, count, 3) loss subsample (colibri_common.py:712-730)."""
        return np.stack(
            [subsample_model_points(pts, count) for pts in self.models_3d_points]
        )

    def get_models_3d_points_dict(self):
        return dict(enumerate(self.models_3d_points))

    def get_objects_diameter_dict(self):
        return dict(enumerate(self.diameters))
