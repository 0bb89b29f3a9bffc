"""Host-side input pipeline: augment -> preprocess -> pad -> device batches.

The heavy per-anchor target materialization the reference does in DataLoader
workers (12k anchors x 68 floats per image; generators/colibri_common.py:243)
is gone — targets are assigned on device (ops/target_assign.py).  Workers
only decode images, apply label-coupled augmentations, normalize, and pad the
per-image ground truth to a fixed K.  A background thread pool keeps
``prefetch`` batches ready so the TPU never waits on the host.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional

import numpy as np

from hmd_ego_pose_tpu.config import DataConfig, ModelConfig
from hmd_ego_pose_tpu.data.augment import ColorAugmenter, augment_6dof, random_6dof_params
from hmd_ego_pose_tpu.data.colibri import ColibriDataset
from hmd_ego_pose_tpu.data.image import preprocess_image
from hmd_ego_pose_tpu.train.step import Batch

_PI = np.pi


class InputPipeline:
    """Iterable of training/eval batches from a ColibriDataset."""

    def __init__(
        self,
        dataset: ColibriDataset,
        data_config: DataConfig,
        model_config: ModelConfig,
        batch_size: int,
        training: bool = True,
        max_objects: Optional[int] = None,
        seed: int = 0,
    ):
        self.dataset = dataset
        self.cfg = data_config
        self.model_cfg = model_config
        self.batch_size = batch_size
        self.training = training
        self.max_objects = (
            max_objects if max_objects is not None else data_config.max_objects
        )
        self.rng = np.random.RandomState(seed)
        self.color_aug = ColorAugmenter()
        if data_config.preload and hasattr(dataset, "preload"):
            dataset.preload(data_config.preload_budget_bytes)

    # -- single example -----------------------------------------------------------
    def _load_example(self, index: int, rng: np.random.RandomState):
        image = self.dataset.load_image(index)
        anno = self.dataset.load_annotations(index)
        cam = self.dataset.load_camera_matrix(index)

        if self.training and rng.random_sample() >= self.cfg.chance_no_augmentation:
            if self.cfg.use_colorspace_augmentation:
                image = self.color_aug(image, rng)
            if self.cfg.use_6dof_augmentation:
                mask = self.dataset.load_mask(index)
                angle, scale = random_6dof_params(rng, self.cfg.scale_6dof_augmentation)
                image, anno, _ = augment_6dof(
                    image, mask, anno, cam, angle, scale,
                    mask_values=anno.get("mask_values"),
                )

        image, image_scale = preprocess_image(image, self.model_cfg.image_size)

        # label-space preprocessing (colibri_common.py:583-620): scale bboxes,
        # normalize rotation to [-1, 1], scale 2-D centres, keep mm translations
        anno["bboxes"] = anno["bboxes"] * image_scale
        anno["rotations"][:, :3] = anno["rotations"][:, :3] / _PI
        anno["translations_x_y_2D"] = anno["translations_x_y_2D"] * image_scale
        coords = anno["coords_3d"] * image_scale

        camera_parameters = np.array(
            [cam[0, 0], cam[1, 1], cam[0, 2], cam[1, 2],
             self.cfg.translation_scale_norm, image_scale],
            np.float32,
        )

        k = self.max_objects
        num = min(anno["labels"].shape[0], k)
        gt_boxes = np.zeros((k, 4), np.float32)
        gt_labels = np.zeros((k,), np.int32)
        gt_transformation = np.zeros((k, 8), np.float32)
        gt_coords = np.zeros((k, 63), np.float32)
        gt_valid = np.zeros((k,), bool)

        gt_boxes[:num] = anno["bboxes"][:num]
        gt_labels[:num] = anno["labels"][:num]
        # transformation target layout: [rot/pi (3), trans mm (3), is_sym, class]
        gt_transformation[:num, :3] = anno["rotations"][:num, :3]
        gt_transformation[:num, 3:6] = anno["translations"][:num]
        gt_transformation[:num, 6:8] = anno["rotations"][:num, 3:5]
        gt_coords[:num] = coords[:num].reshape(num, 63)
        gt_valid[:num] = True

        return image, camera_parameters, gt_boxes, gt_labels, gt_transformation, gt_coords, gt_valid

    def _make_batch(self, indices, seeds) -> Batch:
        parts = [self._load_example(i, np.random.RandomState(s)) for i, s in zip(indices, seeds)]
        stacked = [np.stack(x) for x in zip(*parts)]
        return Batch(*stacked)

    # -- raw (device-augmentation) mode --------------------------------------------
    def _load_raw_example(self, index: int):
        """Cached uint8 frame + mask + raw labels; no host math beyond copies."""
        image = self.dataset.load_image(index)
        mask = self.dataset.load_mask(index)
        if mask.ndim == 3:
            mask = mask[..., 0]
        anno = self.dataset.load_annotations(index)
        cam = self.dataset.load_camera_matrix(index)

        k = self.max_objects
        num = min(anno["labels"].shape[0], k)
        boxes = np.zeros((k, 4), np.float32)
        rotations = np.zeros((k, 3), np.float32)
        is_sym = np.zeros((k,), np.float32)
        translations = np.zeros((k, 3), np.float32)
        coords = np.zeros((k, 21, 3), np.float32)
        labels = np.zeros((k,), np.int32)
        valid = np.zeros((k,), bool)
        mask_values = np.full((k,), 255, np.int32)

        boxes[:num] = anno["bboxes"][:num]
        rotations[:num] = anno["rotations"][:num, :3]
        is_sym[:num] = anno["rotations"][:num, 3]
        translations[:num] = anno["translations"][:num]
        coords[:num] = anno["coords_3d"][:num]
        labels[:num] = anno["labels"][:num]
        valid[:num] = True
        if "mask_values" in anno:
            mask_values[:num] = anno["mask_values"][:num]
        elif num > 1:
            raise ValueError(
                "multi-object frames need per-object 'mask_values' in "
                "annotations (which mask pixel value is which object)"
            )

        cam4 = np.array([cam[0, 0], cam[1, 1], cam[0, 2], cam[1, 2]], np.float32)
        return (image, mask, cam4, boxes, rotations, is_sym, translations,
                coords, labels, valid, mask_values)

    def _make_raw_batch(self, indices, _seeds):
        from hmd_ego_pose_tpu.ops.augment_device import RawBatch

        parts = [self._load_raw_example(i) for i in indices]
        return RawBatch(*[np.stack(x) for x in zip(*parts)])

    # -- iteration ----------------------------------------------------------------
    def epoch_indices(self, oversample: int = 1) -> np.ndarray:
        n = len(self.dataset)
        idx = np.concatenate([self.rng.permutation(n) for _ in range(oversample)])
        usable = (len(idx) // self.batch_size) * self.batch_size
        return idx[:usable].reshape(-1, self.batch_size)

    def batches(self, oversample: int = 1, num_workers: Optional[int] = None) -> Iterator[Batch]:
        """Yield batches for one (oversampled) epoch with background workers.

        Submission is windowed to ``prefetch + workers`` outstanding batch
        futures (backpressure): a 10x-oversampled epoch must not materialize
        every batch future upfront (unbounded memory, round-1 weak #3).
        """
        groups = self.epoch_indices(oversample)
        seeds = self.rng.randint(0, 2 ** 31 - 1, size=groups.shape)
        workers = num_workers if num_workers is not None else self.cfg.num_workers
        make = self._make_raw_batch if (self.training and self.cfg.device_augment) else self._make_batch

        if workers <= 1:
            for g, s in zip(groups, seeds):
                yield make(g, s)
            return

        window = max(1, self.cfg.prefetch) + workers
        with ThreadPoolExecutor(max_workers=workers) as pool:
            from collections import deque

            pending = deque()
            it = iter(zip(groups, seeds))
            for g, s in it:
                pending.append(pool.submit(make, g, s))
                if len(pending) >= window:
                    break
            while pending:
                fut = pending.popleft()
                nxt = next(it, None)
                if nxt is not None:
                    pending.append(pool.submit(make, *nxt))
                yield fut.result()
