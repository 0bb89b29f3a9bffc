"""Multi-object (K=2, two-class) END-TO-END integration on real files.

Beyond the reference — its colibri scenes are strictly single-object
(pytorch-sandbox/generators/colibri.py builds 1-row annotations throughout)
— but this framework claims K>1/multi-class generality, so the whole chain
is pinned at the disk-format level: generator (shared frames, per-object
mask pixel values) -> ColibriDataset(object_ids=...) -> host InputPipeline
-> device-path host cache + in-step augmentation -> Trainer epoch ->
multi-class evaluator (per-class + class-mean metrics).
"""

import math
import os

import numpy as np
import pytest
import yaml

import jax.numpy as jnp

from hmd_ego_pose_tpu.config import Config, DataConfig, EvalConfig, ModelConfig, TrainConfig
from hmd_ego_pose_tpu.data.colibri import ColibriDataset
from hmd_ego_pose_tpu.data.synthetic import generate_synthetic_colibri
from hmd_ego_pose_tpu.ops.nms import Detections


@pytest.fixture(scope="module")
def multi_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("syn_multi")
    return generate_synthetic_colibri(
        str(root), num_frames=12, image_size=(256, 256), num_objects=2
    )


@pytest.fixture(scope="module")
def train_ds(multi_root):
    return ColibriDataset(multi_root, fold=0, partition="train", object_ids=[1, 2])


def test_generator_multi_object_layout(multi_root):
    scene = os.path.join(multi_root, "data", "01")
    with open(os.path.join(scene, "mask_values.yml")) as f:
        mv = yaml.safe_load(f)
    assert mv == {1: 255, 2: 100}

    for oid in (1, 2):
        assert os.path.isfile(os.path.join(multi_root, "models", f"obj_{oid:02d}.ply"))
    with open(os.path.join(multi_root, "models", "models_info.yml")) as f:
        mi = yaml.safe_load(f)
    assert set(mi) == {1, 2}
    # distinct shapes -> distinct diameters
    assert abs(mi[1]["diameter"] - mi[2]["diameter"]) > 1.0

    with open(os.path.join(scene, "gt_0.yml")) as f:
        gt = yaml.safe_load(f)
    assert all(sorted(g["obj_id"] for g in entries) == [1, 2] for entries in gt.values())

    from hmd_ego_pose_tpu.data.image import imread_rgb

    mask = imread_rgb(os.path.join(scene, "mask", "000000.png"))
    mask = mask[..., 0] if mask.ndim == 3 else mask
    vals = set(np.unique(mask).tolist())
    assert {255, 100} <= vals  # both objects visible at their own value
    assert vals <= {0, 100, 255}


def test_reader_multi_object_annotations(train_ds, multi_root):
    assert train_ds.num_classes() == 2
    assert train_ds.class_labels_to_object_ids == {0: 1, 1: 2}
    assert train_ds.name_to_mask_value == {"object_01": 255, "object_02": 100}

    pts = train_ds.model_points_for_loss(500)
    assert pts.shape == (2, 500, 3)
    assert not np.allclose(pts[0], pts[1])
    assert set(train_ds.get_models_3d_points_dict()) == {0, 1}
    d = train_ds.get_objects_diameter_dict()
    assert set(d) == {0, 1} and d[0] != d[1]

    gt_yml = os.path.join(multi_root, "data", "01", "gt_0.yml")
    with open(gt_yml) as f:
        gt = yaml.safe_load(f)

    for i in range(len(train_ds)):
        anno = train_ds.load_annotations(i)
        k = anno["labels"].shape[0]
        assert 1 <= k <= 2
        assert set(anno["labels"].tolist()) <= {0, 1}
        assert anno["mask_values"].shape == (k,)
        for r in range(k):
            cls = int(anno["labels"][r])
            assert anno["mask_values"][r] == (255 if cls == 0 else 100)
            # class column rides the rotation row (schema: [axis-angle,
            # is_sym, class]); object id 2 is symmetric by the colibri
            # convention (colibri.py:27)
            assert anno["rotations"][r, 4] == float(cls)
            assert anno["rotations"][r, 3] == float(cls == 1)
            # translations match the on-disk gt for THIS object
            oid = train_ds.class_labels_to_object_ids[cls]
            g = next(e for e in gt[train_ds.frame_ids[i]] if e["obj_id"] == oid)
            np.testing.assert_allclose(anno["translations"][r], g["cam_t_m2c"])
        # per-object bboxes are genuinely per-object: when both are present
        # they differ (objects live in separate lateral slots)
        if k == 2:
            assert not np.allclose(anno["bboxes"][0], anno["bboxes"][1])


def test_host_pipeline_k2_batches(train_ds):
    from hmd_ego_pose_tpu.data.pipeline import InputPipeline

    cfg = Config(model=ModelConfig(image_size=128, num_classes=2),
                 data=DataConfig(max_objects=2, num_workers=1,
                                 device_augment=False))
    pipe = InputPipeline(train_ds, cfg.data, cfg.model, batch_size=2,
                         training=True, seed=0)
    batch = next(iter(pipe.batches(oversample=1, num_workers=1)))
    b = batch.images.shape[0]
    assert batch.gt_boxes.shape == (b, 2, 4)
    assert batch.gt_transformation.shape == (b, 2, 8)
    assert batch.gt_coords_3d.shape == (b, 2, 63)
    assert batch.gt_valid.shape == (b, 2)
    assert batch.gt_valid.any()
    # the transformation target's class column carries the REAL label so the
    # loss's per-class model-point lookup engages
    valid = np.asarray(batch.gt_valid)
    tcls = np.asarray(batch.gt_transformation[..., 7])
    lbls = np.asarray(batch.gt_labels)
    np.testing.assert_array_equal(tcls[valid], lbls[valid].astype(np.float32))


def test_device_path_k2_from_files(train_ds):
    """build_host_cache -> gather -> in-step augment on real multi-object
    files: per-object mask values ride the device dataset."""
    import jax

    from hmd_ego_pose_tpu.data.device_dataset import (
        build_host_cache, gather_raw_batch, upload_window,
    )
    from hmd_ego_pose_tpu.ops.augment_device import augment_and_preprocess_batch

    cache = build_host_cache(train_ds, max_objects=2)
    assert cache.gt_mask_values.shape == (len(train_ds), 2)
    # every valid row's mask value is the class's own pixel value
    for i in range(len(train_ds)):
        anno = train_ds.load_annotations(i)
        for r in range(anno["labels"].shape[0]):
            assert cache.gt_mask_values[i, r] == anno["mask_values"][r]

    data = upload_window(cache)
    raw = gather_raw_batch(data, jnp.asarray([0, 1], jnp.int32))
    assert raw.gt_mask_values.shape == (2, 2)

    batch = augment_and_preprocess_batch(
        jax.random.PRNGKey(0), raw, image_size=128,
        chance_no_augmentation=0.0, scale_range=(0.9, 1.1),
    )
    assert batch.gt_boxes.shape == (2, 2, 4)
    assert np.asarray(batch.gt_valid).any()
    assert np.isfinite(np.asarray(batch.gt_boxes)).all()


class _MultiOracle:
    """predict_fn returning every GT row of each frame as a perfect detection
    (labels carried per class; batched cursor like test_data_eval's oracle)."""

    def __init__(self, dataset, max_detections):
        self.ds = dataset
        self.k = max_detections
        self.cursor = 0

    def __call__(self, params, state, images, cam):
        b = images.shape[0]
        k = self.k
        boxes = np.full((b, k, 4), -1, np.float32)
        scores = np.full((b, k), -1, np.float32)
        labels = np.full((b, k), -1, np.int32)
        rot = np.full((b, k, 3), -1, np.float32)
        trans = np.full((b, k, 3), -1, np.float32)
        hand = np.full((b, k, 63), -1, np.float32)
        num_valid = np.zeros((b,), np.int32)
        for row in range(b):
            i = self.cursor + row
            if i >= len(self.ds):
                break
            anno = self.ds.load_annotations(i)
            scale = float(cam[row, 5])
            n = anno["labels"].shape[0]
            for r in range(n):
                boxes[row, r] = anno["bboxes"][r] * scale
                scores[row, r] = 0.97
                labels[row, r] = int(anno["labels"][r])
                rot[row, r] = anno["rotations"][r, :3] / math.pi
                trans[row, r] = anno["translations"][r]
                hand[row, r] = anno["coords_3d"][r].reshape(-1) * scale
            num_valid[row] = n
        self.cursor += b
        return Detections(
            boxes=jnp.asarray(boxes), scores=jnp.asarray(scores),
            labels=jnp.asarray(labels), rotation=jnp.asarray(rot),
            translation=jnp.asarray(trans), hand=jnp.asarray(hand),
            num_valid=jnp.asarray(num_valid),
        )


def test_multiclass_evaluator_oracle_on_files(train_ds):
    from hmd_ego_pose_tpu.eval.evaluator import evaluate_model

    cfg = Config(model=ModelConfig(image_size=256, num_classes=2))
    oracle = _MultiOracle(train_ds, cfg.eval.max_detections)
    result = evaluate_model(train_ds, oracle, None, None, cfg)

    assert set(result.per_class) == {0, 1}
    for c in (0, 1):
        assert result.per_class[c].mean_ap == pytest.approx(1.0)
        assert result.per_class[c].translation_error_mean_mm < 1e-3
    assert result.mean_ap == pytest.approx(1.0)
    # object id 2 is symmetric: its ADD-S (sym point distance) must be the
    # populated branch for class 1
    assert np.isfinite(result.per_class[1].sym_point_distance_mean_mm)


def test_trainer_epoch_multi_object(multi_root, tmp_path, monkeypatch):
    """Full Trainer epoch (device-resident path) on the 2-object dataset:
    num_classes=2 head, (2,*,3) per-class loss model points, K=2 in-step
    augmentation — loss finite, steps advance."""
    from hmd_ego_pose_tpu.train.trainer import Trainer
    from hmd_ego_pose_tpu.eval.evaluator import EvalResult
    import hmd_ego_pose_tpu.train.trainer as trainer_mod

    cfg = Config(
        model=ModelConfig(phi=0, image_size=128, num_classes=2),
        train=TrainConfig(
            batch_size=2, learning_rate=1e-4, epochs=1, oversample=1,
            freeze_backbone=False, checkpoint_dir=str(tmp_path / "ckpt"),
        ),
        data=DataConfig(dataset="syn_colibri", fold=0, max_objects=2, num_workers=1),
        eval=EvalConfig(score_threshold=0.0, max_detections=4),
    )
    train_ds = ColibriDataset(multi_root, fold=0, partition="train", object_ids=[1, 2])
    val_ds = ColibriDataset(multi_root, fold=0, partition="val", object_ids=[1, 2])

    monkeypatch.setattr(
        trainer_mod, "evaluate_model",
        lambda *a, **k: EvalResult(mixed_point_distance_mean_mm=42.0, mean_ap=0.5),
    )
    trainer = Trainer(cfg, train_ds, val_ds)
    assert trainer._device_data is not None  # HBM(-analog)-resident path on
    trainer.fit(epochs=1)
    import jax

    assert int(jax.device_get(trainer.state.step)) == len(train_ds) // 2
