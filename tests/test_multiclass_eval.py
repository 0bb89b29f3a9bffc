"""Multi-class evaluation: per-label matching + class-mean aggregation.

The reference loops per label over per-label detection/annotation lists
(pytorch-sandbox/eval/common.py:912-1103) and averages metrics unweighted
over labels with annotations (eval/common.py:92-105).  Round 2 hardcoded
class 0; this pins the generalized evaluator on a 2-class fake dataset with
a stubbed predict_fn (no network), where every expected number is known in
closed form.
"""

import dataclasses

import numpy as np
import pytest

from hmd_ego_pose_tpu.config import Config, EvalConfig, ModelConfig
from hmd_ego_pose_tpu.eval.evaluator import EvalResult, evaluate_model
from hmd_ego_pose_tpu.ops.nms import Detections

S = 64  # image + model size (scale 1.0 in preprocess)


class TwoClassDataset:
    """2 images x 2 annotations (one per class).  Class 0 asymmetric,
    class 1 symmetric (object ids 1 and 2)."""

    class_labels_to_object_ids = {0: 1, 1: 2}

    def __init__(self):
        rng = np.random.RandomState(0)
        self.points = {
            0: rng.uniform(-30, 30, (60, 3)).astype(np.float32),
            1: rng.uniform(-20, 20, (60, 3)).astype(np.float32),
        }
        self.cam = np.array([[100.0, 0, S / 2], [0, 100.0, S / 2], [0, 0, 1.0]])
        # per-image, per-class GT poses
        self.rot = {0: np.array([0.1, -0.2, 0.3]), 1: np.array([0.0, 0.4, -0.1])}
        self.trans = {0: np.array([10.0, 5.0, 500.0]), 1: np.array([-20.0, 0.0, 650.0])}
        self.boxes = {0: np.array([5.0, 5.0, 25.0, 25.0]), 1: np.array([35.0, 30.0, 60.0, 55.0])}
        self.hand = np.tile(np.array([0.01, 0.02, 0.5]), (21, 1))  # metres

    def __len__(self):
        return 2

    def load_image(self, i):
        return np.zeros((S, S, 3), np.uint8)

    def load_camera_matrix(self, i):
        return self.cam

    def load_drill_tip_offset(self, i):
        return np.array([0.0, 0.0, 50.0, 1.0])  # homogeneous, like colibri.py

    def load_annotations(self, i):
        rots = np.zeros((2, 5))
        rots[0, :3], rots[1, :3] = self.rot[0], self.rot[1]
        rots[1, 3] = 1.0  # is_sym flag mirrors dataset convention
        return {
            "labels": np.array([0, 1]),
            "bboxes": np.stack([self.boxes[0], self.boxes[1]]),
            "rotations": rots,
            "translations": np.stack([self.trans[0], self.trans[1]]),
            "coords_3d": np.stack([self.hand, self.hand]),
        }

    def get_models_3d_points_dict(self):
        return self.points

    def get_objects_diameter_dict(self):
        return {c: float(np.linalg.norm(p.max(0) - p.min(0))) for c, p in self.points.items()}

    def is_symmetric_object(self, object_id):
        return object_id == 2


# class-1 predictions are offset by exactly this much in translation
T_OFFSET = np.array([3.0, 0.0, 0.0])


def _stub_predict(dataset):
    """(params, state, images, cams) -> Detections with known content.

    Class 0: exact GT pose, score 0.9.  Class 1: translation off by
    ||T_OFFSET|| mm, score 0.8.  Plus one class-0 false positive (score 0.3,
    box nowhere near GT) on every image to exercise per-class AP.
    """

    def predict(params, state, images, cams):
        b = images.shape[0]
        k = 3
        boxes = np.zeros((b, k, 4), np.float32)
        scores = np.full((b, k), -1.0, np.float32)
        labels = np.full((b, k), -1, np.int32)
        rot = np.zeros((b, k, 3), np.float32)
        trans = np.zeros((b, k, 3), np.float32)
        hand = np.zeros((b, k, 63), np.float32)
        for i in range(b):
            boxes[i, 0], scores[i, 0], labels[i, 0] = dataset.boxes[0], 0.9, 0
            rot[i, 0] = dataset.rot[0] / np.pi  # evaluator multiplies by pi
            trans[i, 0] = dataset.trans[0]
            hand[i, 0] = (dataset.hand + 0.001).ravel()  # 1 mm/joint-axis off

            boxes[i, 1], scores[i, 1], labels[i, 1] = dataset.boxes[1], 0.8, 1
            rot[i, 1] = dataset.rot[1] / np.pi
            trans[i, 1] = dataset.trans[1] + T_OFFSET
            hand[i, 1] = dataset.hand.ravel()

            boxes[i, 2] = [50.0, 0.0, 60.0, 10.0]  # overlaps no class-0 GT
            scores[i, 2], labels[i, 2] = 0.3, 0
        return Detections(
            boxes=boxes, scores=scores, labels=labels, rotation=rot,
            translation=trans, hand=hand,
            num_valid=np.full((b,), k, np.int32),
        )

    return predict


@pytest.fixture(scope="module")
def result():
    ds = TwoClassDataset()
    cfg = Config(
        model=ModelConfig(phi=0, image_size=S, num_classes=2),
        eval=EvalConfig(score_threshold=0.2, eval_batch_size=1),
    )
    return evaluate_model(ds, _stub_predict(ds), None, None, cfg)


def test_per_class_results_present(result):
    assert set(result.per_class.keys()) == {0, 1}


def test_class0_exact_pose(result):
    r0 = result.per_class[0]
    # 2 TPs out of 2 annotations; the low-score FP sinks AP below 1 only
    # after both TPs are counted -> AP stays 1.0 (all TPs rank first)
    assert r0.mean_ap == pytest.approx(1.0)
    assert r0.translation_error_mean_mm == pytest.approx(0.0, abs=1e-4)
    assert r0.rotation_error_mean_deg == pytest.approx(0.0, abs=1e-3)
    assert r0.add_accuracy == pytest.approx(1.0)
    # asymmetric class: mixed metrics == plain ADD / point distance
    assert r0.mixed_add_and_add_s_accuracy == r0.add_accuracy
    assert r0.mixed_point_distance_mean_mm == pytest.approx(r0.point_distance_mean_mm)
    # hand: 0.001 m/axis off -> sqrt(3) mm per joint
    assert r0.hand_error_mean_mm == pytest.approx(np.sqrt(3.0), rel=1e-3)


def test_class1_known_offset(result):
    r1 = result.per_class[1]
    t_err = float(np.linalg.norm(T_OFFSET))
    assert r1.translation_error_mean_mm == pytest.approx(t_err, rel=1e-5)
    assert r1.rotation_error_mean_deg == pytest.approx(0.0, abs=1e-3)
    assert r1.mean_ap == pytest.approx(1.0)
    # symmetric class: mixed metrics come from the SYMMETRIC variants
    assert r1.mixed_add_and_add_s_accuracy == r1.add_s_accuracy
    assert r1.mixed_point_distance_mean_mm == pytest.approx(r1.sym_point_distance_mean_mm)
    # pure-translation offset: ADD point distance == translation error;
    # sym (closest-point) distance can only be <= the paired distance
    assert r1.point_distance_mean_mm == pytest.approx(t_err, rel=1e-4)
    assert r1.sym_point_distance_mean_mm <= t_err + 1e-5


def test_mean_is_unweighted_class_mean(result):
    for name in ("translation_error_mean_mm", "mean_ap", "add_accuracy",
                 "hand_error_mean_mm", "mixed_point_distance_mean_mm"):
        expected = np.mean([getattr(result.per_class[c], name) for c in (0, 1)])
        assert getattr(result, name) == pytest.approx(expected), name


def test_scalars_excludes_per_class(result):
    s = result.scalars()
    assert "per_class" not in s
    assert all(np.isscalar(v) for v in s.values())


def test_wrong_label_detection_is_not_matched():
    """A detection with the right box but wrong label must be a FP for its
    own class, not a TP for the overlapping class (per-label matching,
    eval/common.py:934-961)."""
    ds = TwoClassDataset()

    def predict(params, state, images, cams):
        b = images.shape[0]
        boxes = np.tile(ds.boxes[0], (b, 1, 1)).astype(np.float32)  # class-0 GT box
        return Detections(
            boxes=boxes,
            scores=np.full((b, 1), 0.9, np.float32),
            labels=np.full((b, 1), 1, np.int32),  # ...claimed as class 1
            rotation=np.zeros((b, 1, 3), np.float32),
            translation=np.zeros((b, 1, 3), np.float32),
            hand=np.zeros((b, 1, 63), np.float32),
            num_valid=np.ones((b,), np.int32),
        )

    cfg = Config(
        model=ModelConfig(phi=0, image_size=S, num_classes=2),
        eval=EvalConfig(score_threshold=0.2, eval_batch_size=1),
    )
    r = evaluate_model(ds, predict, None, None, cfg)
    assert r.per_class[0].mean_ap == 0.0  # class 0: no detections at all
    assert r.per_class[1].mean_ap == 0.0  # class 1: FP only (box elsewhere)
    assert r.per_class[1].translation_error_mean_mm == float("inf")
