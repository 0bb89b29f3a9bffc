"""6-DoF pose metrics: ADD, ADD-S, 5cm-5deg (+drill tip), 2-D reprojection, AP.

Re-derives the metric checkers of the reference
(pytorch-sandbox/eval/common.py:646-863) in numpy with identical thresholds
and subsampling rules:

* ADD: mean paired distance of transformed model points <= 0.1 x diameter;
* ADD-S: mean *minimum* distance with the reference's point subsample
  ``step = num_points // 1000 + 1`` (eval/common.py:736-738);
* 5cm-5deg: translation distance <= 50 (mm) and geodesic rotation <= 5 deg,
  plus the drill-tip translation distance through the per-frame homogeneous
  tip offset (eval/common.py:782-843);
* 2-D reprojection: mean projected pixel distance <= 5 px;
* AP via the py-faster-rcnn precision-envelope integral.
"""

from __future__ import annotations

import functools as _functools
from typing import Tuple

import numpy as np


def transform_points(points: np.ndarray, rotation: np.ndarray, translation: np.ndarray):
    """(P, 3) points through R, t."""
    return points @ rotation.T + translation


def translation_diff(t_gt: np.ndarray, t_pred: np.ndarray) -> float:
    return float(np.linalg.norm(np.asarray(t_gt) - np.asarray(t_pred)))


def rotation_diff_degrees(r_gt: np.ndarray, r_pred: np.ndarray) -> float:
    """Geodesic angle between rotation matrices in degrees (common.py:761-779)."""
    trace = np.clip((np.trace(r_pred @ r_gt.T) - 1.0) / 2.0, -1.0, 1.0)
    return float(abs(np.degrees(np.arccos(trace))))


def check_add(
    model_points, diameter, r_gt, t_gt, r_pred, t_pred, diameter_threshold=0.1
) -> Tuple[bool, float]:
    """ADD metric; returns (is_correct, mean_distance)."""
    pts_gt = transform_points(model_points, r_gt, t_gt)
    pts_pred = transform_points(model_points, r_pred, t_pred)
    mean_d = float(np.mean(np.linalg.norm(pts_gt - pts_pred, axis=-1)))
    return mean_d <= diameter * diameter_threshold, mean_d


def check_add_s(
    model_points, diameter, r_gt, t_gt, r_pred, t_pred,
    diameter_threshold=0.1, max_points=1000,
) -> Tuple[bool, float]:
    """ADD-S metric with the reference's stride subsample."""
    pts_gt = transform_points(model_points, r_gt, t_gt)
    pts_pred = transform_points(model_points, r_pred, t_pred)
    step = pts_gt.shape[0] // max_points + 1
    a = pts_gt[::step]
    b = pts_pred[::step]
    d2 = np.sum((a[:, None, :] - b[None, :, :]) ** 2, axis=-1)
    mean_d = float(np.mean(np.sqrt(d2.min(axis=1))))
    return mean_d <= diameter * diameter_threshold, mean_d


@_functools.lru_cache(maxsize=None)
def _add_s_device_fn(num_points: int, bucket: int):
    """Jitted batched ADD-S core: transform both point sets for every pose
    pair and min-reduce via the Pallas kernel (ops/pallas_kernels.py) — ONE
    device program for all true positives of an eval epoch."""
    import jax
    import jax.numpy as jnp

    from hmd_ego_pose_tpu.ops.pallas_kernels import min_distances

    @jax.jit
    def fn(sub, rg, tg, rp, tp_):
        # HIGHEST: the TPU matmul default is bf16-input f32-accumulate,
        # which costs ~0.4 mm on metric point transforms
        hi = jax.lax.Precision.HIGHEST
        g = jnp.einsum("pj,tij->tpi", sub, rg, precision=hi) + tg[:, None, :]
        p = jnp.einsum("pj,tij->tpi", sub, rp, precision=hi) + tp_[:, None, :]
        d = jax.vmap(min_distances)(g, p)  # (T, P)
        return jnp.mean(d, axis=1)

    return fn


def add_s_batch(
    model_points, diameter, poses, diameter_threshold=0.1, max_points=1000
):
    """ADD-S for a whole batch of (r_gt, t_gt, r_pred, t_pred) pose pairs.

    Semantics identical to looping ``check_add_s`` (same stride subsample);
    on a TPU backend all pairs run as one device program (poses padded to a
    64-bucket to bound recompiles), elsewhere it falls back to the numpy
    loop.  Returns (ok_flags, mean_distances) as python lists.
    """
    if not poses:
        return [], []

    import jax

    if jax.default_backend() != "tpu":
        flags, means = [], []
        for r_gt, t_gt, r_pred, t_pred in poses:
            ok, mean_d = check_add_s(
                model_points, diameter, r_gt, t_gt, r_pred, t_pred,
                diameter_threshold, max_points,
            )
            flags.append(ok)
            means.append(mean_d)
        return flags, means

    step = model_points.shape[0] // max_points + 1
    sub = np.ascontiguousarray(model_points[::step], np.float32)
    t = len(poses)
    bucket = ((t + 63) // 64) * 64
    rg = np.tile(np.eye(3, dtype=np.float32), (bucket, 1, 1))
    rp = rg.copy()
    tg = np.zeros((bucket, 3), np.float32)
    tp_ = np.zeros((bucket, 3), np.float32)
    for i, (r_gt, t_gt, r_pred, t_pred) in enumerate(poses):
        rg[i], tg[i] = r_gt, np.reshape(t_gt, (3,))
        rp[i], tp_[i] = r_pred, np.reshape(t_pred, (3,))

    fn = _add_s_device_fn(sub.shape[0], bucket)
    means = np.asarray(fn(sub, rg, tg, rp, tp_))[:t]
    thr = diameter * diameter_threshold
    return [bool(m <= thr) for m in means], [float(m) for m in means]


def check_5cm_5degree(
    r_gt, t_gt, r_pred, t_pred, drill_tip_h,
    translation_threshold=50.0, rotation_threshold=5.0,
) -> Tuple[bool, float, float, float]:
    """5cm-5deg + drill-tip distance.

    Args:
        drill_tip_h: (1, 4) or (4,) homogeneous tip offset in model frame.
    Returns:
        (is_correct, translation_distance, rotation_distance_deg, tip_distance)
    """
    t_dist = translation_diff(t_gt, t_pred)
    r_dist = rotation_diff_degrees(r_gt, r_pred)

    tip = np.reshape(np.asarray(drill_tip_h, np.float64), (4,))
    pose_gt = np.concatenate([r_gt, np.reshape(t_gt, (3, 1))], axis=1)
    pose_pred = np.concatenate([r_pred, np.reshape(t_pred, (3, 1))], axis=1)
    tip_dist = float(np.linalg.norm(pose_gt @ tip - pose_pred @ tip))

    ok = t_dist <= translation_threshold and r_dist <= rotation_threshold
    return ok, t_dist, r_dist, tip_dist


def check_2d_reprojection(
    model_points, r_gt, t_gt, r_pred, t_pred, camera_matrix, pixel_threshold=5.0
) -> bool:
    """Mean projected pixel distance <= threshold (common.py:646-679)."""
    pts_gt = transform_points(model_points, r_gt, t_gt)
    pts_pred = transform_points(model_points, r_pred, t_pred)

    def project(p):
        z = p[:, 2]
        u = camera_matrix[0, 0] * p[:, 0] / z + camera_matrix[0, 2]
        v = camera_matrix[1, 1] * p[:, 1] / z + camera_matrix[1, 2]
        return np.stack([u, v], axis=1)

    d = np.linalg.norm(project(pts_gt) - project(pts_pred), axis=-1)
    return float(np.mean(d)) <= pixel_threshold


def hand_mpjpe_mm(gt_joints: np.ndarray, pred_joints: np.ndarray) -> float:
    """Mean per-joint position error, converted to mm as the reference does
    (eval/common.py:975-981 multiplies by 1000)."""
    d = np.linalg.norm(np.reshape(gt_joints, (21, 3)) - np.reshape(pred_joints, (21, 3)), axis=-1)
    return float(np.mean(d) * 1000.0)


def compute_average_precision(recall: np.ndarray, precision: np.ndarray) -> float:
    """py-faster-rcnn AP (precision envelope integral, common.py:328-354)."""
    mrec = np.concatenate(([0.0], recall, [1.0]))
    mpre = np.concatenate(([0.0], precision, [0.0]))
    for i in range(mpre.size - 1, 0, -1):
        mpre[i - 1] = max(mpre[i - 1], mpre[i])
    idx = np.where(mrec[1:] != mrec[:-1])[0]
    return float(np.sum((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1]))
