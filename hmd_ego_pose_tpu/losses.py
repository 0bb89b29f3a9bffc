"""Training losses: focal, smooth-L1 (boxes/hands), 6-DoF transformation.

Re-derives the loss stack of the reference
(pytorch-sandbox/hmdegopose/loss.py:54-428) as fixed-shape, fully vmapped jnp
— no per-batch Python loop (loss.py:68-91), no boolean gathers.  Masking with
anchor states replaces index selection so every shape is static and the whole
loss fuses into the train-step XLA program.

The transformation loss's Rodrigues point rotation runs only on a fixed-size
top-P slice of positive anchors (P=64 by default) instead of all 12k anchors:
single-object scenes have tens of positives, so the slice is exact in
practice and keeps the rotated-point tensor (P x 500 x 3) tiny.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from hmd_ego_pose_tpu.config import LossConfig
from hmd_ego_pose_tpu.ops.geometry import rotate_points_axis_angle
from hmd_ego_pose_tpu.ops.target_assign import AnchorTargets

_PI = 3.141592653589793


class LossBundle(NamedTuple):
    classification: jax.Array
    regression: jax.Array
    rotation: jax.Array
    translation: jax.Array
    hand: jax.Array
    total: jax.Array


# ---------------------------------------------------------------------------
# Per-image losses (vmapped over batch by `total_loss`)
# ---------------------------------------------------------------------------


def focal_loss(labels, classification, state, alpha: float = 0.25, gamma: float = 1.5):
    """Focal loss over non-ignored anchors (loss.py:101-165).

    Args:
        labels: (N, C) one-hot targets.
        classification: (N, C) sigmoid scores.
        state: (N,) anchor states.
    """
    cls = jnp.clip(classification, 1e-4, 1.0 - 1e-4)
    alpha_factor = jnp.where(labels == 1.0, alpha, 1.0 - alpha)
    focal_weight = jnp.where(labels == 1.0, 1.0 - cls, cls)
    focal_weight = alpha_factor * focal_weight ** gamma
    bce = -(labels * jnp.log(cls) + (1.0 - labels) * jnp.log(1.0 - cls))
    per_anchor = focal_weight * bce

    not_ignored = (state != -1.0)[:, None]
    loss = jnp.sum(per_anchor * not_ignored)
    normalizer = jnp.maximum(jnp.sum(state == 1.0).astype(jnp.float32), 1.0)
    return loss / normalizer


def _smooth_l1(diff, sigma: float):
    """Huber with the reference's sigma parametrization (loss.py:194-209)."""
    sigma_sq = sigma ** 2
    adiff = jnp.abs(diff)
    return jnp.where(
        adiff <= 1.0 / sigma_sq,
        0.5 * sigma_sq * adiff ** 2,
        adiff - 0.5 / sigma_sq,
    )


def smooth_l1_loss(targets, predictions, state, sigma: float = 3.0):
    """Box / hand smooth-L1 over positive anchors, normalized by their count
    (loss.py:168-273)."""
    positive = (state == 1.0)[:, None]
    per_elem = _smooth_l1(predictions - targets, sigma) * positive
    normalizer = jnp.maximum(jnp.sum(state == 1.0).astype(jnp.float32), 1.0)
    return jnp.sum(per_elem) / normalizer


def transformation_loss(
    gt_transformation,
    pred_transformation,
    state,
    model_3d_points,
    max_positive_anchors: int = 64,
):
    """Rotation point-distance + translation smooth-L1 (loss.py:275-428).

    The reference gathers ALL positive anchors dynamically; a jit program
    needs static shapes, so the top-``max_positive_anchors`` positives are
    sliced (all of them score identically, so any cap >= the true count is
    EXACT).  The single-object worst case is 44/46 positives at 256/512 px
    (pinned by tests/test_losses.py::test_positive_anchor_cap_covers_worst_case);
    LossConfig.max_positive_anchors scales it for multi-object datasets.

    Args:
        gt_transformation: (N, 8) [rot/pi (3), trans (3), is_sym, class].
        pred_transformation: (N, 6) [rot/pi (3), trans (3)] — translation
            already decoded to metric units.
        state: (N,) anchor states.
        model_3d_points: (num_classes, P3D, 3) subsampled model points.
    Returns:
        (rotation_loss, translation_loss) scalars.
    """
    model_3d_points = jnp.asarray(model_3d_points)  # accept host numpy constants
    positive = state == 1.0
    num_pos = jnp.sum(positive.astype(jnp.float32))

    # fixed-size slice of positive anchors (exact when num_pos <= cap)
    cap = min(max_positive_anchors, state.shape[0])
    score = jnp.where(positive, 1.0, 0.0)
    _, idx = jax.lax.top_k(score, cap)
    valid = positive[idx]  # (P,)

    rot_pred = pred_transformation[idx, :3] * _PI
    rot_gt = gt_transformation[idx, :3] * _PI
    trans_pred = pred_transformation[idx, 3:6]
    trans_gt = gt_transformation[idx, 3:6]
    is_sym = jnp.round(gt_transformation[idx, 6]) == 1.0
    class_idx = jnp.round(gt_transformation[idx, 7]).astype(jnp.int32)

    points = model_3d_points[class_idx]  # (P, P3D, 3)
    rotated_pred = rotate_points_axis_angle(points, rot_pred)
    rotated_gt = rotate_points_axis_angle(points, rot_gt)

    # asymmetric: mean paired distance; symmetric: mean min distance
    paired = jnp.linalg.norm(rotated_pred - rotated_gt, axis=-1)  # (P, P3D)
    diff = rotated_pred[:, :, None, :] - rotated_gt[:, None, :, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    min_d = jnp.sqrt(jnp.clip(jnp.min(d2, axis=-1), 1e-12))  # (P, P3D)

    per_anchor = jnp.where(is_sym, jnp.mean(min_d, axis=-1), jnp.mean(paired, axis=-1))
    capped_pos = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    rotation_loss = jnp.sum(per_anchor * valid) / capped_pos
    rotation_loss = jnp.where(num_pos > 0, rotation_loss, 0.0)

    # translation: torch.nn.SmoothL1Loss default (beta=1), mean over elements
    trans_elem = _smooth_l1(trans_pred - trans_gt, sigma=1.0) * valid[:, None]
    translation_loss = jnp.sum(trans_elem) / (capped_pos * 3.0)
    translation_loss = jnp.where(num_pos > 0, translation_loss, 0.0)

    return rotation_loss, translation_loss


# ---------------------------------------------------------------------------
# Batched total loss
# ---------------------------------------------------------------------------


def total_loss(
    targets: AnchorTargets,
    classification,
    regression,
    rotation,
    translation,
    hand,
    model_3d_points,
    config: LossConfig = LossConfig(),
) -> LossBundle:
    """Batch loss with the reference's weighting (train.py:63-68, loss.py:94-98).

    All prediction tensors are (B, N, D); ``targets`` fields are (B, N, ...).
    Per-image losses are vmapped then averaged over the batch, matching the
    reference's stack-and-mean.
    """
    transformation_pred = jnp.concatenate([rotation, translation], axis=-1)

    cls = jax.vmap(lambda l, c, s: focal_loss(l, c, s, config.focal_alpha, config.focal_gamma))(
        targets.labels, classification, targets.state
    ).mean()
    reg = jax.vmap(lambda t, p, s: smooth_l1_loss(t, p, s, config.smooth_l1_sigma))(
        targets.regression, regression, targets.state
    ).mean()
    rot, trans = jax.vmap(
        lambda g, p, s: transformation_loss(g, p, s, model_3d_points, config.max_positive_anchors)
    )(targets.transformation, transformation_pred, targets.state)
    rot, trans = rot.mean(), trans.mean()
    hnd = jax.vmap(lambda t, p, s: smooth_l1_loss(t, p, s, config.smooth_l1_sigma))(
        targets.coords_3d, hand, targets.state
    ).mean()

    cls_w = cls * config.classification_weight
    reg_w = reg * config.regression_weight
    rot_w = rot * config.rotation_weight
    trans_w = trans * config.translation_weight
    hand_w = hnd * config.hand_weight
    total = cls_w + reg_w + rot_w + trans_w + hand_w
    return LossBundle(cls_w, reg_w, rot_w, trans_w, hand_w, total)
