"""On-device anchor target assignment.

Replaces the reference's host-side per-image numpy/Cython assignment
(pytorch-sandbox/generators/utils/anchors.py:69-215, compute_overlap.pyx)
with a fixed-shape jnp program that runs **inside the jitted train step**:
the host ships raw ground truth (padded boxes/labels/poses) and the TPU does
the 12k-anchor IoU matching itself.  This removes the Cython IoU from the
data-loader hot loop (SURVEY.md call stack 3.1) and makes target assignment
differentiable-adjacent (stop-gradded constants in the loss).

Semantics preserved:
* positive: IoU >= positive_overlap, plus each GT's argmax anchor is forced
  positive (anchors.py:204-210);
* ignore: IoU > negative_overlap but not positive (anchors.py:213);
* anchors whose centre is outside the image are ignored (anchors.py:163-171);
* regression targets are computed against the per-anchor argmax GT for *all*
  anchors (loss masking selects positives later) (anchors.py:152).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from hmd_ego_pose_tpu.ops.anchors import bbox_transform
# Pallas TPU kernel on TPU backends (6x over the fused jnp broadcast at the
# vmapped train-batch shape, scripts/bench_pallas.py), jnp reference on CPU.
from hmd_ego_pose_tpu.ops.pallas_kernels import iou_matrix


class AnchorTargets(NamedTuple):
    """Per-anchor training targets.  ``state``: -1 ignore, 0 negative, 1 positive."""

    labels: jax.Array  # (N, num_classes) one-hot for positives
    regression: jax.Array  # (N, 4) (ty, tx, th, tw)
    transformation: jax.Array  # (N, 8) rot(3)/pi, trans(3), is_sym, class
    coords_3d: jax.Array  # (N, 63) hand joints
    state: jax.Array  # (N,) float32


def assign_targets(
    anchors,
    gt_boxes,
    gt_labels,
    gt_transformation,
    gt_coords_3d,
    gt_valid,
    num_classes: int,
    image_size: int,
    positive_overlap: float = 0.5,
    negative_overlap: float = 0.4,
) -> AnchorTargets:
    """Single-image target assignment over padded ground truth.

    Args:
        anchors: (N, 4).
        gt_boxes: (K, 4) padded with zeros.
        gt_labels: (K,) int32, padded arbitrarily.
        gt_transformation: (K, 8).
        gt_coords_3d: (K, 63).
        gt_valid: (K,) bool — False rows are padding.
        num_classes, image_size: statics.
    """
    n = anchors.shape[0]

    overlaps = iou_matrix(anchors, gt_boxes)  # (N, K)
    # padding GT must never win an argmax
    overlaps = jnp.where(gt_valid[None, :], overlaps, -1.0)

    argmax_gt = jnp.argmax(overlaps, axis=1)  # (N,)
    max_overlap = jnp.max(overlaps, axis=1)

    any_valid = jnp.any(gt_valid)
    positive = max_overlap >= positive_overlap

    # each valid GT's best anchor is forced positive
    best_anchor_per_gt = jnp.argmax(overlaps, axis=0)  # (K,)
    force = jnp.zeros((n,), bool).at[best_anchor_per_gt].set(gt_valid, mode="drop")
    positive = positive | force

    ignore = (max_overlap > negative_overlap) & ~positive

    # anchors with centre outside the image are ignored
    cx = (anchors[:, 0] + anchors[:, 2]) / 2
    cy = (anchors[:, 1] + anchors[:, 3]) / 2
    outside = (cx >= image_size) | (cy >= image_size)

    state = jnp.where(positive, 1.0, 0.0)
    state = jnp.where(ignore, -1.0, state)
    state = jnp.where(outside, -1.0, state)
    # no ground truth at all -> all negative except out-of-image ignores
    state = jnp.where(any_valid, state, jnp.where(outside, -1.0, 0.0))

    assigned = lambda arr: arr[argmax_gt]
    labels_onehot = jax.nn.one_hot(gt_labels[argmax_gt], num_classes) * (
        state == 1.0
    )[:, None].astype(jnp.float32)

    regression = bbox_transform(anchors, assigned(gt_boxes))
    transformation = assigned(gt_transformation)
    coords_3d = assigned(gt_coords_3d)

    return AnchorTargets(
        labels=labels_onehot.astype(jnp.float32),
        regression=regression.astype(jnp.float32),
        transformation=transformation.astype(jnp.float32),
        coords_3d=coords_3d.astype(jnp.float32),
        state=state.astype(jnp.float32),
    )


def assign_targets_batch(
    anchors,
    gt_boxes,
    gt_labels,
    gt_transformation,
    gt_coords_3d,
    gt_valid,
    num_classes: int,
    image_size: int,
    positive_overlap: float = 0.5,
    negative_overlap: float = 0.4,
) -> AnchorTargets:
    """vmapped batch variant; all gt_* carry a leading batch dim."""
    fn = lambda b, l, t, c, v: assign_targets(
        anchors, b, l, t, c, v,
        num_classes=num_classes,
        image_size=image_size,
        positive_overlap=positive_overlap,
        negative_overlap=negative_overlap,
    )
    return jax.vmap(fn)(gt_boxes, gt_labels, gt_transformation, gt_coords_3d, gt_valid)
