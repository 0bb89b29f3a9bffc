"""Anchor-pyramid generation and box/translation target transforms.

Reimplements the semantics of the reference anchor machinery
(pytorch-sandbox/generators/utils/anchors.py:273-488) with two key design
changes for TPU:

* Anchors are generated **once** per (image_size, AnchorConfig) and baked into
  the jitted graph as constants.  The reference regenerates the full numpy
  anchor set on every forward pass (pytorch-sandbox/hmdegopose/loss.py:25-28).
* All target/decode transforms also exist as pure jnp functions so they can be
  fused into the on-device program.

Numerics are verified bit-close against the reference's committed golden files
(onnx-models/anchors_256.txt, translation_anchors_256.txt) in
tests/test_anchors.py.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax.numpy as jnp

from hmd_ego_pose_tpu.config import AnchorConfig


def _level_anchors(base_size: float, ratios: np.ndarray, scales: np.ndarray) -> np.ndarray:
    """(num_ratios*num_scales, 4) anchor windows centred on the origin.

    Ordering matters for golden parity: anchor i uses scale ``scales[i // R]``
    and ratio ``ratios[i % R]`` (reference: anchors.py:385-419).
    """
    # Per-anchor (scale, ratio) selection via index gather.  The float op
    # ORDER below deliberately mirrors the reference pipeline (square side in
    # f32, area/sqrt/aspect in f64, halve-and-subtract recentring) because the
    # committed golden files pin the bit pattern; the construction itself is
    # an independent formulation.
    idx = np.arange(len(ratios) * len(scales))
    scale_per = scales[idx // len(ratios)]  # anchor i -> scales[i // R]
    ratio_per = ratios[idx % len(ratios)].astype(np.float64)  # -> ratios[i % R]

    side = np.asarray(base_size * scale_per, dtype=np.float64)  # f32 multiply
    area = side * side
    w = np.sqrt(area / ratio_per)
    h = w * ratio_per
    half_w = w * 0.5
    half_h = h * 0.5
    return np.stack([-half_w, -half_h, w - half_w, h - half_h], axis=1)


def feature_shapes(image_shape: Tuple[int, int], levels: Tuple[int, ...]) -> list:
    """Pyramid feature-map shapes: ceil-division by 2^level (anchors.py:257-270)."""
    hw = np.array(image_shape[:2])
    return [(hw + 2 ** lv - 1) // (2 ** lv) for lv in levels]


@functools.lru_cache(maxsize=None)
def anchors_for_shape(
    image_shape: Tuple[int, int],
    config: AnchorConfig = AnchorConfig(),
) -> Tuple[np.ndarray, np.ndarray]:
    """Full anchor set for an image shape.

    Returns:
        anchors: float32 (N, 4) boxes (x1, y1, x2, y2).
        translation_anchors: float32 (N, 3) of (x, y, stride).

    Matches reference anchors_for_shape (anchors.py:273-318); grid centres sit
    at ``(i + 0.5) * stride``.  Cached because it is pure in its inputs.
    """
    shapes = feature_shapes(image_shape, config.pyramid_levels)
    ratios = np.asarray(config.ratios, dtype=np.float32)
    scales = np.asarray(config.scales, dtype=np.float32)

    all_boxes, all_trans = [], []
    for idx, _level in enumerate(config.pyramid_levels):
        base = _level_anchors(config.sizes[idx], ratios, scales)  # (A, 4)
        stride = config.strides[idx]
        fh, fw = shapes[idx]
        shift_x = (np.arange(0, fw) + 0.5) * stride
        shift_y = (np.arange(0, fh) + 0.5) * stride
        sx, sy = np.meshgrid(shift_x, shift_y)
        shifts = np.stack([sx.ravel(), sy.ravel()], axis=1)  # (K, 2)

        boxes = (base[None, :, :] + np.concatenate([shifts, shifts], axis=1)[:, None, :])
        all_boxes.append(boxes.reshape(-1, 4))

        trans = np.concatenate(
            [
                np.repeat(shifts, base.shape[0], axis=0),
                np.full((shifts.shape[0] * base.shape[0], 1), stride, dtype=np.float64),
            ],
            axis=1,
        )
        all_trans.append(trans)

    anchors = np.concatenate(all_boxes, axis=0).astype(np.float32)
    translation_anchors = np.concatenate(all_trans, axis=0).astype(np.float32)
    anchors.setflags(write=False)
    translation_anchors.setflags(write=False)
    return anchors, translation_anchors


# ---------------------------------------------------------------------------
# Encoding transforms (training targets)
# ---------------------------------------------------------------------------


def bbox_transform(anchors, gt_boxes, eps: float = 1e-7):
    """Box regression targets in (ty, tx, th, tw) order (anchors.py:422-458).

    jnp-traceable; works on (..., 4) arrays.
    """
    wa = anchors[..., 2] - anchors[..., 0]
    ha = anchors[..., 3] - anchors[..., 1]
    cxa = anchors[..., 0] + wa / 2.0
    cya = anchors[..., 1] + ha / 2.0

    w = gt_boxes[..., 2] - gt_boxes[..., 0]
    h = gt_boxes[..., 3] - gt_boxes[..., 1]
    cx = gt_boxes[..., 0] + w / 2.0
    cy = gt_boxes[..., 1] + h / 2.0

    ha = ha + eps
    wa = wa + eps
    h = h + eps
    w = w + eps

    ty = (cy - cya) / ha
    tx = (cx - cxa) / wa
    th = jnp.log(h / ha) if not isinstance(h, np.ndarray) else np.log(h / ha)
    tw = jnp.log(w / wa) if not isinstance(w, np.ndarray) else np.log(w / wa)
    stack = np.stack if isinstance(h, np.ndarray) else jnp.stack
    return stack([ty, tx, th, tw], axis=-1)


def translation_transform(translation_anchors, gt_translations):
    """Translation regression targets (dx, dy, Tz) (anchors.py:461-488)."""
    strides = translation_anchors[..., -1]
    dx = (gt_translations[..., 0] - translation_anchors[..., 0]) / strides
    dy = (gt_translations[..., 1] - translation_anchors[..., 1]) / strides
    tz = gt_translations[..., 2]
    stack = np.stack if isinstance(dx, np.ndarray) else jnp.stack
    return stack([dx, dy, tz], axis=-1)
