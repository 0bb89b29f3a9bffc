"""Vectorized IoU matrix.

Replaces the reference's O(N*K) Cython loop kernel
(pytorch-sandbox/generators/utils/compute_overlap.pyx:33-73) with a single
broadcasted jnp expression that XLA tiles onto the VPU.  Used by training
anchor-target assignment (12k+ anchors x K ground-truth boxes per image) and
by the eval detection-matching loop.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def iou_matrix(boxes_a, boxes_b):
    """Pairwise IoU between two box sets.

    Args:
        boxes_a: (N, 4) of (x1, y1, x2, y2).
        boxes_b: (K, 4).
    Returns:
        (N, K) IoU matrix.  Matches the Cython kernel's semantics: box area is
        computed as (x2 - x1) * (y2 - y1), intersection width/height as
        ``min(x2) - max(x1)`` clamped at 0.
    """
    a = boxes_a[:, None, :]  # (N, 1, 4)
    b = boxes_b[None, :, :]  # (1, K, 4)

    iw = jnp.clip(jnp.minimum(a[..., 2], b[..., 2]) - jnp.maximum(a[..., 0], b[..., 0]), 0.0)
    ih = jnp.clip(jnp.minimum(a[..., 3], b[..., 3]) - jnp.maximum(a[..., 1], b[..., 1]), 0.0)
    inter = iw * ih

    area_a = (a[..., 2] - a[..., 0]) * (a[..., 3] - a[..., 1])
    area_b = (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])
    union = area_a + area_b - inter
    return jnp.where(union > 0, inter / union, 0.0)


def iou_matrix_np(boxes_a: np.ndarray, boxes_b: np.ndarray) -> np.ndarray:
    """Numpy twin for host-side code paths (dataset workers, eval matching)."""
    a = boxes_a[:, None, :].astype(np.float64)
    b = boxes_b[None, :, :].astype(np.float64)
    iw = np.clip(np.minimum(a[..., 2], b[..., 2]) - np.maximum(a[..., 0], b[..., 0]), 0.0, None)
    ih = np.clip(np.minimum(a[..., 3], b[..., 3]) - np.maximum(a[..., 1], b[..., 1]), 0.0, None)
    inter = iw * ih
    area_a = (a[..., 2] - a[..., 0]) * (a[..., 3] - a[..., 1])
    area_b = (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])
    union = area_a + area_b - inter
    with np.errstate(divide="ignore", invalid="ignore"):
        out = np.where(union > 0, inter / union, 0.0)
    return out
