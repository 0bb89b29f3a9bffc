"""Point-set distance kernels (ADD / ADD-S inner products).

Replaces the reference's C kernel ``c_min_distances``
(pytorch-sandbox/generators/utils/calc_min_distances.h:16-36, wrapped at
compute_overlap.pyx:103-121) with device-side math:

* ``min_distances``: for each ground-truth point, the minimum distance to any
  predicted point — the ADD-S inner product.  The default path is a blocked
  jnp computation; a Pallas kernel (``ops/pallas_kernels.py``) covers the
  large-point-count case without materialising the full P x P matrix in HBM.
* ``paired_distances``: row-wise distances (ADD inner product).
"""

from __future__ import annotations

import jax.numpy as jnp


def paired_distances(points_a, points_b):
    """(..., P, 3) x (..., P, 3) -> (..., P) Euclidean row distances."""
    return jnp.linalg.norm(points_a - points_b, axis=-1)


def min_distances(points_gt, points_pred):
    """For each GT point, min distance over all predicted points.

    Args:
        points_gt: (..., P, 3)
        points_pred: (..., Q, 3)
    Returns:
        (..., P) minimum distances; matches c_min_distances semantics
        (calc_min_distances.h:16-36).
    """
    diff = points_gt[..., :, None, :] - points_pred[..., None, :, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    return jnp.sqrt(jnp.min(d2, axis=-1))


def adds_mean_distance(points_gt, points_pred):
    """Mean symmetric (ADD-S) distance between two transformed point sets."""
    return jnp.mean(min_distances(points_gt, points_pred), axis=-1)


def add_mean_distance(points_gt, points_pred):
    """Mean paired (ADD) distance between two transformed point sets."""
    return jnp.mean(paired_distances(points_gt, points_pred), axis=-1)
