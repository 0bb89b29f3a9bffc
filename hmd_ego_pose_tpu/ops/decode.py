"""On-device anchor decoding: boxes, translation, and pinhole back-projection.

Pure-jnp equivalents of the reference decode layers
(pytorch-sandbox/hmdegopose/layers.py:21-257).  Everything here is shape-stable
and fuses into the single jitted inference program — the reference runs these
as separate eager torch modules and then leaves the device for NMS.
"""

from __future__ import annotations

import jax.numpy as jnp


def bbox_transform_inv(anchors, deltas):
    """Decode (ty, tx, th, tw) deltas into (x1, y1, x2, y2) boxes.

    Mirrors layers.py:169-200.  ``anchors``: (..., 4), ``deltas``: (..., 4).
    """
    cxa = (anchors[..., 0] + anchors[..., 2]) / 2
    cya = (anchors[..., 1] + anchors[..., 3]) / 2
    wa = anchors[..., 2] - anchors[..., 0]
    ha = anchors[..., 3] - anchors[..., 1]
    ty, tx, th, tw = deltas[..., 0], deltas[..., 1], deltas[..., 2], deltas[..., 3]
    w = jnp.exp(tw) * wa
    h = jnp.exp(th) * ha
    cy = ty * ha + cya
    cx = tx * wa + cxa
    return jnp.stack(
        [cx - w / 2.0, cy - h / 2.0, cx + w / 2.0, cy + h / 2.0], axis=-1
    )


def clip_boxes(boxes, height: int, width: int):
    """Clip boxes into the image (layers.py:117-139)."""
    x1 = jnp.clip(boxes[..., 0], 0, width - 1)
    y1 = jnp.clip(boxes[..., 1], 0, height - 1)
    x2 = jnp.clip(boxes[..., 2], 0, width - 1)
    y2 = jnp.clip(boxes[..., 3], 0, height - 1)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def translation_transform_inv(translation_anchors, deltas):
    """Apply predicted (dx, dy) offsets scaled by stride; Tz passthrough.

    Mirrors layers.py:142-166.  ``translation_anchors``: (..., 3) of
    (x, y, stride); ``deltas``: (..., 3) of (dx, dy, Tz).
    """
    stride = translation_anchors[..., -1]
    x = translation_anchors[..., 0] + deltas[..., 0] * stride
    y = translation_anchors[..., 1] + deltas[..., 1] * stride
    return jnp.stack([x, y, deltas[..., 2]], axis=-1)


def calculate_txty(xy_tz, camera_parameters):
    """Pinhole back-projection of 2-D centres to metric (Tx, Ty, Tz).

    Mirrors CalculateTxTy (layers.py:203-257):
        Tx = (x / image_scale - px) * Tz / fx
        Ty = (y / image_scale - py) * Tz / fy
        Tz = tz_raw * tz_scale

    Args:
        xy_tz: (B, N, 3) of (x_2d, y_2d, Tz_raw) in network input pixels.
        camera_parameters: (B, 6) of [fx, fy, px, py, tz_scale, image_scale]
            (generators/colibri_common.py:658-679).
    Returns:
        (B, N, 3) translation vectors in dataset units (mm when tz_scale=1000).
    """
    fx = camera_parameters[:, 0:1]
    fy = camera_parameters[:, 1:2]
    px = camera_parameters[:, 2:3]
    py = camera_parameters[:, 3:4]
    tz_scale = camera_parameters[:, 4:5]
    image_scale = camera_parameters[:, 5:6]

    x = xy_tz[..., 0] / image_scale - px
    y = xy_tz[..., 1] / image_scale - py
    tz = xy_tz[..., 2] * tz_scale
    tx = x * tz / fx
    ty = y * tz / fy
    return jnp.stack([tx, ty, tz], axis=-1)


def decode_translation(translation_anchors, translation_raw, camera_parameters):
    """Fused translation decode: offsets -> 2-D centre -> metric translation.

    Equivalent of the reference's format_translation
    (pytorch-sandbox/hmdegopose/loss.py:30-51) in one traced expression.
    """
    xy_tz = translation_transform_inv(translation_anchors, translation_raw)
    return calculate_txty(xy_tz, camera_parameters)


def hand_to_relative(coords_3d, translation_mm):
    """Drill-anchored hand targets (ModelConfig.hand_relative, beyond
    reference parity): subtract the object translation (metric mm -> m)
    from each of the 21 joints' meter coordinates.

    ``coords_3d``: (..., 63) flattened 21x3 joints in meters (the
    reference's hand unit, eval/common.py:975-981).
    ``translation_mm``: (..., 3) object translation in millimeters (the
    reference's pose unit, loss.py:30-51).
    """
    reps = (1,) * (coords_3d.ndim - 1) + (21,)
    return coords_3d - jnp.tile(translation_mm / 1000.0, reps)


def hand_to_absolute(coords_3d_rel, translation_mm):
    """Exact inverse of :func:`hand_to_relative` (same translation)."""
    reps = (1,) * (coords_3d_rel.ndim - 1) + (21,)
    return coords_3d_rel + jnp.tile(translation_mm / 1000.0, reps)
