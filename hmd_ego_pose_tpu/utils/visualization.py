"""Detection/annotation visualization without OpenCV (PIL drawing).

Equivalent of the reference's visualization helpers
(pytorch-sandbox/generators/utils/visualization.py): 2-D boxes, projected
3-D cuboids (8 corners through the camera), hand-joint overlays, and
side-by-side GT (green/blue) vs prediction (red) renderings.  Used by the
debug viewer CLI and the eval --save-images path.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
from PIL import Image, ImageDraw

from hmd_ego_pose_tpu.ops.geometry import np_axis_angle_to_matrix

GT_COLOR = (0, 255, 0)
PRED_COLOR = (255, 50, 50)
HAND_COLOR = (70, 130, 255)

# 12 edges of a cuboid whose corners are ordered (min/max per axis bitmask)
_CUBOID_EDGES = [
    (0, 1), (0, 2), (1, 3), (2, 3),
    (4, 5), (4, 6), (5, 7), (6, 7),
    (0, 4), (1, 5), (2, 6), (3, 7),
]


def cuboid_corners(model_info: dict) -> np.ndarray:
    """(8, 3) cuboid corners from a models_info entry (colibri.py:121-180)."""
    mn = np.array([model_info["min_x"], model_info["min_y"], model_info["min_z"]])
    sz = np.array([model_info["size_x"], model_info["size_y"], model_info["size_z"]])
    corners = []
    for bits in range(8):
        offset = np.array([(bits >> a) & 1 for a in range(3)]) * sz
        corners.append(mn + offset)
    return np.stack(corners)


def project(points_3d, rotation_vec, translation, camera_matrix) -> np.ndarray:
    r = np_axis_angle_to_matrix(np.asarray(rotation_vec))
    cam = points_3d @ r.T + np.asarray(translation)
    z = np.clip(cam[:, 2], 1e-6, None)
    u = camera_matrix[0, 0] * cam[:, 0] / z + camera_matrix[0, 2]
    v = camera_matrix[1, 1] * cam[:, 1] / z + camera_matrix[1, 2]
    return np.stack([u, v], axis=1)


def draw_box_2d(draw: ImageDraw.ImageDraw, box, color, width: int = 2):
    x1, y1, x2, y2 = [float(v) for v in box]
    draw.rectangle([x1, y1, x2, y2], outline=color, width=width)


def draw_cuboid(draw, corners_2d, color, width: int = 2):
    for a, b in _CUBOID_EDGES:
        draw.line(
            [tuple(corners_2d[a]), tuple(corners_2d[b])], fill=color, width=width
        )


def draw_hand(draw, joints_2d, color=HAND_COLOR, radius: int = 3):
    for u, v in joints_2d:
        draw.ellipse([u - radius, v - radius, u + radius, v + radius], fill=color)


def render_frame(
    image: np.ndarray,
    camera_matrix: np.ndarray,
    model_info: Optional[dict] = None,
    gt_pose: Optional[Tuple[np.ndarray, np.ndarray]] = None,
    pred_pose: Optional[Tuple[np.ndarray, np.ndarray]] = None,
    gt_box: Optional[Sequence[float]] = None,
    pred_box: Optional[Sequence[float]] = None,
    hand_3d: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Compose a debug overlay; returns an RGB uint8 image."""
    img = Image.fromarray(image.astype(np.uint8))
    draw = ImageDraw.Draw(img)

    if gt_box is not None:
        draw_box_2d(draw, gt_box, GT_COLOR)
    if pred_box is not None:
        draw_box_2d(draw, pred_box, PRED_COLOR)

    if model_info is not None:
        corners = cuboid_corners(model_info)
        if gt_pose is not None:
            draw_cuboid(draw, project(corners, *gt_pose, camera_matrix), GT_COLOR)
        if pred_pose is not None:
            draw_cuboid(draw, project(corners, *pred_pose, camera_matrix), PRED_COLOR)

    if hand_3d is not None:
        joints = np.asarray(hand_3d).reshape(21, 3)
        z = np.clip(joints[:, 2], 1e-6, None)
        u = camera_matrix[0, 0] * joints[:, 0] / z + camera_matrix[0, 2]
        v = camera_matrix[1, 1] * joints[:, 1] / z + camera_matrix[1, 2]
        draw_hand(draw, np.stack([u, v], axis=1))

    return np.asarray(img)
