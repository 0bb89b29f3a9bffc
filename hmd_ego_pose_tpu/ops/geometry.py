"""Rotation / projection geometry in pure jnp and numpy.

Replaces the reference's three scattered implementations: cv2.Rodrigues on
the host (generators/colibri_common.py:791-815), a torch port of
tensorflow-graphics axis-angle rotate in the loss
(pytorch-sandbox/hmdegopose/loss.py:437-609), and cv2.projectPoints in the
metrics (eval/common.py:646-679).  The jnp variants are traceable/vmappable
so the loss and metric inner products run on the TPU.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_EPS = 1e-12


def separate_axis_from_angle(axis_angle):
    """Split compact axis-angle (..., 3) into unit axis (..., 3) and angle (..., 1).

    Mirrors loss.py:437-457 including its divide-by-zero behaviour: a zero
    vector yields angle 0 and axis 0 (because 0/0 is replaced by 0).
    """
    angle = jnp.sqrt(jnp.sum(axis_angle * axis_angle, axis=-1, keepdims=True))
    axis = jnp.where(angle > _EPS, axis_angle / jnp.where(angle > _EPS, angle, 1.0), 0.0)
    return axis, angle


def rotate_points(points, axis, angle):
    """Rodrigues rotation of points by (unit axis, angle), broadcastable.

    v' = v cos(t) + (a x v) sin(t) + a (a . v)(1 - cos(t))
    Mirrors loss.py:571-609.

    Args:
        points: (..., P, 3)
        axis: (..., 1, 3) or broadcast-compatible
        angle: (..., 1, 1) or broadcast-compatible
    """
    cos_t = jnp.cos(angle)
    sin_t = jnp.sin(angle)
    a_dot_v = jnp.sum(axis * points, axis=-1, keepdims=True)
    a_cross_v = jnp.cross(axis, points)
    return points * cos_t + a_cross_v * sin_t + axis * a_dot_v * (1.0 - cos_t)


def rotate_points_axis_angle(points, axis_angle):
    """Rotate (..., P, 3) points by compact (..., 3) axis-angle vectors."""
    axis, angle = separate_axis_from_angle(axis_angle)
    return rotate_points(points, axis[..., None, :], angle[..., None, :])


def axis_angle_to_matrix(axis_angle):
    """Compact axis-angle (..., 3) -> rotation matrix (..., 3, 3); jnp.

    Closed-form Rodrigues: R = cos(t) I + sin(t) [a]_x + (1 - cos(t)) a a^T.
    Written elementwise (no matmul) so the TPU computes it on the VPU in full
    float32 rather than routing a 3x3 matmul through the bf16 MXU.
    """
    axis_angle = jnp.asarray(axis_angle)
    angle = jnp.sqrt(jnp.sum(axis_angle * axis_angle, axis=-1, keepdims=True))
    safe = jnp.where(angle > _EPS, angle, 1.0)
    a = jnp.where(angle > _EPS, axis_angle / safe, 0.0)
    x, y, z = a[..., 0], a[..., 1], a[..., 2]
    t = angle[..., 0]
    c, s = jnp.cos(t), jnp.sin(t)
    omc = 1.0 - c
    row0 = jnp.stack([c + x * x * omc, x * y * omc - z * s, x * z * omc + y * s], axis=-1)
    row1 = jnp.stack([y * x * omc + z * s, c + y * y * omc, y * z * omc - x * s], axis=-1)
    row2 = jnp.stack([z * x * omc - y * s, z * y * omc + x * s, c + z * z * omc], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def matrix_to_axis_angle(matrix):
    """Rotation matrix (..., 3, 3) -> compact axis-angle (..., 3); numpy.

    Host-side converter for dataset annotations (replaces cv2.Rodrigues in
    colibri_common.py:791-801).  Uses scipy's robust implementation, which
    handles the angle ~ 0 and angle ~ pi branch cuts correctly.
    """
    from scipy.spatial.transform import Rotation

    m = np.asarray(matrix, dtype=np.float64)
    flat = m.reshape(-1, 3, 3)
    out = Rotation.from_matrix(flat).as_rotvec()
    return out.reshape(m.shape[:-2] + (3,))


def np_axis_angle_to_matrix(axis_angle):
    """Numpy twin of axis_angle_to_matrix for host-side dataset code."""
    v = np.asarray(axis_angle, dtype=np.float64)
    angle = np.linalg.norm(v, axis=-1, keepdims=True)
    safe = np.where(angle > _EPS, angle, 1.0)
    a = np.where(angle > _EPS, v / safe, 0.0)
    x, y, z = a[..., 0], a[..., 1], a[..., 2]
    zero = np.zeros_like(x)
    k = np.stack(
        [
            np.stack([zero, -z, y], axis=-1),
            np.stack([z, zero, -x], axis=-1),
            np.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )
    eye = np.eye(3)
    t = angle[..., None]
    return eye + np.sin(t) * k + (1.0 - np.cos(t)) * (k @ k)


def project_points(points_3d, rotation_matrix, translation, camera_matrix):
    """Project 3-D points through R, t, K onto the image plane.

    Replaces cv2.projectPoints with zero distortion
    (colibri_common.py:779-789, eval/common.py:646-679).  jnp and numpy both
    work since only matmul/divide are used.

    Args:
        points_3d: (..., P, 3)
        rotation_matrix: (..., 3, 3)
        translation: (..., 3)
        camera_matrix: (3, 3)
    Returns:
        (..., P, 2) pixel coordinates.
    """
    cam = points_3d @ jnp.swapaxes(rotation_matrix, -1, -2) + translation[..., None, :]
    fx, fy = camera_matrix[0, 0], camera_matrix[1, 1]
    px, py = camera_matrix[0, 2], camera_matrix[1, 2]
    z = cam[..., 2]
    u = fx * cam[..., 0] / z + px
    v = fy * cam[..., 1] / z + py
    return jnp.stack([u, v], axis=-1)


def rotation_angular_distance(r1, r2):
    """Geodesic angle in degrees between two rotation matrices.

    Mirrors calc_rotation_diff (eval/common.py:761-779).
    """
    diff = r1 @ jnp.swapaxes(r2, -1, -2)
    trace = jnp.clip((jnp.trace(diff, axis1=-2, axis2=-1) - 1.0) / 2.0, -1.0, 1.0)
    return jnp.abs(jnp.degrees(jnp.arccos(trace)))
