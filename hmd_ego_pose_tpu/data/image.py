"""Host-side image ops in pure numpy/PIL (no OpenCV dependency).

The reference leans on cv2 for imread/resize/warpAffine/Rodrigues in its
data path (pytorch-sandbox/generators/colibri_common.py).  This module
provides numpy equivalents with matching conventions:

* ``get_rotation_matrix_2d`` replicates cv2.getRotationMatrix2D (angle in
  degrees, counter-clockwise positive, rotation about an arbitrary centre).
* ``warp_affine`` replicates cv2.warpAffine's *inverse* sampling with
  bilinear or nearest interpolation and zero border.
* ``resize_bilinear`` matches cv2.resize's default INTER_LINEAR sampling
  (half-pixel-centre convention).
"""

from __future__ import annotations

import math
from typing import Tuple

import numpy as np
from PIL import Image


def imread_rgb(path: str) -> np.ndarray:
    """Load an image file -> uint8 RGB (H, W, 3)."""
    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"))


def imwrite(path: str, image: np.ndarray) -> None:
    Image.fromarray(image.astype(np.uint8)).save(path)


def get_rotation_matrix_2d(center: Tuple[float, float], angle_deg: float, scale: float) -> np.ndarray:
    """cv2.getRotationMatrix2D semantics -> (2, 3) affine matrix."""
    a = math.radians(angle_deg)
    alpha = scale * math.cos(a)
    beta = scale * math.sin(a)
    cx, cy = center
    return np.array(
        [
            [alpha, beta, (1 - alpha) * cx - beta * cy],
            [-beta, alpha, beta * cx + (1 - alpha) * cy],
        ],
        dtype=np.float64,
    )


def _invert_affine(m: np.ndarray) -> np.ndarray:
    a = m[:, :2]
    t = m[:, 2]
    inv_a = np.linalg.inv(a)
    inv_t = -inv_a @ t
    return np.concatenate([inv_a, inv_t[:, None]], axis=1)


def warp_affine(
    image: np.ndarray,
    matrix: np.ndarray,
    out_size: Tuple[int, int],
    interpolation: str = "bilinear",
) -> np.ndarray:
    """Apply a forward 2x3 affine to an image (cv2.warpAffine semantics).

    Args:
        image: (H, W) or (H, W, C).
        matrix: forward-mapping (2, 3) affine (dst <- M @ src).
        out_size: (width, height) of the output.
        interpolation: 'bilinear' or 'nearest'.
    """
    w, h = out_size
    inv = _invert_affine(matrix)

    # native C++ fast path for uint8 (the training-augmentation hot loop;
    # ~20x the numpy gather below)
    if np.issubdtype(image.dtype, np.uint8):
        from hmd_ego_pose_tpu.serving.frameio import warp_affine_u8

        native = warp_affine_u8(image, inv, out_size, interpolation)
        if native is not None:
            return native

    ys, xs = np.mgrid[0:h, 0:w]
    src_x = inv[0, 0] * xs + inv[0, 1] * ys + inv[0, 2]
    src_y = inv[1, 0] * xs + inv[1, 1] * ys + inv[1, 2]

    squeeze = image.ndim == 2
    img = image[:, :, None] if squeeze else image
    ih, iw = img.shape[:2]

    if interpolation == "nearest":
        xi = np.round(src_x).astype(np.int64)
        yi = np.round(src_y).astype(np.int64)
        valid = (xi >= 0) & (xi < iw) & (yi >= 0) & (yi < ih)
        xi, yi = np.clip(xi, 0, iw - 1), np.clip(yi, 0, ih - 1)
        out = img[yi, xi].astype(img.dtype)
        out[~valid] = 0
    else:
        x0 = np.floor(src_x).astype(np.int64)
        y0 = np.floor(src_y).astype(np.int64)
        fx = (src_x - x0)[..., None]
        fy = (src_y - y0)[..., None]

        def sample(yy, xx):
            inside = (xx >= 0) & (xx < iw) & (yy >= 0) & (yy < ih)
            s = img[np.clip(yy, 0, ih - 1), np.clip(xx, 0, iw - 1)].astype(np.float64)
            s[~inside] = 0
            return s

        v00 = sample(y0, x0)
        v01 = sample(y0, x0 + 1)
        v10 = sample(y0 + 1, x0)
        v11 = sample(y0 + 1, x0 + 1)
        out = (
            v00 * (1 - fx) * (1 - fy)
            + v01 * fx * (1 - fy)
            + v10 * (1 - fx) * fy
            + v11 * fx * fy
        )
        if np.issubdtype(image.dtype, np.integer):
            out = np.round(out).clip(np.iinfo(image.dtype).min, np.iinfo(image.dtype).max)
        out = out.astype(image.dtype)

    return out[:, :, 0] if squeeze else out


def resize_bilinear(image: np.ndarray, out_hw: Tuple[int, int]) -> np.ndarray:
    """Bilinear resize with half-pixel centres (cv2 INTER_LINEAR convention)."""
    oh, ow = out_hw
    ih, iw = image.shape[:2]
    if (oh, ow) == (ih, iw):
        return image.copy()

    # native fast path: a resize is an affine warp with a diagonal matrix
    # (inverse map src = (dst + 0.5)/s - 0.5); every source sample is in
    # bounds so the zero border never triggers
    if np.issubdtype(image.dtype, np.uint8):
        from hmd_ego_pose_tpu.serving.frameio import warp_affine_u8

        sx, sy = ow / iw, oh / ih
        inv = np.array(
            [[1.0 / sx, 0.0, 0.5 / sx - 0.5], [0.0, 1.0 / sy, 0.5 / sy - 0.5]]
        )
        native = warp_affine_u8(image, inv, (ow, oh), "bilinear", border="clamp")
        if native is not None:
            return native

    ys = (np.arange(oh) + 0.5) * ih / oh - 0.5
    xs = (np.arange(ow) + 0.5) * iw / ow - 0.5
    y0 = np.floor(ys).astype(np.int64)
    x0 = np.floor(xs).astype(np.int64)
    fy = (ys - y0)[:, None, None]
    fx = (xs - x0)[None, :, None]
    y0c = np.clip(y0, 0, ih - 1)
    y1c = np.clip(y0 + 1, 0, ih - 1)
    x0c = np.clip(x0, 0, iw - 1)
    x1c = np.clip(x0 + 1, 0, iw - 1)

    squeeze = image.ndim == 2
    img = image[:, :, None].astype(np.float64) if squeeze else image.astype(np.float64)

    v00 = img[y0c][:, x0c]
    v01 = img[y0c][:, x1c]
    v10 = img[y1c][:, x0c]
    v11 = img[y1c][:, x1c]
    out = v00 * (1 - fy) * (1 - fx) + v01 * (1 - fy) * fx + v10 * fy * (1 - fx) + v11 * fy * fx
    if np.issubdtype(image.dtype, np.integer):
        out = np.round(out).clip(np.iinfo(image.dtype).min, np.iinfo(image.dtype).max)
    out = out.astype(image.dtype)
    return out[:, :, 0] if squeeze else out


# ImageNet statistics used by the reference preprocess
# (generators/colibri_common.py:644-648).
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def preprocess_image(image: np.ndarray, target_size: int) -> Tuple[np.ndarray, float]:
    """Aspect-preserving resize + /255 + ImageNet norm + bottom/right zero pad.

    Mirrors the reference preprocess (colibri_common.py:622-656).  Returns the
    float32 (target, target, 3) image and the applied scale.
    """
    h, w = image.shape[:2]
    if h > w:
        scale = target_size / h
        rh, rw = target_size, int(w * scale)
    else:
        scale = target_size / w
        rh, rw = int(h * scale), target_size

    image = resize_bilinear(image, (rh, rw)).astype(np.float32)
    image /= 255.0
    image -= IMAGENET_MEAN
    image /= IMAGENET_STD
    out = np.zeros((target_size, target_size, 3), np.float32)
    out[:rh, :rw] = image
    return out, scale
