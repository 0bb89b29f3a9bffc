"""Device-side image preprocessing, fused into the inference program.

The reference preprocesses on the host with OpenCV (resize + /255 + ImageNet
mean/std + zero pad, ~6-8 ms/frame: unity-sandbox/WebRTCNetCoreSandbox/
Program.cs:24,167-200 and generators/colibri_common.py:622-656).  Here raw
uint8 frames are shipped to HBM and the same pipeline runs as jnp inside the
jitted program — it fuses with the stem convolution, so the effective cost is
one pass over the frame's bytes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

import numpy as np

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def _interp_matrix(out_size: int, in_size: int) -> np.ndarray:
    """(out, in) bilinear interpolation matrix, cv2 half-pixel convention."""
    coords = (np.arange(out_size) + 0.5) * in_size / out_size - 0.5
    i0 = np.floor(coords).astype(np.int64)
    frac = coords - i0
    m = np.zeros((out_size, in_size), np.float32)
    for row in range(out_size):
        a = np.clip(i0[row], 0, in_size - 1)
        b = np.clip(i0[row] + 1, 0, in_size - 1)
        m[row, a] += 1.0 - frac[row]
        m[row, b] += frac[row]
    return m


def _resize_bilinear_cv(x, rh: int, rw: int):
    """cv2 INTER_LINEAR-convention bilinear resize (half-pixel centres, NO
    antialiasing) of NHWC batches.  jax.image.resize antialiases when
    downsampling, which breaks parity with the reference's cv2 preprocessing
    (generators/colibri_common.py:640).

    Separable bilinear = two small matmuls against constant interpolation
    matrices — they ride the MXU instead of lowering to scatter/gather.
    HIGHEST precision keeps the fp32 weights exact enough that the uint8
    rounding downstream is bit-stable.
    """
    b, h, w, c = x.shape
    my = jnp.asarray(_interp_matrix(rh, h))  # (rh, h)
    mx = jnp.asarray(_interp_matrix(rw, w))  # (rw, w)
    hi = jax.lax.Precision.HIGHEST
    # rows: (rh,h) x (b,h,w,c) -> (b,rh,w,c)
    x = jnp.einsum("ry,bywc->brwc", my, x, precision=hi)
    # cols: (rw,w) x (b,rh,w,c) -> (b,rh,rw,c)
    x = jnp.einsum("sw,brwc->brsc", mx, x, precision=hi)
    return x


def preprocess_uint8_batch(frames, target_size: int):
    """uint8 (B, H, W, 3) -> normalized float32 (B, S, S, 3), aspect-preserving.

    H, W are static at trace time, so the resized shape and padding are
    compile-time constants — matching host preprocess_image semantics
    (aspect-preserving resize, /255, ImageNet norm, bottom/right zero pad).
    """
    b, h, w, c = frames.shape
    if h > w:
        scale = target_size / h
        rh, rw = target_size, int(w * scale)
    else:
        scale = target_size / w
        rh, rw = int(h * scale), target_size

    x = frames.astype(jnp.float32)
    if (rh, rw) != (h, w):
        # resize in the 0..255 domain and round, replicating cv2's uint8
        # output quantization before the /255 (colibri_common.py:640-643)
        x = jnp.round(_resize_bilinear_cv(x, rh, rw))
    x = x / 255.0
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    x = (x - mean) / std
    if rh != target_size or rw != target_size:
        x = jnp.pad(x, ((0, 0), (0, target_size - rh), (0, target_size - rw), (0, 0)))
    return x


def preprocess_scale(frame_h: int, frame_w: int, target_size: int) -> float:
    """The image scale the host must put into the camera-parameter vector."""
    return target_size / max(frame_h, frame_w)
