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


def _resize_bilinear_cv(x, rh: int, rw: int):
    """cv2 INTER_LINEAR-convention bilinear resize (half-pixel centres, NO
    antialiasing) of NHWC batches.  jax.image.resize antialiases when
    downsampling, which breaks parity with the reference's cv2 preprocessing
    (generators/colibri_common.py:640); this gather+lerp matches it exactly.
    All indices/weights are compile-time constants."""
    b, h, w, c = x.shape
    ys = (np.arange(rh) + 0.5) * h / rh - 0.5
    xs = (np.arange(rw) + 0.5) * w / rw - 0.5
    y0 = np.floor(ys).astype(np.int32)
    x0 = np.floor(xs).astype(np.int32)
    fy = jnp.asarray((ys - y0).astype(np.float32))[None, :, None, None]
    fx = jnp.asarray((xs - x0).astype(np.float32))[None, None, :, None]
    y0c = np.clip(y0, 0, h - 1)
    y1c = np.clip(y0 + 1, 0, h - 1)
    x0c = np.clip(x0, 0, w - 1)
    x1c = np.clip(x0 + 1, 0, w - 1)

    top = x[:, y0c][:, :, x0c] * (1 - fx) + x[:, y0c][:, :, x1c] * fx
    bot = x[:, y1c][:, :, x0c] * (1 - fx) + x[:, y1c][:, :, x1c] * fx
    return top * (1 - fy) + bot * fy


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
