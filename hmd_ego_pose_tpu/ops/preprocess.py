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

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


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

    x = frames.astype(jnp.float32) / 255.0
    if (rh, rw) != (h, w):
        x = jax.image.resize(x, (b, rh, rw, c), method="linear")
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    x = (x - mean) / std
    if rh != target_size or rw != target_size:
        x = jnp.pad(x, ((0, 0), (0, target_size - rh), (0, target_size - rw), (0, 0)))
    return x


def preprocess_scale(frame_h: int, frame_w: int, target_size: int) -> float:
    """The image scale the host must put into the camera-parameter vector."""
    return target_size / max(frame_h, frame_w)
