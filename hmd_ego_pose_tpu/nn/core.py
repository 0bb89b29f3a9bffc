"""Minimal functional NN core: params are pytrees, layers are pure functions.

Design notes (TPU-first):

* Layout is **NHWC** throughout — XLA:TPU's native convolution layout.  The
  reference uses torch NCHW (pytorch-sandbox/efficientnet/model.py); weights
  imported from torch checkpoints are transposed once at conversion time.
* Convolutions use TensorFlow-style asymmetric SAME padding computed at trace
  time from static shapes, replicating the semantics of the reference's
  Conv2dStaticSamePadding / MaxPool2dStaticSamePadding
  (pytorch-sandbox/efficientnet/utils_extra.py:9-87) — this padding choice is
  load-bearing for weight parity with EfficientNet/EfficientDet checkpoints.
* BatchNorm is functional: ``(params, state, x) -> (y, new_state)``.  In
  training, batch statistics are optionally all-reduced over a named mesh
  axis (``axis_name``) via ``jax.lax.pmean`` — the TPU-native replacement for
  the reference's vestigial master/slave SyncBN
  (pytorch-sandbox/utils/sync_batchnorm/batchnorm.py).
* Everything is dtype-polymorphic: params live in float32; the conv stack can
  run in bfloat16 via a ``compute_dtype`` cast at the call site.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Initializers
# ---------------------------------------------------------------------------


def _fan_in_conv(shape):
    # HWIO layout: (kh, kw, in_ch/groups, out_ch)
    kh, kw, in_ch, _ = shape
    return kh * kw * in_ch


def kaiming_normal(key, shape, dtype=jnp.float32):
    """He-normal init for conv kernels (torch's default for Conv2d-like stacks)."""
    fan_in = _fan_in_conv(shape)
    std = math.sqrt(2.0 / fan_in)
    return std * jax.random.normal(key, shape, dtype)


# ---------------------------------------------------------------------------
# SAME padding
# ---------------------------------------------------------------------------


def same_padding(size: int, kernel: int, stride: int) -> Tuple[int, int]:
    """TF SAME padding (lo, hi) for one spatial dim.

    extra = (ceil(size / stride) - 1) * stride - size + kernel, split with the
    extra pixel on the **high** side (utils_extra.py:33-47).
    """
    extra = max((math.ceil(size / stride) - 1) * stride - size + kernel, 0)
    lo = extra // 2
    return lo, extra - lo


# ---------------------------------------------------------------------------
# Conv layers
# ---------------------------------------------------------------------------


def conv_init(key, in_ch: int, out_ch: int, kernel: int, bias: bool = True):
    """Params for a standard conv; kernel layout HWIO."""
    kkey, _ = jax.random.split(key)
    params = {"kernel": kaiming_normal(kkey, (kernel, kernel, in_ch, out_ch))}
    if bias:
        params["bias"] = jnp.zeros((out_ch,), jnp.float32)
    return params


def conv_apply(params, x, stride: int = 1):
    """SAME-padded conv, NHWC x HWIO -> NHWC."""
    kh, kw = params["kernel"].shape[:2]
    h, w = x.shape[1], x.shape[2]
    pad_h = same_padding(h, kh, stride)
    pad_w = same_padding(w, kw, stride)
    y = jax.lax.conv_general_dilated(
        x,
        params["kernel"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=(pad_h, pad_w),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "bias" in params:
        y = y + params["bias"].astype(y.dtype)
    return y


def depthwise_conv_init(key, channels: int, kernel: int):
    """Depthwise conv params; kernel layout HWIO with I = 1, O = channels."""
    return {"kernel": kaiming_normal(key, (kernel, kernel, 1, channels))}


def depthwise_conv_apply(params, x, stride: int = 1):
    kh, kw = params["kernel"].shape[:2]
    channels = params["kernel"].shape[3]
    h, w = x.shape[1], x.shape[2]
    pad_h = same_padding(h, kh, stride)
    pad_w = same_padding(w, kw, stride)
    y = jax.lax.conv_general_dilated(
        x,
        params["kernel"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=(pad_h, pad_w),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=channels,
    )
    if "bias" in params:
        y = y + params["bias"].astype(y.dtype)
    return y


# ---------------------------------------------------------------------------
# BatchNorm
# ---------------------------------------------------------------------------


def batch_norm_init(channels: int):
    params = {
        "scale": jnp.ones((channels,), jnp.float32),
        "bias": jnp.zeros((channels,), jnp.float32),
    }
    state = {
        "mean": jnp.zeros((channels,), jnp.float32),
        "var": jnp.ones((channels,), jnp.float32),
    }
    return params, state


def batch_norm_apply(
    params,
    state,
    x,
    training: bool = False,
    momentum: float = 0.01,
    eps: float = 1e-3,
    axis_name: Optional[str] = None,
):
    """Functional BatchNorm over NHWC (normalizes over N, H, W).

    torch-momentum convention: ``new = (1 - m) * running + m * batch``
    (efficientdet/model.py:36 uses momentum=0.01, eps=1e-3).

    When ``axis_name`` is given and we're inside shard_map/pmap, batch
    statistics are averaged across that mesh axis — cross-replica BN over ICI
    replacing the reference's SyncBN pipes (utils/sync_batchnorm/comm.py:22-137).
    """
    if training:
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(0, 1, 2))
        mean_sq = jnp.mean(jnp.square(xf), axis=(0, 1, 2))
        if axis_name is not None:
            mean = jax.lax.pmean(mean, axis_name)
            mean_sq = jax.lax.pmean(mean_sq, axis_name)
        var = mean_sq - jnp.square(mean)
        # unbiased variance for the running stats, as torch does
        n = x.shape[0] * x.shape[1] * x.shape[2]
        if axis_name is not None:
            n = n * jax.lax.psum(jnp.ones(()), axis_name)
        correction = n / jnp.maximum(n - 1.0, 1.0)
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * var * correction,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state

    inv = jax.lax.rsqrt(var + eps) * params["scale"]
    y = (x.astype(jnp.float32) - mean) * inv + params["bias"]
    return y.astype(x.dtype), new_state


# ---------------------------------------------------------------------------
# Activations and resampling
# ---------------------------------------------------------------------------


def swish(x):
    """x * sigmoid(x) (SiLU). Matches efficientnet/utils.py:38-59."""
    return x * jax.nn.sigmoid(x)


def max_pool_same(x, kernel: int = 3, stride: int = 2):
    """Max pool with TF SAME padding.

    NOTE: the reference's MaxPool2dStaticSamePadding zero-pads before pooling
    (utils_extra.py:50-87, F.pad default value 0), so border maxima are
    clamped at >= 0 rather than ignoring padding.  We replicate that — it is
    observable through trained weights.  Implemented as explicit zero pad +
    -inf-identity reduce_window over the padded tensor.
    """
    h, w = x.shape[1], x.shape[2]
    pad_h = same_padding(h, kernel, stride)
    pad_w = same_padding(w, kernel, stride)
    x = jnp.pad(x, ((0, 0), pad_h, pad_w, (0, 0)))
    return jax.lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        window_dimensions=(1, kernel, kernel, 1),
        window_strides=(1, stride, stride, 1),
        padding="VALID",
    )


def resize_nearest_2x(x):
    """Nearest-neighbour 2x upsample of NHWC, matching nn.Upsample(scale=2).

    Implemented as a reshape-broadcast (pure data movement, no gather) so XLA
    lowers it to a cheap copy.
    """
    n, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)
