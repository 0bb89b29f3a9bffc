"""Functional BiFPN (weighted bidirectional feature pyramid).

Re-implements the reference BiFPN
(pytorch-sandbox/efficientdet/model.py:55-341): first cell down-channels the
backbone's (P3, P4, P5) and synthesizes P6/P7 from P5; every cell runs a
top-down then bottom-up pass with fast-attention fusion (ReLU'd scalar
weights, normalized with epsilon 1e-4) for phi < 6 and plain-sum fusion
otherwise.  Depthwise-separable conv blocks carry BN (momentum 0.01, eps
1e-3) but no activation; swish is applied to the fused input.

Everything is a pure function over a params/state pytree; fusion weights are
scalars so XLA folds the whole fusion+swish into the conv epilogue.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from hmd_ego_pose_tpu.nn.core import (
    batch_norm_apply,
    batch_norm_init,
    conv_apply,
    conv_init,
    depthwise_conv_apply,
    depthwise_conv_init,
    max_pool_same,
    resize_nearest_2x,
    swish,
)

# BN defaults 0.01/1e-3 and fast-attention fusion epsilon 1e-4
# (efficientdet/model.py:14-52,72); single source of truth is ModelConfig —
# hmd_ego_pose.apply threads bn_momentum/bn_epsilon/fusion_epsilon here.


# ---------------------------------------------------------------------------
# Separable conv block: depthwise 3x3 (no bias) + pointwise 1x1 (bias) + BN
# (efficientdet/model.py:14-52)
# ---------------------------------------------------------------------------


def sep_conv_init(key, in_ch: int, out_ch: int, norm: bool = True):
    k1, k2 = jax.random.split(key)
    params = {
        "depthwise": depthwise_conv_init(k1, in_ch, 3),
        "pointwise": conv_init(k2, in_ch, out_ch, 1, bias=True),
    }
    state = {}
    if norm:
        params["bn"], state["bn"] = batch_norm_init(out_ch)
    return params, state


def sep_conv_apply(params, state, x, training=False, axis_name=None,
                   bn_momentum=0.01, bn_eps=1e-3):
    x = depthwise_conv_apply(params["depthwise"], x)
    x = conv_apply(params["pointwise"], x)
    new_state = {}
    if "bn" in params:
        x, new_state["bn"] = batch_norm_apply(
            params["bn"], state["bn"], x, training, bn_momentum, bn_eps, axis_name
        )
    return x, new_state


def _channel_align_init(key, in_ch: int, out_ch: int):
    """1x1 conv + BN used to down-channel backbone features (model.py:107-140)."""
    params = {"conv": conv_init(key, in_ch, out_ch, 1, bias=True)}
    params["bn"], state_bn = batch_norm_init(out_ch)
    return params, {"bn": state_bn}


def _channel_align_apply(params, state, x, training, axis_name, bn_momentum, bn_eps):
    x = conv_apply(params["conv"], x)
    x, bn = batch_norm_apply(params["bn"], state["bn"], x, training, bn_momentum, bn_eps, axis_name)
    return x, {"bn": bn}


# ---------------------------------------------------------------------------
# One BiFPN cell
# ---------------------------------------------------------------------------

_EDGE_NAMES_UP = ("conv6_up", "conv5_up", "conv4_up", "conv3_up")
_EDGE_NAMES_DOWN = ("conv4_down", "conv5_down", "conv6_down", "conv7_down")


def cell_init(key, num_channels: int, conv_channels: Tuple[int, int, int], first_time: bool):
    keys = iter(jax.random.split(key, 24))
    params: Dict[str, Any] = {}
    state: Dict[str, Any] = {}

    for name in _EDGE_NAMES_UP + _EDGE_NAMES_DOWN:
        params[name], state[name] = sep_conv_init(next(keys), num_channels, num_channels)

    if first_time:
        c3, c4, c5 = conv_channels
        for name, cin in (
            ("p3_down_channel", c3),
            ("p4_down_channel", c4),
            ("p5_down_channel", c5),
            ("p5_to_p6", c5),
            ("p4_down_channel_2", c4),
            ("p5_down_channel_2", c5),
        ):
            params[name], state[name] = _channel_align_init(next(keys), cin, num_channels)

    # fast-attention fusion weights, initialized to 1 (model.py:143-159)
    for name, n in (
        ("p6_w1", 2), ("p5_w1", 2), ("p4_w1", 2), ("p3_w1", 2),
        ("p4_w2", 3), ("p5_w2", 3), ("p6_w2", 3), ("p7_w2", 2),
    ):
        params[name] = jnp.ones((n,), jnp.float32)

    return params, state


def _fuse(weight_param, tensors, attention: bool, eps: float = 1e-4):
    """Fast-attention weighted fusion + swish (model.py:212-264)."""
    if attention:
        w = jax.nn.relu(weight_param)
        w = w / (jnp.sum(w) + eps)
        out = sum(w[i].astype(tensors[i].dtype) * tensors[i] for i in range(len(tensors)))
    else:
        out = sum(tensors)
    return swish(out)


def cell_apply(
    params,
    state,
    features,
    first_time: bool,
    attention: bool = True,
    training: bool = False,
    axis_name: Optional[str] = None,
    bn_momentum: float = 0.01,
    bn_eps: float = 1e-3,
    fusion_eps: float = 1e-4,
):
    """One BiFPN cell: 5-level in (or 3-level backbone in if first), 5-level out."""
    new_state: Dict[str, Any] = {}

    def sep(name, x):
        y, s = sep_conv_apply(params[name], state[name], x, training, axis_name,
                              bn_momentum, bn_eps)
        new_state[name] = s
        return y

    def align(name, x):
        y, s = _channel_align_apply(params[name], state[name], x, training, axis_name,
                                    bn_momentum, bn_eps)
        new_state[name] = s
        return y

    if first_time:
        p3, p4, p5 = features
        p6_in = max_pool_same(align("p5_to_p6", p5))
        p7_in = max_pool_same(p6_in)
        p3_in = align("p3_down_channel", p3)
        p4_in = align("p4_down_channel", p4)
        p5_in = align("p5_down_channel", p5)
    else:
        p3_in, p4_in, p5_in, p6_in, p7_in = features

    # top-down pass
    p6_up = sep("conv6_up", _fuse(params["p6_w1"], [p6_in, resize_nearest_2x(p7_in)], attention, fusion_eps))
    p5_up = sep("conv5_up", _fuse(params["p5_w1"], [p5_in, resize_nearest_2x(p6_up)], attention, fusion_eps))
    p4_up = sep("conv4_up", _fuse(params["p4_w1"], [p4_in, resize_nearest_2x(p5_up)], attention, fusion_eps))
    p3_out = sep("conv3_up", _fuse(params["p3_w1"], [p3_in, resize_nearest_2x(p4_up)], attention, fusion_eps))

    if first_time:
        p4_in = align("p4_down_channel_2", p4)
        p5_in = align("p5_down_channel_2", p5)

    # bottom-up pass
    p4_out = sep(
        "conv4_down", _fuse(params["p4_w2"], [p4_in, p4_up, max_pool_same(p3_out)], attention, fusion_eps)
    )
    p5_out = sep(
        "conv5_down", _fuse(params["p5_w2"], [p5_in, p5_up, max_pool_same(p4_out)], attention, fusion_eps)
    )
    p6_out = sep(
        "conv6_down", _fuse(params["p6_w2"], [p6_in, p6_up, max_pool_same(p5_out)], attention, fusion_eps)
    )
    p7_out = sep("conv7_down", _fuse(params["p7_w2"], [p7_in, max_pool_same(p6_out)], attention, fusion_eps))

    return (p3_out, p4_out, p5_out, p6_out, p7_out), new_state


# ---------------------------------------------------------------------------
# Stacked BiFPN
# ---------------------------------------------------------------------------


def init(key, num_channels: int, conv_channels: Tuple[int, int, int], repeats: int):
    keys = jax.random.split(key, repeats)
    cells_p, cells_s = [], []
    for i in range(repeats):
        p, s = cell_init(keys[i], num_channels, conv_channels, first_time=(i == 0))
        cells_p.append(p)
        cells_s.append(s)
    return {"cells": cells_p}, {"cells": cells_s}


def apply(params, state, backbone_features, attention=True, training=False, axis_name=None,
          capture=None, bn_momentum=0.01, bn_eps=1e-3, fusion_eps=1e-4):
    """``capture``: optional dict collecting per-cell pyramid outputs
    (activation-diffing harness for checkpoint parity work)."""
    features = backbone_features
    new_cells = []
    for i, (p, s) in enumerate(zip(params["cells"], state["cells"])):
        features, ns = cell_apply(
            p, s, features, first_time=(i == 0), attention=attention,
            training=training, axis_name=axis_name,
            bn_momentum=bn_momentum, bn_eps=bn_eps, fusion_eps=fusion_eps,
        )
        new_cells.append(ns)
        if capture is not None:
            for level, feat in enumerate(features):
                capture[f"bifpn.cell{i}.p{level + 3}"] = feat
    return features, {"cells": new_cells}
