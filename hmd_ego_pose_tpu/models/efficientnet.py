"""Functional EfficientNet backbone (B0..B7), NHWC, feature-pyramid output.

Re-implements the semantics of the reference backbone
(pytorch-sandbox/efficientnet/model.py:17-239 and the feature-extraction
wrapper at pytorch-sandbox/efficientdet/model.py:420-458) as a pure function:
``init`` builds a params/state pytree, ``apply`` maps an NHWC batch to the
(P3, P4, P5) pyramid features (strides 8/16/32, channels e.g. 40/112/320 for
B0).  The torch version collects features by watching depthwise strides at
runtime; here the cut points are static: the outputs of stages 3, 5 and 7.

TPU notes: NHWC layout, TF-SAME padding (required for checkpoint parity),
float32 params with optional bfloat16 compute, and `jax.checkpoint`-friendly
structure (each block is a pure function of (params, state, x)).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from hmd_ego_pose_tpu.config import EFFICIENTNET_PARAMS, MBCONV_STAGES
from hmd_ego_pose_tpu.nn.core import (
    batch_norm_apply,
    batch_norm_init,
    conv_apply,
    conv_init,
    depthwise_conv_apply,
    depthwise_conv_init,
    swish,
)

# BN defaults: torch momentum 0.01 == tf momentum 0.99, eps 1e-3
# (efficientnet/utils.py:244); single source of truth is ModelConfig —
# hmd_ego_pose.apply threads config.bn_momentum/bn_epsilon through here.


def round_filters(filters: int, width_coefficient: float, divisor: int = 8) -> int:
    """Width scaling with 8-divisor snapping (efficientnet/utils.py:62-74)."""
    if not width_coefficient:
        return filters
    filters *= width_coefficient
    new_filters = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new_filters < 0.9 * filters:
        new_filters += divisor
    return int(new_filters)


def round_repeats(repeats: int, depth_coefficient: float) -> int:
    if not depth_coefficient:
        return repeats
    return int(math.ceil(depth_coefficient * repeats))


def block_specs(coefficient: int) -> List[Dict[str, Any]]:
    """Expanded per-block spec list for a compound coefficient."""
    width, depth, _res, _drop = EFFICIENTNET_PARAMS[coefficient]
    blocks = []
    for stage_idx, (num_repeat, kernel, stride, expand, cin, cout, se) in enumerate(MBCONV_STAGES):
        cin_r = round_filters(cin, width)
        cout_r = round_filters(cout, width)
        repeats = round_repeats(num_repeat, depth)
        for r in range(repeats):
            blocks.append(
                dict(
                    stage=stage_idx + 1,
                    kernel=kernel,
                    stride=stride if r == 0 else 1,
                    expand_ratio=expand,
                    in_ch=cin_r if r == 0 else cout_r,
                    out_ch=cout_r,
                    se_ratio=se,
                )
            )
    return blocks


# ---------------------------------------------------------------------------
# MBConv block
# ---------------------------------------------------------------------------


def _mbconv_init(key, spec) -> Tuple[Dict, Dict]:
    keys = jax.random.split(key, 8)
    params: Dict[str, Any] = {}
    state: Dict[str, Any] = {}
    cin, cout, expand = spec["in_ch"], spec["out_ch"], spec["expand_ratio"]
    mid = cin * expand

    if expand != 1:
        params["expand_conv"] = conv_init(keys[0], cin, mid, 1, bias=False)
        params["bn0"], state["bn0"] = batch_norm_init(mid)

    params["depthwise_conv"] = depthwise_conv_init(keys[1], mid, spec["kernel"])
    params["bn1"], state["bn1"] = batch_norm_init(mid)

    if spec["se_ratio"]:
        se_ch = max(1, int(cin * spec["se_ratio"]))
        params["se_reduce"] = conv_init(keys[2], mid, se_ch, 1, bias=True)
        params["se_expand"] = conv_init(keys[3], se_ch, mid, 1, bias=True)

    params["project_conv"] = conv_init(keys[4], mid, cout, 1, bias=False)
    params["bn2"], state["bn2"] = batch_norm_init(cout)
    return params, state


def _mbconv_apply(
    params,
    state,
    x,
    spec,
    training: bool,
    drop_rate: float,
    rng: Optional[jax.Array],
    axis_name: Optional[str],
    bn_momentum: float = 0.01,
    bn_eps: float = 1e-3,
):
    """One MBConv block (efficientnet/model.py:69-104)."""
    new_state = {}
    inputs = x

    if spec["expand_ratio"] != 1:
        x = conv_apply(params["expand_conv"], x)
        x, new_state["bn0"] = batch_norm_apply(
            params["bn0"], state["bn0"], x, training, bn_momentum, bn_eps, axis_name
        )
        x = swish(x)

    x = depthwise_conv_apply(params["depthwise_conv"], x, stride=spec["stride"])
    x, new_state["bn1"] = batch_norm_apply(
        params["bn1"], state["bn1"], x, training, bn_momentum, bn_eps, axis_name
    )
    x = swish(x)

    if spec["se_ratio"]:
        se = jnp.mean(x, axis=(1, 2), keepdims=True)
        se = conv_apply(params["se_reduce"], se)
        se = swish(se)
        se = conv_apply(params["se_expand"], se)
        x = jax.nn.sigmoid(se) * x

    x = conv_apply(params["project_conv"], x)
    x, new_state["bn2"] = batch_norm_apply(
        params["bn2"], state["bn2"], x, training, bn_momentum, bn_eps, axis_name
    )

    if spec["stride"] == 1 and spec["in_ch"] == spec["out_ch"]:
        if training and drop_rate > 0 and rng is not None:
            # stochastic depth / drop-connect (efficientnet/utils.py:85-94)
            keep = 1.0 - drop_rate
            mask = jax.random.bernoulli(rng, keep, (x.shape[0], 1, 1, 1))
            x = x / keep * mask.astype(x.dtype)
        x = x + inputs
    return x, new_state


# ---------------------------------------------------------------------------
# Backbone
# ---------------------------------------------------------------------------

# Output taken after the last block of these stages -> (P3, P4, P5)
_FEATURE_STAGES = (3, 5, 7)


def init(key, coefficient: int = 0) -> Tuple[Dict, Dict]:
    """Build backbone params/state for ``efficientnet-b{coefficient}``."""
    specs = block_specs(coefficient)
    width = EFFICIENTNET_PARAMS[coefficient][0]
    keys = jax.random.split(key, len(specs) + 1)

    stem_out = round_filters(32, width)
    params: Dict[str, Any] = {"stem_conv": conv_init(keys[0], 3, stem_out, 3, bias=False)}
    state: Dict[str, Any] = {}
    params["stem_bn"], state["stem_bn"] = batch_norm_init(stem_out)

    blocks_p, blocks_s = [], []
    for i, spec in enumerate(specs):
        p, s = _mbconv_init(keys[i + 1], spec)
        blocks_p.append(p)
        blocks_s.append(s)
    params["blocks"] = blocks_p
    state["blocks"] = blocks_s
    return params, state


def apply(
    params,
    state,
    x,
    coefficient: int = 0,
    training: bool = False,
    rng: Optional[jax.Array] = None,
    axis_name: Optional[str] = None,
    drop_connect_rate: float = 0.2,
    bn_momentum: float = 0.01,
    bn_eps: float = 1e-3,
    remat: bool = False,
):
    """NHWC image batch -> (P3, P4, P5) features and new BN state.

    Feature cut points are the last blocks of stages 3/5/7, equivalent to the
    reference's runtime stride-watching collection
    (efficientdet/model.py:436-458).

    ``remat``: wrap each MBConv block in ``jax.checkpoint`` during training.
    The train step is HBM-bandwidth-bound (BENCH_NOTES.md roofline: 3.4
    FLOP/byte vs the v5e's 240 ridge), and the blocks' 6x-expanded
    intermediates are most of the saved-activation traffic — recomputing
    them in the backward pass from the (unexpanded) block inputs trades
    nearly-free FLOPs for bytes.  Numerically identical outputs/grads
    (pinned by tests/test_model.py).
    """
    specs = block_specs(coefficient)
    new_state: Dict[str, Any] = {}

    x = conv_apply(params["stem_conv"], x, stride=2)
    x, new_state["stem_bn"] = batch_norm_apply(
        params["stem_bn"], state["stem_bn"], x, training, bn_momentum, bn_eps, axis_name
    )
    x = swish(x)

    features = []
    n_blocks = len(specs)
    new_blocks = []
    rngs = jax.random.split(rng, n_blocks) if rng is not None else [None] * n_blocks
    for i, spec in enumerate(specs):
        rate = drop_connect_rate * i / n_blocks
        block_fn = _mbconv_apply
        if remat and training:
            # bind the non-array args via defaults; (params, state, x, rng)
            # stay traced so checkpoint saves only the block INPUTS
            block_fn = jax.checkpoint(
                lambda p, s, xx, key, _spec=spec, _rate=rate: _mbconv_apply(
                    p, s, xx, _spec, training, _rate, key,
                    axis_name, bn_momentum, bn_eps,
                )
            )
            x, s = block_fn(params["blocks"][i], state["blocks"][i], x, rngs[i])
        else:
            x, s = block_fn(
                params["blocks"][i], state["blocks"][i], x, spec, training, rate,
                rngs[i], axis_name, bn_momentum, bn_eps,
            )
        new_blocks.append(s)
        is_last_of_stage = i + 1 == n_blocks or specs[i + 1]["stage"] != spec["stage"]
        if is_last_of_stage and spec["stage"] in _FEATURE_STAGES:
            features.append(x)
    new_state["blocks"] = new_blocks

    p3, p4, p5 = features
    return (p3, p4, p5), new_state
