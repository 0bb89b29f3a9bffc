"""Prediction subnets: box regression, classification, rotation, translation, hand.

Re-implements the five anchor-based heads of the reference
(pytorch-sandbox/efficientdet/model.py:344-417 for Regressor/Classifier and
pytorch-sandbox/hmdegopose/model.py:22-346 for Rotation/Translation/Hand nets
plus their iterative refinement subnets).  Shared structure:

* ``num_layers`` depthwise-separable convs whose weights are **shared across
  pyramid levels**, but each level gets its own BatchNorm stack, then swish;
* a separable-conv header projecting to ``num_anchors * out_dim``;
* outputs from all levels flattened to (B, total_anchors, out_dim).

TranslationNet keeps separate xy (2) and z (1) headers whose outputs are
concatenated per anchor (hmdegopose/model.py:177-228).  Optional iterative
refinement subnets concatenate the current prediction onto the features and
regress a delta ``iter_steps`` times (model.py:232-346).  Note: the reference
hard-codes the refinement convs' input width (91/631), which only type-checks
for ``num_layers == 1``; here the first conv takes the concatenated width and
subsequent convs the head width, which is the EfficientPose paper's intent.

In NHWC the torch permute+view dance (model.py:370-372) reduces to a single
reshape; anchor-major ordering (location, then anchor index, then component)
is preserved so anchors line up with ops.anchors.anchors_for_shape.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from hmd_ego_pose_tpu.models.bifpn import sep_conv_apply, sep_conv_init
from hmd_ego_pose_tpu.nn.core import batch_norm_apply, batch_norm_init, swish

# BN defaults 0.01/1e-3 (efficientdet/model.py:349-359); single source of
# truth is ModelConfig — hmd_ego_pose.apply threads bn_momentum/bn_epsilon.


def _head_core_init(key, in_ch: int, num_layers: int, pyramid_levels: int):
    """Shared convs (no norm) + per-level BN stacks (efficientdet/model.py:349-359)."""
    keys = jax.random.split(key, num_layers)
    params: Dict[str, Any] = {
        "convs": [sep_conv_init(keys[i], in_ch, in_ch, norm=False)[0] for i in range(num_layers)],
        "bns": [
            [batch_norm_init(in_ch)[0] for _ in range(num_layers)]
            for _ in range(pyramid_levels)
        ],
    }
    state = {
        "bns": [
            [batch_norm_init(in_ch)[1] for _ in range(num_layers)]
            for _ in range(pyramid_levels)
        ]
    }
    return params, state


def _head_core_apply(params, state, feat, level: int, training, axis_name,
                     bn_momentum, bn_eps):
    """Apply the shared conv stack with this level's BN chain."""
    new_bns = []
    for conv_p, bn_p, bn_s in zip(params["convs"], params["bns"][level], state["bns"][level]):
        feat, _ = sep_conv_apply(conv_p, {}, feat)
        feat, ns = batch_norm_apply(bn_p, bn_s, feat, training, bn_momentum, bn_eps, axis_name)
        new_bns.append(ns)
        feat = swish(feat)
    return feat, new_bns


def _flatten_anchors(x, out_dim: int):
    """(B, H, W, A*D) -> (B, H*W*A, D)."""
    b = x.shape[0]
    return x.reshape(b, -1, out_dim)


# ---------------------------------------------------------------------------
# Simple heads (regression / classification / rotation / hand)
# ---------------------------------------------------------------------------


def head_init(
    key,
    in_ch: int,
    out_dim: int,
    num_anchors: int,
    num_layers: int,
    pyramid_levels: int,
    iter_steps: int = 0,
    header_bias_init: float = 0.0,
):
    k_core, k_head, k_iter = jax.random.split(key, 3)
    params, state = _head_core_init(k_core, in_ch, num_layers, pyramid_levels)
    params["header"], _ = sep_conv_init(k_head, in_ch, num_anchors * out_dim, norm=False)
    if header_bias_init:
        params["header"]["pointwise"]["bias"] = jnp.full(
            (num_anchors * out_dim,), header_bias_init, jnp.float32
        )
    if iter_steps >= 1:
        p, s = _iter_subnet_init(
            k_iter, in_ch, in_ch + num_anchors * out_dim,
            (num_anchors * out_dim,), num_layers, iter_steps,
        )
        params["iter"], state["iter"] = p, s
    return params, state


def head_apply(
    params,
    state,
    features,
    out_dim: int,
    iter_steps: int = 0,
    training: bool = False,
    axis_name: Optional[str] = None,
    bn_momentum: float = 0.01,
    bn_eps: float = 1e-3,
):
    """Run a head over the 5-level pyramid -> (B, N, out_dim)."""
    new_state: Dict[str, Any] = {"bns": []}
    outs = []
    iter_states = []
    for level, feat in enumerate(features):
        feat, bns = _head_core_apply(params, state, feat, level, training, axis_name,
                                     bn_momentum, bn_eps)
        new_state["bns"].append(bns)
        pred, _ = sep_conv_apply(params["header"], {}, feat)
        if iter_steps >= 1:
            (pred,), it_s = _iter_subnet_apply(
                params["iter"], state["iter"], feat, (pred,), iter_steps, training, axis_name,
                bn_momentum, bn_eps,
            )
            iter_states.append(it_s)
        outs.append(_flatten_anchors(pred, out_dim))
    if iter_states:
        # the refinement subnet's BN stacks are shared across pyramid levels
        # (as in the reference, hmdegopose/model.py:248-249); we keep the last
        # level's running-stat update per step rather than chaining updates
        # through all five levels — a negligible difference in EMA statistics
        new_state["iter"] = iter_states[-1]
    return jnp.concatenate(outs, axis=1), new_state


def classification_apply(params, state, features, num_classes: int, training=False,
                         axis_name=None, bn_momentum=0.01, bn_eps=1e-3):
    logits, new_state = head_apply(params, state, features, num_classes, 0, training,
                                   axis_name, bn_momentum, bn_eps)
    return jax.nn.sigmoid(logits), new_state


# ---------------------------------------------------------------------------
# Translation head (separate xy / z headers)
# ---------------------------------------------------------------------------


def translation_head_init(
    key, in_ch: int, num_anchors: int, num_layers: int, pyramid_levels: int, iter_steps: int = 0
):
    k_core, k_xy, k_z, k_iter = jax.random.split(key, 4)
    params, state = _head_core_init(k_core, in_ch, num_layers, pyramid_levels)
    params["header_xy"], _ = sep_conv_init(k_xy, in_ch, num_anchors * 2, norm=False)
    params["header_z"], _ = sep_conv_init(k_z, in_ch, num_anchors, norm=False)
    if iter_steps >= 1:
        p, s = _iter_subnet_init(
            k_iter, in_ch, in_ch + num_anchors * 3,
            (num_anchors * 2, num_anchors), num_layers, iter_steps,
        )
        params["iter"], state["iter"] = p, s
    return params, state


def translation_head_apply(
    params, state, features, iter_steps: int = 0, training=False, axis_name=None,
    bn_momentum=0.01, bn_eps=1e-3,
):
    new_state: Dict[str, Any] = {"bns": []}
    outs = []
    for level, feat in enumerate(features):
        feat, bns = _head_core_apply(params, state, feat, level, training, axis_name,
                                     bn_momentum, bn_eps)
        new_state["bns"].append(bns)
        xy, _ = sep_conv_apply(params["header_xy"], {}, feat)
        z, _ = sep_conv_apply(params["header_z"], {}, feat)
        if iter_steps >= 1:
            (xy, z), it_s = _iter_subnet_apply(
                params["iter"], state["iter"], feat, (xy, z), iter_steps, training, axis_name,
                bn_momentum, bn_eps,
            )
            new_state["iter"] = it_s
        xy = _flatten_anchors(xy, 2)
        z = _flatten_anchors(z, 1)
        outs.append(jnp.concatenate([xy, z], axis=-1))
    return jnp.concatenate(outs, axis=1), new_state


# ---------------------------------------------------------------------------
# Iterative refinement subnet (shared shape across heads)
# ---------------------------------------------------------------------------


def _iter_subnet_init(key, in_ch, concat_ch, header_dims, num_layers, iter_steps):
    """Delta-regression subnet: convs over concat(feat, pred) with
    per-iteration BN (hmdegopose/model.py:232-346)."""
    keys = jax.random.split(key, num_layers + len(header_dims))
    params: Dict[str, Any] = {"convs": [], "bns": [], "headers": []}
    state = {"bns": []}
    for i in range(num_layers):
        cin = concat_ch if i == 0 else in_ch
        params["convs"].append(sep_conv_init(keys[i], cin, in_ch, norm=False)[0])
    params["bns"] = [
        [batch_norm_init(in_ch)[0] for _ in range(num_layers)] for _ in range(iter_steps)
    ]
    state["bns"] = [
        [batch_norm_init(in_ch)[1] for _ in range(num_layers)] for _ in range(iter_steps)
    ]
    for j, dim in enumerate(header_dims):
        params["headers"].append(sep_conv_init(keys[num_layers + j], in_ch, dim, norm=False)[0])
    return params, state


def _iter_subnet_apply(params, state, feat, preds, iter_steps, training, axis_name,
                       bn_momentum=0.01, bn_eps=1e-3):
    new_state = {"bns": [list(s) for s in state["bns"]]}
    preds = list(preds)
    for step in range(iter_steps):
        x = jnp.concatenate([feat] + preds, axis=-1)
        for i, conv_p in enumerate(params["convs"]):
            x, _ = sep_conv_apply(conv_p, {}, x)
            x, ns = batch_norm_apply(
                params["bns"][step][i], state["bns"][step][i], x,
                training, bn_momentum, bn_eps, axis_name,
            )
            new_state["bns"][step][i] = ns
            x = swish(x)
        for j, header_p in enumerate(params["headers"]):
            delta, _ = sep_conv_apply(header_p, {}, x)
            preds[j] = preds[j] + delta
    return tuple(preds), new_state
