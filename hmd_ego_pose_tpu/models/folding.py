"""Inference-time BatchNorm folding.

Folds every eval-mode BatchNorm that directly follows a convolution into the
conv's kernel/bias:  y = ((Wx + b) - mean) * gamma/sqrt(var+eps) + beta
becomes  W' = W * s,  b' = (b - mean) * s + beta  with  s = gamma/sqrt(var+eps)
per output channel.  The BN node itself is then set to an exact identity
(scale 1, bias 0, mean 0, var 1-eps) so the unchanged ``apply`` graph
computes the same function while XLA constant-folds the no-op normalization.

Folded: backbone stem + all MBConv convs, BiFPN separable convs and channel
aligners — the ~95% of BN sites.  NOT folded: head BN stacks, whose conv
weights are shared across pyramid levels while BN is per-level
(efficientdet/model.py:353-357) — folding would need per-level conv copies.

Use for deployment (serving engine, StableHLO export); training must use the
unfolded tree.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import numpy as np

from hmd_ego_pose_tpu.config import ModelConfig
from hmd_ego_pose_tpu.models.efficientnet import block_specs

def _fold_pair(conv: Dict[str, Any], bn_params: Dict[str, Any], bn_state: Dict[str, Any],
               eps: float):
    """Return (folded conv dict, identity bn params, identity bn state)."""
    scale = np.asarray(bn_params["scale"]) / np.sqrt(np.asarray(bn_state["var"]) + eps)
    kernel = np.asarray(conv["kernel"]) * scale  # (..., out_ch) broadcast
    bias = np.asarray(conv.get("bias", 0.0)) - np.asarray(bn_state["mean"])
    bias = bias * scale + np.asarray(bn_params["bias"])

    folded_conv = dict(conv)
    folded_conv["kernel"] = kernel.astype(np.float32)
    folded_conv["bias"] = bias.astype(np.float32)

    ch = scale.shape[0]
    ident_p = {"scale": np.ones(ch, np.float32), "bias": np.zeros(ch, np.float32)}
    ident_s = {"mean": np.zeros(ch, np.float32), "var": np.full(ch, 1.0 - eps, np.float32)}
    return folded_conv, ident_p, ident_s


def fold_batch_norms(params, bn_state, config: ModelConfig) -> Tuple[Any, Any]:
    """Produce a deployment (params, bn_state) with conv+BN pairs folded.

    The returned trees run through the standard hmd_ego_pose.apply with
    training=False and produce bit-identical-up-to-fp32 outputs.
    """
    params = jax.tree.map(np.asarray, jax.device_get(params))
    bn_state = jax.tree.map(np.asarray, jax.device_get(bn_state))

    # ---- backbone ----
    bb_p, bb_s = params["backbone"], bn_state["backbone"]
    eps = config.bn_epsilon
    bb_p["stem_conv"], bb_p["stem_bn"], bb_s["stem_bn"] = _fold_pair(
        bb_p["stem_conv"], bb_p["stem_bn"], bb_s["stem_bn"], eps
    )
    for i, spec in enumerate(block_specs(config.backbone_coefficient)):
        bp, bs = bb_p["blocks"][i], bb_s["blocks"][i]
        if spec["expand_ratio"] != 1:
            bp["expand_conv"], bp["bn0"], bs["bn0"] = _fold_pair(bp["expand_conv"], bp["bn0"], bs["bn0"], eps)
        bp["depthwise_conv"], bp["bn1"], bs["bn1"] = _fold_pair(bp["depthwise_conv"], bp["bn1"], bs["bn1"], eps)
        bp["project_conv"], bp["bn2"], bs["bn2"] = _fold_pair(bp["project_conv"], bp["bn2"], bs["bn2"], eps)

    # ---- BiFPN ----
    for cell_p, cell_s in zip(params["bifpn"]["cells"], bn_state["bifpn"]["cells"]):
        for name, node in cell_p.items():
            if not isinstance(node, dict):
                continue
            if "pointwise" in node and "bn" in node:  # separable conv block
                node["pointwise"], node["bn"], cell_s[name]["bn"] = _fold_pair(
                    node["pointwise"], node["bn"], cell_s[name]["bn"], eps
                )
            elif "conv" in node and "bn" in node:  # channel aligner
                node["conv"], node["bn"], cell_s[name]["bn"] = _fold_pair(
                    node["conv"], node["bn"], cell_s[name]["bn"], eps
                )

    return params, bn_state
