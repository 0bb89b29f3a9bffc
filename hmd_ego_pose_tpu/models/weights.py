"""Torch-checkpoint <-> params-pytree weight converter.

Maps the reference's state_dict naming (pytorch-sandbox/backbone.py module
tree) onto this framework's pytree, with layout transposes:

* torch conv weight OIHW -> jax HWIO (and depthwise (C,1,kh,kw) -> (kh,kw,1,C));
* BatchNorm weight/bias -> params scale/bias; running stats -> bn_state.

Key-prefix surgery mirrors the reference's own loaders, which strip
``module.`` / ``model.`` / ``model.module.`` depending on provenance
(pytorch-sandbox/train.py:142, evaluate.py:105-116,
hmdegopose/misc_utils.py:44-52).

Naming conventions handled (from the reference module structure):
* EfficientNet blocks use plain nn.Conv2d subclasses -> ``..._conv_stem.weight``
  (efficientnet/utils.py:106-110);
* EfficientDet/pose-head convs wrap the conv -> ``...depthwise_conv.conv.weight``
  (efficientnet/utils_extra.py:9-47);
* BiFPN down-channel paths are Sequentials -> ``p5_down_channel.0.conv.weight``,
  ``p5_down_channel.1.weight`` (BN) (efficientdet/model.py:107-140).

The exactness oracle is ``export_torch_state_dict`` + roundtrip tests: every
tensor converted must land with matching shape, and unknown/missed keys are
reported loudly rather than silently skipped.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np

from hmd_ego_pose_tpu.config import ModelConfig
from hmd_ego_pose_tpu.models.efficientnet import block_specs


def strip_prefixes(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Remove module./model. wrappers (reference provenance variants)."""
    out = {}
    for k, v in state_dict.items():
        for prefix in ("model.module.", "module.model.", "model.", "module."):
            if k.startswith(prefix):
                k = k[len(prefix):]
                break
        out[k] = v
    return out


def _conv_oihw_to_hwio(w) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w).transpose(2, 3, 1, 0))


def _conv_hwio_to_oihw(w) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w).transpose(3, 2, 0, 1))


class _Mapper:
    """Accumulates (torch key <-> pytree path) assignments in both directions."""

    def __init__(self):
        self.entries: List[Tuple[str, Tuple, str]] = []  # (torch_key, path, kind)

    def conv(self, torch_prefix: str, path: Tuple, bias: bool = True, wrapped: bool = True):
        stem = f"{torch_prefix}.conv" if wrapped else torch_prefix
        self.entries.append((f"{stem}.weight", path + ("kernel",), "conv"))
        if bias:
            self.entries.append((f"{stem}.bias", path + ("bias",), "vec"))

    def depthwise(self, torch_prefix: str, path: Tuple, wrapped: bool = True):
        stem = f"{torch_prefix}.conv" if wrapped else torch_prefix
        self.entries.append((f"{stem}.weight", path + ("kernel",), "conv"))

    def bn(self, torch_prefix: str, params_path: Tuple, state_path: Tuple):
        self.entries.append((f"{torch_prefix}.weight", params_path + ("scale",), "vec"))
        self.entries.append((f"{torch_prefix}.bias", params_path + ("bias",), "vec"))
        self.entries.append((f"{torch_prefix}.running_mean", ("__state__",) + state_path + ("mean",), "vec"))
        self.entries.append((f"{torch_prefix}.running_var", ("__state__",) + state_path + ("var",), "vec"))

    def raw(self, torch_key: str, path: Tuple):
        self.entries.append((torch_key, path, "vec"))

    def sep_conv(self, torch_prefix: str, path: Tuple, norm: bool = True, state_path: Tuple = None):
        self.depthwise(f"{torch_prefix}.depthwise_conv", path + ("depthwise",))
        self.conv(f"{torch_prefix}.pointwise_conv", path + ("pointwise",))
        if norm:
            self.bn(f"{torch_prefix}.bn", path + ("bn",), (state_path or path) + ("bn",))


def build_mapping(config: ModelConfig) -> _Mapper:
    """Full key mapping for a given phi."""
    m = _Mapper()
    coeff = config.backbone_coefficient
    specs = block_specs(coeff)

    # ---- EfficientNet backbone (plain nn.Conv2d: unwrapped keys) ----
    bb = ("backbone",)
    m.conv("backbone_net.model._conv_stem", bb + ("stem_conv",), bias=False, wrapped=False)
    m.bn("backbone_net.model._bn0", bb + ("stem_bn",), bb + ("stem_bn",))
    for i, spec in enumerate(specs):
        t = f"backbone_net.model._blocks.{i}"
        p = bb + ("blocks", i)
        if spec["expand_ratio"] != 1:
            m.conv(f"{t}._expand_conv", p + ("expand_conv",), bias=False, wrapped=False)
            m.bn(f"{t}._bn0", p + ("bn0",), p + ("bn0",))
        m.depthwise(f"{t}._depthwise_conv", p + ("depthwise_conv",), wrapped=False)
        m.bn(f"{t}._bn1", p + ("bn1",), p + ("bn1",))
        if spec["se_ratio"]:
            m.conv(f"{t}._se_reduce", p + ("se_reduce",), wrapped=False)
            m.conv(f"{t}._se_expand", p + ("se_expand",), wrapped=False)
        m.conv(f"{t}._project_conv", p + ("project_conv",), bias=False, wrapped=False)
        m.bn(f"{t}._bn2", p + ("bn2",), p + ("bn2",))

    # ---- BiFPN cells ----
    for i in range(config.fpn_cell_repeats):
        t = f"bifpn.{i}"
        p = ("bifpn", "cells", i)
        for name in ("conv6_up", "conv5_up", "conv4_up", "conv3_up",
                     "conv4_down", "conv5_down", "conv6_down", "conv7_down"):
            m.sep_conv(f"{t}.{name}", p + (name,))
        if i == 0:
            for name in ("p3_down_channel", "p4_down_channel", "p5_down_channel",
                         "p4_down_channel_2", "p5_down_channel_2", "p5_to_p6"):
                m.conv(f"{t}.{name}.0", p + (name, "conv"))
                m.bn(f"{t}.{name}.1", p + (name, "bn"), p + (name, "bn"))
        for w in ("p6_w1", "p5_w1", "p4_w1", "p3_w1", "p4_w2", "p5_w2", "p6_w2", "p7_w2"):
            m.raw(f"{t}.{w}", p + (w,))

    # ---- heads ----
    levels = config.num_pyramid_levels
    repeats = config.head_repeats

    def head(torch_name: str, tree_name: str, headers: Dict[str, str],
             iter_headers: Tuple[str, ...] = ()):
        t, p = torch_name, (tree_name,)
        for j in range(repeats):
            m.sep_conv(f"{t}.conv_list.{j}", p + ("convs", j), norm=False)
        for lv in range(levels):
            for j in range(repeats):
                m.bn(f"{t}.bn_list.{lv}.{j}", p + ("bns", lv, j), p + ("bns", lv, j))
        for torch_h, tree_h in headers.items():
            m.sep_conv(f"{t}.{torch_h}", p + (tree_h,), norm=False)
        # iterative refinement subnet (hmdegopose/model.py:232-346)
        if config.iter_steps >= 1 and iter_headers:
            it = f"{t}.iterative_submodel"
            ip = p + ("iter",)
            for j in range(repeats):
                m.sep_conv(f"{it}.conv_list.{j}", ip + ("convs", j), norm=False)
            for s in range(config.iter_steps):
                for j in range(repeats):
                    m.bn(f"{it}.norm_layer.{s}.{j}", ip + ("bns", s, j), ip + ("bns", s, j))
            for h_idx, torch_h in enumerate(iter_headers):
                m.sep_conv(f"{it}.{torch_h}", ip + ("headers", h_idx), norm=False)

    head("regressor", "regressor", {"header": "header"})
    head("classifier", "classifier", {"header": "header"})
    head("rotation_net", "rotation", {"initial_rotation": "header"}, iter_headers=("head",))
    head("hand_net", "hand", {"initial_hand_coords": "header"}, iter_headers=("head",))
    head("translation_net", "translation",
         {"initial_translation_xy": "header_xy", "initial_translation_z": "header_z"},
         iter_headers=("head_xy", "head_z"))
    return m


def _get(tree, path):
    node = tree
    for p in path:
        node = node[p]
    return node


def _set(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node[p]
    node[path[-1]] = value


def convert_torch_state_dict(
    state_dict: Dict[str, Any],
    params,
    bn_state,
    config: ModelConfig,
    strict: bool = True,
):
    """Fill (copies of) params/bn_state from a torch state_dict.

    ``params``/``bn_state`` provide the target structure and must be
    HOST-resident (numpy or CPU-backend — use ``hmd_ego_pose.init_host``):
    this function reads the template values, and reading accelerator
    buffers back is the permanent-degrade trigger on relay-attached TPUs
    (utils/device.py).  Every mapped tensor is shape-checked.
    """
    import jax

    for leaf in jax.tree.leaves((params, bn_state)):
        if isinstance(leaf, jax.Array) and any(
            d.platform != "cpu" for d in leaf.devices()
        ):
            raise ValueError(
                "convert_torch_state_dict needs a HOST-resident template "
                "(use hmd_ego_pose.init_host): reading accelerator buffers "
                "back permanently degrades relay-attached TPU sessions"
            )

    sd = strip_prefixes(state_dict)
    params = jax.tree.map(np.asarray, params)
    bn_state = jax.tree.map(np.asarray, bn_state)

    mapping = build_mapping(config)
    missing, converted = [], set()
    for torch_key, path, kind in mapping.entries:
        if torch_key not in sd:
            missing.append(torch_key)
            continue
        value = np.asarray(sd[torch_key], np.float32)
        if kind == "conv":
            value = _conv_oihw_to_hwio(value)
        if path[0] == "__state__":
            target_tree, path = bn_state, path[1:]
        else:
            target_tree = params
        expected = _get(target_tree, path)
        if expected.shape != value.shape:
            raise ValueError(
                f"shape mismatch for {torch_key} -> {'/'.join(map(str, path))}: "
                f"{value.shape} vs expected {expected.shape}"
            )
        _set(target_tree, path, value)
        converted.add(torch_key)

    ignorable = {k for k in sd if k.endswith("num_batches_tracked")}
    unused = set(sd) - converted - ignorable
    if strict and (missing or unused):
        raise ValueError(
            f"conversion mismatch: {len(missing)} missing keys (e.g. {missing[:3]}), "
            f"{len(unused)} unused keys (e.g. {sorted(unused)[:3]})"
        )
    return params, bn_state, {"missing": missing, "unused": sorted(unused)}


def export_torch_state_dict(params, bn_state, config: ModelConfig) -> Dict[str, np.ndarray]:
    """Inverse conversion: pytree -> reference-named torch state_dict (numpy)."""
    import jax

    params = jax.tree.map(np.asarray, jax.device_get(params))
    bn_state = jax.tree.map(np.asarray, jax.device_get(bn_state))
    out: Dict[str, np.ndarray] = {}
    for torch_key, path, kind in build_mapping(config).entries:
        if path[0] == "__state__":
            value = _get(bn_state, path[1:])
        else:
            value = _get(params, path)
        value = np.asarray(value)
        if kind == "conv":
            value = _conv_hwio_to_oihw(value)
        out[torch_key] = value
    return out
