"""Torch re-derivation of the full reference architecture (test oracle).

Built inline from the documented formulas — NOT imported reference code — with
the reference's exact state_dict naming (pytorch-sandbox/backbone.py module
tree), so that `models.weights.convert_torch_state_dict` can map a checkpoint
of this module onto the jax pytree and the two full forwards can be diffed.

Naming contract being exercised (see weights.py docstring):
* backbone convs are plain nn.Conv2d subclasses -> unwrapped keys
  (``backbone_net.model._conv_stem.weight``);
* BiFPN/head convs wrap the conv -> ``...depthwise_conv.conv.weight``;
* BiFPN down-channel paths are Sequentials -> ``p5_down_channel.0.conv.*``;
* heads: conv_list / bn_list[level][j] / named headers / iterative_submodel.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F

from hmd_ego_pose_tpu.config import EFFICIENTNET_PARAMS
from hmd_ego_pose_tpu.models.efficientnet import block_specs, round_filters


def same_pad(x, kernel, stride):
    """TF SAME zero-padding (utils_extra.py:33-47)."""
    h, w = x.shape[-2:]
    extra_h = (math.ceil(w / stride) - 1) * stride - w + kernel
    extra_v = (math.ceil(h / stride) - 1) * stride - h + kernel
    left, top = extra_h // 2, extra_v // 2
    return F.pad(x, [left, extra_h - left, top, extra_v - top])


class PlainSameConv(nn.Conv2d):
    """Backbone conv: nn.Conv2d subclass (unwrapped keys) with SAME pad."""

    def __init__(self, cin, cout, kernel, stride=1, groups=1, bias=True):
        super().__init__(cin, cout, kernel, stride=stride, groups=groups, bias=bias)
        self._k, self._s = kernel, stride

    def forward(self, x):
        x = same_pad(x, self._k, self._s)
        return F.conv2d(x, self.weight, self.bias, self.stride, 0, self.dilation, self.groups)


class WrappedSameConv(nn.Module):
    """BiFPN/head conv: wraps nn.Conv2d as ``.conv`` (wrapped keys)."""

    def __init__(self, cin, cout, kernel, stride=1, groups=1, bias=True):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, kernel, stride=stride, groups=groups, bias=bias)
        self._k, self._s = kernel, stride

    def forward(self, x):
        return self.conv(same_pad(x, self._k, self._s))


class SepConv(nn.Module):
    """Depthwise 3x3 (no bias) + pointwise 1x1 (bias) [+ BN]."""

    def __init__(self, cin, cout, norm=True):
        super().__init__()
        self.depthwise_conv = WrappedSameConv(cin, cin, 3, groups=cin, bias=False)
        self.pointwise_conv = WrappedSameConv(cin, cout, 1, bias=True)
        if norm:
            self.bn = nn.BatchNorm2d(cout, momentum=0.01, eps=1e-3)
        self._norm = norm

    def forward(self, x):
        x = self.pointwise_conv(self.depthwise_conv(x))
        return self.bn(x) if self._norm else x


def bn2d(ch):
    return nn.BatchNorm2d(ch, momentum=0.01, eps=1e-3)


def pool_same(x):
    """Zero-padded SAME 3x3/stride-2 max pool (reference quirk)."""
    return F.max_pool2d(same_pad(x, 3, 2), 3, 2)


# ---------------------------------------------------------------------------
# Backbone
# ---------------------------------------------------------------------------


class MBConvTorch(nn.Module):
    def __init__(self, spec):
        super().__init__()
        self.spec = spec
        cin, cout, expand = spec["in_ch"], spec["out_ch"], spec["expand_ratio"]
        mid = cin * expand
        if expand != 1:
            self._expand_conv = PlainSameConv(cin, mid, 1, bias=False)
            self._bn0 = bn2d(mid)
        self._depthwise_conv = PlainSameConv(mid, mid, spec["kernel"], stride=spec["stride"],
                                             groups=mid, bias=False)
        self._bn1 = bn2d(mid)
        if spec["se_ratio"]:
            se_ch = max(1, int(cin * spec["se_ratio"]))
            self._se_reduce = PlainSameConv(mid, se_ch, 1, bias=True)
            self._se_expand = PlainSameConv(se_ch, mid, 1, bias=True)
        self._project_conv = PlainSameConv(mid, cout, 1, bias=False)
        self._bn2 = bn2d(cout)

    def forward(self, x):
        inputs = x
        if self.spec["expand_ratio"] != 1:
            x = F.silu(self._bn0(self._expand_conv(x)))
        x = F.silu(self._bn1(self._depthwise_conv(x)))
        if self.spec["se_ratio"]:
            se = F.adaptive_avg_pool2d(x, 1)
            se = self._se_expand(F.silu(self._se_reduce(se)))
            x = torch.sigmoid(se) * x
        x = self._bn2(self._project_conv(x))
        if self.spec["stride"] == 1 and self.spec["in_ch"] == self.spec["out_ch"]:
            x = x + inputs
        return x


class EfficientNetTorch(nn.Module):
    """Named ``model`` inside BackboneWrapper -> backbone_net.model.* keys."""

    def __init__(self, coefficient):
        super().__init__()
        specs = block_specs(coefficient)
        width = EFFICIENTNET_PARAMS[coefficient][0]
        stem = round_filters(32, width)
        self._conv_stem = PlainSameConv(3, stem, 3, stride=2, bias=False)
        self._bn0 = bn2d(stem)
        self._blocks = nn.ModuleList([MBConvTorch(s) for s in specs])
        self._specs = specs

    def forward(self, x):
        x = F.silu(self._bn0(self._conv_stem(x)))
        feats = []
        for i, block in enumerate(self._blocks):
            x = block(x)
            spec = self._specs[i]
            last_of_stage = i + 1 == len(self._specs) or self._specs[i + 1]["stage"] != spec["stage"]
            if last_of_stage and spec["stage"] in (3, 5, 7):
                feats.append(x)
        return feats  # [P3, P4, P5]


class BackboneWrapper(nn.Module):
    def __init__(self, coefficient):
        super().__init__()
        self.model = EfficientNetTorch(coefficient)

    def forward(self, x):
        return self.model(x)


# ---------------------------------------------------------------------------
# BiFPN
# ---------------------------------------------------------------------------


class BiFPNCellTorch(nn.Module):
    def __init__(self, num_ch, conv_channels, first_time):
        super().__init__()
        self.first_time = first_time
        for name in ("conv6_up", "conv5_up", "conv4_up", "conv3_up",
                     "conv4_down", "conv5_down", "conv6_down", "conv7_down"):
            setattr(self, name, SepConv(num_ch, num_ch))
        if first_time:
            c3, c4, c5 = conv_channels
            for name, cin in (("p3_down_channel", c3), ("p4_down_channel", c4),
                              ("p5_down_channel", c5), ("p5_to_p6", c5),
                              ("p4_down_channel_2", c4), ("p5_down_channel_2", c5)):
                setattr(self, name, nn.Sequential(WrappedSameConv(cin, num_ch, 1), bn2d(num_ch)))
        for name, n in (("p6_w1", 2), ("p5_w1", 2), ("p4_w1", 2), ("p3_w1", 2),
                        ("p4_w2", 3), ("p5_w2", 3), ("p6_w2", 3), ("p7_w2", 2)):
            setattr(self, name, nn.Parameter(torch.ones(n)))

    def _fuse(self, wname, tensors):
        w = F.relu(getattr(self, wname))
        w = w / (w.sum() + 1e-4)
        return F.silu(sum(w[i] * t for i, t in enumerate(tensors)))

    def forward(self, features):
        up = lambda x: F.interpolate(x, scale_factor=2, mode="nearest")
        if self.first_time:
            p3, p4, p5 = features
            p6_in = pool_same(self.p5_to_p6(p5))
            p7_in = pool_same(p6_in)
            p3_in = self.p3_down_channel(p3)
            p4_in = self.p4_down_channel(p4)
            p5_in = self.p5_down_channel(p5)
        else:
            p3_in, p4_in, p5_in, p6_in, p7_in = features

        p6_up = self.conv6_up(self._fuse("p6_w1", [p6_in, up(p7_in)]))
        p5_up = self.conv5_up(self._fuse("p5_w1", [p5_in, up(p6_up)]))
        p4_up = self.conv4_up(self._fuse("p4_w1", [p4_in, up(p5_up)]))
        p3_out = self.conv3_up(self._fuse("p3_w1", [p3_in, up(p4_up)]))

        if self.first_time:
            p4_in = self.p4_down_channel_2(features[1])
            p5_in = self.p5_down_channel_2(features[2])

        p4_out = self.conv4_down(self._fuse("p4_w2", [p4_in, p4_up, pool_same(p3_out)]))
        p5_out = self.conv5_down(self._fuse("p5_w2", [p5_in, p5_up, pool_same(p4_out)]))
        p6_out = self.conv6_down(self._fuse("p6_w2", [p6_in, p6_up, pool_same(p5_out)]))
        p7_out = self.conv7_down(self._fuse("p7_w2", [p7_in, pool_same(p6_out)]))
        return p3_out, p4_out, p5_out, p6_out, p7_out


# ---------------------------------------------------------------------------
# Heads
# ---------------------------------------------------------------------------


def _flatten(x, out_dim):
    b = x.shape[0]
    return x.permute(0, 2, 3, 1).reshape(b, -1, out_dim)


class IterSubnetTorch(nn.Module):
    """Delta-regression refinement (hmdegopose/model.py:232-346)."""

    def __init__(self, in_ch, concat_ch, header_names, header_dims, repeats, steps):
        super().__init__()
        self.conv_list = nn.ModuleList(
            [SepConv(concat_ch if j == 0 else in_ch, in_ch, norm=False) for j in range(repeats)]
        )
        self.norm_layer = nn.ModuleList(
            [nn.ModuleList([bn2d(in_ch) for _ in range(repeats)]) for _ in range(steps)]
        )
        for name, dim in zip(header_names, header_dims):
            setattr(self, name, SepConv(in_ch, dim, norm=False))
        self._header_names = header_names
        self._steps = steps

    def forward(self, feat, preds):
        preds = list(preds)
        for step in range(self._steps):
            x = torch.cat([feat] + preds, dim=1)
            for j, conv in enumerate(self.conv_list):
                x = F.silu(self.norm_layer[step][j](conv(x)))
            for h_idx, name in enumerate(self._header_names):
                preds[h_idx] = preds[h_idx] + getattr(self, name)(x)
        return preds


class HeadTorch(nn.Module):
    def __init__(self, in_ch, out_dim, num_anchors, repeats, levels,
                 header_name="header", iter_steps=0, iter_header_names=()):
        super().__init__()
        self.conv_list = nn.ModuleList([SepConv(in_ch, in_ch, norm=False) for _ in range(repeats)])
        self.bn_list = nn.ModuleList(
            [nn.ModuleList([bn2d(in_ch) for _ in range(repeats)]) for _ in range(levels)]
        )
        setattr(self, header_name, SepConv(in_ch, num_anchors * out_dim, norm=False))
        self._header_name = header_name
        self._out_dim = out_dim
        if iter_steps >= 1:
            self.iterative_submodel = IterSubnetTorch(
                in_ch, in_ch + num_anchors * out_dim, iter_header_names,
                (num_anchors * out_dim,), repeats, iter_steps,
            )
        self._iter = iter_steps

    def forward(self, features):
        outs = []
        for lv, feat in enumerate(features):
            for j, conv in enumerate(self.conv_list):
                feat = F.silu(self.bn_list[lv][j](conv(feat)))
            pred = getattr(self, self._header_name)(feat)
            if self._iter >= 1:
                (pred,) = self.iterative_submodel(feat, [pred])
            outs.append(_flatten(pred, self._out_dim))
        return torch.cat(outs, dim=1)


class TranslationHeadTorch(nn.Module):
    def __init__(self, in_ch, num_anchors, repeats, levels, iter_steps=0):
        super().__init__()
        self.conv_list = nn.ModuleList([SepConv(in_ch, in_ch, norm=False) for _ in range(repeats)])
        self.bn_list = nn.ModuleList(
            [nn.ModuleList([bn2d(in_ch) for _ in range(repeats)]) for _ in range(levels)]
        )
        self.initial_translation_xy = SepConv(in_ch, num_anchors * 2, norm=False)
        self.initial_translation_z = SepConv(in_ch, num_anchors, norm=False)
        if iter_steps >= 1:
            self.iterative_submodel = IterSubnetTorch(
                in_ch, in_ch + num_anchors * 3, ("head_xy", "head_z"),
                (num_anchors * 2, num_anchors), repeats, iter_steps,
            )
        self._iter = iter_steps

    def forward(self, features):
        outs = []
        for lv, feat in enumerate(features):
            for j, conv in enumerate(self.conv_list):
                feat = F.silu(self.bn_list[lv][j](conv(feat)))
            xy = self.initial_translation_xy(feat)
            z = self.initial_translation_z(feat)
            if self._iter >= 1:
                xy, z = self.iterative_submodel(feat, [xy, z])
            outs.append(torch.cat([_flatten(xy, 2), _flatten(z, 1)], dim=-1))
        return torch.cat(outs, dim=1)


# ---------------------------------------------------------------------------
# Full model
# ---------------------------------------------------------------------------


class TorchHMDEgoPose(nn.Module):
    """Full reference model (backbone.py:13-133) with reference key naming."""

    def __init__(self, config):
        super().__init__()
        fpn_ch = config.fpn_num_filters
        levels = config.num_pyramid_levels
        repeats = config.head_repeats
        na = config.num_anchors_per_location

        self.backbone_net = BackboneWrapper(config.backbone_coefficient)
        self.bifpn = nn.ModuleList(
            [BiFPNCellTorch(fpn_ch, config.conv_channels, first_time=(i == 0))
             for i in range(config.fpn_cell_repeats)]
        )
        self.regressor = HeadTorch(fpn_ch, 4, na, repeats, levels)
        self.classifier = HeadTorch(fpn_ch, config.num_classes, na, repeats, levels)
        self.rotation_net = HeadTorch(
            fpn_ch, config.num_rotation_parameters, na, repeats, levels,
            header_name="initial_rotation", iter_steps=config.iter_steps,
            iter_header_names=("head",),
        )
        self.translation_net = TranslationHeadTorch(
            fpn_ch, na, repeats, levels, iter_steps=config.iter_steps
        )
        self.hand_net = HeadTorch(
            fpn_ch, config.num_hand_parameters, na, repeats, levels,
            header_name="initial_hand_coords", iter_steps=config.iter_steps,
            iter_header_names=("head",),
        )
        self._attention = config.phi < 6

    def forward(self, x):
        feats = self.backbone_net(x)
        features = feats
        for cell in self.bifpn:
            features = cell(features)
        regression = self.regressor(features)
        classification = torch.sigmoid(self.classifier(features))
        rotation = self.rotation_net(features)
        translation = self.translation_net(features)
        hand = self.hand_net(features)
        return regression, classification, rotation, translation, hand


def randomize_(model: nn.Module, seed: int = 0) -> None:
    """Fill every tensor (weights AND BN running stats) with non-trivial
    random values so identity defaults can't mask converter mapping bugs."""
    g = torch.Generator().manual_seed(seed)
    sd = model.state_dict()
    with torch.no_grad():
        for k, v in sd.items():
            if v.dtype not in (torch.float32, torch.float64):
                continue  # num_batches_tracked
            if "running_var" in k:
                v.copy_(torch.empty_like(v).uniform_(0.5, 1.5, generator=g))
            elif "running_mean" in k:
                v.copy_(torch.empty_like(v).normal_(0.0, 0.2, generator=g))
            elif k.endswith((".p6_w1", ".p5_w1", ".p4_w1", ".p3_w1",
                             ".p4_w2", ".p5_w2", ".p6_w2", ".p7_w2")):
                v.copy_(torch.empty_like(v).uniform_(0.2, 1.2, generator=g))
            elif "bn" in k.lower() and k.endswith(".weight") and v.ndim == 1:
                v.copy_(torch.empty_like(v).uniform_(0.6, 1.4, generator=g))
            else:
                v.copy_(torch.empty_like(v).normal_(0.0, 0.05, generator=g))
