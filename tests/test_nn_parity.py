"""Numerical parity of the NN primitives against torch (CPU) references.

The reference's weight-compatibility hinges on TF-style SAME padding
(pytorch-sandbox/efficientnet/utils_extra.py:9-87) and torch BatchNorm
semantics (momentum 0.01, eps 1e-3).  These tests build the equivalent torch
ops inline (from the documented formulas, not imported reference code) and
require agreement to float32 tolerance.
"""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from hmd_ego_pose_tpu.nn.core import (  # noqa: E402
    batch_norm_apply,
    conv_apply,
    depthwise_conv_apply,
    max_pool_same,
    resize_nearest_2x,
    same_padding,
    swish,
)


def _torch_same_pad(x, kernel, stride):
    """TF SAME padding in torch, as the reference does (utils_extra.py:33-47)."""
    h, w = x.shape[-2:]
    import math

    extra_h = (math.ceil(w / stride) - 1) * stride - w + kernel
    extra_v = (math.ceil(h / stride) - 1) * stride - h + kernel
    left = extra_h // 2
    top = extra_v // 2
    return F.pad(x, [left, extra_h - left, top, extra_v - top])


@pytest.mark.parametrize("size,kernel,stride", [(256, 3, 2), (15, 3, 1), (8, 5, 2), (7, 3, 2), (2, 3, 2)])
def test_same_padding_formula(size, kernel, stride):
    import math

    lo, hi = same_padding(size, kernel, stride)
    extra = (math.ceil(size / stride) - 1) * stride - size + kernel
    assert lo == extra // 2 and hi == extra - extra // 2


@pytest.mark.parametrize("stride,kernel,in_ch,out_ch,hw", [(1, 1, 8, 16, 9), (2, 3, 3, 32, 15), (1, 3, 8, 8, 8), (2, 5, 4, 8, 13)])
def test_conv_matches_torch(stride, kernel, in_ch, out_ch, hw):
    rng = np.random.RandomState(0)
    x = rng.normal(size=(2, hw, hw, in_ch)).astype(np.float32)
    w = rng.normal(scale=0.1, size=(kernel, kernel, in_ch, out_ch)).astype(np.float32)
    b = rng.normal(size=(out_ch,)).astype(np.float32)

    got = np.asarray(conv_apply({"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}, jnp.asarray(x), stride=stride))

    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    wt = torch.from_numpy(w.transpose(3, 2, 0, 1))  # HWIO -> OIHW
    xt = _torch_same_pad(xt, kernel, stride)
    yt = F.conv2d(xt, wt, torch.from_numpy(b), stride=stride)
    expected = yt.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)


def test_depthwise_conv_matches_torch():
    rng = np.random.RandomState(1)
    ch, hw, kernel, stride = 16, 13, 3, 2
    x = rng.normal(size=(2, hw, hw, ch)).astype(np.float32)
    w = rng.normal(scale=0.1, size=(kernel, kernel, 1, ch)).astype(np.float32)

    got = np.asarray(depthwise_conv_apply({"kernel": jnp.asarray(w)}, jnp.asarray(x), stride=stride))

    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    # HWIO (I=1, O=ch) -> torch depthwise OIHW (ch, 1, kh, kw)
    wt = torch.from_numpy(w.transpose(3, 2, 0, 1))
    xt = _torch_same_pad(xt, kernel, stride)
    yt = F.conv2d(xt, wt, None, stride=stride, groups=ch)
    expected = yt.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)


def test_max_pool_matches_torch():
    rng = np.random.RandomState(2)
    x = rng.normal(size=(2, 15, 15, 8)).astype(np.float32)
    got = np.asarray(max_pool_same(jnp.asarray(x), kernel=3, stride=2))
    xt = _torch_same_pad(torch.from_numpy(x.transpose(0, 3, 1, 2)), 3, 2)
    # pad with -inf for pooling correctness: replicate via masking large negative
    yt = F.max_pool2d(xt, 3, 2)
    expected = yt.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


def test_batch_norm_matches_torch_eval_and_train():
    rng = np.random.RandomState(3)
    ch = 6
    x = rng.normal(size=(4, 5, 5, ch)).astype(np.float32)
    scale = rng.uniform(0.5, 1.5, ch).astype(np.float32)
    bias = rng.normal(size=ch).astype(np.float32)
    mean = rng.normal(size=ch).astype(np.float32)
    var = rng.uniform(0.5, 2.0, ch).astype(np.float32)

    params = {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}
    state = {"mean": jnp.asarray(mean), "var": jnp.asarray(var)}

    bn = torch.nn.BatchNorm2d(ch, momentum=0.01, eps=1e-3)
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(scale))
        bn.bias.copy_(torch.from_numpy(bias))
        bn.running_mean.copy_(torch.from_numpy(mean))
        bn.running_var.copy_(torch.from_numpy(var))
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))

    # eval mode
    bn.eval()
    y, new_state = batch_norm_apply(params, state, jnp.asarray(x), training=False)
    expected = bn(xt).detach().numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(y), expected, rtol=1e-4, atol=1e-5)

    # train mode: output + running-stat update
    bn.train()
    y, new_state = batch_norm_apply(params, state, jnp.asarray(x), training=True)
    expected = bn(xt).detach().numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(y), expected, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(new_state["mean"]), bn.running_mean.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state["var"]), bn.running_var.numpy(), rtol=1e-4, atol=1e-5)


def test_swish_matches_torch():
    x = np.linspace(-5, 5, 101).astype(np.float32)
    got = np.asarray(swish(jnp.asarray(x)))
    expected = F.silu(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_mbconv_block_matches_torch_composite():
    """Full MBConv (expand -> dw -> SE -> project -> skip) vs a torch
    re-derivation with identical weights — validates the converter's layout
    transposes end-to-end."""
    import jax
    import jax.numpy as jnp2

    from hmd_ego_pose_tpu.models.efficientnet import _mbconv_apply, _mbconv_init

    spec = dict(stage=2, kernel=3, stride=1, expand_ratio=6, in_ch=16, out_ch=16, se_ratio=0.25)
    params, state = _mbconv_init(jax.random.PRNGKey(0), spec)

    rng = np.random.RandomState(0)
    x = rng.normal(size=(2, 8, 8, 16)).astype(np.float32)

    got, _ = _mbconv_apply(params, state, jnp2.asarray(x), spec, training=False,
                           drop_rate=0.0, rng=None, axis_name=None)
    got = np.asarray(got)

    # torch re-derivation (eval-mode BN with our running stats)
    def t(v):
        return torch.from_numpy(np.asarray(v))

    def conv_t(p, xt, stride=1, groups=1, kernel=1):
        w = t(p["kernel"]).permute(3, 2, 0, 1)
        if groups > 1:
            pass  # depthwise HWIO (k,k,1,C) -> (C,1,k,k) handled by permute
        xt = _torch_same_pad(xt, kernel, stride)
        return F.conv2d(xt, w, t(p["bias"]) if "bias" in p else None, stride=stride, groups=groups)

    def bn_t(p, s, xt):
        return F.batch_norm(xt, t(s["mean"]), t(s["var"]), t(p["scale"]), t(p["bias"]),
                            training=False, eps=1e-3)

    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    inputs = xt
    xt = F.silu(bn_t(params["bn0"], state["bn0"], conv_t(params["expand_conv"], xt)))
    xt = F.silu(bn_t(params["bn1"], state["bn1"],
                     conv_t(params["depthwise_conv"], xt, stride=1, groups=96, kernel=3)))
    se = F.adaptive_avg_pool2d(xt, 1)
    se = F.silu(conv_t(params["se_reduce"], se))
    se = conv_t(params["se_expand"], se)
    xt = torch.sigmoid(se) * xt
    xt = bn_t(params["bn2"], state["bn2"], conv_t(params["project_conv"], xt))
    xt = xt + inputs
    expected = xt.numpy().transpose(0, 2, 3, 1)

    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)


def test_bifpn_first_cell_matches_torch_composite():
    """Full first BiFPN cell vs a torch re-derivation with identical weights:
    covers down-channel aligners, P6/P7 synthesis, fast-attention fusion,
    zero-padded max-pool downsampling, and nearest upsampling."""
    import jax
    import jax.numpy as jnp2

    from hmd_ego_pose_tpu.models.bifpn import cell_apply, cell_init

    num_ch, conv_ch = 16, (8, 12, 20)
    params, state = cell_init(jax.random.PRNGKey(0), num_ch, conv_ch, first_time=True)
    rng = np.random.RandomState(0)
    p3 = rng.normal(size=(1, 16, 16, 8)).astype(np.float32)
    p4 = rng.normal(size=(1, 8, 8, 12)).astype(np.float32)
    p5 = rng.normal(size=(1, 4, 4, 20)).astype(np.float32)

    (o3, o4, o5, o6, o7), _ = cell_apply(
        params, state, (jnp2.asarray(p3), jnp2.asarray(p4), jnp2.asarray(p5)),
        first_time=True, attention=True,
    )

    # ---- torch re-derivation ----
    def t(v):
        return torch.from_numpy(np.asarray(v))

    def conv(p, xt, kernel=1, stride=1, groups=1):
        w = t(p["kernel"]).permute(3, 2, 0, 1)
        xt = _torch_same_pad(xt, kernel, stride)
        return F.conv2d(xt, w, t(p["bias"]) if "bias" in p else None, stride=stride, groups=groups)

    def bn(p, s, xt):
        return F.batch_norm(xt, t(s["mean"]), t(s["var"]), t(p["scale"]), t(p["bias"]),
                            training=False, eps=1e-3)

    def align(name, xt):
        return bn(params[name]["bn"], state[name]["bn"], conv(params[name]["conv"], xt))

    def sep(name, xt):
        node, s = params[name], state[name]
        ch = node["depthwise"]["kernel"].shape[3]
        xt = conv(node["depthwise"], xt, kernel=3, groups=ch)
        xt = conv(node["pointwise"], xt)
        return bn(node["bn"], s["bn"], xt)

    def pool(xt):  # zero-padded SAME max pool, stride 2
        return F.max_pool2d(_torch_same_pad(xt, 3, 2), 3, 2)

    def fuse(wname, tensors):
        w = F.relu(t(params[wname]))
        w = w / (w.sum() + 1e-4)
        return F.silu(sum(w[i] * x for i, x in enumerate(tensors)))

    up = lambda xt: F.interpolate(xt, scale_factor=2, mode="nearest")

    p3t = torch.from_numpy(p3.transpose(0, 3, 1, 2))
    p4t = torch.from_numpy(p4.transpose(0, 3, 1, 2))
    p5t = torch.from_numpy(p5.transpose(0, 3, 1, 2))

    p6_in = pool(align("p5_to_p6", p5t))
    p7_in = pool(p6_in)
    p3_in = align("p3_down_channel", p3t)
    p4_in = align("p4_down_channel", p4t)
    p5_in = align("p5_down_channel", p5t)

    p6_up = sep("conv6_up", fuse("p6_w1", [p6_in, up(p7_in)]))
    p5_up = sep("conv5_up", fuse("p5_w1", [p5_in, up(p6_up)]))
    p4_up = sep("conv4_up", fuse("p4_w1", [p4_in, up(p5_up)]))
    p3_out = sep("conv3_up", fuse("p3_w1", [p3_in, up(p4_up)]))

    p4_in2 = align("p4_down_channel_2", p4t)
    p5_in2 = align("p5_down_channel_2", p5t)
    p4_out = sep("conv4_down", fuse("p4_w2", [p4_in2, p4_up, pool(p3_out)]))
    p5_out = sep("conv5_down", fuse("p5_w2", [p5_in2, p5_up, pool(p4_out)]))
    p6_out = sep("conv6_down", fuse("p6_w2", [p6_in, p6_up, pool(p5_out)]))
    p7_out = sep("conv7_down", fuse("p7_w2", [p7_in, pool(p6_out)]))

    for ours, theirs in ((o3, p3_out), (o4, p4_out), (o5, p5_out), (o6, p6_out), (o7, p7_out)):
        np.testing.assert_allclose(
            np.asarray(ours), theirs.numpy().transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-4
        )


def test_resize_nearest_matches_torch():
    rng = np.random.RandomState(4)
    x = rng.normal(size=(1, 4, 4, 3)).astype(np.float32)
    got = np.asarray(resize_nearest_2x(jnp.asarray(x)))
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    expected = F.interpolate(xt, scale_factor=2, mode="nearest").numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, expected)
