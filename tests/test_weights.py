"""Weight-converter tests: roundtrip and reference-naming conformance."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from hmd_ego_pose_tpu.config import ModelConfig
from hmd_ego_pose_tpu.models import hmd_ego_pose
from hmd_ego_pose_tpu.models.weights import (
    convert_torch_state_dict,
    export_torch_state_dict,
    strip_prefixes,
)


@pytest.fixture(scope="module")
def model():
    cfg = ModelConfig(phi=0, image_size=128)
    params, state = hmd_ego_pose.init(jax.random.PRNGKey(0), cfg)
    return cfg, params, state


def test_export_key_names_match_reference_scheme(model):
    cfg, params, state = model
    sd = export_torch_state_dict(params, state, cfg)
    # canonical reference key spellings (backbone.py module tree)
    expected_samples = [
        "backbone_net.model._conv_stem.weight",
        "backbone_net.model._bn0.running_mean",
        "backbone_net.model._blocks.0._depthwise_conv.weight",
        "backbone_net.model._blocks.1._expand_conv.weight",
        "backbone_net.model._blocks.15._project_conv.weight",
        "bifpn.0.conv6_up.depthwise_conv.conv.weight",
        "bifpn.0.conv6_up.pointwise_conv.conv.bias",
        "bifpn.0.p5_to_p6.0.conv.weight",
        "bifpn.0.p5_to_p6.1.running_var",
        "bifpn.2.p6_w1",
        "regressor.conv_list.0.pointwise_conv.conv.weight",
        "regressor.bn_list.4.2.running_mean",
        "regressor.header.pointwise_conv.conv.bias",
        "classifier.header.pointwise_conv.conv.weight",
        "rotation_net.initial_rotation.pointwise_conv.conv.weight",
        "translation_net.initial_translation_xy.pointwise_conv.conv.weight",
        "translation_net.initial_translation_z.pointwise_conv.conv.weight",
        "hand_net.initial_hand_coords.pointwise_conv.conv.weight",
    ]
    for key in expected_samples:
        assert key in sd, key

    # torch layout shapes
    assert sd["backbone_net.model._conv_stem.weight"].shape == (32, 3, 3, 3)
    assert sd["backbone_net.model._blocks.0._depthwise_conv.weight"].shape == (32, 1, 3, 3)
    assert sd["classifier.header.pointwise_conv.conv.weight"].shape == (9, 64, 1, 1)
    assert sd["rotation_net.initial_rotation.pointwise_conv.conv.weight"].shape == (27, 64, 1, 1)
    assert sd["hand_net.initial_hand_coords.pointwise_conv.conv.weight"].shape == (567, 64, 1, 1)


def test_convert_roundtrip_is_identity(model):
    cfg, params, state = model
    sd = export_torch_state_dict(params, state, cfg)
    # prefix as a TrainModelWithLoss checkpoint would be
    sd_prefixed = {"model." + k: v for k, v in sd.items()}

    params2, state2, report = convert_torch_state_dict(sd_prefixed, params, state, cfg)
    assert not report["missing"] and not report["unused"]

    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(state2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_strip_prefixes_variants():
    sd = {
        "module.a": 1,
        "model.b": 2,
        "model.module.c": 3,
        "d": 4,
    }
    out = strip_prefixes(sd)
    assert set(out) == {"a", "b", "c", "d"}


def test_converted_weights_change_outputs(model):
    """Converting a perturbed checkpoint must actually change inference."""
    import jax.numpy as jnp

    cfg, params, state = model
    sd = export_torch_state_dict(params, state, cfg)
    rng = np.random.RandomState(0)
    sd2 = {k: v + rng.normal(scale=0.01, size=v.shape).astype(np.float32) for k, v in sd.items()}
    params2, state2, _ = convert_torch_state_dict(sd2, params, state, cfg)

    x = jnp.asarray(rng.normal(size=(1, 128, 128, 3)).astype(np.float32))
    out1, _ = hmd_ego_pose.apply(params, state, x, cfg)
    out2, _ = hmd_ego_pose.apply(params2, state2, x, cfg)
    assert float(jnp.max(jnp.abs(out1.regression - out2.regression))) > 1e-6


def test_convert_roundtrip_with_iterative_subnets():
    cfg = ModelConfig(phi=0, image_size=128, iter_steps=1)
    params, state = hmd_ego_pose.init(jax.random.PRNGKey(1), cfg)
    sd = export_torch_state_dict(params, state, cfg)
    assert "rotation_net.iterative_submodel.conv_list.0.depthwise_conv.conv.weight" in sd
    assert "translation_net.iterative_submodel.head_z.pointwise_conv.conv.weight" in sd
    assert "hand_net.iterative_submodel.norm_layer.0.1.running_var" in sd
    params2, state2, report = convert_torch_state_dict(sd, params, state, cfg)
    assert not report["missing"] and not report["unused"]
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_strict_conversion_catches_unknown_keys(model):
    cfg, params, state = model
    sd = export_torch_state_dict(params, state, cfg)
    sd["bogus.key"] = np.zeros(3, np.float32)
    with pytest.raises(ValueError, match="unused"):
        convert_torch_state_dict(sd, params, state, cfg)


def test_full_model_torch_oracle_forward_parity():
    """Round-2 gate (SURVEY §7 step 2): the COMPLETE reference architecture
    rebuilt in torch (tests/torch_ref.py, reference key naming), random
    weights + random BN running stats, converted through
    convert_torch_state_dict — all five head outputs must agree with
    hmd_ego_pose.apply to fp32 tolerance.  Proves the converter on a full
    forward so trained reference weights are plug-and-play
    (pytorch-sandbox/scratchpad.py:78-87 is the eventual oracle).
    """
    torch = pytest.importorskip("torch")

    from torch_ref import TorchHMDEgoPose, randomize_

    cfg = ModelConfig(phi=0, image_size=128, iter_steps=1)
    tm = TorchHMDEgoPose(cfg)
    randomize_(tm, seed=7)
    tm.eval()

    rng = np.random.RandomState(11)
    x = rng.normal(size=(1, 128, 128, 3)).astype(np.float32) * 0.5

    with torch.no_grad():
        t_reg, t_cls, t_rot, t_tra, t_hand = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    params, state = hmd_ego_pose.init(jax.random.PRNGKey(0), cfg)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params, state, report = convert_torch_state_dict(sd, params, state, cfg)
    assert not report["missing"] and not report["unused"], report

    out, _ = hmd_ego_pose.apply(jax.tree.map(jnp.asarray, params),
                                jax.tree.map(jnp.asarray, state), jnp.asarray(x), cfg)

    for name, ours, theirs in (
        ("regression", out.regression, t_reg),
        ("classification", out.classification, t_cls),
        ("rotation", out.rotation, t_rot),
        ("translation", out.translation_raw, t_tra),
        ("hand", out.hand, t_hand),
    ):
        np.testing.assert_allclose(
            np.asarray(ours), theirs.numpy(), rtol=2e-3, atol=2e-4,
            err_msg=f"head {name} diverged from the torch oracle",
        )
