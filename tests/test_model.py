"""Structural tests for the full HMDEgoPose model."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from hmd_ego_pose_tpu.config import ModelConfig
from hmd_ego_pose_tpu.models import efficientnet, hmd_ego_pose
from hmd_ego_pose_tpu.models.efficientnet import block_specs, round_filters, round_repeats


def small_config(image_size=128, iter_steps=0):
    return ModelConfig(phi=0, image_size=image_size, iter_steps=iter_steps)


def test_block_specs_b0():
    specs = block_specs(0)
    assert len(specs) == 16
    strides = [s["stride"] for s in specs]
    assert strides.count(2) == 4  # stages 2, 3, 4, 6 downsample
    assert specs[0]["in_ch"] == 32 and specs[0]["out_ch"] == 16
    assert specs[-1]["out_ch"] == 320


def test_round_filters_and_repeats():
    # b0 identity
    assert round_filters(32, 1.0) == 32
    # b2 (width 1.1): 32 -> 32, 320 -> 352
    assert round_filters(32, 1.1) == 32
    assert round_filters(320, 1.1) == 352
    assert round_repeats(3, 1.2) == 4


def test_backbone_feature_shapes():
    key = jax.random.PRNGKey(0)
    params, state = efficientnet.init(key, 0)
    x = jnp.zeros((1, 128, 128, 3))
    (p3, p4, p5), _ = efficientnet.apply(params, state, x)
    assert p3.shape == (1, 16, 16, 40)
    assert p4.shape == (1, 8, 8, 112)
    assert p5.shape == (1, 4, 4, 320)


def test_model_output_shapes():
    cfg = small_config()
    key = jax.random.PRNGKey(0)
    params, state = hmd_ego_pose.init(key, cfg)
    x = jnp.zeros((2, 128, 128, 3))
    out, new_state = hmd_ego_pose.apply(params, state, x, cfg)

    n = cfg.total_anchors
    assert n == (16 ** 2 + 8 ** 2 + 4 ** 2 + 2 ** 2 + 1) * 9
    assert out.regression.shape == (2, n, 4)
    assert out.classification.shape == (2, n, 1)
    assert out.rotation.shape == (2, n, 3)
    assert out.translation_raw.shape == (2, n, 3)
    assert out.hand.shape == (2, n, 63)
    assert len(out.features) == 5
    # classification is sigmoided
    c = np.asarray(out.classification)
    assert c.min() >= 0 and c.max() <= 1


def test_model_with_iterative_refinement():
    cfg = small_config(iter_steps=1)
    key = jax.random.PRNGKey(1)
    params, state = hmd_ego_pose.init(key, cfg)
    x = jnp.zeros((1, 128, 128, 3))
    out, _ = hmd_ego_pose.apply(params, state, x, cfg)
    assert out.rotation.shape == (1, cfg.total_anchors, 3)
    assert out.translation_raw.shape == (1, cfg.total_anchors, 3)
    assert out.hand.shape == (1, cfg.total_anchors, 63)


def test_predict_end_to_end():
    cfg = small_config()
    key = jax.random.PRNGKey(2)
    params, state = hmd_ego_pose.init(key, cfg)
    images = jax.random.normal(key, (1, 128, 128, 3)) * 0.1
    cam = jnp.array([[572.4, 573.5, 64.0, 64.0, 1000.0, 0.5]])

    predict_fn = hmd_ego_pose.make_predict_fn(cfg, score_threshold=0.01, max_detections=10)
    det = predict_fn(params, state, images, cam)
    assert det.boxes.shape == (1, 10, 4)
    assert det.translation.shape == (1, 10, 3)
    assert det.hand.shape == (1, 10, 63)
    assert int(det.num_valid[0]) >= 0


def test_phi1_model_family():
    """Scaling tables beyond phi 0: b1 backbone (depth 1.1), 88-ch BiFPN x4."""
    cfg = ModelConfig(phi=1, image_size=128)
    assert cfg.fpn_num_filters == 88
    assert cfg.fpn_cell_repeats == 4
    specs = block_specs(1)
    assert len(specs) == 23  # depth multiplier 1.1 rounds stage repeats up
    params, state = hmd_ego_pose.init(jax.random.PRNGKey(0), cfg)
    out, _ = hmd_ego_pose.apply(params, state, jnp.zeros((1, 128, 128, 3)), cfg)
    assert out.regression.shape == (1, cfg.total_anchors, 4)
    assert out.hand.shape == (1, cfg.total_anchors, 63)


def test_activation_capture():
    cfg = small_config()
    params, state = hmd_ego_pose.init(jax.random.PRNGKey(0), cfg)
    capture = {}
    hmd_ego_pose.apply(params, state, jnp.zeros((1, 128, 128, 3)), cfg, capture=capture)
    assert capture["backbone.p3"].shape == (1, 16, 16, 40)
    assert capture["bifpn.cell0.p3"].shape == (1, 16, 16, 64)
    assert capture["bifpn.cell2.p7"].shape == (1, 1, 1, 64)
    assert len([k for k in capture if k.startswith("bifpn")]) == 3 * 5


def test_param_count_phi0_reasonable():
    """EfficientPose-phi0 should be in the ~4M parameter regime."""
    cfg = small_config()
    params, _ = hmd_ego_pose.init(jax.random.PRNGKey(0), cfg)
    n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    assert 3_000_000 < n < 6_000_000, n


def test_bn_config_is_threaded():
    """ModelConfig.bn_epsilon / fusion_epsilon must reach every norm site.

    Regression for round-1 'decorative config fields': the modules used to
    hard-code BN_MOMENTUM/BN_EPS copies, so setting the field did nothing.
    """
    cfg = small_config(image_size=128)
    params, state = hmd_ego_pose.init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 128, 128, 3), jnp.float32)

    base, _ = hmd_ego_pose.apply(params, state, x, cfg)

    cfg_eps = dataclasses.replace(cfg, bn_epsilon=10.0)
    out_eps, _ = hmd_ego_pose.apply(params, state, x, cfg_eps)
    assert not np.allclose(np.asarray(base.regression), np.asarray(out_eps.regression)), (
        "bn_epsilon change did not affect the forward pass — field is decorative"
    )

    cfg_fus = dataclasses.replace(cfg, fusion_epsilon=5.0)
    out_fus, _ = hmd_ego_pose.apply(params, state, x, cfg_fus)
    assert not np.allclose(np.asarray(base.regression), np.asarray(out_fus.regression)), (
        "fusion_epsilon change did not affect the forward pass — field is decorative"
    )

    # bn_momentum only matters in training mode (running-stat EMA update)
    cfg_mom = dataclasses.replace(cfg, bn_momentum=0.9)
    _, ns_base = hmd_ego_pose.apply(
        params, state, x, cfg, training=True, rng=jax.random.PRNGKey(2))
    _, ns_mom = hmd_ego_pose.apply(
        params, state, x, cfg_mom, training=True, rng=jax.random.PRNGKey(2))
    v0 = np.asarray(ns_base["backbone"]["stem_bn"]["mean"])
    v1 = np.asarray(ns_mom["backbone"]["stem_bn"]["mean"])
    assert not np.allclose(v0, v1), "bn_momentum change did not affect EMA update"


def test_init_accepts_int_seed():
    """init(seed) must equal init(PRNGKey(seed)) — the int form is the
    host-side key path used by every accelerator entry point (an
    accelerator-resident key would force init onto the device; see
    hmd_ego_pose.init / utils/device.py docstrings)."""
    cfg = small_config()
    p_int, s_int = hmd_ego_pose.init(0, cfg)
    p_key, s_key = hmd_ego_pose.init(jax.random.PRNGKey(0), cfg)
    for a, b in zip(jax.tree.leaves((p_int, s_int)), jax.tree.leaves((p_key, s_key))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_remat_backbone_same_outputs_and_grads():
    """remat_backbone trades FLOPs for HBM bytes (memory-bound train step);
    it must not change forward outputs or parameter gradients."""
    cfg = small_config()
    cfg_remat = dataclasses.replace(cfg, remat_backbone=True)
    params, state = hmd_ego_pose.init(0, cfg)
    images = jnp.asarray(
        np.random.RandomState(0).normal(size=(1, 128, 128, 3)).astype(np.float32)
    )
    rng = jax.random.PRNGKey(3)

    def loss(p, c):
        out, _ = hmd_ego_pose.apply(p, state, images, c, training=True, rng=rng)
        return sum(jnp.sum(jnp.abs(t.astype(jnp.float32))) for t in
                   (out.classification, out.regression, out.rotation,
                    out.translation_raw, out.hand))

    v0, g0 = jax.value_and_grad(loss)(params, cfg)
    v1, g1 = jax.value_and_grad(loss)(params, cfg_remat)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6)


def test_predict_hand_relative_reanchors_on_predicted_translation():
    """ModelConfig.hand_relative: same params/weights, predict() with the
    flag must return hand == (flag-off hand) + predicted translation tiled
    over the 21 joints (mm -> m) on every valid detection — the exact
    inverse of the training-target transform (train/step.py)."""
    cfg = small_config()
    cfg_rel = dataclasses.replace(cfg, hand_relative=True)
    params, state = hmd_ego_pose.init(0, cfg)
    rng = np.random.RandomState(3)
    images = jnp.asarray(rng.normal(size=(2, 128, 128, 3)).astype(np.float32) * 0.3)
    cams = jnp.tile(
        jnp.asarray([[570.0, 570.0, 64.0, 64.0, 1000.0, 1.0]], jnp.float32), (2, 1)
    )

    kw = dict(score_threshold=0.0, iou_threshold=0.5, max_detections=8)
    base = hmd_ego_pose.predict(params, state, images, cams, cfg, **kw)
    rel = hmd_ego_pose.predict(params, state, images, cams, cfg_rel, **kw)

    valid = np.asarray(base.labels) >= 0
    assert valid.any()
    expect = np.asarray(base.hand) + np.tile(np.asarray(base.translation) / 1000.0, (1, 1, 21))
    np.testing.assert_allclose(
        np.asarray(rel.hand)[valid], expect[valid], rtol=1e-6, atol=1e-7
    )
    # everything except the hand is untouched by the flag
    for name in ("boxes", "scores", "labels", "rotation", "translation"):
        np.testing.assert_array_equal(
            np.asarray(getattr(base, name)), np.asarray(getattr(rel, name)), err_msg=name
        )
