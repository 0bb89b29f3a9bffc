"""Golden-parity and roundtrip tests for anchor generation and transforms."""

import numpy as np
import jax.numpy as jnp

from hmd_ego_pose_tpu.config import AnchorConfig
from hmd_ego_pose_tpu.ops.anchors import (
    anchors_for_shape,
    bbox_transform,
    translation_transform,
)
from hmd_ego_pose_tpu.ops.decode import (
    bbox_transform_inv,
    calculate_txty,
    clip_boxes,
    translation_transform_inv,
)


def test_anchor_counts():
    cfg = AnchorConfig()
    anchors, trans = anchors_for_shape((256, 256), cfg)
    # 32^2 + 16^2 + 8^2 + 4^2 + 2^2 = 1364 locations x 9 anchors = 12276
    assert anchors.shape == (12276, 4)
    assert trans.shape == (12276, 3)
    assert cfg.num_anchors(256) == 12276
    assert cfg.num_anchors(512) == 49104


def test_anchors_match_reference_golden(golden_anchors_256):
    anchors, _ = anchors_for_shape((256, 256))
    np.testing.assert_allclose(anchors, golden_anchors_256, rtol=0, atol=1e-4)


def test_translation_anchors_match_reference_golden(golden_translation_anchors_256):
    _, trans = anchors_for_shape((256, 256))
    np.testing.assert_allclose(trans, golden_translation_anchors_256, rtol=0, atol=1e-4)


def test_bbox_transform_roundtrip():
    rng = np.random.RandomState(0)
    anchors, _ = anchors_for_shape((256, 256))
    anchors = anchors[::97]  # subsample
    # random plausible gt boxes
    cx = rng.uniform(10, 240, size=(anchors.shape[0],))
    cy = rng.uniform(10, 240, size=(anchors.shape[0],))
    w = rng.uniform(5, 100, size=(anchors.shape[0],))
    h = rng.uniform(5, 100, size=(anchors.shape[0],))
    gt = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=1)

    targets = bbox_transform(anchors.astype(np.float64), gt)
    decoded = np.asarray(bbox_transform_inv(jnp.asarray(anchors), jnp.asarray(targets)))
    np.testing.assert_allclose(decoded, gt, rtol=1e-4, atol=1e-3)


def test_translation_transform_roundtrip():
    rng = np.random.RandomState(1)
    _, trans_anchors = anchors_for_shape((256, 256))
    trans_anchors = trans_anchors[::53]
    gt = np.stack(
        [
            rng.uniform(0, 256, size=(trans_anchors.shape[0],)),
            rng.uniform(0, 256, size=(trans_anchors.shape[0],)),
            rng.uniform(0.2, 2.0, size=(trans_anchors.shape[0],)),
        ],
        axis=1,
    )
    targets = translation_transform(trans_anchors, gt)
    decoded = np.asarray(
        translation_transform_inv(jnp.asarray(trans_anchors), jnp.asarray(targets))
    )
    np.testing.assert_allclose(decoded, gt, rtol=1e-4, atol=1e-3)


def test_clip_boxes():
    boxes = jnp.array([[[-5.0, -3.0, 300.0, 100.0], [10.0, 20.0, 30.0, 40.0]]])
    clipped = np.asarray(clip_boxes(boxes, 256, 256))
    np.testing.assert_allclose(clipped[0, 0], [0, 0, 255, 100])
    np.testing.assert_allclose(clipped[0, 1], [10, 20, 30, 40])


def test_calculate_txty_pinhole():
    # Tx = (x/scale - px) * Tz / fx (reference layers.py:203-257)
    cam = jnp.array([[572.4114, 573.57043, 325.2611, 242.04899, 1000.0, 1.0 / 1.875]])
    # centre pixel exactly at principal point -> Tx = Ty = 0
    x = 325.2611 * (1.0 / 1.875)
    y = 242.04899 * (1.0 / 1.875)
    xy_tz = jnp.array([[[x, y, 0.5]]])
    out = np.asarray(calculate_txty(xy_tz, cam))
    np.testing.assert_allclose(out[0, 0], [0.0, 0.0, 500.0], atol=1e-3)

    # off-centre point
    xy_tz = jnp.array([[[(325.2611 + 57.24114) * (1 / 1.875), y, 1.0]]])
    out = np.asarray(calculate_txty(xy_tz, cam))
    np.testing.assert_allclose(out[0, 0], [100.0, 0.0, 1000.0], rtol=1e-4, atol=1e-2)
