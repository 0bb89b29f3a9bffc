"""Pallas kernel parity tests (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from hmd_ego_pose_tpu.ops.distances import min_distances
from hmd_ego_pose_tpu.ops.iou import iou_matrix
from hmd_ego_pose_tpu.ops.pallas_kernels import iou_matrix_pallas, min_distances_pallas


def _random_boxes(rng, n):
    b = rng.uniform(0, 200, size=(n, 4))
    b[:, 2:] = b[:, :2] + rng.uniform(1, 60, size=(n, 2))
    return b.astype(np.float32)


def test_iou_pallas_matches_reference():
    rng = np.random.RandomState(0)
    a = _random_boxes(rng, 300)  # not a multiple of the block size
    b = _random_boxes(rng, 5)
    expected = np.asarray(iou_matrix(jnp.asarray(a), jnp.asarray(b)))
    got = np.asarray(iou_matrix_pallas(jnp.asarray(a), jnp.asarray(b), interpret=True))
    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_iou_pallas_full_anchor_set():
    from hmd_ego_pose_tpu.ops.anchors import anchors_for_shape

    anchors, _ = anchors_for_shape((256, 256))
    rng = np.random.RandomState(1)
    gt = _random_boxes(rng, 2)
    expected = np.asarray(iou_matrix(jnp.asarray(anchors), jnp.asarray(gt)))
    got = np.asarray(iou_matrix_pallas(jnp.asarray(anchors), jnp.asarray(gt), interpret=True))
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_min_distances_pallas_matches_reference():
    rng = np.random.RandomState(2)
    gt = rng.normal(scale=50, size=(500, 3)).astype(np.float32)
    pred = rng.normal(scale=50, size=(400, 3)).astype(np.float32)
    expected = np.asarray(min_distances(jnp.asarray(gt), jnp.asarray(pred)))
    got = np.asarray(min_distances_pallas(jnp.asarray(gt), jnp.asarray(pred), interpret=True))
    assert got.shape == expected.shape
    # the matmul-expansion form loses a little precision on large coords
    np.testing.assert_allclose(got, expected, atol=1e-2, rtol=1e-4)


def test_min_distances_pallas_identical_sets():
    rng = np.random.RandomState(3)
    pts = rng.normal(scale=10, size=(64, 3)).astype(np.float32)
    got = np.asarray(min_distances_pallas(jnp.asarray(pts), jnp.asarray(pts), interpret=True))
    np.testing.assert_allclose(got, 0.0, atol=1e-2)
