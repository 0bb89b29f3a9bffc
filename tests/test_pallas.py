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


def test_production_paths_use_pallas_dispatcher():
    """Regression for round-1 'dead code': the train-step target assignment
    must route IoU through the Pallas auto-dispatcher (Pallas on TPU, jnp
    elsewhere); the evaluator's batched ADD-S must route through
    min_distances.  NMS deliberately stays on the jnp path (measured 0.94x
    at its 100x100 shape, scripts/bench_pallas.py)."""
    from hmd_ego_pose_tpu.ops import pallas_kernels, target_assign
    from hmd_ego_pose_tpu.eval import metrics as M

    assert target_assign.iou_matrix is pallas_kernels.iou_matrix

    import inspect

    src = inspect.getsource(M._add_s_device_fn)
    assert "pallas_kernels import min_distances" in src


def test_add_s_batch_matches_looped_reference():
    """add_s_batch (both the numpy fallback and the jitted device math)
    must agree with the per-pose check_add_s loop."""
    from hmd_ego_pose_tpu.eval import metrics as M

    rng = np.random.RandomState(3)
    model_points = rng.normal(scale=40, size=(2311, 3)).astype(np.float32)
    diameter = 120.0

    def rand_rot(r):
        a = r.normal(size=(3, 3))
        q, _ = np.linalg.qr(a)
        return (q * np.sign(np.linalg.det(q))).astype(np.float32)

    poses = []
    for _ in range(5):
        poses.append((
            rand_rot(rng), rng.normal(scale=100, size=3).astype(np.float32),
            rand_rot(rng), rng.normal(scale=100, size=3).astype(np.float32),
        ))

    exp_flags, exp_means = [], []
    for r_gt, t_gt, r_pred, t_pred in poses:
        ok, m = M.check_add_s(model_points, diameter, r_gt, t_gt, r_pred, t_pred)
        exp_flags.append(ok)
        exp_means.append(m)

    # public entry (numpy fallback on the CPU test backend)
    flags, means = M.add_s_batch(model_points, diameter, poses)
    assert flags == exp_flags
    np.testing.assert_allclose(means, exp_means, rtol=1e-5)

    # the device math itself (jnp path of the dispatcher on CPU)
    step = model_points.shape[0] // 1000 + 1
    sub = np.ascontiguousarray(model_points[::step], np.float32)
    bucket = 64
    rg = np.tile(np.eye(3, dtype=np.float32), (bucket, 1, 1)); rp = rg.copy()
    tg = np.zeros((bucket, 3), np.float32); tp_ = np.zeros((bucket, 3), np.float32)
    for i, (r_gt, t_gt, r_pred, t_pred) in enumerate(poses):
        rg[i], tg[i], rp[i], tp_[i] = r_gt, t_gt, r_pred, t_pred
    got = np.asarray(M._add_s_device_fn(sub.shape[0], bucket)(sub, rg, tg, rp, tp_))[:5]
    np.testing.assert_allclose(got, exp_means, rtol=1e-4)


def test_empty_poses_add_s_batch():
    from hmd_ego_pose_tpu.eval import metrics as M

    flags, means = M.add_s_batch(np.zeros((100, 3), np.float32), 50.0, [])
    assert flags == [] and means == []
