"""Spatial partitioning (the ``space`` mesh axis) — batch-1 latency scale-out.

The serving workload is one frame at a time (the reference's per-frame loop,
unity-sandbox/WebRTCNetCoreSandbox/Program.cs:128-297); data parallelism
cannot split one frame, so multi-chip latency wins need the image itself
sharded.  ``image_sharding`` puts NHWC height over the ``space`` axis and
lets GSPMD insert the conv halo exchanges.  These tests pin that the
spatially-partitioned programs compute the SAME function as single-device:

* raw forward outputs (continuous) match tightly,
* the fused predict (decode + NMS, discrete top-k/argmax inside) matches,
* a training step (BN batch statistics become cross-slab collectives,
  gradient reduction spans the space axis) matches the unsharded step,
* the serving engine accepts a pure-spatial mesh end-to-end.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from hmd_ego_pose_tpu.config import Config, ModelConfig, ParallelConfig, TrainConfig
from hmd_ego_pose_tpu.models import hmd_ego_pose
from hmd_ego_pose_tpu.parallel.mesh import (
    batch_sharding,
    image_sharding,
    make_mesh,
    replicated_sharding,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

CFG = ModelConfig(phi=0, image_size=128, compute_dtype="float32")


def _spatial_mesh(space=4, data=1):
    devices = jax.devices()[: data * space]
    return make_mesh(
        ParallelConfig(data_parallel=data, spatial_parallel=space), devices=devices
    )


def _init_and_inputs(batch=1, seed=0):
    params, state = hmd_ego_pose.init(seed, CFG)
    rng = np.random.RandomState(seed)
    images = jnp.asarray(rng.normal(size=(batch, 128, 128, 3)).astype(np.float32) * 0.3)
    cams = jnp.tile(
        jnp.asarray([[570.0, 570.0, 64.0, 64.0, 1000.0, 1.0]], jnp.float32), (batch, 1)
    )
    return params, state, images, cams


def test_make_mesh_spatial_axis():
    mesh = _spatial_mesh(space=4, data=2)
    assert mesh.shape["data"] == 2 and mesh.shape["space"] == 4
    sh = image_sharding(mesh)
    assert sh.spec == P("data", "space")
    # trivial space axis -> height unconstrained (plain DP behaves as before)
    dp = make_mesh(ParallelConfig(), devices=jax.devices())
    assert image_sharding(dp).spec == P("data", None)


def test_spatial_forward_matches_single_device():
    params, state, images, cams = _init_and_inputs(batch=1)

    ref, _ = jax.jit(
        lambda p, s, x: hmd_ego_pose.apply(p, s, x, CFG, training=False)
    )(params, state, images)

    mesh = _spatial_mesh(space=4)
    repl = replicated_sharding(mesh)
    sp_params = jax.device_put(params, repl)
    sp_state = jax.device_put(state, repl)
    sp_images = jax.device_put(images, image_sharding(mesh))
    out, _ = jax.jit(
        lambda p, s, x: hmd_ego_pose.apply(p, s, x, CFG, training=False)
    )(sp_params, sp_state, sp_images)

    for name in ("classification", "regression", "rotation", "translation_raw", "hand"):
        a = np.asarray(getattr(ref, name))
        b = np.asarray(getattr(out, name))
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5, err_msg=name)


def test_spatial_predict_matches_single_device():
    params, state, images, cams = _init_and_inputs(batch=2, seed=1)

    def run(p, s, x, c):
        return hmd_ego_pose.predict(
            p, s, x, c, CFG, score_threshold=0.05, iou_threshold=0.5, max_detections=10
        )

    ref = jax.jit(run)(params, state, images, cams)

    mesh = _spatial_mesh(space=4)
    repl = replicated_sharding(mesh)
    det = jax.jit(run)(
        jax.device_put(params, repl),
        jax.device_put(state, repl),
        jax.device_put(images, image_sharding(mesh)),
        jax.device_put(cams, batch_sharding(mesh)),
    )

    np.testing.assert_array_equal(np.asarray(ref.labels), np.asarray(det.labels))
    np.testing.assert_allclose(
        np.asarray(ref.scores), np.asarray(det.scores), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ref.boxes), np.asarray(det.boxes), rtol=1e-3, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(ref.translation), np.asarray(det.translation), rtol=1e-3, atol=1e-2
    )


def test_spatial_train_step_matches_single_device():
    """One optimizer step under a (data=2, space=4) mesh == unsharded step.

    BatchNorm batch statistics reduce over (B, H, W) — under the spatial
    sharding that mean/var becomes a cross-slab collective, so this pins
    both the gradient psum and the BN reduction paths.
    """
    from hmd_ego_pose_tpu.train.step import Batch, make_train_step

    cfg = Config(
        model=CFG, train=TrainConfig(batch_size=4, learning_rate=1e-3)
    )
    rng = np.random.RandomState(2)
    model_points = (rng.normal(size=(1, 64, 3)) * 50).astype(np.float32)
    step = make_train_step(cfg, model_points)

    params, bn_state = hmd_ego_pose.init(3, cfg.model)
    b = 4
    batch = Batch(
        images=jnp.asarray(rng.normal(size=(b, 128, 128, 3)).astype(np.float32) * 0.1),
        camera_parameters=jnp.tile(
            jnp.asarray([[570.0, 570.0, 64.0, 64.0, 1000.0, 1.0]], jnp.float32), (b, 1)
        ),
        gt_boxes=jnp.tile(jnp.asarray([[[30.0, 40.0, 90.0, 100.0]]], jnp.float32), (b, 1, 1)),
        gt_labels=jnp.zeros((b, 1), jnp.int32),
        gt_transformation=jnp.tile(
            jnp.asarray([[[0.1, 0.2, 0.1, 10.0, -5.0, 500.0, 0.0, 0.0]]], jnp.float32),
            (b, 1, 1),
        ),
        gt_coords_3d=jnp.zeros((b, 1, 63), jnp.float32),
        gt_valid=jnp.ones((b, 1), bool),
    )
    key = jax.random.PRNGKey(0)

    mesh = _spatial_mesh(space=4, data=2)
    repl = replicated_sharding(mesh)
    sp_state = jax.device_put(step.init_state(params, bn_state), repl)

    # device_put may ALIAS the original single-device buffer as one shard of
    # the replicated copy, and the step donates its state — so the reference
    # step must run on its own deep copies, not the originals
    params_ref, bn_ref = jax.tree.map(lambda x: jnp.array(x, copy=True), (params, bn_state))
    ref_state = step.init_state(params_ref, bn_ref)
    ref_new, ref_metrics = step.jitted(ref_state, batch, key)
    sp_batch = batch._replace(
        images=jax.device_put(batch.images, image_sharding(mesh)),
        **{
            f: jax.device_put(getattr(batch, f), batch_sharding(mesh))
            for f in Batch._fields
            if f != "images"
        },
    )
    sp_new, sp_metrics = step.jitted(sp_state, sp_batch, jax.device_put(key, repl))

    np.testing.assert_allclose(
        float(ref_metrics["loss"]), float(sp_metrics["loss"]), rtol=1e-4
    )
    ref_leaves = jax.tree.leaves(ref_new.params)
    sp_leaves = jax.tree.leaves(sp_new.params)
    worst = max(
        float(jnp.max(jnp.abs(a - b))) for a, b in zip(ref_leaves, sp_leaves)
    )
    assert worst < 5e-3, f"params diverged: max abs diff {worst}"


def test_engine_pure_spatial_mesh():
    """InferenceEngine on a space-only mesh: one frame, k cooperating chips."""
    from hmd_ego_pose_tpu.config import ServingConfig
    from hmd_ego_pose_tpu.serving.engine import InferenceEngine

    params, state = hmd_ego_pose.init(4, CFG)
    mesh = _spatial_mesh(space=4, data=1)
    eng = InferenceEngine(
        params, state, CFG,
        ServingConfig(max_batch_size=1, score_threshold=0.0),
        frame_shape=(128, 128), mesh=mesh,
    )
    assert eng.batch_sizes[0] == 1  # pure-space mesh: no batch-padding floor
    eng.start()
    try:
        frame = np.random.RandomState(5).randint(0, 255, (128, 128, 3), np.uint8)
        pose = eng.infer_blocking(frame)
        assert np.all(np.isfinite(np.asarray(pose, np.float32)))
    finally:
        eng.stop()
