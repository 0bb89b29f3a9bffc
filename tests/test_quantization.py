"""Int8 quantization tests: kernel parity, tree compression, accuracy impact."""

import numpy as np
import jax
import jax.numpy as jnp

from hmd_ego_pose_tpu.ops.quantization import (
    dequantize_np,
    dequantize_pallas,
    dequantize_tree,
    quantize_np,
    quantize_pallas,
    quantize_tree,
    quantized_nbytes,
)


def test_quantize_roundtrip_error_bound():
    rng = np.random.RandomState(0)
    x = rng.normal(scale=0.1, size=(64, 32)).astype(np.float32)
    q, s = quantize_np(x)
    back = dequantize_np(q, s)
    # symmetric int8: error bounded by scale/2 per channel
    assert np.all(np.abs(back - x) <= s / 2 + 1e-7)


def test_pallas_kernels_match_numpy():
    rng = np.random.RandomState(1)
    x = rng.normal(scale=0.3, size=(50, 40)).astype(np.float32)
    q_np, s_np = quantize_np(x)
    q_pl, s_pl = quantize_pallas(jnp.asarray(x), interpret=True)
    np.testing.assert_array_equal(np.asarray(q_pl), q_np)
    np.testing.assert_allclose(np.asarray(s_pl), s_np, rtol=1e-6)

    back = dequantize_pallas(jnp.asarray(q_np), jnp.asarray(s_np), interpret=True)
    np.testing.assert_allclose(np.asarray(back), dequantize_np(q_np, s_np), rtol=1e-6)


def test_tree_compression_and_model_accuracy():
    from hmd_ego_pose_tpu.config import ModelConfig
    from hmd_ego_pose_tpu.models import hmd_ego_pose

    cfg = ModelConfig(phi=0, image_size=128)
    params, state = hmd_ego_pose.init(jax.random.PRNGKey(0), cfg)

    packed = quantize_tree(params)
    restored = dequantize_tree(packed)

    orig_bytes = sum(np.asarray(x).nbytes for x in jax.tree.leaves(jax.device_get(params)))
    packed_bytes = quantized_nbytes(packed)
    assert packed_bytes < orig_bytes * 0.45  # ~4x on conv kernels, fp32 smalls kept

    # same structure
    assert jax.tree.structure(jax.device_get(params)) == jax.tree.structure(restored)

    # outputs stay close under weight quantization
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.normal(size=(1, 128, 128, 3)).astype(np.float32) * 0.3)
    ref, _ = hmd_ego_pose.apply(params, state, x, cfg)
    got, _ = hmd_ego_pose.apply(restored, state, x, cfg)
    assert float(jnp.max(jnp.abs(got.classification - ref.classification))) < 0.05
    # int8 noise must actually be present (not a trivial identity)
    assert float(jnp.max(jnp.abs(got.regression - ref.regression))) > 0


def test_int8_checkpoint_backend_roundtrip(tmp_path):
    """PRODUCTION consumer: save_checkpoint(backend='int8') -> transparent
    dequantizing restore; forward outputs stay close to fp32."""
    import os

    import jax
    import jax.numpy as jnp

    from hmd_ego_pose_tpu.config import ModelConfig
    from hmd_ego_pose_tpu.models import hmd_ego_pose
    from hmd_ego_pose_tpu.train.checkpoint import restore_checkpoint, save_checkpoint

    cfg = ModelConfig(phi=0, image_size=128)
    params, bn_state = hmd_ego_pose.init(jax.random.PRNGKey(0), cfg)

    fp32 = save_checkpoint(str(tmp_path), "w_fp32", params, bn_state)
    int8 = save_checkpoint(str(tmp_path), "w_int8", params, bn_state, backend="int8")
    ratio = os.path.getsize(fp32) / os.path.getsize(int8)
    assert ratio > 3.0, f"int8 checkpoint only {ratio:.2f}x smaller"

    q_params, q_bn, _ = restore_checkpoint(int8)
    # same tree structure
    assert jax.tree.structure(q_params) == jax.tree.structure(params)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.normal(size=(1, 128, 128, 3)).astype(np.float32) * 0.3)
    base, _ = hmd_ego_pose.apply(params, bn_state, x, cfg)
    quant, _ = hmd_ego_pose.apply(
        jax.tree.map(jnp.asarray, q_params), jax.tree.map(jnp.asarray, q_bn), x, cfg
    )
    # int8 weight error is small but nonzero
    diff = float(jnp.max(jnp.abs(base.regression - quant.regression)))
    assert 0 < diff < 0.3, diff
