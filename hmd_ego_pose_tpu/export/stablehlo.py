"""Model export via jax.export (StableHLO) — the TPU-native analog of the
reference's ONNX export path (pytorch-sandbox/hmdegopose/misc_utils.py:36-95).

The reference exports opset-9 ONNX and immediately re-verifies the artifact
with onnxruntime on a saved random input; we serialize the fused inference
program to portable StableHLO bytes, save the golden input/output pair next
to it, and ``load_and_verify`` re-runs the deserialized program against the
goldens — same contract, compiler-native format.
"""

from __future__ import annotations

import json
import os
from typing import Tuple

import numpy as np


def export_inference(
    params,
    bn_state,
    config,
    out_dir: str,
    name: str = "hmd_ego_pose",
    batch_size: int = 1,
    rng_seed: int = 0,
    fold_bn: bool = True,
) -> str:
    """Serialize the raw-forward program + goldens; returns the artifact dir.

    Exports the *raw head outputs* function (regression/classification/
    rotation/translation_raw/hand), mirroring the reference's 10-output ONNX
    graph (misc_utils.py:77-83) minus the redundant feature maps.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jax_export

    from hmd_ego_pose_tpu.models import hmd_ego_pose

    if fold_bn:
        from hmd_ego_pose_tpu.models.folding import fold_batch_norms

        params, bn_state = fold_batch_norms(params, bn_state, config)

    os.makedirs(out_dir, exist_ok=True)

    def raw_forward(params, bn_state, images):
        out, _ = hmd_ego_pose.apply(params, bn_state, images, config, training=False)
        return {
            "regression": out.regression,
            "classification": out.classification,
            "rotation": out.rotation,
            "translation_raw": out.translation_raw,
            "hand": out.hand,
        }

    rng = np.random.RandomState(rng_seed)
    sample = rng.uniform(-1, 1, size=(batch_size, config.image_size, config.image_size, 3)).astype(np.float32)

    fn = jax.jit(lambda images: raw_forward(params, bn_state, images))
    exported = jax_export.export(fn)(jnp.asarray(sample))
    blob = exported.serialize()

    with open(os.path.join(out_dir, f"{name}.stablehlo"), "wb") as f:
        f.write(blob)
    np.save(os.path.join(out_dir, f"{name}_input.npy"), sample)
    golden = jax.device_get(fn(jnp.asarray(sample)))
    np.savez(os.path.join(out_dir, f"{name}_golden.npz"), **golden)
    with open(os.path.join(out_dir, f"{name}_meta.json"), "w") as f:
        json.dump(
            {
                "image_size": config.image_size,
                "phi": config.phi,
                "batch_size": batch_size,
                "outputs": sorted(golden.keys()),
            },
            f,
            indent=2,
        )
    return out_dir


def load_and_verify(out_dir: str, name: str = "hmd_ego_pose", atol: float = 1e-5) -> bool:
    """Deserialize the artifact and check outputs against the saved goldens."""
    import jax
    import jax.numpy as jnp
    from jax import export as jax_export

    with open(os.path.join(out_dir, f"{name}.stablehlo"), "rb") as f:
        exported = jax_export.deserialize(f.read())
    sample = np.load(os.path.join(out_dir, f"{name}_input.npy"))
    golden = np.load(os.path.join(out_dir, f"{name}_golden.npz"))

    outputs = exported.call(jnp.asarray(sample))
    outputs = jax.device_get(outputs)
    for key in golden.files:
        np.testing.assert_allclose(outputs[key], golden[key], atol=atol, rtol=1e-4)
    return True
