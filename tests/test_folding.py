"""BN-folding correctness: folded deployment tree computes the same function."""

import numpy as np
import jax
import jax.numpy as jnp

from hmd_ego_pose_tpu.config import ModelConfig
from hmd_ego_pose_tpu.models import hmd_ego_pose
from hmd_ego_pose_tpu.models.folding import fold_batch_norms


def _randomize_bn(params, bn_state, rng):
    """Give every BN non-trivial scale/bias/stats so folding is exercised."""

    def rand_like(x, scale, offset):
        return (rng.uniform(0, 1, np.shape(x)) * scale + offset).astype(np.float32)

    def walk(p, s):
        if isinstance(p, dict):
            if set(p.keys()) == {"scale", "bias"} and isinstance(s, dict) and set(s.keys()) == {"mean", "var"}:
                # gentle perturbations: violent ones explode activations
                # through ~100 layers and drown the comparison in fp32 noise
                return (
                    {"scale": rand_like(p["scale"], 0.2, 0.9), "bias": rand_like(p["bias"], 0.1, -0.05)},
                    {"mean": rand_like(s["mean"], 0.1, -0.05), "var": rand_like(s["var"], 0.2, 0.9)},
                )
            out_p, out_s = {}, {}
            for k in p:
                if isinstance(s, dict) and k in s:
                    out_p[k], out_s[k] = walk(p[k], s[k])
                else:
                    out_p[k] = p[k]
            for k in s if isinstance(s, dict) else {}:
                if k not in out_s:
                    out_s[k] = s[k]
            return out_p, out_s
        if isinstance(p, list):
            pairs = [walk(a, b) for a, b in zip(p, s)]
            return [a for a, _ in pairs], [b for _, b in pairs]
        return p, s

    return walk(params, bn_state)


def test_folded_model_matches_unfolded():
    cfg = ModelConfig(phi=0, image_size=128)
    params, bn_state = hmd_ego_pose.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)

    # randomize BN params/stats everywhere they pair up
    params2, bn2 = _randomize_bn(jax.device_get(params), jax.device_get(bn_state), rng)

    x = jnp.asarray(rng.normal(size=(1, 128, 128, 3)).astype(np.float32) * 0.5)
    ref, _ = hmd_ego_pose.apply(params2, bn2, x, cfg, training=False)

    folded_p, folded_s = fold_batch_norms(params2, bn2, cfg)
    got, _ = hmd_ego_pose.apply(folded_p, folded_s, x, cfg, training=False)

    np.testing.assert_allclose(np.asarray(got.regression), np.asarray(ref.regression), atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got.classification), np.asarray(ref.classification), atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got.hand), np.asarray(ref.hand), atol=5e-4, rtol=1e-3)

    # folded conv kernels actually changed (non-trivial fold)
    a = np.asarray(jax.device_get(params2)["backbone"]["stem_conv"]["kernel"])
    b = folded_p["backbone"]["stem_conv"]["kernel"]
    assert np.abs(a - b).max() > 1e-3
    assert "bias" in folded_p["backbone"]["stem_conv"]
