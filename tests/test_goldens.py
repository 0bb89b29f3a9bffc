"""Self-golden regression tests: frozen model outputs for fixed seeds.

The reference's de-facto test strategy is golden-value parity on committed
artifacts (SURVEY.md §4).  Besides the reference's own anchor goldens
(test_anchors.py), this freezes OUR model's numerics so refactors of the
conv/BN/head stack can't silently drift: init with PRNGKey(42), forward a
fixed input, compare a strided anchor subsample to the committed npz.
Regenerate deliberately (see the inline script in git history) only when a
numeric change is intended, and say why in the commit.
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from hmd_ego_pose_tpu.config import ModelConfig
from hmd_ego_pose_tpu.models import hmd_ego_pose

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "model_phi0_128_seed42.npz")


def test_model_outputs_match_committed_golden():
    if not os.path.exists(GOLDEN):
        pytest.skip("golden artifact missing")
    data = np.load(GOLDEN)
    cfg = ModelConfig(phi=0, image_size=128)
    params, state = hmd_ego_pose.init(jax.random.PRNGKey(42), cfg)
    rng = np.random.RandomState(42)
    x = jnp.asarray(rng.normal(size=(1, 128, 128, 3)).astype(np.float32) * 0.5)
    out, _ = hmd_ego_pose.apply(params, state, x, cfg)

    idx = data["idx"]
    np.testing.assert_allclose(np.asarray(out.regression)[0, idx], data["regression"], atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out.classification)[0, idx], data["classification"], atol=2e-5, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out.rotation)[0, idx], data["rotation"], atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out.translation_raw)[0, idx], data["translation_raw"], atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out.hand)[0, idx, :6], data["hand"], atol=2e-4, rtol=1e-3)
