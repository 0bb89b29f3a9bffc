"""Test harness configuration.

Forces an 8-device CPU platform so multi-chip sharding logic (pjit over a
jax.sharding.Mesh) is exercised without TPU hardware, per the project's
multi-chip validation strategy.  Must run before the first jax import.
"""

import os

# The image presets JAX_PLATFORMS=axon (TPU-over-tunnel) and preimports jax
# from sitecustomize, so the env var is already consumed; the backend itself
# initializes lazily, which means jax.config.update still wins if it runs
# before the first device query.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the full-model train-step compiles dominate suite
# wall time; caching them makes repeated runs fast
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu_tests")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import numpy as np
import pytest


REFERENCE_ROOT = "/root/reference"


def reference_asset(relpath: str) -> str:
    return os.path.join(REFERENCE_ROOT, relpath)


@pytest.fixture(scope="session")
def golden_anchors_256():
    """The reference's committed golden anchor dump (12276 x 4)."""
    path = reference_asset("pytorch-sandbox/onnx-models/anchors_256.txt")
    if not os.path.exists(path):
        pytest.skip("reference golden anchors not available")
    return np.loadtxt(path).reshape(-1, 4)


@pytest.fixture(scope="session")
def golden_translation_anchors_256():
    path = reference_asset("pytorch-sandbox/onnx-models/translation_anchors_256.txt")
    if not os.path.exists(path):
        pytest.skip("reference golden translation anchors not available")
    return np.loadtxt(path).reshape(-1, 3)
