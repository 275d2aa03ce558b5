"""Test harness config: force CPU backend with 8 virtual devices.

This is the TPU framework's equivalent of the reference's headset-free
TestScene (CPU inference backend, Assets/Scenes/TestScene.unity:747): all
tests run without TPU hardware, and multi-chip sharding tests run against a
virtual 8-device CPU mesh.

Note: this machine's sitecustomize imports jax at interpreter startup with
JAX_PLATFORMS=axon, so env vars are too late — we must use
jax.config.update *before the backend initializes* (first jax.devices()
call), which conftest import order guarantees.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: repeat suite runs on this 1-core box skip
# the multi-minute jit compiles (keyed by HLO hash — new code recompiles).
from xrseg_tpu import enable_compile_cache  # noqa: E402

enable_compile_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
