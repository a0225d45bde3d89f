"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI, so sharding/pjit paths are
validated on 8 virtual CPU devices (the standard JAX testing recipe).

NOTE: this image's sitecustomize registers the remote 'axon' TPU plugin in
every interpreter and presets JAX_PLATFORMS=axon before conftest runs, so the
env var alone is not enough — jax.config must be updated explicitly before
any backend initialization. Without this, every eager op round-trips through
the TPU tunnel (minutes-per-test slow) and f32 matmuls drop to bf16 passes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# Never reuse the persistent compilation cache in tests: it may hold XLA:CPU
# AOT artifacts compiled on a host with different machine features (the
# loader warns of SIGILL risk), and tiny test programs compile in seconds.
os.environ["JAX_COMPILATION_CACHE_DIR"] = ""
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu"


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
