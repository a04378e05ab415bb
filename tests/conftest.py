"""Test configuration: run everything on a CPU backend with 8 virtual
devices so collectives/sharding tests exercise a real (simulated) mesh
without TPU hardware.  Must run before jax is imported anywhere."""
import os

# force CPU: the session env may pre-set JAX_PLATFORMS to a TPU platform, and
# a sitecustomize may have imported jax before this file runs — so update the
# live jax config as well as the environment.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
