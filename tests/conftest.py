"""Test configuration: force the CPU backend with 8 virtual devices.

Correctness tests must not require TPU hardware (SURVEY §4 "CI-friendly"):
Pallas kernels run in interpret mode on CPU, and sharding tests use an
8-device virtual CPU mesh.  The environment may pin JAX_PLATFORMS to a TPU
plugin, so the override happens in-process before any backend is touched.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    # function-scoped: every test sees the same stream regardless of which
    # other tests ran first (a session-scoped generator made marginal
    # tolerances order-dependent)
    return np.random.default_rng(1234)


@pytest.fixture(scope="session")
def test_image():
    from interpolate_antialiasing_tpu.utils.imageio import synthetic_image

    return synthetic_image()
