"""Test harness: force an 8-device virtual CPU mesh before jax imports.

TPU-equivalent of a fake backend — all sharding/collective tests run here
without hardware; the driver separately dry-runs the multichip path.
"""

import os

# The axon site hook forces JAX_PLATFORMS=axon; the config update below wins
# because the backend is not initialized until first device use.
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


@pytest.fixture(scope="session")
def mesh8():
    from mmd_tpu.core.mesh import make_mesh
    assert len(jax.devices()) == 8, jax.devices()
    return make_mesh(jax.devices(), model_parallel=1)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
