"""Test harness: run all JAX code on a virtual 8-device CPU mesh.

Must set the platform/device-count env vars BEFORE jax initialises its
backends, which conftest import order guarantees.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU shim (sitecustomize) force-selects jax_platforms="axon,cpu" at
# interpreter start; an explicit config update is needed to actually run the
# suite on the virtual CPU mesh instead of tunnelling every op to the TPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(1234)
