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

# Persistent compilation cache: the big ResNet-50 graphs dominate suite time;
# caching executables across runs cuts repeat suite time by minutes. The
# directory is keyed by the host's CPU feature set: XLA:CPU AOT executables
# compiled on a previous host generation still LOAD here (with a
# machine-feature-mismatch warning), and the foreign codegen can shift float
# rounding (flipping threshold-adjacent scores) or even SIGILL -- observed
# when this image migrated hosts between rounds.
import hashlib  # noqa: E402

_cpu_flags = ""
try:
    with open("/proc/cpuinfo") as _f:
        for _line in _f:
            if _line.startswith("flags"):
                _cpu_flags = _line
                break
except OSError:
    pass
_cache_dir = os.path.join(
    os.path.dirname(__file__),
    ".jax_cache-" + hashlib.sha1(_cpu_flags.encode()).hexdigest()[:8],
)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(1234)


@pytest.fixture(scope="session")
def small_chunk_config():
    """Config with a small pose-chunk so every pipeline test reuses ONE
    compiled SPIN shape instead of padding to 64-frame chunks."""
    from poserisk_release_tpu.config import default_config

    return default_config().replace(PARALLEL={"frames_per_step": 16})
