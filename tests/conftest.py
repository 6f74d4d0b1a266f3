"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated on virtual CPU devices (the driver separately
dry-runs the multichip path); real-TPU benchmarking happens via bench.py.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

# sitecustomize registers the axon TPU backend before conftest runs; override.
# Match TPU numerics: no x64 (TPU has no int64 path; kernels are int32-only).
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the kernels are compile-heavy (long unrolled
# carry chains); caching makes repeated test runs fast.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE_DIR))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest  # noqa: E402
import random  # noqa: E402


@pytest.fixture
def rng():
    return random.Random(0xC0FFEE)
