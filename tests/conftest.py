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

# Persistent compilation cache for the CPU suite (round-5), READ-ONLY by
# default: cache LOADS are stable (verified across the whole suite incl.
# the windowed-sqrt executables), but XLA:CPU's executable SERIALIZER
# segfaults nondeterministically on some entries (stack:
# compilation_cache.put_executable_and_time, .logs/pytest_full_cold.log) —
# so plain pytest runs never write. To (re)warm the cache run
# scripts/warm_test_cache.py, which enables writes (MSM_TEST_CACHE_WRITE=1)
# in child pytest processes and simply reruns on a serializer crash — every
# attempt adds entries, so it converges. Warm suite runs load everything
# and skip the expensive compiles. MSM_TEST_CACHE=0 disables entirely.
if os.environ.get("MSM_TEST_CACHE", "1") == "1":
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), os.pardir,
                                   ".jax_cache_cpu"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    if os.environ.get("MSM_TEST_CACHE_WRITE", "0") != "1":
        from jax._src import compilation_cache as _cc

        _cc.put_executable_and_time = lambda *a, **k: None

import pytest  # noqa: E402
import random  # noqa: E402

# Default kernel mode for the suite: CALLBACK — every fused field/group
# formula runs as ONE opaque pure_callback op (eagerly evaluated, identical
# formula code), so tests that jit whole MSM pipelines compile in seconds
# instead of minutes (a fully inlined MSM program is ~250k HLO ops and was
# the reason the round-3 suite could not finish). The pallas wrapper itself
# is covered by tests/test_pallas_kernels.py (interpret mode), the compiled
# path by the TPU bench. Individual tests can override with
# kernels.force_pallas(...) as usual (the context manager restores this
# default on exit).
from montgomery_tpu.ops import kernels  # noqa: E402

kernels._FORCE = True
kernels._MODE = "callback"


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: production-shape tests (run with -m slow or by file)"
    )


@pytest.fixture
def rng():
    return random.Random(0xC0FFEE)
