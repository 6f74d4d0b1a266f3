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

# NO persistent compilation cache for the CPU suite: deserializing large
# XLA:CPU AOT cache entries crashes the process (deterministic SIGSEGV /
# SIGABRT inside compilation_cache.get_executable_and_time when
# test_sqrt[bls12377] reloads its windowed-sqrt executables — reproduced
# with a fresh same-machine cache dir, so it is the loader, not machine
# mismatch; the loader also warns '+prefer-no-gather is not supported on
# the host machine ... could lead to execution errors such as SIGILL').
# Tests therefore compile in-process only: slower cold, but the suite
# completes deterministically. The TPU bench/scripts keep .jax_cache (the
# remote-compile path has no such loader).

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
