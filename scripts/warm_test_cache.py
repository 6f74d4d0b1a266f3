#!/usr/bin/env python
"""(Re)warm the CPU test suite's persistent compilation cache.

Runs the suite with cache WRITES enabled (MSM_TEST_CACHE_WRITE=1). XLA:CPU's
executable serializer segfaults nondeterministically on some entries, so a
writing run can die mid-suite — but every attempt persists the entries it
wrote, so rerunning converges; this script just loops until the suite exits
green (or the attempt budget runs out). Plain `pytest tests/` runs are
READ-ONLY against the warmed cache (see tests/conftest.py) and cannot crash.

Usage: python scripts/warm_test_cache.py [max_attempts]
"""

import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    attempts = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    env = dict(os.environ, MSM_TEST_CACHE_WRITE="1")
    for i in range(attempts):
        t0 = time.time()
        rc = subprocess.call(
            [sys.executable, "-m", "pytest", "tests/", "-q", "-m", "not slow"],
            cwd=ROOT, env=env,
        )
        dt = time.time() - t0
        n = len(os.listdir(os.path.join(ROOT, ".jax_cache_cpu"))) if (
            os.path.isdir(os.path.join(ROOT, ".jax_cache_cpu"))) else 0
        print(f"[warm_test_cache] attempt {i + 1}: rc={rc} in {dt:.0f}s, "
              f"{n} cache entries", flush=True)
        if rc == 0:
            return 0
    print("[warm_test_cache] attempts exhausted; cache is partially warm "
          "(read-only runs still benefit)", flush=True)
    return 1


if __name__ == "__main__":
    sys.exit(main())
