#!/usr/bin/env python
"""Run the test suite in a few PROCESS BATCHES.

XLA:CPU becomes unstable late in long processes that have compiled ~100+
kernel executables: the next backend_compile (or, with cache writes enabled,
the executable serializer) segfaults — observed deterministically around the
100th test of a single-process `pytest tests/` run (.logs/pytest_full_cold2.log)
and noted since round 4. Per-file and per-batch processes never hit it.
This runner executes the suite as 4 process batches and aggregates results.

Usage: python scripts/run_suite.py [--slow] [extra pytest args...]
"""

import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BATCHES = [
    ["tests/test_bigint_oracle.py", "tests/test_alt_mul.py",
     "tests/test_divstep.py", "tests/test_glv.py",
     "tests/test_scalar_device.py"],
    ["tests/test_field_ops.py"],
    ["tests/test_curve_ops.py", "tests/test_pallas_kernels.py"],
    ["tests/test_random_points.py", "tests/test_negative.py"],
    ["tests/test_msm.py", "tests/test_msm_production.py",
     "tests/test_grid_combine.py", "tests/test_sharded.py",
     "tests/test_serve.py"],
]


def main():
    args = sys.argv[1:]
    slow = "--slow" in args
    args = [a for a in args if a != "--slow"]
    mark = [] if slow else ["-m", "not slow"]
    rc_total = 0
    t_all = time.time()
    for i, batch in enumerate(BATCHES):
        t0 = time.time()
        rc = subprocess.call(
            [sys.executable, "-m", "pytest", "-q", *mark, *args, *batch],
            cwd=ROOT,
        )
        print(f"[run_suite] batch {i + 1}/{len(BATCHES)}: rc={rc} "
              f"({time.time() - t0:.0f}s)", flush=True)
        if rc not in (0, 5):  # 5 = no tests collected (all deselected)
            rc_total = 1
    print(f"[run_suite] TOTAL rc={rc_total} in {time.time() - t_all:.0f}s",
          flush=True)
    return rc_total


if __name__ == "__main__":
    sys.exit(main())
