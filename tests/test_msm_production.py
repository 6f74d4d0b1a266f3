"""Production-shape MSM correctness (round-3 verdict item #7; mirror of the
reference's per-curve size sweep, src/msm.test.ts:35-119).

These run the FULL device pipeline (device GLV decompose + fused GLV packing
+ packed batched-affine accumulation + projective reduction) at N and c big
enough to cross every interesting threshold: window widths c >= 10
(bucket grids L = 2^(c-1) > 512), pair-round widths far above
_BATCH_INV_STOP = 512 (shared batch-inversion TREE), multi-round shrink
schedules, and the GLV digit bounds at production c. Kernels run in callback
mode (identical formula code, opaque ops) so the tests execute in tens of
seconds instead of tens of minutes of XLA compile."""

import numpy as np
import pytest

from montgomery_tpu.bigint import WeierstrassCurve, msm as oracle_msm
from montgomery_tpu.concrete import BLS12_377, BLS12_381
from montgomery_tpu.msm import WeierstrassMsm

pytestmark = pytest.mark.slow


def _points(C, N, rng):
    base = [C.scale(rng.randrange(1, 1 << 62), C.generator) for _ in range(16)]
    return [C.scale(1 + rng.randrange(1 << 20), base[i % 16]) for i in range(N)]


def test_bls12_381_msm_e2e(rng):
    """BLS12-381 end-to-end at N=2^10, c=10 — the curve had never been
    MSM-tested (only its GLV decomposition)."""
    C = WeierstrassCurve(BLS12_381)
    ctx = WeierstrassMsm(BLS12_381)
    N = 1 << 10
    pts = _points(C, N, rng)
    sc = [rng.randrange(BLS12_381.order) for _ in range(N)]
    sc[0] = 0
    pts[5] = pts[4]
    got = ctx.msm_full(sc, pts, c=10)  # safe packed affine
    assert C.equal(got, oracle_msm(C, sc, pts))


@pytest.mark.parametrize("unsafe", [True, False])
def test_bls12_377_production_windows(rng, unsafe):
    """BLS12-377 at N=2^12, c=12: L=2048 buckets/window, round widths
    ~90k >> 512, GLV x packed x (un)safe composed."""
    C = WeierstrassCurve(BLS12_377)
    ctx = WeierstrassMsm(BLS12_377)
    N = 1 << 12
    pts = _points(C, N, rng)
    sc = [rng.randrange(BLS12_377.order) for _ in range(N)]
    sc[0] = 0
    sc[1] = 1
    if not unsafe:
        # duplicate points with equal scalars: only the SAFE path contract
        pts[3] = pts[2]
        sc[3] = sc[2]
    got = ctx.msm_full(sc, pts, c=12, unsafe=unsafe)
    assert C.equal(got, oracle_msm(C, sc, pts))
