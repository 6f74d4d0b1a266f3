"""GLV decomposition audit (mirror of reference src/glv/glv-test.ts:89-133):
random scalars decompose with s0 + s1*lambda = s (mod q) and magnitudes below
the proven bound; MSM with GLV matches the plain path and the oracle."""

import random

import pytest

from montgomery_tpu.bigint import WeierstrassCurve, msm as oracle_msm
from montgomery_tpu.concrete import BLS12_377, BLS12_381, PALLAS
from montgomery_tpu.msm import WeierstrassMsm
from montgomery_tpu.scalar.glv import decompose, glv_params, signed_digits_glv


@pytest.mark.parametrize("params", [BLS12_377, BLS12_381, PALLAS], ids=lambda p: p.label)
def test_decompose(params, rng):
    q = params.order
    lam = params.endomorphism.lam
    g = glv_params(q, lam)
    assert g.max_bits <= q.bit_length() // 2 + 2
    worst = 0
    for _ in range(2000):
        s = rng.randrange(q)
        s0, s1 = decompose(g, s)
        assert (s0 + s1 * lam - s) % q == 0
        worst = max(worst, abs(s0).bit_length(), abs(s1).bit_length())
    # boundary scalars
    for s in [0, 1, 2, q - 1, q - 2, q // 2]:
        s0, s1 = decompose(g, s)
        assert (s0 + s1 * lam - s) % q == 0
        worst = max(worst, abs(s0).bit_length(), abs(s1).bit_length())
    assert worst <= g.max_bits, (worst, g.max_bits)


def test_digits_glv_roundtrip(rng):
    g = glv_params(PALLAS.order, PALLAS.endomorphism.lam)
    c = 5
    scalars = [rng.randrange(PALLAS.order) for _ in range(8)]
    d = signed_digits_glv(g, scalars, c)
    K, twoN = d.shape
    assert twoN == 16
    for j, s in enumerate(scalars):
        s0 = sum(int(d[k, j]) << (k * c) for k in range(K))
        s1 = sum(int(d[k, 8 + j]) << (k * c) for k in range(K))
        assert (s0 + s1 * g.lam - s) % g.q == 0


def test_msm_glv_matches_oracle(rng):
    C = WeierstrassCurve(PALLAS)
    ctx = WeierstrassMsm(PALLAS)
    N, c = 16, 4
    pts = C.random_points(N, rng)
    sc = [rng.randrange(PALLAS.order) for _ in range(N)]
    sc[0] = 0
    got = ctx.msm_glv(sc, pts, c=c)
    assert C.equal(got, oracle_msm(C, sc, pts))
