"""End-to-end MSM tests vs the oracle (mirror of reference src/msm.test.ts):
for each curve family, random points/scalars at several sizes, full device
pipeline vs bigint Pippenger, plus MSM linearity identities and edge inputs
(zero scalars, duplicated points)."""

import random

import pytest

from montgomery_tpu.bigint import (
    TwistedEdwardsCurve,
    WeierstrassCurve,
    msm as oracle_msm,
)
from montgomery_tpu.concrete import BLS12_377, ED_ON_BLS12_377, PALLAS
from montgomery_tpu.msm import EdwardsMsm, WeierstrassMsm

_CTX = {}


def get_ctx(which):
    if which not in _CTX:
        if which == "pallas":
            _CTX[which] = (WeierstrassCurve(PALLAS), WeierstrassMsm(PALLAS))
        elif which == "bls12-377":
            _CTX[which] = (WeierstrassCurve(BLS12_377), WeierstrassMsm(BLS12_377))
        else:
            _CTX[which] = (
                TwistedEdwardsCurve(ED_ON_BLS12_377),
                EdwardsMsm(ED_ON_BLS12_377),
            )
    return _CTX[which]


@pytest.mark.parametrize("which", ["pallas", "bls12-377", "ed-on-bls12-377"])
def test_msm_matches_oracle(which, rng):
    """Quick per-curve correctness at 62-bit scalars (scalar_bits trims the
    window count so the CPU run stays seconds; FULL-width scalars run in
    tests/test_msm_production.py and the serve tests)."""
    C, ctx = get_ctx(which)
    N, c, SB = 16, 4, 64
    pts = C.random_points(N, rng)
    sc = [rng.randrange(1 << 62) for _ in range(N)]
    # adversarial lanes: zero scalar, scalar 1, duplicate point, tiny scalar
    sc[0] = 0
    sc[1] = 1
    pts[3] = pts[2]
    sc[4] = 2
    got = ctx.msm(sc, pts, c=c, scalar_bits=SB)
    assert C.equal(got, oracle_msm(C, sc, pts))

    # same compiled shape, different data (cache reuse path)
    sc2 = [rng.randrange(1 << 62) for _ in range(N)]
    got = ctx.msm(sc2, pts, c=c, scalar_bits=SB)
    assert C.equal(got, oracle_msm(C, sc2, pts))

    # batched-affine accumulation path (Weierstrass only)
    if which == "pallas":
        got = ctx.msm(sc, pts, c=c, affine=True, scalar_bits=SB)
        assert C.equal(got, oracle_msm(C, sc, pts))


@pytest.mark.parametrize("which", ["pallas"])
def test_msm_identities(which, rng):
    C, ctx = get_ctx(which)
    N, c, SB = 16, 4, 64
    order = C.scalar_field.p
    P = C.random_point(rng)
    pts = [P] * N
    sc = [rng.randrange(1 << 60) for _ in range(N)]
    # same point => scale by sum of scalars (reference bigint/msm.test.ts:36-58)
    got = ctx.msm(sc, pts, c=c, scalar_bits=SB)
    assert C.equal(got, C.scale(sum(sc) % order, P))
    # zero-sum cancellation: 5*P + 5*(-P)
    pts2 = [P, C.neg(P)] + [P] * (N - 2)
    sc = [5, 5] + [0] * (N - 2)
    got = ctx.msm(sc, pts2, c=c, scalar_bits=SB)
    assert got.is_zero


def test_msm_window_chunking(rng):
    """window_chunk splits the scan over window groups; result must agree."""
    C, ctx = get_ctx("pallas")
    N, c = 16, 4
    pts = C.random_points(N, rng)
    sc = [rng.randrange(1 << 62) for _ in range(N)]
    d = ctx.digits(sc, c, scalar_bits=64)
    import jax
    import jax.numpy as jnp

    A = ctx.proj.affine_to_device(pts)
    full = jax.jit(lambda a, dg: ctx.msm_device(a, dg, c))(A, jnp.asarray(d))
    chunked = jax.jit(lambda a, dg: ctx.msm_device(a, dg, c, window_chunk=3))(
        A, jnp.asarray(d)
    )
    got_f = ctx.proj.to_host(full)[0]
    got_c = ctx.proj.to_host(chunked)[0]
    assert C.equal(got_f, got_c)
    assert C.equal(got_f, oracle_msm(C, sc, pts))
