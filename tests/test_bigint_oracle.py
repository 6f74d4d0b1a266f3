"""Oracle-layer self-tests: algebraic laws.

Mirror of reference src/bigint/field.test.ts, curves.test.ts, msm.test.ts —
the oracle must be right before anything else is tested against it.
"""

import pytest

from montgomery_tpu.bigint import (
    TwistedEdwardsCurve,
    WeierstrassCurve,
    msm,
    msm_naive,
)
from montgomery_tpu.concrete import (
    BLS12_377,
    BLS12_381,
    ED_ON_BLS12_377,
    PALLAS,
    example_fields,
)
from montgomery_tpu.testing.generators import sample_field_elements, sample_scalars

FIELD_NAMES = ["small", "babybear", "goldilocks", "pastaFp", "bls12377", "bls12381Scalar"]


@pytest.mark.parametrize("name", FIELD_NAMES)
def test_field_laws(name, rng):
    F = example_fields()[name]
    p = F.p
    xs = sample_field_elements(p, 20, rng)
    ys = sample_field_elements(p, 20, rng)
    zs = sample_field_elements(p, 20, rng)
    for x, y, z in zip(xs, ys, zs):
        assert F.mul(F.add(x, y), z) == F.add(F.mul(x, z), F.mul(y, z))  # distrib
        assert F.mul(F.mul(x, y), z) == F.mul(x, F.mul(y, z))  # assoc
        assert F.add(x, F.neg(x)) == 0
        if x % p != 0:
            assert F.mul(x, F.inv(x)) == 1
        assert F.exp(x, 3) == F.mul(x, F.square(x))
        r = F.sqrt(F.square(x))
        assert r is not None and F.square(r) == F.square(x)


@pytest.mark.parametrize("name", ["pastaFp", "bls12377", "babybear"])
def test_field_sqrt_nonsquares(name, rng):
    F = example_fields()[name]
    n_sq = 0
    for x in sample_field_elements(F.p, 30, rng):
        s = F.sqrt(x)
        if s is None:
            assert not F.is_square(x)
        else:
            n_sq += 1
            assert F.square(s) == x % F.p
    assert n_sq > 0


@pytest.mark.parametrize("params", [BLS12_377, BLS12_381, PALLAS], ids=lambda c: c.label)
def test_weierstrass_laws(params, rng):
    C = WeierstrassCurve(params)
    G = C.generator
    assert C.is_on_curve(G)
    assert C.scale(params.order, G).is_zero
    P = C.random_point(rng)
    Q = C.random_point(rng)
    assert C.is_on_curve(P) and C.is_in_subgroup(P)
    # group laws
    assert C.equal(C.add(P, Q), C.add(Q, P))
    assert C.equal(C.add(P, C.neg(P)), C.add(Q, C.neg(Q)))  # both zero
    assert C.add(P, C.neg(P)).is_zero
    assert C.equal(C.double(P), C.add(P, P))
    a, b = rng.randrange(1, 1000), rng.randrange(1, 1000)
    assert C.equal(C.add(C.scale(a, P), C.scale(b, P)), C.scale(a + b, P))
    # endomorphism: endo(P) == lambda * P
    assert C.equal(C.endomorphism(P), C.scale(params.endomorphism.lam, P))


def test_twisted_edwards_laws(rng):
    E = TwistedEdwardsCurve(ED_ON_BLS12_377)
    G = E.generator
    assert E.is_on_curve(G)
    assert E.scale(ED_ON_BLS12_377.order, G).is_zero
    P, Q = E.random_point(rng), E.random_point(rng)
    assert E.is_on_curve(P)
    assert E.equal(E.add(P, Q), E.add(Q, P))
    assert E.add(P, E.neg(P)).is_zero
    assert E.equal(E.double(P), E.add(P, P))
    a, b = rng.randrange(1, 1000), rng.randrange(1, 1000)
    assert E.equal(E.add(E.scale(a, P), E.scale(b, P)), E.scale(a + b, P))


@pytest.mark.parametrize("which", ["weierstrass", "edwards"])
def test_msm_oracle(which, rng):
    """MSM identities (reference bigint/msm.test.ts:36-58)."""
    if which == "weierstrass":
        C = WeierstrassCurve(PALLAS)
    else:
        C = TwistedEdwardsCurve(ED_ON_BLS12_377)
    n = 8
    pts = C.random_points(n, rng)
    sc = sample_scalars(C.scalar_field.p, n, rng)
    assert C.equal(msm(C, sc, pts), msm_naive(C, sc, pts))
    # same point => scale by sum of scalars
    same = [pts[0]] * n
    assert C.equal(msm(C, sc, same), C.scale(sum(sc), pts[0]))
    # same scalar => scale of sum of points
    s = sc[0]
    acc = pts[0]
    for P in pts[1:]:
        acc = C.add(acc, P)
    assert C.equal(msm(C, [s] * n, pts), C.scale(s, acc))
