"""Curve-kernel equivalence tests vs the bigint oracle.

Mirror of reference src/curve-projective.test.ts and
curve-twisted-edwards.test.ts: add/add_mixed/sub/double/neg/scale/is_zero/
is_on_curve vs the oracle curve, including edge lanes (zero operands, P+P,
P+(-P)); batched-affine adds with poisoned-lane handling.

Device results are read back in projective coordinates and compared via
cross-multiplication (avoids compiling inversions for every check).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from montgomery_tpu.bigint import TwistedEdwardsCurve, WeierstrassCurve
from montgomery_tpu.bigint.weierstrass import AffinePoint
from montgomery_tpu.concrete import BLS12_377, ED_ON_BLS12_377, PALLAS
from montgomery_tpu.curves import AffineBatch, AffineOps, EdwardsOps, ProjectiveOps
from montgomery_tpu.ops.field import create_field_ops


def proj_eq(C, raw, pt: AffinePoint) -> bool:
    """(X:Y:Z) equals affine pt (cross-multiplied, no inversion)."""
    p = C.field.p
    X, Y, Z = raw
    if pt.is_zero:
        return Z % p == 0
    return Z % p != 0 and X % p == pt.x * Z % p and Y % p == pt.y * Z % p


def ed_eq(E, raw, pt) -> bool:
    p = E.field.p
    X, Y, Z, T = raw
    return (
        Z % p != 0
        and X % p == pt.x * Z % p
        and Y % p == pt.y * Z % p
        and T % p == pt.x * pt.y % p * Z % p
    )


def weierstrass_fixture(params, rng, n_random=6):
    C = WeierstrassCurve(params)
    fops = create_field_ops(params.modulus, w=12)
    proj = ProjectiveOps(fops, params)
    aff = AffineOps(fops, params)
    pts = C.random_points(n_random, rng)
    return C, fops, proj, aff, pts


@pytest.mark.parametrize("params", [PALLAS, BLS12_377], ids=lambda c: c.label)
def test_projective_add_double_scale(params, rng):
    C, fops, proj, aff, pts = weierstrass_fixture(params, rng)
    P, Q = pts[0], pts[1]
    Z0 = AffinePoint.zero()
    lhs = [P, Q, P, P, Z0, P, Z0]
    rhs = [Q, P, P, C.neg(P), Q, Z0, Z0]
    A = proj.from_affine(proj.affine_to_device(lhs))
    B = proj.from_affine(proj.affine_to_device(rhs))
    Baff = proj.affine_to_device(rhs)

    @jax.jit
    def all_ops(A, B, Baff):
        return (
            proj.add(A, B),
            proj.add_mixed(A, Baff),
            proj.sub_mixed(A, Baff),
            proj.double(A),
        )

    r_add, r_madd, r_msub, r_dbl = all_ops(A, B, Baff)
    for raw, (a, b) in zip(proj.to_host_raw(r_add), zip(lhs, rhs)):
        assert proj_eq(C, raw, C.add(a, b)), (a, b)
    for raw, (a, b) in zip(proj.to_host_raw(r_madd), zip(lhs, rhs)):
        assert proj_eq(C, raw, C.add(a, b))
    for raw, (a, b) in zip(proj.to_host_raw(r_msub), zip(lhs, rhs)):
        assert proj_eq(C, raw, C.sub(a, b))
    for raw, a in zip(proj.to_host_raw(r_dbl), lhs):
        assert proj_eq(C, raw, C.double(a))

    # is_on_curve: valid points, zero, and an invalid point
    bad = _with_bad_lane(proj, pts)
    flags = np.asarray(jax.jit(proj.is_on_curve)(proj.from_affine(bad)))
    assert list(flags) == [True] * len(pts) + [False]

    # scale (scalar in the high range)
    k = rng.randrange(params.order // 2, params.order)
    A2 = proj.from_affine(proj.affine_to_device(pts[:2]))
    got = proj.to_host_raw(jax.jit(lambda v: proj.scale(k, v))(A2))
    for raw, a in zip(got, pts[:2]):
        assert proj_eq(C, raw, C.scale(k, a))


def _with_bad_lane(proj, pts):
    batch = proj.affine_to_device(pts)
    fops = proj.f
    bad_x = fops.add(batch.x[:, :1], jnp.asarray(fops.one_mont))
    x = jnp.concatenate([batch.x, bad_x], axis=1)
    y = jnp.concatenate([batch.y, batch.y[:, :1]], axis=1)
    inf = jnp.concatenate([batch.inf, jnp.asarray([False])])
    return AffineBatch(x, y, inf)


@pytest.mark.parametrize("params", [PALLAS, BLS12_377], ids=lambda c: c.label)
def test_batch_affine_add(params, rng):
    C, fops, proj, aff, pts = weierstrass_fixture(params, rng, n_random=8)
    P, Q, R, S = pts[0], pts[1], pts[2], pts[3]
    Z0 = AffinePoint.zero()
    lhs = [P, Q, P, P, Z0, P, Z0, R]
    rhs = [Q, R, P, C.neg(P), Q, Z0, Z0, S]
    G = proj.affine_to_device(lhs)
    H = proj.affine_to_device(rhs)

    @jax.jit
    def ops(G, H):
        return (
            aff.batch_add(G, H),
            aff.batch_double(G),
            proj.endomorphism_affine(G),
            proj.to_affine(proj.from_affine(G)),
        )

    r_add, r_dbl, r_endo, r_rt = ops(G, H)
    for got, (a, b) in zip(proj.affine_to_host(r_add), zip(lhs, rhs)):
        assert C.equal(got, C.add(a, b)), (a, b)
    for got, a in zip(proj.affine_to_host(r_dbl), lhs):
        assert C.equal(got, C.double(a))
    for got, a in zip(proj.affine_to_host(r_endo), lhs):
        assert C.equal(got, a if a.is_zero else C.endomorphism(a))
    for got, a in zip(proj.affine_to_host(r_rt), lhs):
        assert C.equal(got, a)

    # unsafe path: generic lanes only
    G2 = proj.affine_to_device(pts[:4])
    H2 = proj.affine_to_device(pts[4:8])
    got = proj.affine_to_host(jax.jit(aff.batch_add_unsafe)(G2, H2))
    for g, (a, b) in zip(got, zip(pts[:4], pts[4:8])):
        assert C.equal(g, C.add(a, b))


def test_edwards_ops(rng):
    params = ED_ON_BLS12_377
    E = TwistedEdwardsCurve(params)
    fops = create_field_ops(params.modulus, w=12)
    ed = EdwardsOps(fops, params)
    pts = E.random_points(6, rng)
    P, Q = pts[0], pts[1]
    Z0 = type(P).zero()
    lhs = [P, Q, P, P, Z0, P, Z0]
    rhs = [Q, P, P, E.neg(P), Q, Z0, Z0]
    A = ed.to_device(lhs)
    B = ed.to_device(rhs)

    @jax.jit
    def ops(A, B):
        return ed.add(A, B), ed.sub(A, B), ed.double(A), ed.is_zero(A), ed.is_on_curve(A)

    r_add, r_sub, r_dbl, r_zero, r_oc = ops(A, B)
    for raw, (a, b) in zip(ed.to_host_raw(r_add), zip(lhs, rhs)):
        assert ed_eq(E, raw, E.add(a, b))
    for raw, (a, b) in zip(ed.to_host_raw(r_sub), zip(lhs, rhs)):
        assert ed_eq(E, raw, E.sub(a, b))
    for raw, a in zip(ed.to_host_raw(r_dbl), lhs):
        assert ed_eq(E, raw, E.double(a))
    assert list(np.asarray(r_zero)) == [a.is_zero for a in lhs]
    assert all(np.asarray(r_oc))

    bad = ed.to_device([type(P)(P.x, (P.y + 1) % params.modulus)])
    assert not np.asarray(jax.jit(ed.is_on_curve)(bad))[0]

    # scale
    k = rng.randrange(params.order // 2, params.order)
    got = ed.to_host_raw(jax.jit(lambda v: ed.scale(k, v))(ed.to_device(pts[:2])))
    for raw, a in zip(got, pts[:2]):
        assert ed_eq(E, raw, E.scale(k, a))
