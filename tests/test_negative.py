"""Negative-path tests: malformed input must be REJECTED (mirror of the
reference's handleErrors contract, testing/equivalent.ts:228-256, and the
invalid-point cases of curve-projective.test.ts)."""

import jax
import numpy as np
import pytest

from montgomery_tpu.bigint import TwistedEdwardsCurve, WeierstrassCurve
from montgomery_tpu.concrete import ED_ON_BLS12_377, PALLAS
from montgomery_tpu.serve import compute_msm, get_curve


def test_empty_inputs_rejected():
    with pytest.raises(ValueError, match="empty|nonzero"):
        compute_msm([], [], curve="pallas")
    with pytest.raises(ValueError, match="nonzero multiple"):
        compute_msm(b"", b"", curve="pallas")


def test_misaligned_point_bytes_rejected():
    ctx = get_curve("pallas")
    nb = ctx.fops.mp.n_packed_bytes
    with pytest.raises(ValueError, match="nonzero multiple"):
        compute_msm(b"\x00" * (2 * nb + 1), b"\x00" * 32, curve="pallas")


def test_length_mismatch_rejected(rng):
    C = WeierstrassCurve(PALLAS)
    pts = C.random_points(4, rng)
    sc = [1, 2, 3]
    with pytest.raises(ValueError, match="length mismatch"):
        compute_msm([(P.x, P.y) for P in pts], sc, curve="pallas", c=4)


def test_off_curve_point_rejected(rng):
    C = WeierstrassCurve(PALLAS)
    pts = C.random_points(4, rng)
    sc = [rng.randrange(PALLAS.order) for _ in range(4)]
    xy = [(P.x, P.y) for P in pts]
    xy[2] = (xy[2][0], (xy[2][1] + 1) % PALLAS.modulus)  # off-curve y
    with pytest.raises(ValueError, match="not on curve"):
        compute_msm(xy, sc, curve="pallas", c=4)
    # validate=False skips the check (msmUnsafe-style contract)
    compute_msm(xy, sc, curve="pallas", c=4, validate=False)


def test_off_curve_edwards_rejected(rng):
    E = TwistedEdwardsCurve(ED_ON_BLS12_377)
    pts = E.random_points(4, rng)
    sc = [rng.randrange(ED_ON_BLS12_377.order) for _ in range(4)]
    xy = [(P.x, P.y) for P in pts]
    xy[1] = ((xy[1][0] + 1) % ED_ON_BLS12_377.modulus, xy[1][1])
    with pytest.raises(ValueError, match="not on curve"):
        compute_msm(xy, sc, curve="ed-on-bls12-377", c=4)


def test_subgroup_predicate_flags_cofactor_points(rng):
    """is_in_subgroup must reject on-curve points OUTSIDE the prime-order
    subgroup (reference curve-projective.test.ts isInSubgroup cases).
    ed-on-bls12-377 has cofactor 4, so such points exist."""
    from montgomery_tpu.msm import EdwardsMsm

    from montgomery_tpu.bigint.twisted_edwards import EdwardsPoint

    E = TwistedEdwardsCurve(ED_ON_BLS12_377)
    ctx = EdwardsMsm(ED_ON_BLS12_377)
    good = E.random_points(2, rng)
    # an on-curve point OUTSIDE the subgroup: solve the curve equation for
    # random x WITHOUT cofactor clearing (cofactor 4 -> 3/4 of raw points)
    F = E.field
    bad = None
    for _ in range(256):
        x = F.random(rng)
        denom = F.sub(1, F.mul(E.d, F.square(x)))
        if denom == 0:
            continue
        y = F.sqrt(F.div(F.add(1, F.square(x)), denom))
        if y is None:
            continue
        P = EdwardsPoint(x, y)
        if E.is_on_curve(P) and not E.is_in_subgroup(P):
            bad = P
            break
    assert bad is not None, "cofactor-4 curve must yield full-order points"
    batch = ctx.ed.to_device(good + [bad])
    flags = np.asarray(jax.jit(ctx.ed.is_in_subgroup)(batch))
    assert list(flags) == [True, True, False]


def test_oversized_scalar_bytes_rejected():
    ctx = get_curve("pallas")
    nb = (PALLAS.order.bit_length() + 7) // 8
    with pytest.raises((ValueError, AssertionError)):
        # wrong blob size (not a multiple of the per-scalar byte count)
        ctx.scalars_to_limbs(b"\x01" * (nb + 1))
