"""Device random-point generation vs the oracle (reference
curve-random.ts + curve-affine.ts:155-190 + curve-twisted-edwards.ts:269-312):
sqrt-trial generators must produce on-curve subgroup points."""

import numpy as np

from montgomery_tpu.bigint import TwistedEdwardsCurve, WeierstrassCurve
from montgomery_tpu.concrete import BLS12_377, ED_ON_BLS12_377
from montgomery_tpu.msm import EdwardsMsm, WeierstrassMsm
from montgomery_tpu.curves.random import (
    random_points_edwards,
    random_points_fast,
    random_points_weierstrass,
)


def test_random_points_weierstrass_sqrt_trial():
    C = WeierstrassCurve(BLS12_377)
    ctx = WeierstrassMsm(BLS12_377)
    N = 16
    pts = random_points_weierstrass(ctx.proj, N, seed=3)
    host = ctx.proj.affine_to_host(pts)
    for i, P in enumerate(host):
        assert not P.is_zero
        assert C.is_on_curve(P), f"lane {i}"
    # cofactor cleared -> subgroup membership (oracle check on one point)
    assert C.is_in_subgroup(host[0])


def test_random_points_fast_weierstrass():
    C = WeierstrassCurve(BLS12_377)
    ctx = WeierstrassMsm(BLS12_377)
    pts = random_points_fast(ctx.proj, 12, seed=5)
    host = ctx.proj.affine_to_host(pts)
    for P in host:
        assert C.is_on_curve(P)
    assert C.is_in_subgroup(host[0])
    # ALL outputs pairwise distinct — the msmUnsafe bench contract (a
    # duplicate pair inside one bucket poisons the unsafe engine's shared
    # batch inversion; found as the c=15 failure, round 5)
    assert len({(P.x, P.y) for P in host}) == len(host)


def test_fast_point_index_entropy():
    """The table-combination space must be large enough that duplicate
    points AND colliding small integer combinations are negligible (the
    msmUnsafe bench contract): >= 64 bits, and no duplicate draws in a
    sample."""
    from montgomery_tpu.curves.random import _table_indices

    rng = np.random.default_rng(0)
    idx = _table_indices(rng, 5000, 8, 512)
    combos = {tuple(idx[:, i]) for i in range(idx.shape[1])}
    assert len(combos) == idx.shape[1]
    import pytest

    with pytest.raises(AssertionError):
        _table_indices(rng, 16, 3, 256)  # 24-bit space must be rejected


def test_random_points_edwards_device():
    E = TwistedEdwardsCurve(ED_ON_BLS12_377)
    ctx = EdwardsMsm(ED_ON_BLS12_377)
    N = 12
    P = random_points_edwards(ctx.ed, N, seed=7)
    host = ctx.ed.to_host(P)
    for i, Q in enumerate(host):
        assert E.is_on_curve(Q), f"lane {i}"
    assert E.is_in_subgroup(host[0])
    assert len({(Q.x, Q.y) for Q in host}) > 1
