"""Serve-path tests: compute_msm with bigint and byte ingestion
(mirror of reference scripts/zprize23/submission.ts semantics)."""

import pytest

from montgomery_tpu.bigint import TwistedEdwardsCurve, WeierstrassCurve, msm as oracle_msm
from montgomery_tpu.concrete import ED_ON_BLS12_377, PALLAS
from montgomery_tpu.serve import compute_msm, get_curve


def test_compute_msm_weierstrass_ints(rng):
    C = WeierstrassCurve(PALLAS)
    N = 8
    pts = C.random_points(N, rng)
    sc = [rng.randrange(PALLAS.order) for _ in range(N)]
    x, y = compute_msm([(P.x, P.y) for P in pts], sc, curve="pallas", c=4)
    exp = oracle_msm(C, sc, pts)
    assert (x, y) == (exp.x, exp.y)


def test_compute_msm_bytes(rng):
    C = WeierstrassCurve(PALLAS)
    ctx = get_curve("pallas")
    nb = ctx.fops.mp.n_packed_bytes
    N = 8
    pts = C.random_points(N, rng)
    sc = [rng.randrange(PALLAS.order) for _ in range(N)]
    pbytes = b"".join(
        P.x.to_bytes(nb, "little") + P.y.to_bytes(nb, "little") for P in pts
    )
    snb = (PALLAS.order.bit_length() + 7) // 8
    sbytes = b"".join(s.to_bytes(snb, "little") for s in sc)
    x, y = compute_msm(pbytes, sbytes, curve="pallas", c=4)
    exp = oracle_msm(C, sc, pts)
    assert (x, y) == (exp.x, exp.y)


def test_compute_msm_edwards(rng):
    E = TwistedEdwardsCurve(ED_ON_BLS12_377)
    N = 8
    pts = E.random_points(N, rng)
    sc = [rng.randrange(ED_ON_BLS12_377.order) for _ in range(N)]
    x, y = compute_msm([(P.x, P.y) for P in pts], sc, curve="ed-on-bls12-377", c=4)
    exp = oracle_msm(E, sc, pts)
    assert (x, y) == (exp.x, exp.y)


def test_unknown_curve():
    with pytest.raises(KeyError):
        get_curve("nope")


def test_serve_no_per_scalar_python(rng, monkeypatch):
    """The serve hot path must not touch the per-scalar host GLV loop:
    decomposition runs on device inside the single jit (round-2/3 verdict
    item; reference decomposes inside the parallel msm,
    scripts/zprize23/submission.ts:26-30). N = 2^10 with the host loop
    booby-trapped."""
    import montgomery_tpu.scalar.glv as glv_mod
    from montgomery_tpu.bigint import WeierstrassCurve as WC
    from montgomery_tpu.concrete import BLS12_377
    from montgomery_tpu.ops import kernels

    C = WC(BLS12_377)
    N = 1 << 10
    base = [C.scale(rng.randrange(1, 1 << 62), C.generator) for _ in range(8)]
    pts = [C.scale(1 + (i % 97), base[i % 8]) for i in range(N)]
    sc = [rng.randrange(BLS12_377.order) for _ in range(N)]

    def boom(*a, **k):
        raise AssertionError("per-scalar host GLV called on the serve path")

    monkeypatch.setattr(glv_mod, "decompose", boom)
    monkeypatch.setattr(glv_mod, "decompose_batch", boom)
    with kernels.force_pallas(True, callback=True):
        x, y = compute_msm([(P.x, P.y) for P in pts], sc, curve="bls12-377")
    exp = oracle_msm(C, sc, pts)
    assert (x, y) == (exp.x, exp.y)
