"""Serve-path API: `compute_msm` with byte or bigint ingestion.

Analog of the reference's ZPrize harness entry point
(scripts/zprize23/submission.ts:19-35 compute_msm + parallel.ts
pointsFromBytes/scalarsFromBytes :97-133): accepts points/scalars as packed
little-endian bytes or python ints, runs the full device MSM, returns the
affine result as bigints.
"""

from __future__ import annotations

from functools import lru_cache

from .bigint.twisted_edwards import EdwardsPoint
from .bigint.weierstrass import AffinePoint
from .concrete import BLS12_377, BLS12_381, ED_ON_BLS12_377, PALLAS
from .msm.api import EdwardsMsm, WeierstrassMsm

_WEIERSTRASS = {p.label: p for p in (BLS12_377, BLS12_381, PALLAS)}
_EDWARDS = {ED_ON_BLS12_377.label: ED_ON_BLS12_377}


@lru_cache(maxsize=None)
def get_curve(label: str):
    """Cached curve context singleton (analog of reference concrete/bls12-377.ts
    `BLS12377 = await Weierstraß.create(curveParams)`)."""
    if label in _WEIERSTRASS:
        return WeierstrassMsm(_WEIERSTRASS[label])
    if label in _EDWARDS:
        return EdwardsMsm(_EDWARDS[label])
    raise KeyError(f"unknown curve {label!r}; have "
                   f"{sorted(_WEIERSTRASS) + sorted(_EDWARDS)}")


def _coerce_points(ctx, points):
    """points: list of (x, y) int tuples, AffinePoint/EdwardsPoint, or a bytes
    object with 2*n_packed_bytes per point (x || y, little-endian)."""
    nb = ctx.fops.mp.n_packed_bytes
    if isinstance(points, (bytes, bytearray)):
        step = 2 * nb
        assert len(points) % step == 0
        out = []
        for off in range(0, len(points), step):
            x = int.from_bytes(points[off : off + nb], "little")
            y = int.from_bytes(points[off + nb : off + step], "little")
            out.append((x, y))
        points = out
    cls = AffinePoint if isinstance(ctx, WeierstrassMsm) else EdwardsPoint
    coerced = []
    for P in points:
        if isinstance(P, (AffinePoint, EdwardsPoint)):
            coerced.append(P)
        else:
            x, y = P
            coerced.append(cls(x, y))
    return coerced


def _coerce_scalars(ctx, scalars):
    if isinstance(scalars, (bytes, bytearray)):
        nb = (ctx.params.order.bit_length() + 7) // 8
        assert len(scalars) % nb == 0
        scalars = [
            int.from_bytes(scalars[off : off + nb], "little")
            for off in range(0, len(scalars), nb)
        ]
    return [int(s) for s in scalars]


def compute_msm(points, scalars, curve: str = "bls12-377",
                c: int | None = None) -> tuple[int, int]:
    """S = sum_i scalars[i] * points[i]; returns affine (x, y) as ints
    ((0, 0) encodes the point at infinity for Weierstrass curves).

    points/scalars may be python ints/tuples or packed little-endian bytes
    (x || y per point; order-sized scalars)."""
    ctx = get_curve(curve)
    pts = _coerce_points(ctx, points)
    sc = _coerce_scalars(ctx, scalars)
    if isinstance(ctx, WeierstrassMsm):
        # hot path: everything after numpy ingestion is ONE jit — device GLV
        # decomposition + digit slicing + batched-affine MSM (no per-scalar
        # Python; reference decomposes inside the parallel msm,
        # scripts/zprize23/submission.ts:26-30)
        if ctx.glv is not None:
            R = ctx.msm_full(sc, pts, c=c)
        else:
            R = ctx.msm(sc, pts, c=c)
        if R.is_zero:
            return (0, 0)
        return (R.x, R.y)
    R = ctx.msm_full(sc, pts, c=c)
    return (R.x, R.y)
