"""Serve-path API: `compute_msm` with byte or bigint ingestion.

Analog of the reference's ZPrize harness entry point
(scripts/zprize23/submission.ts:19-35 compute_msm + parallel.ts
pointsFromBytes/scalarsFromBytes :97-133): accepts points/scalars as packed
little-endian bytes or python ints, runs the full device MSM, returns the
affine result as bigints.

Ingestion is vectorized end-to-end: bytes go straight through numpy limb
extraction + one device to-Montgomery kernel (no per-point Python loop —
the reference shards exactly this conversion across its worker pool,
parallel.ts:97-133); int inputs pay one C-level int.to_bytes per value.
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


def _points_to_batch(ctx, points):
    """points (packed bytes | list of (x, y) tuples or oracle points) ->
    device point batch via the vectorized byte path. For Weierstrass curves
    (0, 0) encodes the point at infinity (AffinePoint.zero)."""
    if isinstance(points, (bytes, bytearray)):
        step = 2 * ctx.fops.mp.n_packed_bytes
        if len(points) == 0 or len(points) % step != 0:
            raise ValueError(
                f"point bytes must be a nonzero multiple of {step} "
                f"(2 coordinates x n_packed_bytes); got {len(points)}"
            )
        return ctx.points_from_bytes(points)
    if len(points) == 0:
        raise ValueError("empty point list")
    nb = ctx.fops.mp.n_packed_bytes

    def xy(P):
        if isinstance(P, (AffinePoint, EdwardsPoint)):
            return P.x, P.y
        return P

    blob = b"".join(
        int(x).to_bytes(nb, "little") + int(y).to_bytes(nb, "little")
        for x, y in map(xy, points)
    )
    return ctx.points_from_bytes(blob)


def _scalar_limbs(ctx, scalars):
    """scalars (packed bytes | list of ints) -> (ns, N) device limb planes."""
    import jax.numpy as jnp

    return jnp.asarray(ctx.scalars_to_limbs(scalars))


def compute_msm(points, scalars, curve: str = "bls12-377",
                c: int | None = None, validate: bool = True) -> tuple[int, int]:
    """S = sum_i scalars[i] * points[i]; returns affine (x, y) as ints
    ((0, 0) encodes the point at infinity for Weierstrass curves).

    points/scalars may be python ints/tuples or packed little-endian bytes
    (x || y per point; order-sized scalars).

    validate=True rejects malformed input with ValueError: empty inputs,
    length mismatches, and off-curve points (one vectorized on-curve check —
    the reference's equivalence harness requires invalid inputs to be
    rejected, testing/equivalent.ts:228-256 handleErrors + the invalid-point
    cases of curve-projective.test.ts)."""
    import jax
    import numpy as np

    ctx = get_curve(curve)
    batch = _points_to_batch(ctx, points)
    limbs = _scalar_limbs(ctx, scalars)
    n_pts = int((batch.inf if isinstance(ctx, WeierstrassMsm)
                 else batch.X).shape[-1])
    if int(limbs.shape[-1]) != n_pts:
        raise ValueError(
            f"length mismatch: {n_pts} points vs {int(limbs.shape[-1])} scalars"
        )
    if validate:
        cache = ctx._jits
        if "serve_on_curve" not in cache:
            chk = (ctx.affine.is_on_curve if isinstance(ctx, WeierstrassMsm)
                   else ctx.ed.is_on_curve)
            cache["serve_on_curve"] = jax.jit(chk)
        ok = cache["serve_on_curve"](batch)
        bad = int(np.sum(~np.asarray(ok)))
        if bad:
            raise ValueError(f"{bad} input point(s) not on curve {curve!r}")
    # hot path: everything after numpy ingestion is ONE jit — device GLV
    # decomposition (Weierstrass) / digit slicing + MSM (no per-scalar
    # Python; reference decomposes inside the parallel msm,
    # scripts/zprize23/submission.ts:26-30)
    R = ctx.msm_full(limbs, batch, c=c)
    if isinstance(ctx, WeierstrassMsm) and R.is_zero:
        return (0, 0)
    return (R.x, R.y)
