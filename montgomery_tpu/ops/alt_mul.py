"""Alternative multipliers: schoolbook product + Barrett reduction.

TPU analogs of the reference's alternative-mul baselines
(wasm/multiply-schoolbook.ts:12-72 plain n^2 product;
wasm/barrett.ts:7-78 Barrett reduction with msb-truncated quotient,
findMsbCutoff :219-254). The reference validated its Montgomery design by
benchmarking against these; scripts/micro_bench.py does the same here. They
also serve moduli that need not be prime (the reference's GLV-by-lambda
legacy path, wasm/glv.ts:248-412).

All functions operate on PLAIN-domain limb planes (not Montgomery form).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..bigint.util import to_limbs
from ..scalar.device import conv_mul_const, ks_carry
from .field import Array, FieldOps, _conv_tree


def schoolbook_product(f: FieldOps, x: Array, y: Array) -> Array:
    """Plain 2n-limb schoolbook product of two n-limb operands
    (reference multiply-schoolbook.ts:12-72): shifted-accumulate conv tree
    + one wide carry pass. Requires n * 2^(2w) < 2^31 (same bound as the
    Montgomery dot form)."""
    n, w = f.n, f.w
    assert n * (1 << (2 * w)) < (1 << 31)
    T = _conv_tree([(i, x[i] * y) for i in range(n)], 2 * n)
    return f.carry_wide(T, bound=n << (2 * w))


@dataclass(frozen=True)
class BarrettParams:
    """Precomputed Barrett constants for x mod p with x < p^2
    (reference barrettReduction, wasm/barrett.ts:7-78: m = floor(2^(2K)/p),
    q = floor(floor(x / 2^(K-1)) * m / 2^(K+1)), error <= 2)."""

    f: FieldOps
    K: int  # bit length of p
    mu_limbs: tuple  # floor(2^(2K) / p), K+1 bits
    p_limbs: tuple

    @property
    def n(self):
        return self.f.n


def barrett_params(f: FieldOps) -> BarrettParams:
    w = f.w
    K = f.p.bit_length()
    mu = (1 << (2 * K)) // f.p
    return BarrettParams(
        f=f,
        K=K,
        mu_limbs=tuple(to_limbs(mu, w, (mu.bit_length() + w - 1) // w)),
        p_limbs=tuple(to_limbs(f.p, w, f.n)),
    )


def _shift_right_bits(T: Array, s: int, w: int, out_len: int) -> Array:
    """floor(value / 2^s) of a canonical limb plane, out_len limbs."""
    d, r = divmod(s, w)
    mask = (1 << w) - 1
    n_in = T.shape[0]
    zero = jnp.zeros_like(T[0])
    rows = []
    for i in range(out_len):
        lo = T[i + d] if i + d < n_in else zero
        if r == 0:
            rows.append(lo)
            continue
        hi = T[i + d + 1] if i + d + 1 < n_in else zero
        rows.append(((lo >> r) | (hi << (w - r))) & mask)
    return jnp.stack(rows, axis=0)


def barrett_reduce(bp: BarrettParams, T: Array) -> Array:
    """T (2n limbs canonical, value < p^2) -> T mod p in [0, p), n limbs.

    Bit-granular Barrett (reference wasm/barrett.ts:7-78): classical error
    <= 2 plus < 1 from the 2-guard-limb truncated convolution
    (findMsbCutoff analysis, wasm/barrett.ts:219-254) -> at most 3
    conditional subtracts."""
    from ..scalar.device import carry_signed

    f = bp.f
    n, w, K = f.n, f.w, bp.K
    # q1 = floor(T / 2^(K-1)), < 2^(K+1)
    nq1 = (K + 1 + w - 1) // w
    q1 = _shift_right_bits(T, K - 1, w, nq1)
    # q = floor(q1 * mu / 2^(K+1)), < 2^(K+1): truncated conv from 2 limbs
    # below the cut, then a bit shift of the kept limbs
    cut = K + 1
    k_lo = max(0, cut // w - 2)
    nq = (K + 1 + w - 1) // w + 1
    prod = conv_mul_const(q1, bp.mu_limbs, w, k_lo=k_lo,
                          k_hi=cut // w + nq + 1)
    q = _shift_right_bits(prod, cut - k_lo * w, w, nq)
    # r = T - q*p over nr limbs (value in [0, 4p))
    nr = min((K + 3 + w - 1) // w + 1, 2 * n)
    qp = conv_mul_const(q, bp.p_limbs, w, k_lo=0, k_hi=nr)
    r = carry_signed(T[:nr] - qp, w, nr + 1)
    p_ext = jnp.asarray(
        np.array(to_limbs(f.p, w, nr), dtype=np.int32).reshape(nr, 1)
    )
    for _ in range(3):
        ge = _geq(r, p_ext, w)
        d = carry_signed(r - p_ext, w, nr + 1)
        r = jnp.where(ge[None], d, r)
    out_rows = [r[i] if i < nr else jnp.zeros_like(r[0]) for i in range(n)]
    return jnp.stack(out_rows, axis=0)


def _geq(a: Array, b_plane: Array, w: int) -> Array:
    """Lexicographic a >= b over limb planes (canonical limbs)."""
    n = a.shape[0]
    b = jnp.broadcast_to(b_plane, a.shape)
    gt = a > b
    eq = a == b
    res = gt[0] | eq[0]  # base: a0 >= b0 (all-equal must count as >=)
    for i in range(1, n):
        res = gt[i] | (eq[i] & res)
    return res


def barrett_mul(bp: BarrettParams, x: Array, y: Array) -> Array:
    """Plain-domain modular multiply via schoolbook + Barrett — the
    alternative-mul baseline (reference benchmarked montgomery vs barrett,
    doc/zprize22.md:199). One fused Pallas kernel on TPU (same treatment as
    the Montgomery mul, so the micro-benchmark comparison is apples to
    apples)."""
    from . import kernels

    if not kernels.use_pallas():
        return barrett_reduce(bp, schoolbook_product(bp.f, x, y))
    cache = bp.__dict__.setdefault("_fused_cache", {})
    fn = cache.get("bmul")
    if fn is None:

        def fn(a, b, _bp=bp):
            return [barrett_reduce(_bp, schoolbook_product(_bp.f, a, b))]

        cache["bmul"] = fn
    return kernels.fused("barrett_mul", fn, [x, y], [bp.n])[0]
