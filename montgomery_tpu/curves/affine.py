"""Batched affine Weierstrass additions with one shared batch inversion.

The flagship kernel family of the reference (curve-affine.ts batchAddNew
:376-458 / batchAddUnsafeNew :463-522): thousands of affine adds amortize a
single field inversion. TPU re-design: the reference's edge-case triage
(sorting lanes into add/double/skip lists) becomes masked selects — every
lane computes the generic chord/tangent slope, with poisoned denominators
substituted by 1 *before* the shared inversion (SURVEY.md §7.3 item 3).

Safe cost/lane: ~5M + amortized batch-inv (~3M). Unsafe: ~4M + ~3M.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..bigint.weierstrass import CurveParams
from ..ops import limbs as codec
from ..ops.field import Array, FieldOps
from .projective import AffineBatch


class AffineOps:
    """Batched affine group ops for y^2 = x^3 + a x + b."""

    def __init__(self, fops: FieldOps, params: CurveParams):
        self.f = fops
        self.params = params
        p = fops.p
        R = fops.mp.R
        self.a_is_zero = params.a % p == 0
        self.a_mont = codec.pack_scalar(params.a % p * R % p, fops.mp)
        self.b_mont = codec.pack_scalar(params.b % p * R % p, fops.mp)

    def zero(self, N: int) -> AffineBatch:
        f = self.f
        return AffineBatch(
            f.zeros((N,)), f.zeros((N,)), jnp.ones((N,), dtype=bool)
        )

    def select(self, mask: Array, a: AffineBatch, b: AffineBatch) -> AffineBatch:
        s = self.f._sel
        return AffineBatch(
            s(mask, a.x, b.x), s(mask, a.y, b.y), jnp.where(mask, a.inf, b.inf)
        )

    def neg(self, A: AffineBatch) -> AffineBatch:
        return AffineBatch(A.x, self.f.neg(A.y), A.inf)

    def _slope_numer_dbl(self, x, y):
        """3 x^2 + a (tangent numerator)."""
        f = self.f
        xx = f.square(x)
        num = f.add(f.add(xx, xx), xx)
        if not self.a_is_zero:
            num = f.add(num, f.bc_full(self.a_mont, x))
        return num

    def batch_add(self, G: AffineBatch, H: AffineBatch) -> AffineBatch:
        """Lane-wise G[i] + H[i], complete: handles infinities, doubling
        (x1==x2, y1==y2), and cancellation (x1==x2, y1==-y2).
        One batch inversion shared across all lanes."""
        f = self.f
        x1, y1, x2, y2 = G.x, G.y, H.x, H.y
        xeq = f.is_equal(x1, x2)
        yeq = f.is_equal(y1, y2)
        finite = jnp.logical_not(G.inf) & jnp.logical_not(H.inf)
        is_dbl = xeq & yeq & finite
        cancel = xeq & jnp.logical_not(yeq) & finite

        denom = f._sel(is_dbl, f.add(y1, y1), f.sub(x2, x1))
        # poisoned lanes (cancel, 2-torsion double with y=0, infinities)
        # must not reach the shared inversion: substitute 1
        y1_zero = f.is_zero(y1)
        poisoned = cancel | (is_dbl & y1_zero) | jnp.logical_not(finite)
        one = f.bc_full(f.one_mont, x1)
        denom = f._sel(poisoned, one, denom)
        dinv = f.batch_inv(denom)

        numer = f._sel(is_dbl, self._slope_numer_dbl(x1, y1), f.sub(y2, y1))
        (lam,) = f.mul_list([(numer, dinv)])
        (ll,) = f.mul_list([(lam, lam)])
        x3 = f.sub(f.sub(ll, x1), x2)
        (t,) = f.mul_list([(lam, f.sub(x1, x3))])
        y3 = f.sub(t, y1)
        inf3 = cancel | (is_dbl & y1_zero) | (G.inf & H.inf)
        out = AffineBatch(x3, y3, inf3)
        out = self.select(G.inf & jnp.logical_not(H.inf), H, out)
        out = self.select(H.inf & jnp.logical_not(G.inf), G, out)
        return out

    def batch_add_unsafe(self, G: AffineBatch, H: AffineBatch) -> AffineBatch:
        """Lane-wise G[i] + H[i] assuming all lanes are finite points with
        x1 != x2 (reference batchAddUnsafeNew: ~5% faster, used for random
        inputs where collisions have negligible probability)."""
        f = self.f
        dinv = f.batch_inv(f.sub(H.x, G.x))
        (lam,) = f.mul_list([(f.sub(H.y, G.y), dinv)])
        (ll,) = f.mul_list([(lam, lam)])
        x3 = f.sub(f.sub(ll, G.x), H.x)
        (t,) = f.mul_list([(lam, f.sub(G.x, x3))])
        y3 = f.sub(t, G.y)
        return AffineBatch(x3, y3, jnp.zeros_like(G.inf))

    def batch_double(self, G: AffineBatch) -> AffineBatch:
        """Lane-wise 2*G[i] (reference batchDoubleInPlace, curve-affine.ts:537-687)."""
        f = self.f
        y_zero = f.is_zero(G.y)
        bad = G.inf | y_zero
        one = f.bc_full(f.one_mont, G.x)
        denom = f._sel(bad, one, f.add(G.y, G.y))
        dinv = f.batch_inv(denom)
        lam = f.mul(self._slope_numer_dbl(G.x, G.y), dinv)
        x3 = f.sub(f.sub(f.square(lam), G.x), G.x)
        y3 = f.sub(f.mul(lam, f.sub(G.x, x3)), G.y)
        return AffineBatch(x3, y3, bad)

    def is_on_curve(self, A: AffineBatch) -> Array:
        f = self.f
        rhs = f.mul(f.square(A.x), A.x)
        if not self.a_is_zero:
            rhs = f.add(rhs, f.mul_const(A.x, self.a_mont))
        rhs = f.add(rhs, f.bc_full(self.b_mont, A.x))
        return f.is_equal(f.square(A.y), rhs) | A.inf
