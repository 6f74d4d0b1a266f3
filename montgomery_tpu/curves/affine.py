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
import numpy as np

from ..bigint.weierstrass import CurveParams
from ..ops import limbs as codec
from ..ops.field import Array, FieldOps
from ..utils.memo import MemoizedOps, ready
from .projective import AffineBatch


class AffineOps(MemoizedOps):
    """Batched affine group ops for y^2 = x^3 + a x + b."""

    def __init__(self, fops: FieldOps, params: CurveParams):
        if ready(self):
            return
        self.f = fops
        self.params = params
        p = fops.p
        R = fops.mp.R
        self.a_is_zero = params.a % p == 0
        self.a_mont = codec.pack_scalar(params.a % p * R % p, fops.mp)
        self.b_mont = codec.pack_scalar(params.b % p * R % p, fops.mp)
        # stable bound refs so the Pallas-call cache hits (ops/kernels.py)
        self._pre_f = self._pre_inv_formula
        self._post_f = self._post_inv_formula
        self._pre_unsafe_f = self._pre_inv_unsafe_formula
        self._pre_masked_f = self._pre_inv_masked_formula
        self._post_unsafe_f = self._post_inv_unsafe_formula
        self._pre_packed_f = self._pre_packed_formula
        self._post_packed_f = self._post_packed_formula
        self._pre_packed_u_f = self._pre_packed_unsafe_formula
        self._post_packed_u_f = self._post_packed_unsafe_formula
        self._pack_glv_f = self._pack_glv_formula
        beta = params.endomorphism.beta if params.endomorphism else 0
        self.beta_mont = codec.pack_scalar(beta % p * R % p, fops.mp)

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

    def _pre_inv_formula(self, x1, y1, x2, y2, infG, infH):
        """Fused pre-inversion stage: slope numerator/denominator selection
        and edge-case triage, all int32 masks (Mosaic-safe).
        Outputs [denom (poison-substituted), numer, flags] with flags bits:
        1 = is_dbl, 2 = cancel, 4 = y1_zero."""
        f = self.f
        xeq = f.is_equal(x1, x2).astype(jnp.int32)[None]
        yeq = f.is_equal(y1, y2).astype(jnp.int32)[None]
        finite = (1 - infG) * (1 - infH)
        is_dbl = xeq * yeq * finite
        cancel = xeq * (1 - yeq) * finite
        y1_zero = f.is_zero(y1).astype(jnp.int32)[None]

        denom = f._sel(is_dbl[0] != 0, f.add(y1, y1), f.sub(x2, x1))
        # poisoned lanes (cancel, 2-torsion double with y=0, infinities)
        # must not reach the shared inversion: substitute 1
        poisoned = cancel | (is_dbl * y1_zero) | (1 - finite)
        one = f.bc_full(f.one_mont, x1)
        denom = f._sel(poisoned[0] != 0, one, denom)
        numer = f._sel(
            is_dbl[0] != 0, self._slope_numer_dbl(x1, y1), f.sub(y2, y1)
        )
        flags = is_dbl + 2 * cancel + 4 * y1_zero
        return [denom, numer, flags]

    def _post_inv_formula(self, x1, y1, x2, y2, dinv, numer, flags, infG, infH):
        """Fused post-inversion stage: chord/tangent completion + edge-case
        selects. Outputs [x3, y3, inf3-plane]."""
        f = self.f
        is_dbl = flags & 1
        cancel = (flags >> 1) & 1
        y1_zero = (flags >> 2) & 1
        lam = f.mul(numer, dinv)
        ll = f.square(lam)
        x3 = f.sub(f.sub(ll, x1), x2)
        t = f.mul(lam, f.sub(x1, x3))
        y3 = f.sub(t, y1)
        inf3 = cancel | (is_dbl * y1_zero) | (infG * infH)
        # one-operand-infinite cases pass the other operand through
        gi = (infG * (1 - infH))[0] != 0
        hi = (infH * (1 - infG))[0] != 0
        x3 = f._sel(gi, x2, x3)
        y3 = f._sel(gi, y2, y3)
        x3 = f._sel(hi, x1, x3)
        y3 = f._sel(hi, y1, y3)
        return [x3, y3, inf3]

    def batch_add(self, G: AffineBatch, H: AffineBatch) -> AffineBatch:
        """Lane-wise G[i] + H[i], complete: handles infinities, doubling
        (x1==x2, y1==y2), and cancellation (x1==x2, y1==-y2).
        One batch inversion shared across all lanes; the arithmetic around
        it runs as TWO fused Pallas kernels (pre/post) — inline XLA carry
        chains at MSM widths cost 2-3x a full Montgomery mul each."""
        from ..ops import kernels

        f = self.f
        infG = kernels.mask_to_plane(G.inf)
        infH = kernels.mask_to_plane(H.inf)
        denom, numer, flags = kernels.fused(
            "aff_pre", self._pre_f, [G.x, G.y, H.x, H.y, infG, infH],
            [f.n, f.n, 1],
        )
        shape = denom.shape
        dinv = f.batch_inv(denom.reshape(f.n, -1)).reshape(shape)
        x3, y3, inf3 = kernels.fused(
            "aff_post", self._post_f,
            [G.x, G.y, H.x, H.y, dinv, numer, flags, infG, infH],
            [f.n, f.n, 1],
        )
        return AffineBatch(x3, y3, kernels.plane_to_mask(inf3))

    def _pre_inv_unsafe_formula(self, x1, x2):
        return [self.f.sub(x2, x1)]

    def _pre_inv_masked_formula(self, x1, x2, valid):
        """Unsafe pre-inversion with a validity plane: invalid lanes (e.g.
        pass-through lanes of a pair-halving round, where A == B would give a
        zero denominator) get denominator 1 so they cannot poison the shared
        inversion. No field comparisons — the MSM engine guarantees real
        pairs are distinct finite points (reference msmUnsafe contract)."""
        f = self.f
        one = f.bc_full(f.one_mont, x1)
        return [f._sel(valid[0] != 0, f.sub(x2, x1), one)]

    def _post_inv_unsafe_formula(self, x1, y1, x2, y2, dinv):
        f = self.f
        lam = f.mul(f.sub(y2, y1), dinv)
        ll = f.square(lam)
        x3 = f.sub(f.sub(ll, x1), x2)
        t = f.mul(lam, f.sub(x1, x3))
        y3 = f.sub(t, y1)
        return [x3, y3]

    def batch_add_unsafe(self, G: AffineBatch, H: AffineBatch,
                         valid=None) -> AffineBatch:
        """Lane-wise G[i] + H[i] assuming all valid lanes are finite points
        with x1 != x2 (reference batchAddUnsafeNew, curve-affine.ts:463-522:
        faster, used for random inputs where collisions have negligible
        probability). `valid` (bool (N,), optional) marks lanes whose result
        is consumed — invalid lanes are excluded from the shared inversion."""
        from ..ops import kernels

        f = self.f
        if valid is None:
            (denom,) = kernels.fused(
                "aff_pre_unsafe", self._pre_unsafe_f, [G.x, H.x], [f.n]
            )
        else:
            (denom,) = kernels.fused(
                "aff_pre_masked", self._pre_masked_f,
                [G.x, H.x, kernels.mask_to_plane(valid)], [f.n],
            )
        shape = denom.shape
        dinv = f.batch_inv(denom.reshape(f.n, -1)).reshape(shape)
        x3, y3 = kernels.fused(
            "aff_post_unsafe", self._post_unsafe_f,
            [G.x, G.y, H.x, H.y, dinv], [f.n, f.n],
        )
        return AffineBatch(x3, y3, jnp.zeros_like(G.inf))

    # ------------------------------------------------------------ packed form
    #
    # The MSM pair-halving engine keeps points as ONE int32 array with TWO
    # w-bit limbs per 32-bit row: rows [x lo-half | y lo-half | inf], where
    # row j of a coordinate holds limbs j and j+ceil(n/2) as (lo | hi<<16).
    # One array means ONE lane gather per operand per round (instead of one
    # per coordinate plane) at HALF the int32 volume — gathers are ~40% of
    # accumulation time at 2^16. The add kernels unpack/repack with
    # shifts+masks (no sublane interleave: halves are contiguous row
    # blocks) and fold in the sign application (round 0 reads points
    # through the sort permutation with per-lane negation, reference
    # msm-batched-affine.ts:350-421) and the pass-through select for
    # unpaired lanes. Requires w <= 16 (limbs must be canonical).

    @property
    def _half(self) -> int:
        return (self.f.n + 1) // 2

    @property
    def packed_rows(self) -> int:
        return 2 * self._half + 1

    def _pack16(self, x: Array) -> Array:
        """(n, M) canonical limbs -> (ceil(n/2), M): limb j | limb j+half << 16
        (shared implementation: ops/limbs.py pack16)."""
        return codec.pack16(x, self.f.n)

    def _unpack16(self, p: Array) -> Array:
        return codec.unpack16(p, self.f.n)

    def pack_rows(self, A: AffineBatch) -> Array:
        """AffineBatch -> (2*ceil(n/2)+1, M) int32 packed rows."""
        assert self.f.w <= 16
        inf = A.inf.astype(jnp.int32)[None]
        return jnp.concatenate([self._pack16(A.x), self._pack16(A.y), inf], axis=0)

    def unpack_rows(self, P: Array) -> AffineBatch:
        h = self._half
        return AffineBatch(
            self._unpack16(P[:h]), self._unpack16(P[h : 2 * h]), P[2 * h] != 0
        )

    def _pack_glv_formula(self, x, y, inf):
        """Fused GLV expansion + packing: emits packed rows for BOTH P and
        phi(P) = (beta x, y) in one kernel (endomorphism reference
        wasm/curve.ts:90-103). Replaces the separate mul_const + concat +
        pack chain of expand_points_glv -> pack_rows, whose per-op dispatch
        cost dominated the expand phase at 2^16 (round-3 verdict item #3)."""
        f = self.f
        beta_limbs = tuple(int(v) for v in np.asarray(self.beta_mont).reshape(-1))
        xb = f._mul_const_impl(x, beta_limbs)
        px, py = self._pack16(x), self._pack16(y)
        return [
            jnp.concatenate([px, py, inf], axis=0),
            jnp.concatenate([self._pack16(xb), py, inf], axis=0),
        ]

    def pack_rows_glv(self, A: AffineBatch) -> Array:
        """AffineBatch (N) -> packed rows (2*half+1, 2N) for the GLV point
        list [P..., phi(P)...] — ONE fused kernel + one lane concat."""
        from ..ops import kernels

        assert self.f.w <= 16
        R = self.packed_rows
        infp = kernels.mask_to_plane(A.inf)
        p1, p2 = kernels.fused(
            "pack_glv", self._pack_glv_f, [A.x, A.y, infp], [R, R]
        )
        return jnp.concatenate([p1, p2], axis=-1)

    def _split_signed(self, A, sA):
        """Packed rows + sign plane -> (x, y sign-applied, inf plane)."""
        f, h = self.f, self._half
        x = self._unpack16(A[:h])
        y = self._unpack16(A[h : 2 * h])
        inf = A[2 * h : 2 * h + 1]
        y = f._sel(sA[0] != 0, f.neg(y), y)
        return x, y, inf

    def _pre_packed_unsafe_formula(self, A, B, hp):
        """Packed unsafe pre-inversion: denom = x2 - x1, invalid (hp == 0)
        lanes get 1 so they cannot poison the shared inversion."""
        f, h = self.f, self._half
        d = f.sub(self._unpack16(B[:h]), self._unpack16(A[:h]))
        one = f.bc_full(f.one_mont, d)
        return [f._sel(hp[0] != 0, d, one)]

    def _post_packed_unsafe_formula(self, A, B, sA, sB, dinv, hp):
        """Packed unsafe post-inversion: chord completion with signs folded
        in and the pass-through select for unpaired lanes (output = sign-
        applied A). Output: ONE packed (2*half+1, M) array."""
        f = self.f
        x1, y1, inf1 = self._split_signed(A, sA)
        x2, y2, _ = self._split_signed(B, sB)
        lam = f.mul(f.sub(y2, y1), dinv)
        x3 = f.sub(f.sub(f.square(lam), x1), x2)
        y3 = f.sub(f.mul(lam, f.sub(x1, x3)), y1)
        hpm = hp[0] != 0
        out_x = f._sel(hpm, x3, x1)
        out_y = f._sel(hpm, y3, y1)
        out_inf = jnp.where(hp != 0, jnp.zeros_like(inf1), inf1)
        return [
            jnp.concatenate(
                [self._pack16(out_x), self._pack16(out_y), out_inf], axis=0
            )
        ]

    def _pre_packed_formula(self, A, B, sA, sB, hp):
        """Packed SAFE pre-inversion (full edge-case triage of
        _pre_inv_formula, with signs folded and hp-invalid lanes poisoned)."""
        f = self.f
        x1, y1, inf1 = self._split_signed(A, sA)
        x2, y2, inf2 = self._split_signed(B, sB)
        denom, numer, flags = self._pre_inv_formula(x1, y1, x2, y2, inf1, inf2)
        one = f.bc_full(f.one_mont, denom)
        denom = f._sel(hp[0] != 0, denom, one)
        return [denom, numer, flags]

    def _post_packed_formula(self, A, B, sA, sB, dinv, numer, flags, hp):
        f = self.f
        x1, y1, inf1 = self._split_signed(A, sA)
        x2, y2, inf2 = self._split_signed(B, sB)
        x3, y3, inf3 = self._post_inv_formula(
            x1, y1, x2, y2, dinv, numer, flags, inf1, inf2
        )
        hpm = hp[0] != 0
        out_x = f._sel(hpm, x3, x1)
        out_y = f._sel(hpm, y3, y1)
        out_inf = jnp.where(hp != 0, inf3, inf1)
        return [
            jnp.concatenate(
                [self._pack16(out_x), self._pack16(out_y), out_inf], axis=0
            )
        ]

    def add_packed(self, A: Array, B: Array, sA: Array, sB: Array,
                   valid: Array, unsafe: bool = False) -> Array:
        """Lane-wise packed add with pass-through: out[i] = sgn(A[i]) +
        sgn(B[i]) where valid[i], else sgn(A[i]). sA/sB/valid are int32
        (1, M) planes. Two fused kernels + one shared batch inversion."""
        from ..ops import kernels

        f = self.f
        R = self.packed_rows
        if unsafe:
            (denom,) = kernels.fused(
                "aff_pre_packed_u", self._pre_packed_u_f, [A, B, valid], [f.n]
            )
            dinv = f.batch_inv(denom.reshape(f.n, -1)).reshape(denom.shape)
            (out,) = kernels.fused(
                "aff_post_packed_u", self._post_packed_u_f,
                [A, B, sA, sB, dinv, valid], [R],
            )
            return out
        denom, numer, flags = kernels.fused(
            "aff_pre_packed", self._pre_packed_f, [A, B, sA, sB, valid],
            [f.n, f.n, 1],
        )
        dinv = f.batch_inv(denom.reshape(f.n, -1)).reshape(denom.shape)
        (out,) = kernels.fused(
            "aff_post_packed", self._post_packed_f,
            [A, B, sA, sB, dinv, numer, flags, valid], [R],
        )
        return out

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
