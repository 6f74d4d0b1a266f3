"""Vectorized twisted-Edwards curve ops in extended coordinates (a = -1).

TPU re-design of reference `src/curve-twisted-edwards.ts`: extended
coordinates [X, Y, Z, T], strongly-unified add-2008-hwcd-3 (9M, k = 2d
precomputed) — completely branch-free, the ideal curve shape for SIMD/TPU:
no masks, no edge cases, zero is just (0 : 1 : 1 : 0).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..bigint.twisted_edwards import EdwardsParams, EdwardsPoint
from ..ops import limbs as codec
from ..ops.field import Array, FieldOps
from ..utils.memo import MemoizedOps, ready


class EdwardsBatch(NamedTuple):
    """Extended coordinates (X : Y : Z : T) with x = X/Z, y = Y/Z, T = XY/Z."""

    X: Array
    Y: Array
    Z: Array
    T: Array

    @property
    def count(self):
        return self.X.shape[-1]


class EdwardsOps(MemoizedOps):
    """a = -1 twisted Edwards arithmetic (reference curve-twisted-edwards.ts)."""

    def __init__(self, fops: FieldOps, params: EdwardsParams):
        if ready(self):
            return
        self.f = fops
        self.params = params
        p = fops.p
        R = fops.mp.R
        self.d_mont = codec.pack_scalar(params.d % p * R % p, fops.mp)
        self.k_mont = codec.pack_scalar(2 * params.d % p * R % p, fops.mp)  # k = 2d
        # stable bound-method ref so the Pallas-call cache hits (ops/kernels.py)
        self._add_f = self._add_formula

    # ------------------------------------------------------------- structure

    def zero(self, N: int) -> EdwardsBatch:
        f = self.f
        one = jnp.broadcast_to(jnp.asarray(f.one_mont).reshape(f.n, 1), (f.n, N))
        z = f.zeros((N,))
        return EdwardsBatch(z, one, one, z)

    def zero_like(self, P: EdwardsBatch) -> EdwardsBatch:
        """Zero with the same batch shape/rank as P."""
        f = self.f
        one = f.bc_full(f.one_mont, P.Y)
        z = jnp.zeros_like(P.X)
        return EdwardsBatch(z, one, one, z)

    def is_zero(self, P: EdwardsBatch) -> Array:
        """X == 0 and Y == Z (reference curve-twisted-edwards.ts:58-69)."""
        return self.f.is_zero(P.X) & self.f.is_equal(P.Y, P.Z)

    def neg(self, P: EdwardsBatch) -> EdwardsBatch:
        f = self.f
        return EdwardsBatch(f.neg(P.X), P.Y, P.Z, f.neg(P.T))

    def select(self, mask: Array, a: EdwardsBatch, b: EdwardsBatch) -> EdwardsBatch:
        s = self.f._sel
        return EdwardsBatch(
            s(mask, a.X, b.X), s(mask, a.Y, b.Y), s(mask, a.Z, b.Z), s(mask, a.T, b.T)
        )

    # ------------------------------------------------------------ group law

    def add(self, P: EdwardsBatch, Q: EdwardsBatch) -> EdwardsBatch:
        """add-2008-hwcd-3, strongly unified — works for P==Q, zero, etc.
        (reference curve-twisted-edwards.ts:84-165). 8M + 1 const-M.
        Runs as ONE fused Pallas kernel on TPU (ops/kernels.py)."""
        from ..ops import kernels

        outs = kernels.fused(
            "ed_add", self._add_f,
            [P.X, P.Y, P.Z, P.T, Q.X, Q.Y, Q.Z, Q.T], [self.f.n] * 4,
        )
        return EdwardsBatch(*outs)

    def _add_formula(self, PX, PY, PZ, PT, QX, QY, QZ, QT):
        P = EdwardsBatch(PX, PY, PZ, PT)
        Q = EdwardsBatch(QX, QY, QZ, QT)
        f = self.f
        # lazy internal sums: operands stay <= 8p, within the >= 6-bit
        # Montgomery slack (see FieldOps.add_lazy bound analysis)
        A, B, ZZ = f.mul_list(
            [
                (f.sub_lazy(P.Y, P.X), f.sub_lazy(Q.Y, Q.X)),
                (f.add_lazy(P.Y, P.X), f.add_lazy(Q.Y, Q.X)),
                (P.Z, Q.Z),
            ]
        )
        kT1 = f.mul_const(P.T, self.k_mont)  # k = 2d, limbs inlined
        (C,) = f.mul_list([(kT1, Q.T)])
        D = f.add_lazy(ZZ, ZZ)
        E = f.sub_lazy(B, A)
        F = f.sub_lazy(D, C)
        G = f.add_lazy(D, C)
        H = f.add_lazy(B, A)
        X3, Y3, Z3, T3 = f.mul_list([(E, F), (G, H), (F, G), (E, H)])
        return [X3, Y3, Z3, T3]

    def sub(self, P: EdwardsBatch, Q: EdwardsBatch) -> EdwardsBatch:
        return self.add(P, self.neg(Q))

    # ------------------------------------------------------------ packed form
    #
    # Like the Weierstrass packed-affine form (curves/affine.py): the MSM
    # engine keeps points as ONE int32 array with two 16-bit limb halves per
    # row — rows [X | Y | Z | T] — so every pair-halving round is one lane
    # gather + ONE fused add kernel (the TE add is inversion-free, so there
    # is no pre/inv/post split at all). The reference's flagship ZPrize'23
    # numbers are TE (doc/zprize23.md:25); this is the TPU fast path for
    # that engine. Requires w <= 16.

    @property
    def _half(self) -> int:
        return (self.f.n + 1) // 2

    @property
    def packed_rows(self) -> int:
        return 4 * self._half

    def pack_rows(self, P: EdwardsBatch) -> Array:
        assert self.f.w <= 16
        n = self.f.n
        return jnp.concatenate(
            [codec.pack16(P.X, n), codec.pack16(P.Y, n),
             codec.pack16(P.Z, n), codec.pack16(P.T, n)], axis=0
        )

    def unpack_rows(self, A: Array) -> EdwardsBatch:
        n, h = self.f.n, self._half
        return EdwardsBatch(
            codec.unpack16(A[:h], n), codec.unpack16(A[h : 2 * h], n),
            codec.unpack16(A[2 * h : 3 * h], n), codec.unpack16(A[3 * h :], n),
        )

    def _split_signed(self, A: Array, sA: Array) -> EdwardsBatch:
        """Packed rows + sign plane -> EdwardsBatch with the sign applied
        (negation = negate X and T; curve-twisted-edwards.ts negation)."""
        f = self.f
        P = self.unpack_rows(A)
        sm = sA[0] != 0
        return EdwardsBatch(
            f._sel(sm, f.neg(P.X), P.X), P.Y, P.Z,
            f._sel(sm, f.neg(P.T), P.T),
        )

    def _add_packed_formula(self, A, B, sA, sB, hp):
        P = self._split_signed(A, sA)
        Q = self._split_signed(B, sB)
        X3, Y3, Z3, T3 = self._add_formula(*P, *Q)
        hpm = hp[0] != 0
        f = self.f
        out = EdwardsBatch(
            f._sel(hpm, X3, P.X), f._sel(hpm, Y3, P.Y),
            f._sel(hpm, Z3, P.Z), f._sel(hpm, T3, P.T),
        )
        return [self.pack_rows(out)]

    def add_packed(self, A: Array, B: Array, sA: Array, sB: Array,
                   valid: Array) -> Array:
        """Lane-wise packed add with pass-through: out[i] = sgn(A[i]) +
        sgn(B[i]) where valid[i], else sgn(A[i]). ONE fused kernel — the TE
        add is complete and inversion-free."""
        from ..ops import kernels

        cache = self.__dict__.setdefault("_packed_cache", {})
        fn = cache.setdefault("add", self._add_packed_formula)
        (out,) = kernels.fused(
            "ed_add_packed", fn, [A, B, sA, sB, valid], [self.packed_rows]
        )
        return out

    def double(self, P: EdwardsBatch) -> EdwardsBatch:
        return self.add(P, P)

    def scale(self, k: int, P: EdwardsBatch) -> EdwardsBatch:
        if k < 0:
            return self.scale(-k, self.neg(P))
        bits = jnp.asarray([c == "1" for c in (bin(k)[2:] if k else "0")])

        def step(R, b):
            R = self.double(R)
            return self.select(b, self.add(R, P), R), None

        R, _ = jax.lax.scan(step, self.zero_like(P), bits)
        return R

    # ---------------------------------------------------------- predicates

    def is_on_curve(self, P: EdwardsBatch) -> Array:
        """(-X^2 + Y^2) Z^2 == Z^4 + d X^2 Y^2 and T Z == X Y
        (reference curve-twisted-edwards.ts:342-367)."""
        f = self.f
        XX, YY, ZZ, TZ, XY = f.mul_list(
            [(P.X, P.X), (P.Y, P.Y), (P.Z, P.Z), (P.T, P.Z), (P.X, P.Y)]
        )
        d_b = f.bc_full(self.d_mont, XX)
        lhs, Z4, dXX = f.mul_list([(f.sub(YY, XX), ZZ), (ZZ, ZZ), (d_b, XX)])
        (dXXYY,) = f.mul_list([(dXX, YY)])
        rhs = f.add(Z4, dXXYY)
        t_ok = f.is_equal(TZ, XY)
        return f.is_equal(lhs, rhs) & t_ok

    def is_in_subgroup(self, P: EdwardsBatch) -> Array:
        """order * P == 0 (reference curve-twisted-edwards.ts isInSubgroup)."""
        return self.is_zero(self.scale(self.params.order, P))

    def eq(self, P: EdwardsBatch, Q: EdwardsBatch) -> Array:
        f = self.f
        a1, a2, b1, b2 = f.mul_list(
            [(P.X, Q.Z), (Q.X, P.Z), (P.Y, Q.Z), (Q.Y, P.Z)]
        )
        return f.is_equal(a1, a2) & f.is_equal(b1, b2)

    # ------------------------------------------------------------------ I/O

    def from_affine_arrays(self, x_mont: Array, y_mont: Array) -> EdwardsBatch:
        f = self.f
        one = f.bc_full(f.one_mont, x_mont)
        # T = X*Y / Z = x*y (Z=1); in mont form T = mont_mul(x, y)
        return EdwardsBatch(x_mont, y_mont, one, f.mul(x_mont, y_mont))

    def jitted_from_affine(self, x_mont: Array, y_mont: Array) -> EdwardsBatch:
        cache = self.__dict__.setdefault("_jit_cache", {})
        fn = cache.setdefault("from_affine", jax.jit(self.from_affine_arrays))
        return fn(x_mont, y_mont)

    def to_device(self, points: list[EdwardsPoint]) -> EdwardsBatch:
        f = self.f
        x = f.pack([P.x for P in points], to_mont=True)
        y = f.pack([P.y for P in points], to_mont=True)
        return self.from_affine_arrays(x, y)

    def to_host(self, P: EdwardsBatch) -> list[EdwardsPoint]:
        cache = self.__dict__.setdefault("_jit_cache", {})
        def normalize(q):
            zinv = self.f.batch_inv(q.Z)
            return self.f.mul(q.X, zinv), self.f.mul(q.Y, zinv)

        fn = cache.setdefault("normalize", jax.jit(normalize))
        xm, ym = fn(P)
        xs = self.f.unpack(xm, from_mont=True)
        ys = self.f.unpack(ym, from_mont=True)
        return [EdwardsPoint(x, y) for x, y in zip(xs, ys)]

    def to_host_raw(self, P: EdwardsBatch) -> list[tuple[int, int, int, int]]:
        """Host: raw (X, Y, Z, T) python ints (no inversion — cheap for tests)."""
        X = self.f.unpack(P.X, from_mont=True)
        Y = self.f.unpack(P.Y, from_mont=True)
        Z = self.f.unpack(P.Z, from_mont=True)
        T = self.f.unpack(P.T, from_mont=True)
        return list(zip(X, Y, Z, T))
