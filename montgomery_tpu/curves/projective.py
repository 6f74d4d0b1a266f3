"""Vectorized projective Weierstrass curve ops over limb planes.

TPU re-design of reference `src/curve-projective.ts`: same coordinate-level
semantics (complete addOrSubtract falling back to double on equal points,
zero encoded in a flag; here zero is Z == 0), but branch-free — every lane
computes both the add and the double candidate and a masked select picks the
right one (SURVEY.md §7.1 "branchy control flow becomes data-parallel
selection").

All coordinates are in Montgomery form. Batch shape: (n_limbs, N).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..bigint.weierstrass import AffinePoint, CurveParams
from ..ops import limbs as codec
from ..ops.field import Array, FieldOps
from ..utils.memo import MemoizedOps, ready


class ProjectiveBatch(NamedTuple):
    """(X : Y : Z); the point at infinity is any lane with Z == 0."""

    X: Array
    Y: Array
    Z: Array

    @property
    def count(self):
        return self.X.shape[-1]


class AffineBatch(NamedTuple):
    """Affine points with an explicit infinity mask (reference layout
    [x, y, isNonZero], curve-affine.ts:20-52 — flag becomes a lane mask)."""

    x: Array
    y: Array
    inf: Array  # bool (N,)

    @property
    def count(self):
        return self.x.shape[-1]


class ProjectiveOps(MemoizedOps):
    """Projective Weierstrass arithmetic (reference curve-projective.ts)."""

    def __init__(self, fops: FieldOps, params: CurveParams):
        if ready(self):
            return
        self.f = fops
        self.params = params
        p = fops.p
        # constants in Montgomery form, shape (n, 1)
        self.a_is_zero = params.a % p == 0
        self.a_mont = codec.pack_scalar(params.a % p * fops.mp.R % p, fops.mp)
        self.b_mont = codec.pack_scalar(params.b % p * fops.mp.R % p, fops.mp)
        self.b3_mont = codec.pack_scalar(3 * params.b % p * fops.mp.R % p, fops.mp)
        beta = params.endomorphism.beta if params.endomorphism else 0
        self.beta_mont = codec.pack_scalar(beta % p * fops.mp.R % p, fops.mp)
        # stable bound-method refs so the Pallas-call cache hits (ops/kernels.py)
        self._add_rcb_f = self._add_rcb_formula
        self._dbl_rcb_f = self._dbl_rcb_formula

    # ------------------------------------------------------------- structure

    def zero(self, N: int) -> ProjectiveBatch:
        f = self.f
        X = f.zeros((N,))
        Y = jnp.broadcast_to(jnp.asarray(f.one_mont).reshape(f.n, 1), (f.n, N))
        Z = f.zeros((N,))
        return ProjectiveBatch(X, Y, Z)

    def zero_like(self, P: ProjectiveBatch) -> ProjectiveBatch:
        """Zero with the same batch shape/rank as P."""
        f = self.f
        return ProjectiveBatch(
            jnp.zeros_like(P.X), f.bc_full(f.one_mont, P.Y), jnp.zeros_like(P.Z)
        )

    def is_zero(self, P: ProjectiveBatch) -> Array:
        return self.f.is_zero(P.Z)

    def neg(self, P: ProjectiveBatch) -> ProjectiveBatch:
        return ProjectiveBatch(P.X, self.f.neg(P.Y), P.Z)

    def select(self, mask: Array, a: ProjectiveBatch, b: ProjectiveBatch):
        s = self.f._sel
        return ProjectiveBatch(s(mask, a.X, b.X), s(mask, a.Y, b.Y), s(mask, a.Z, b.Z))

    def from_affine(self, A: AffineBatch) -> ProjectiveBatch:
        f = self.f
        one = f.bc_full(f.one_mont, A.x)
        P = ProjectiveBatch(A.x, A.y, one)
        return self.select(jnp.logical_not(A.inf), P, self.zero_like(P))

    def to_affine(self, P: ProjectiveBatch) -> AffineBatch:
        """Batch-normalize via one shared batch inversion
        (reference curve-affine.ts batchNormalize :310-342)."""
        f = self.f
        zinv = f.batch_inv(P.Z, handle_zero=True)
        inf = self.is_zero(P)
        return AffineBatch(f.mul(P.X, zinv), f.mul(P.Y, zinv), inf)

    # ------------------------------------------------------------ group law

    def double(self, P: ProjectiveBatch) -> ProjectiveBatch:
        """Complete doubling: RCB for a = 0, dbl-1998-cmo-2 otherwise
        (reference curve-projective.ts:202-253)."""
        if self.a_is_zero:
            return self.double_rcb(P)
        f = self.f
        if self.a_is_zero:
            XX, YZ = f.mul_list([(P.X, P.X), (P.Y, P.Z)])
            w = f.add(f.add(XX, XX), XX)  # 3*XX
        else:
            XX, YZ, ZZ = f.mul_list([(P.X, P.X), (P.Y, P.Z), (P.Z, P.Z)])
            a_b = f.bc_full(self.a_mont, ZZ)
            w3 = f.add(f.add(XX, XX), XX)
            aZZ, = f.mul_list([(a_b, ZZ)])
            w = f.add(w3, aZZ)
        s = f.add(YZ, YZ)  # 2*Y*Z
        ss, R = f.mul_list([(s, s), (P.Y, s)])
        XR = f.add(P.X, R)
        sss, RR, BB, ww = f.mul_list([(s, ss), (R, R), (XR, XR), (w, w)])
        B = f.sub(f.sub(BB, XX), RR)
        h = f.sub(ww, f.add(B, B))
        X3, t = f.mul_list([(h, s), (w, f.sub(B, h))])
        Y3 = f.sub(t, f.add(RR, RR))
        # doubling a 2-torsion point (Y == 0) or zero gives zero: Z3 = 0 there
        return ProjectiveBatch(X3, Y3, sss)

    def add(self, P: ProjectiveBatch, Q: ProjectiveBatch) -> ProjectiveBatch:
        """Complete branch-free addition.

        For a = 0 (all concrete curves) uses the Renes-Costello-Batina
        complete formulas (2015/1060, Alg. 7): 12M + 2 const-M in 3 fused
        mul_list calls, valid for ALL inputs in the odd-order subgroup
        including P == Q, P == -Q and zero — strictly stronger than the
        reference's addOrSubtract (curve-projective.ts:51-160) and the
        TPU-right shape (no masks, no flag bookkeeping).
        Falls back to the masked formulas for a != 0."""
        if self.a_is_zero:
            return self._add_rcb(P.X, P.Y, P.Z, Q.X, Q.Y, Q.Z)
        return self.add_masked(P, Q)

    def _add_rcb(self, X1, Y1, Z1, X2, Y2, Z2) -> ProjectiveBatch:
        from ..ops import kernels

        X3, Y3, Z3 = kernels.fused(
            "proj_add_rcb", self._add_rcb_f, [X1, Y1, Z1, X2, Y2, Z2],
            [self.f.n] * 3,
        )
        return ProjectiveBatch(X3, Y3, Z3)

    def _add_rcb_formula(self, X1, Y1, Z1, X2, Y2, Z2):
        # internal sums use the single-pass lazy add/sub (values grow to <= 6p,
        # covered by the >= 6-bit Montgomery slack; see FieldOps.add_lazy)
        f = self.f
        t0, t1, t2, m0, m1, m2 = f.mul_list(
            [
                (X1, X2),
                (Y1, Y2),
                (Z1, Z2),
                (f.add_lazy(X1, Y1), f.add_lazy(X2, Y2)),
                (f.add_lazy(Y1, Z1), f.add_lazy(Y2, Z2)),
                (f.add_lazy(X1, Z1), f.add_lazy(X2, Z2)),
            ]
        )
        t3 = f.sub_lazy(m0, f.add_lazy(t0, t1))  # X1Y2 + X2Y1 (+4p)
        t4 = f.sub_lazy(m1, f.add_lazy(t1, t2))  # Y1Z2 + Y2Z1 (+4p)
        t5 = f.sub_lazy(m2, f.add_lazy(t0, t2))  # X1Z2 + X2Z1 (+4p)
        t2b = f.mul_const(t2, self.b3_mont)  # 3b Z1Z2
        Y3b = f.mul_const(t5, self.b3_mont)  # 3b (X1Z2 + X2Z1)
        t0_3 = f.add_lazy(f.add_lazy(t0, t0), t0)  # 3 X1X2
        Z3s = f.add_lazy(t1, t2b)  # Y1Y2 + 3b Z1Z2
        t1m = f.sub_lazy(t1, t2b)  # Y1Y2 - 3b Z1Z2 (+4p)
        Xa, Xb, Ya, Yb, Za, Zb = f.mul_list(
            [
                (t3, t1m),
                (t4, Y3b),
                (t1m, Z3s),
                (Y3b, t0_3),
                (Z3s, t4),
                (t0_3, t3),
            ]
        )
        return [f.sub(Xa, Xb), f.add(Ya, Yb), f.add(Za, Zb)]

    def double_rcb(self, P: ProjectiveBatch) -> ProjectiveBatch:
        """Complete doubling for a = 0 (RCB Alg. 9): 8M + 1 const-M,
        branch-free, zero-safe."""
        from ..ops import kernels

        X3, Y3, Z3 = kernels.fused(
            "proj_dbl_rcb", self._dbl_rcb_f, [P.X, P.Y, P.Z], [self.f.n] * 3
        )
        return ProjectiveBatch(X3, Y3, Z3)

    def _dbl_rcb_formula(self, X, Y, Z):
        P = ProjectiveBatch(X, Y, Z)
        f = self.f
        YY = f.square(P.Y)
        ZZ = f.square(P.Z)
        YZ, XY = f.mul_list([(P.Y, P.Z), (P.X, P.Y)])
        t0 = YY
        Z3d = f.add(t0, t0)
        Z3d = f.add(Z3d, Z3d)  # 4 Y^2, reduced to keep bounds small
        Z3d = f.add_lazy(Z3d, Z3d)  # 8 Y^2, < 4p
        t2 = f.mul_const(ZZ, self.b3_mont)  # 3b Z^2
        Y3t = f.add_lazy(t0, t2)  # < 4p
        t0m = f.sub_lazy(t0, f.add(f.add(t2, t2), t2))  # Y^2 - 9bZ^2 + 4p < 6p
        X3a, Z3, Y3a = f.mul_list([(t2, Z3d), (YZ, Z3d), (t0m, Y3t)])
        Y3 = f.add(X3a, Y3a)
        (X3b,) = f.mul_list([(t0m, XY)])
        X3 = f.add(X3b, X3b)
        return [X3, Y3, Z3]

    def double_n(self, P: ProjectiveBatch, k: int) -> ProjectiveBatch:
        """k successive doublings as ONE fused kernel (fori over the RCB
        doubling body) — the Horner window combine does c of these per
        window and per-launch overhead (~160us) would otherwise dominate."""
        if k <= 0:
            return P
        if not self.a_is_zero:
            Q = P
            for _ in range(k):
                Q = self.double(Q)
            return Q
        from ..ops import kernels

        if kernels.use_pallas() and kernels._MODE == "callback":
            # dynamic trip count -> ONE compiled executable serves every k.
            # The Horner combine instantiates double_n at log2(K) distinct
            # k values; per-k executables cost ~37 s EACH to compile on
            # XLA:CPU (the single largest cost of the old test suite).
            # Mosaic (compiled mode) keeps static-k fori kernels.
            cache = self.__dict__.setdefault("_dbl_n_cache", {})
            fn = cache.get("dyn")
            if fn is None:

                def fn(X, Y, Z, kpl):
                    def body(_, S):
                        return tuple(self._dbl_rcb_formula(*S))

                    return list(
                        jax.lax.fori_loop(0, kpl[0, 0], body, (X, Y, Z))
                    )

                cache["dyn"] = fn
            kpl = jnp.full((1, *P.X.shape[1:]), k, jnp.int32)
            X3, Y3, Z3 = kernels.fused(
                "proj_dbln_rcb", fn, [P.X, P.Y, P.Z, kpl], [self.f.n] * 3
            )
            return ProjectiveBatch(X3, Y3, Z3)
        cache = self.__dict__.setdefault("_dbl_n_cache", {})
        fn = cache.get(k)
        if fn is None:

            def fn(X, Y, Z, _k=k):
                def body(_, S):
                    return tuple(self._dbl_rcb_formula(*S))

                return list(jax.lax.fori_loop(0, _k, body, (X, Y, Z)))

            cache[k] = fn
        X3, Y3, Z3 = kernels.fused(
            f"proj_dbl{k}_rcb", fn, [P.X, P.Y, P.Z], [self.f.n] * 3
        )
        return ProjectiveBatch(X3, Y3, Z3)

    def add_masked(self, P: ProjectiveBatch, Q: ProjectiveBatch) -> ProjectiveBatch:
        """Masked-complete add for general a (reference addOrSubtract,
        curve-projective.ts:51-160): handles P==Q (double), P==-Q (zero), and
        zero operands, per lane."""
        f = self.f
        Y1Z2, X1Z2, Z1Z2, Y2Z1, X2Z1 = f.mul_list(
            [(P.Y, Q.Z), (P.X, Q.Z), (P.Z, Q.Z), (Q.Y, P.Z), (Q.X, P.Z)]
        )
        u = f.sub(Y2Z1, Y1Z2)
        v = f.sub(X2Z1, X1Z2)
        uu, vv = f.square(u), f.square(v)
        vvv, Rq, uuZ = f.mul_list([(v, vv), (vv, X1Z2), (uu, Z1Z2)])
        A = f.sub(f.sub(uuZ, vvv), f.add(Rq, Rq))
        X3, t, w1, Z3 = f.mul_list(
            [(v, A), (u, f.sub(Rq, A)), (vvv, Y1Z2), (vvv, Z1Z2)]
        )
        Y3 = f.sub(t, w1)
        added = ProjectiveBatch(X3, Y3, Z3)

        x_eq = f.is_zero(v)
        y_eq = f.is_zero(u)
        z1_zero = self.is_zero(P)
        z2_zero = self.is_zero(Q)

        dbl = self.double(P)
        # same x: double if same y else zero
        res = self.select(x_eq & y_eq, dbl, added)
        res = self.select(x_eq & jnp.logical_not(y_eq), self.zero_like(P), res)
        res = self.select(z1_zero, Q, res)
        res = self.select(z2_zero, P, res)
        return res

    def add_mixed(self, P: ProjectiveBatch, A: AffineBatch) -> ProjectiveBatch:
        """P + affine Q (Z2 = 1), complete (reference madd variant)."""
        if self.a_is_zero:
            return self.add(P, self.from_affine(A))
        f = self.f
        Y1, X1, Z1 = P.Y, P.X, P.Z
        Y2Z1, X2Z1 = f.mul_list([(A.y, Z1), (A.x, Z1)])
        u = f.sub(Y2Z1, Y1)
        v = f.sub(X2Z1, X1)
        uu, vv = f.square(u), f.square(v)
        vvv, Rq, uuZ = f.mul_list([(v, vv), (vv, X1), (uu, Z1)])
        Aq = f.sub(f.sub(uuZ, vvv), f.add(Rq, Rq))
        X3, t, w1, Z3 = f.mul_list(
            [(v, Aq), (u, f.sub(Rq, Aq)), (vvv, Y1), (vvv, Z1)]
        )
        Y3 = f.sub(t, w1)
        added = ProjectiveBatch(X3, Y3, Z3)

        x_eq = f.is_zero(v)
        y_eq = f.is_zero(u)
        z1_zero = self.is_zero(P)
        q_zero = A.inf

        res = self.select(x_eq & y_eq, self.double(P), added)
        res = self.select(x_eq & jnp.logical_not(y_eq), self.zero_like(P), res)
        res = self.select(z1_zero, self.from_affine(A), res)
        res = self.select(q_zero, P, res)
        return res

    def sub_mixed(self, P: ProjectiveBatch, A: AffineBatch) -> ProjectiveBatch:
        return self.add_mixed(P, AffineBatch(A.x, self.f.neg(A.y), A.inf))

    def scale(self, k: int, P: ProjectiveBatch) -> ProjectiveBatch:
        """Fixed-scalar double-and-add (static k; reference curve-projective.ts:268-284)."""
        if k < 0:
            return self.scale(-k, self.neg(P))
        bits = jnp.asarray([c == "1" for c in (bin(k)[2:] if k else "0")])

        def step(R, b):
            R = self.double(R)
            return self.select(b, self.add(R, P), R), None

        R, _ = jax.lax.scan(step, self.zero_like(P), bits)
        return R

    # ---------------------------------------------------------- predicates

    def is_on_curve(self, P: ProjectiveBatch) -> Array:
        """Y^2 Z == X^3 + a X Z^2 + b Z^3, or zero (curve-projective.ts:286-303)."""
        f = self.f
        YY, XX, ZZ = f.mul_list([(P.Y, P.Y), (P.X, P.X), (P.Z, P.Z)])
        b_b = f.bc_full(self.b_mont, ZZ)
        lhs, X3, bZZ = f.mul_list([(YY, P.Z), (XX, P.X), (b_b, ZZ)])
        rhs = X3
        if not self.a_is_zero:
            a_b = f.bc_full(self.a_mont, ZZ)
            aXZZ, bZ3 = f.mul_list([(f.mul(a_b, P.X), ZZ), (bZZ, P.Z)])
            rhs = f.add(rhs, aXZZ)
        else:
            (bZ3,) = f.mul_list([(bZZ, P.Z)])
        rhs = f.add(rhs, bZ3)
        return jnp.logical_or(f.is_equal(lhs, rhs), self.is_zero(P))

    def is_in_subgroup(self, P: ProjectiveBatch) -> Array:
        """order * P == 0 (reference curve-projective.ts:305-320)."""
        return self.is_zero(self.scale(self.params.order, P))

    def eq(self, P: ProjectiveBatch, Q: ProjectiveBatch) -> Array:
        f = self.f
        both_zero = self.is_zero(P) & self.is_zero(Q)
        a1, a2, b1, b2 = f.mul_list(
            [(P.X, Q.Z), (Q.X, P.Z), (P.Y, Q.Z), (Q.Y, P.Z)]
        )
        xe, ye = f.is_equal(a1, a2), f.is_equal(b1, b2)
        neither = jnp.logical_not(self.is_zero(P) | self.is_zero(Q))
        return both_zero | (neither & xe & ye)

    def endomorphism_affine(self, A: AffineBatch) -> AffineBatch:
        """GLV endo on affine batch: (x, y) -> (beta x, y) (reference wasm/curve.ts:90-103)."""
        return AffineBatch(self.f.mul_const(A.x, self.beta_mont), A.y, A.inf)

    # ------------------------------------------------------------------ I/O

    def affine_to_device(self, points: list[AffinePoint]) -> AffineBatch:
        """Host: oracle affine points -> Montgomery-form device batch."""
        f = self.f
        xs = [P.x for P in points]
        ys = [P.y for P in points]
        inf = jnp.asarray([P.is_zero for P in points])
        return AffineBatch(f.pack(xs, to_mont=True), f.pack(ys, to_mont=True), inf)

    def affine_to_host(self, A: AffineBatch) -> list[AffinePoint]:
        import numpy as np

        xs = self.f.unpack(A.x, from_mont=True)
        ys = self.f.unpack(A.y, from_mont=True)
        inf = np.asarray(A.inf)
        return [
            AffinePoint.zero() if z else AffinePoint(x, y)
            for x, y, z in zip(xs, ys, inf)
        ]

    def to_host(self, P: ProjectiveBatch) -> list[AffinePoint]:
        cache = self.__dict__.setdefault("_jit_cache", {})
        fn = cache.setdefault("to_affine", jax.jit(self.to_affine))
        return self.affine_to_host(fn(P))

    def to_host_raw(self, P: ProjectiveBatch) -> list[tuple[int, int, int]]:
        """Host: raw (X, Y, Z) python ints (no inversion — cheap for tests;
        compare with cross-multiplication against the oracle)."""
        X = self.f.unpack(P.X, from_mont=True)
        Y = self.f.unpack(P.Y, from_mont=True)
        Z = self.f.unpack(P.Z, from_mont=True)
        return list(zip(X, Y, Z))
