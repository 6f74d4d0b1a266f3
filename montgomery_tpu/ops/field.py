"""Vectorized Montgomery field arithmetic over int32 limb planes (JAX).

TPU-native re-design of the reference's Wasm field kernels
(wasm/field-arithmetic.ts, wasm/multiply-montgomery.ts, wasm/inverse.ts,
wasm/exp.ts, field-sqrt.ts). Differences from the reference are deliberate
(SURVEY.md §7.1):

- SoA limb planes int32[(n, N)] — every op vectorizes over N points; the limb
  loop is the *outer*, short loop.
- Limb size w re-derived for 32-bit accumulators: products of w-bit limbs are
  < 2^(2w), and a full CIOS row adds 2 products per container, so
  rows_between_carries = 2^(30-2w). At the default w=12 an entire 32-limb
  Montgomery multiply runs with NO intermediate carries (the analog of the
  reference's deferred-carry schedule, wasm/multiply-montgomery.ts:44-48, with
  nSafe covering the whole loop).
- Values are kept lazily reduced in [0, 2p) (reference invariant,
  wasm/field-arithmetic.ts:32-74); R = 2^(n w) > 4p.
- Inversion is constant-schedule Fermat exponentiation + a log-depth product
  tree for batch inversion (replaces the branchy Kaliski EGCD,
  wasm/inverse.ts:136-179, which does not map to SIMD hardware).
- sqrt uses a Pohlig-Hellman discrete log in the 2-Sylow subgroup with a
  uniform masked loop (replaces branchy Tonelli-Shanks, field-sqrt.ts).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..bigint.util import MontgomeryParams, montgomery_params, to_limbs
from . import limbs as codec

Array = jax.Array

# Roll the CIOS row loop into lax.fori_loop (False) or emit it fully unrolled
# (True). Unrolled produces flat elementwise HLO that XLA fuses and compiles
# predictably, and is also slightly faster at runtime; rolled keeps the HLO
# tiny. Default unrolled.
_UNROLL_MUL = True


class MulCounter:
    """Static field-multiplication cost model: counts mul instantiations and
    lanes at TRACE time (the TPU analog of the reference's `multiplyCount`
    wasm global, multiply-montgomery.ts:50-54 — on TPU the program is traced
    once, so a trace-time count gives exact per-execution mul counts for
    static shapes; lanes inside lax.scan/while bodies count once per trace).

    Usage:  with MulCounter() as mc: jax.eval_shape(fn, *args)
            print(mc.calls, mc.lanes)
    """

    _active: list = []

    def __init__(self):
        self.calls = 0
        self.lanes = 0

    def __enter__(self):
        MulCounter._active.append(self)
        return self

    def __exit__(self, *exc):
        MulCounter._active.remove(self)
        return False

    @classmethod
    def record(cls, shape):
        if not cls._active:
            return
        lanes = int(np.prod(shape[1:])) if len(shape) > 1 else 1
        for c in cls._active:
            c.calls += 1
            c.lanes += lanes


def _stack(xs):
    return jnp.stack(xs, axis=0)


def _merge_shifted(a_off, a, b_off, b):
    """Sum of two limb vectors placed at row offsets: returns (off, vec) with
    off = min; pure slice/add/concat — no dynamic-update-slice (XLA compiles
    scatter/DUS chains catastrophically slowly; this tree keeps the mul's HLO
    DUS-free)."""
    if a_off > b_off:
        a_off, a, b_off, b = b_off, b, a_off, a
    d = b_off - a_off
    la, lb = a.shape[0], b.shape[0]
    if d >= la:
        parts = [a]
        if d > la:
            parts.append(jnp.zeros((d - la, *a.shape[1:]), a.dtype))
        parts.append(b)
        return a_off, jnp.concatenate(parts, axis=0)
    ov = min(la - d, lb)
    # skip zero-size slices: Mosaic rejects 0-length vector operands (d = 0
    # happens when two terms share an offset, e.g. truncated convolutions)
    parts = []
    if d > 0:
        parts.append(a[:d])
    parts.append(a[d : d + ov] + b[:ov])
    if la - d > ov:
        parts.append(a[d + ov :])
    if lb > ov:
        parts.append(b[ov:])
    if len(parts) == 1:
        return a_off, parts[0]
    return a_off, jnp.concatenate(parts, axis=0)


def _conv_tree(terms, out_len: int):
    """Balanced-tree sum of (offset, limb-vector) terms, zero-padded/truncated
    to out_len rows. Replaces sequential .at[off:off+n].add chains."""
    assert terms
    items = list(terms)
    while len(items) > 1:
        nxt = []
        for i in range(0, len(items) - 1, 2):
            (ao, a), (bo, b) = items[i], items[i + 1]
            nxt.append(_merge_shifted(ao, a, bo, b))
        if len(items) % 2:
            nxt.append(items[-1])
        items = nxt
    off, v = items[0]
    pre = off
    post = out_len - off - v.shape[0]
    parts = []
    if pre > 0:
        parts.append(jnp.zeros((pre, *v.shape[1:]), v.dtype))
    parts.append(v if post >= 0 else v[: out_len - off])
    if post > 0:
        parts.append(jnp.zeros((post, *v.shape[1:]), v.dtype))
    return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]


@dataclass(frozen=True, eq=False)
class FieldOps:
    """Field arithmetic over limb planes for a fixed (p, w).

    All methods are pure and traceable; arrays have shape (n, ...) with the
    limb axis leading. Elements are in [0, 2p) unless noted. Montgomery-domain
    values are marked `*_mont` in docstrings; the domain is not tracked in
    types (same as the reference).
    """

    mp: MontgomeryParams
    # numpy constant planes, shape (n, 1)
    p_limbs: np.ndarray
    two_p_limbs: np.ndarray
    four_p_limbs: np.ndarray
    r2_limbs: np.ndarray  # R^2 mod p (plain limbs; mont-mul by it == toMontgomery)
    one_mont: np.ndarray  # R mod p == Montgomery form of 1
    # sqrt precomputation (2-Sylow structure of F_p^*)
    sqrt_M: int = 0
    sqrt_q_odd: int = 1
    sqrt_g_inv_pows: np.ndarray | None = None  # (M, n, 1) g^(-2^j), mont form

    # ------------------------------------------------------------------ basics

    def jitted(self, name: str):
        """Cached jax.jit of a method — for host-side eager use (I/O paths);
        traced/jitted code should call the methods directly."""
        cache = self.__dict__.setdefault("_jit_cache", {})
        if name not in cache:
            cache[name] = jax.jit(getattr(self, name))
        return cache[name]

    @property
    def n(self) -> int:
        return self.mp.n

    @property
    def w(self) -> int:
        return self.mp.w

    @property
    def p(self) -> int:
        return self.mp.p

    @property
    def mask(self) -> int:
        return self.mp.word_max

    def zeros(self, shape) -> Array:
        return jnp.zeros((self.n, *shape), dtype=jnp.int32)

    def const(self, value: int, shape=(1,)) -> Array:
        """Broadcastable constant plane for a python int (plain, not mont)."""
        arr = np.array(to_limbs(value % (1 << self.mp.K), self.w, self.n), dtype=np.int32)
        return jnp.broadcast_to(arr.reshape(self.n, *([1] * len(shape))), (self.n, *shape))

    # --------------------------------------------------------- carry machinery

    def _shift_down(self, a: Array, d: int) -> Array:
        """out[i] = a[i-d] along the limb axis, zero-filled at the bottom."""
        if d >= a.shape[0]:
            return jnp.zeros_like(a)
        return jnp.concatenate([jnp.zeros_like(a[:d]), a[:-d]], axis=0)

    def _ks_carry(self, S: Array) -> Array:
        """Kogge-Stone carry propagation for limbs in [0, 2^(w+1)):
        log2(n) parallel steps instead of an n-step sequential chain.
        Any carry out of the top limb is dropped (arithmetic is mod R).
        TPU-shaped replacement for wasm/field-helpers.ts carry (:99-164).
        Masks stay int32 0/1 (NOT bool): Mosaic cannot concatenate/shift
        i1 vectors, and these run inside Pallas kernels."""
        w, mask, n = self.w, self.mask, self.n
        g = S >> w  # 0/1: generate
        r = S & mask
        p = jnp.where(r == mask, 1, 0)  # propagate, int32 0/1
        d = 1
        while d < n:
            g = g | (p & self._shift_down(g, d))
            p = p & self._shift_down(p, d)
            d <<= 1
        cin = self._shift_down(g, 1)
        return (r + cin) & mask

    def carry(self, S: Array, bound: int = 1 << 31) -> Array:
        """Propagate carries so every limb lands in [0, 2^w).

        S must be non-negative per limb with represented value in [0, R).
        `bound` is a static upper bound on the limb values; multi-bit carries
        are squeezed out with parallel shift/mask stages until single-bit,
        then resolved with Kogge-Stone."""
        w, mask = self.w, self.mask
        B = bound
        while B >= (1 << (w + 1)):
            c = S >> w
            S = (S & mask) + self._shift_down(c, 1)
            B = mask + (B >> w) + 1
        return self._ks_carry(S)

    def _sub_limbs(self, x: Array, y: Array):
        """Limb-wise x - y for canonical inputs via Kogge-Stone borrow
        propagation; returns (diff_limbs mod R, underflow_bool).
        Masks are int32 0/1 (Mosaic cannot shift i1 vectors)."""
        n = self.n
        d0 = x - y  # in (-2^w, 2^w)
        g = (d0 >> 31) & 1  # borrow generate (sign bit), int32 0/1
        p = jnp.where(d0 == 0, 1, 0)  # borrow propagate
        d = 1
        while d < n:
            g = g | (p & self._shift_down(g, d))
            p = p & self._shift_down(p, d)
            d <<= 1
        bin_ = self._shift_down(g, 1)
        out = (d0 - bin_) & self.mask
        return out, g[n - 1] != 0

    @staticmethod
    def _sel(cond: Array, a: Array, b: Array) -> Array:
        """Select over the batch axes: cond has the trailing shape of a/b."""
        return jnp.where(cond[None], a, b)


    def bc(self, const, ref: Array) -> Array:
        """Reshape a stored constant plane ((n,) or (n,1) numpy) so it
        broadcasts against `ref` of any rank (n, *batch)."""
        a = jnp.asarray(const).reshape((self.n,) + (1,) * (ref.ndim - 1))
        return a

    def bc_full(self, const, ref: Array) -> Array:
        return jnp.broadcast_to(self.bc(const, ref), ref.shape)

    # ------------------------------------------------------------ add/sub/cmp

    @property
    def _sum2_bound(self) -> int:
        """Static bound on limbs of a sum of two canonical elements."""
        return 2 * self.mask

    def add(self, x: Array, y: Array) -> Array:
        """x + y with conditional subtract of 2p; in/out in [0, 2p).
        (reference wasm/field-arithmetic.ts:32-74)"""
        z = self.carry(x + y, bound=self._sum2_bound)
        d, under = self._sub_limbs(z, self.bc(self.two_p_limbs, z))
        return self._sel(jnp.logical_not(under), d, z)

    def add_no_reduce(self, x: Array, y: Array) -> Array:
        return self.carry(x + y, bound=self._sum2_bound)

    # Lazy variants: single carry pass, NO reduction. Values may grow to a
    # few multiples of p; legal because create_field_ops guarantees >= 6 bits
    # of Montgomery slack (R > 64p), so mul accepts operands up to 6p/8p
    # (a*b*p < R keeps the output in [0, 2p); see _mul_dot docstring).
    # This is the TPU analog of the reference's addNoReduce/subtractPositive
    # fast paths (wasm/field-arithmetic.ts:32-134).

    def add_lazy(self, x: Array, y: Array) -> Array:
        """x + y, canonical limbs, value bound = bound(x) + bound(y)."""
        return self.carry(x + y, bound=self._sum2_bound)

    def sub_lazy(self, x: Array, y: Array) -> Array:
        """x - y + 4p (no reduction); valid for y < 4p, bound = bound(x) + 4p."""
        t = self.carry(x + self.bc(self.four_p_limbs, x), bound=self._sum2_bound)
        d, _ = self._sub_limbs(t, y)
        return d

    def sub(self, x: Array, y: Array) -> Array:
        """x - y mod 2p; in/out in [0, 2p). (field-arithmetic.ts:76-111)"""
        d, under = self._sub_limbs(x, y)
        d2 = self.carry(d + self.bc(self.two_p_limbs, d), bound=self._sum2_bound)
        return self._sel(under, d2, d)

    def sub_positive(self, x: Array, y: Array) -> Array:
        """Branch-free x - y + 2p, result in [0, 4p) (field-arithmetic.ts:117-134)."""
        t = self.carry(x + self.bc(self.two_p_limbs, x), bound=self._sum2_bound)
        d, _ = self._sub_limbs(t, y)  # never underflows: x + 2p > y
        return d

    def neg(self, x: Array) -> Array:
        """2p - x reduced into [0, 2p) (zero maps to zero)."""
        d, _ = self._sub_limbs(self.bc_full(self.two_p_limbs, x), x)
        # x == 0 gives d == 2p which is outside [0,2p): subtract 2p where needed
        d2, under = self._sub_limbs(d, self.bc(self.two_p_limbs, d))
        return self._sel(jnp.logical_not(under), d2, d)

    def reduce(self, x: Array) -> Array:
        """Map [0, 2p) -> [0, p) by one conditional subtract (field-arithmetic.ts:142-166)."""
        d, under = self._sub_limbs(x, self.bc(self.p_limbs, x))
        return self._sel(jnp.logical_not(under), d, x)

    def is_equal(self, x: Array, y: Array) -> Array:
        """Bool over batch: x == y as field elements (inputs in [0, 2p))."""
        xr, yr = self.reduce(x), self.reduce(y)
        return jnp.all(xr == yr, axis=0)

    def is_zero(self, x: Array) -> Array:
        return jnp.all(self.reduce(x) == 0, axis=0)

    # --------------------------------------------------- montgomery multiply

    @property
    def _rows_between_carries(self) -> int:
        """CIOS rows that can run before a carry pass is required; each row
        adds <= 2 products + carry slack per container (see module docstring)."""
        return max(1, (1 << (30 - 2 * self.w)) - 1)

    def _mul_dot(self, x: Array, y: Array) -> Array:
        """Full-word Montgomery multiply in shifted-accumulate form: the
        schoolbook product T_k = sum_{i+j=k} x_i y_j is n adds of x_i * y
        into a sliding (2n, batch) accumulator, then ONE carry pass covers
        the whole product (the reference's deferred-carry idea taken to its
        limit, wasm/multiply-montgomery.ts:44-48); the Montgomery quotient
        q = T*mu mod R and the correction q*p are the same loops against
        python-constant limbs. Intermediates stay (2n, batch) — never
        (n, 2n-1, batch). Requires n*2^(2w) < 2^31 (w <= 13 at 384 bits)."""
        n, w = self.n, self.w

        if isinstance(x, tuple):
            # constant operand: limbs are python-int literals (zero limbs
            # skipped; also avoids (1,1)->(n,B) vreg broadcasts Mosaic rejects)
            terms = [(i, xi * y) for i, xi in enumerate(x) if xi]
            if not terms:
                return jnp.zeros_like(y)
            T = _conv_tree(terms, 2 * n)
        else:
            T = _conv_tree([(i, x[i] * y) for i in range(n)], 2 * n)
        return self._mont_reduce_wide(T)

    def _mont_reduce_wide(self, T: Array) -> Array:
        """Montgomery-reduce a (2n, batch) schoolbook product accumulator
        (limb values < n * 2^(2w)): carry, compute q = T*mu mod R, add q*p,
        return the high n limbs (value in [0, 2p))."""
        n, w = self.n, self.w
        mu_limbs = self._mu_full_limbs()
        p_limbs = [int(v) for v in np.asarray(self.p_limbs).reshape(-1)]
        Tc = self.carry_wide(T, bound=n << (2 * w))
        # q_k = sum_{i+j=k, k<n} Tc_i * mu_j  (mod R: only k < n kept)
        q = _conv_tree(
            [(j, Tc[: n - j] * mj) for j, mj in enumerate(mu_limbs) if mj], n
        )
        q = self.carry_wide(q, bound=n << (2 * w))
        M = _conv_tree([(j, q * pj) for j, pj in enumerate(p_limbs) if pj], 2 * n)
        Z = self.carry_wide(Tc + M, bound=(2 * n) << (2 * w))  # low n limbs = 0
        return Z[n:]

    def _sqr_dot(self, x: Array) -> Array:
        """Montgomery square with cross-term sharing (the TPU analog of the
        reference's square, multiply-montgomery.ts:138-215): T_k =
        sum_{i<j, i+j=k} 2 x_i x_j + [k even] x_{k/2}^2 needs n(n+1)/2 limb
        products instead of n^2. The value of each T_k is unchanged, so the
        carry bounds of _mont_reduce_wide still hold."""
        n = self.n
        x2 = x + x  # limbs < 2^(w+1); products x_i * 2 x_j < 2^(2w+1) fit
        terms = []
        for i in range(n):
            if i + 1 < n:
                vec = jnp.concatenate([x[i : i + 1], x2[i + 1 :]], axis=0)
            else:
                vec = x[i : i + 1]
            terms.append((2 * i, x[i] * vec))
        T = _conv_tree(terms, 2 * n)
        return self._mont_reduce_wide(T)

    def _mu_full_limbs(self):
        cache = self.__dict__.get("_mu_cache")
        if cache is None:
            mu_full = (-pow(self.p, -1, self.mp.R)) % self.mp.R
            cache = to_limbs(mu_full, self.w, self.n)
            object.__setattr__(self, "_mu_cache", cache)
        return cache

    def carry_wide(self, S: Array, bound: int = 1 << 31) -> Array:
        """carry() for arbitrary limb count (2n for double-width products)."""
        w, mask = self.w, self.mask
        n_total = S.shape[0]
        B = bound
        while B >= (1 << (w + 1)):
            c = S >> w
            S = (S & mask) + self._shift_down(c, 1)
            B = mask + (B >> w) + 1
        g = S >> w
        r = S & mask
        p = jnp.where(r == mask, 1, 0)  # int32 0/1 (no i1 vectors in Mosaic)
        d = 1
        while d < n_total:
            g = g | (p & self._shift_down(g, d))
            p = p & self._shift_down(p, d)
            d <<= 1
        return (r + self._shift_down(g, 1)) & mask

    def _ks_carry_any(self, S: Array, bound: int) -> Array:
        return self.carry_wide(S, bound=bound)

    def mul(self, x: Array, y: Array) -> Array:
        """Montgomery product x*y/R mod p; in/out in [0, 2p).

        On TPU (outside an enclosing kernel) this is ONE cached Pallas
        kernel — the standalone analog of the reference's exported wasm
        `multiply` (field-msm.ts exports); code paths that cannot be fused
        whole (batch_inv tree, exp chains, sqrt) stay compile-light because
        every mul is the same custom call. Inside fused group kernels the
        formula inlines into the enclosing kernel trace."""
        from . import kernels

        if kernels.use_pallas() and x.shape == y.shape:
            return kernels.fused("mont_mul", self._mul_formula_f, [x, y],
                                 [self.n])[0]
        return self._mul_impl(x, y)

    def _mul_formula(self, x: Array, y: Array):
        return [self._mul_impl(x, y)]

    @property
    def _mul_formula_f(self):
        return self._mul_formula

    def _mul_impl(self, x: Array, y: Array) -> Array:
        """Dot/einsum full-word form when n*2^(2w) fits int32 (default w=12),
        else CIOS with deferred carries (reference
        wasm/multiply-montgomery.ts:58-136; rolled-vs-unrolled discussion
        doc/zprize22.md:201-205).
        """
        MulCounter.record(y.shape)
        if self.n * (1 << (2 * self.w)) < (1 << 31):
            return self._mul_dot(x, y)
        n, w, mask = self.n, self.w, self.mask
        p_pl = self.bc(self.p_limbs, y)
        mu = self.mp.mu
        zero_row = jnp.zeros_like(y[:1])

        def row(i, S):
            if isinstance(i, int):
                xi = x[i]
            else:
                xi = jax.lax.dynamic_index_in_dim(x, i, axis=0, keepdims=False)
            t0 = S[0] + xi * y[0]
            qi = (mu * (t0 & mask)) & mask
            full = S + xi * y + qi * p_pl
            c = full[0] >> w
            S = jnp.concatenate([full[1:], zero_row], axis=0)
            return S.at[0].add(c)

        S = jnp.zeros_like(y)
        chunk = self._rows_between_carries
        if _UNROLL_MUL:
            # flat elementwise HLO: no nested loops — compiles far better when
            # the mul sits inside lax.scan bodies, and XLA fuses the whole chain
            for i in range(n):
                S = row(i, S)
                if chunk < n and (i + 1) % chunk == 0:
                    S = self.carry(S)
        elif chunk >= n:
            S = jax.lax.fori_loop(0, n, row, S, unroll=min(n, 8))
        else:
            done = 0
            while done < n:
                hi = min(done + chunk, n)
                S = jax.lax.fori_loop(done, hi, row, S, unroll=min(hi - done, 8))
                S = self.carry(S)
                done = hi
        return self.carry(S)

    def mul_list(self, pairs) -> list[Array]:
        """Montgomery-multiply several independent (a, b) pairs as ONE fused
        kernel: concatenate along the batch axis, multiply, split.

        This is the main compile-time/runtime lever for curve formulas: a
        projective add is 4 mul_list calls instead of 14 scalar muls — fewer
        XLA loops, wider vectors. Inside an enclosing Pallas kernel the
        concatenation buys nothing (the kernel is one fused dataflow) and
        Mosaic's lane-axis concatenate is layout-fragile — multiply pairs
        separately there."""
        from . import kernels

        if len(pairs) == 1 or kernels.in_kernel():
            return [self.mul(a, b) for a, b in pairs]
        xs = jnp.concatenate([a for a, _ in pairs], axis=-1)
        ys = jnp.concatenate([b for _, b in pairs], axis=-1)
        z = self.mul(xs, ys)
        outs = []
        off = 0
        for a, _ in pairs:
            s = a.shape[-1]
            outs.append(z[..., off : off + s])
            off += s
        return outs

    def square(self, x: Array) -> Array:
        """Montgomery square x^2/R mod p; in/out in [0, 2p). Uses the
        cross-term-sharing schedule (_sqr_dot) — ~n(n+1)/2 limb products vs
        n^2 for mul (reference multiply-montgomery.ts:138-215). One cached
        Pallas kernel on TPU, like mul."""
        from . import kernels

        if kernels.use_pallas():
            return kernels.fused("mont_sqr", self._sqr_formula_f, [x],
                                 [self.n])[0]
        return self._sqr_impl(x)

    def _sqr_formula(self, x: Array):
        return [self._sqr_impl(x)]

    @property
    def _sqr_formula_f(self):
        return self._sqr_formula

    def _sqr_impl(self, x: Array) -> Array:
        if self.n * (1 << (2 * self.w)) < (1 << 31):
            MulCounter.record(x.shape)
            return self._sqr_dot(x)
        return self._mul_impl(x, x)

    def to_montgomery(self, x: Array) -> Array:
        """x -> x*R mod p (mont-mul by R^2; reference field-msm.ts:179-182)."""
        return self.mul_const(x, self.r2_limbs)

    def from_montgomery(self, x: Array) -> Array:
        """x*R -> x mod p in [0, p) (mont-mul by 1 + reduce; field-msm.ts:183-186)."""
        return self.reduce(self._mul_const_via_cache(x, 1))

    def _mul_const_via_cache(self, x: Array, value: int) -> Array:
        plane = codec.pack_scalar(value % self.p, self.mp)
        return self.mul_const(x, plane)

    def mul_const(self, x: Array, c_mont: np.ndarray) -> Array:
        """Montgomery-multiply by a precomputed constant plane (n, 1).

        The constant's limbs are inlined into the trace as scalar literals
        (zero limbs skipped), so no constant array rides into the kernel.
        Cached per constant so the Pallas call cache hits."""
        from . import kernels

        key = np.asarray(c_mont).tobytes()
        cache = self.__dict__.setdefault("_cmul_cache", {})
        fn = cache.get(key)
        if fn is None:
            limbs = tuple(int(v) for v in np.asarray(c_mont).reshape(-1))

            def fn(y, _limbs=limbs):
                return [self._mul_const_impl(y, _limbs)]

            cache[key] = fn
        if kernels.use_pallas():
            return kernels.fused("mul_const", fn, [x], [self.n])[0]
        return fn(x)[0]

    def _mul_const_impl(self, y: Array, c_limbs: tuple) -> Array:
        MulCounter.record(y.shape)
        if self.n * (1 << (2 * self.w)) < (1 << 31):
            return self._mul_dot(c_limbs, y)
        arr = np.array(c_limbs, dtype=np.int32).reshape(self.n, 1)
        return self._mul_impl(self.bc_full(arr, y), y)

    def left_shift(self, x: Array, k: int) -> Array:
        """x * 2^k mod p (reference multiply-montgomery.ts:224-296). Implemented
        as mont-mul by the Montgomery form of 2^k."""
        c_mont = ((1 << k) % self.p) * self.mp.R % self.p
        plane = codec.pack_scalar(c_mont, self.mp)
        return self.mul_const(x, plane)

    # ------------------------------------------------------------------- exp

    def _ladder_formula(self, e: int):
        """Cached square-and-multiply formula for a static exponent, designed
        to run as ONE Pallas kernel: a lax.scan over the (static) bit array
        with a masked multiply keeps the jaxpr tiny (2 muls) while the whole
        ~2*log2(e) mul chain stays VMEM-resident in a single launch — the
        launch-latency fix for Fermat inversion (each pallas_call costs
        ~160us on the TPU; the old path was ~475 calls per inversion)."""
        cache = self.__dict__.setdefault("_ladder_cache", {})
        fn = cache.get(e)
        if fn is not None:
            return fn
        # 2-bit windows, MSB first. The first digit is applied statically;
        # the rest run in a fori_loop whose body does 2 squarings + 1 table
        # multiply. Mosaic supports neither scan-with-xs nor (reliably)
        # dynamic indexing inside kernels, so the per-iteration digit and the
        # table entry are selected with iota-compare masks (a handful of
        # vector selects — noise next to 3 Montgomery muls). 2-bit (not 4-bit)
        # keeps the kernel jaxpr small — Mosaic compile time scales with it.
        W = 2
        digits = []
        t = e
        while t:
            digits.append(t & ((1 << W) - 1))
            t >>= W
        digits.reverse()
        d0 = digits[0]
        rest = np.array([[d] for d in digits[1:]], dtype=np.int32)  # (nd, 1)
        iota = np.arange(len(digits) - 1, dtype=np.int32).reshape(-1, 1)

        def fn(x, _rest=rest, _iota=iota, _d0=d0):
            one = jnp.broadcast_to(
                jnp.asarray(self.one_mont).reshape(
                    (self.n,) + (1,) * (x.ndim - 1)
                ),
                x.shape,
            )
            table = [one, x]
            for _ in range((1 << W) - 2):
                table.append(self._mul_impl(table[-1], x))
            acc = table[_d0]
            if len(_rest) == 0:
                return [acc]
            digs = jnp.asarray(_rest)
            idx = jnp.asarray(_iota)

            def body(i, acc):
                d = jnp.sum(jnp.where(idx == i, digs, 0))
                for _ in range(W):
                    acc = self._sqr_impl(acc)
                sel = table[0]
                for tv in range(1, 1 << W):
                    sel = jnp.where(d == tv, table[tv], sel)
                return self._mul_impl(acc, sel)

            acc = jax.lax.fori_loop(0, len(_rest), body, acc)
            return [acc]

        cache[e] = fn
        return fn

    def exp_ladder(self, x: Array, e: int) -> Array:
        """x^e (Montgomery domain) for static e >= 1 as one fused kernel on
        the Pallas path, else inline scan."""
        assert e >= 1
        from . import kernels

        fn = self._ladder_formula(e)
        if kernels.use_pallas():
            return kernels.fused(f"exp_ladder_{e & 0xffff}_{e.bit_length()}",
                                 fn, [x], [self.n])[0]
        return fn(x)[0]

    def exp_const(self, x: Array, e: int) -> Array:
        """x^e for a *static* python-int exponent, 4-bit fixed windows.

        x in Montgomery form; result in Montgomery form, in [0, 2p).
        Constant schedule — the TPU replacement for the reference's wasm exp
        ladder (wasm/exp.ts:22-38) and, with e = p-2, for the Kaliski inverse.
        """
        if e < 0:
            raise ValueError("negative exponent")
        one = self.bc_full(self.one_mont, x)
        if e == 0:
            return one
        from . import kernels

        if kernels.use_pallas():
            return self.exp_ladder(x, e)
        # table[d] = x^d, d in 0..15
        table = [one, x]
        for _ in range(14):
            table.append(self.mul(table[-1], x))
        table = jnp.stack(table, axis=0)  # (16, n, ...)
        digits = []
        t = e
        while t:
            digits.append(t & 15)
            t >>= 4
        digits.reverse()
        acc = table[digits[0]]
        if len(digits) == 1:
            return acc
        ds = jnp.asarray(np.array(digits[1:], dtype=np.int32))

        def step(acc, d):
            acc = self.square(self.square(self.square(self.square(acc))))
            td = jax.lax.dynamic_index_in_dim(table, d, axis=0, keepdims=False)
            return self.mul(acc, td), None

        acc, _ = jax.lax.scan(step, acc, ds)
        return acc

    # -------------------------------------------------------------- inversion

    def inv(self, x: Array) -> Array:
        """1/x in Montgomery form via Fermat: x^(p-2) * R^2-ish.

        For x = v*R (mont form of v), x^(p-2) mont-exponentiated gives
        v^(p-2)*R = (1/v)*R — i.e. exponentiation by p-2 directly yields the
        Montgomery form of the inverse. x must be nonzero (else returns 0).
        Constant-schedule replacement for the Kaliski EGCD
        (wasm/inverse.ts:136-179); on TPU it is ONE fused ladder kernel."""
        return self.exp_ladder(x, self.p - 2)

    def inv_root(self, x: Array) -> Array:
        """Montgomery-domain inverse used at the batch-inversion tree root.

        On the compiled TPU path this is the constant-iteration safegcd
        divstep (ops/divstep.py) fused with the Montgomery-domain
        conversions into ONE kernel: the Fermat ladder's ~760 sequential
        multiplies are depth-bound (~1.8 ms at any lane count), while the
        divstep's 69 matrix batches are ~5x shallower. Other paths keep the
        ladder (exact same results; both are oracle-tested)."""
        from . import kernels

        if not (kernels.use_pallas() and kernels._MODE == "compiled"):
            return self.inv(x)
        cache = self.__dict__.setdefault("_divstep_cache", {})
        if cache.get("unusable"):
            return self.inv(x)
        fn = cache.get("fn")
        if fn is None:
            from .divstep import _inv_formula, divstep_params

            try:
                dp = divstep_params(self)
            except ValueError:
                # int32 headroom preconditions fail (w >= 14 or ~590+-bit
                # modulus): the Fermat ladder is always correct
                cache["unusable"] = True
                return self.inv(x)

            def fn(xm, _dp=dp, _f=self):
                plain = _f.reduce(_f._mul_const_impl(xm, (1,)))  # from mont
                v = _inv_formula(_dp, plain)[0]
                r2 = tuple(
                    int(t) for t in np.asarray(_f.r2_limbs).reshape(-1)
                )
                return [_f._mul_const_impl(v, r2)]  # to mont

            cache["fn"] = fn
        return kernels.fused("divstep_inv_mont", fn, [x], [self.n])[0]

    # tree fold stops at this width: one Pallas tile inverts 512 elements
    # with a single fused root inversion (cost amortized to ~1.5 muls/elem)
    _BATCH_INV_STOP = 512

    def batch_inv(self, x: Array, handle_zero: bool = False) -> Array:
        """Batched inversion over the last axis: log-depth product tree +
        one fused Fermat-ladder inversion + descent (~4 muls/element).

        TPU-shaped replacement for the sequential Montgomery trick
        (wasm/inverse.ts:220-271). x: (n, N) Montgomery form, N arbitrary.
        The tree pairs CONTIGUOUS HALVES (v[:, :h] * v[:, h:]) instead of
        even/odd interleaves — contiguous lane slices avoid the relayout cost
        of strided gathers on TPU, and each level is exactly one mul kernel.
        With handle_zero=True, zeros map to zeros instead of poisoning the tree.
        """
        n, N = x.shape[0], x.shape[-1]
        assert x.ndim == 2, "batch_inv expects (n, N)"
        one = self.bc(self.one_mont, x)
        if handle_zero:
            zmask = self.is_zero(x)
            x = self._sel(zmask, jnp.broadcast_to(one, x.shape), x)
        # tree over contiguous halves at ANY width: an odd level carries its
        # last element through unchanged (padding to a power of two wasted up
        # to 2x work — 676k padded to 1M at the 2^16 MSM's round 0)
        levels = [x]
        while levels[-1].shape[-1] > self._BATCH_INV_STOP:
            v = levels[-1]
            m = v.shape[-1]
            h = m // 2
            prod = self.mul(v[:, :h], v[:, h : 2 * h])
            if m & 1:
                prod = jnp.concatenate([prod, v[:, 2 * h :]], axis=-1)
            levels.append(prod)
        inv_cur = self.inv_root(levels[-1])
        for v in reversed(levels[:-1]):
            m = v.shape[-1]
            h = m // 2
            # inv_left = inv_parent * right ; inv_right = inv_parent * left
            swapped = jnp.concatenate([v[:, h : 2 * h], v[:, :h]], axis=-1)
            inv2 = jnp.concatenate([inv_cur[:, :h], inv_cur[:, :h]], axis=-1)
            out = self.mul(inv2, swapped)
            if m & 1:
                out = jnp.concatenate([out, inv_cur[:, h : h + 1]], axis=-1)
            inv_cur = out
        out = inv_cur
        if handle_zero:
            out = self._sel(zmask, jnp.zeros_like(out), out)
        return out

    # ------------------------------------------------------------------ sqrt

    def sqr_n(self, x: Array, m: int) -> Array:
        """m successive Montgomery squarings as ONE fused kernel (fori over
        the squaring body — the chain stays VMEM-resident; dispatching m
        separate square kernels costs ~1 ms each on the TPU tunnel)."""
        if m <= 0:
            return x
        from . import kernels

        cache = self.__dict__.setdefault("_sqrn_cache", {})
        if kernels.use_pallas() and kernels._MODE == "callback":
            # dynamic trip count: one executable for every chain length
            # (sqrt uses ~M/4 distinct lengths; per-length XLA:CPU compiles
            # dominated test time). Mosaic keeps static-m kernels.
            fn = cache.get("dyn")
            if fn is None:

                def fn(x, mpl):
                    return [
                        jax.lax.fori_loop(
                            0, mpl[0, 0], lambda _, a: self._sqr_impl(a), x
                        )
                    ]

                cache["dyn"] = fn
            mpl = jnp.full((1, *x.shape[1:]), m, jnp.int32)
            return kernels.fused("sqr_n_dyn", fn, [x, mpl], [self.n])[0]
        fn = cache.get(m)
        if fn is None:

            def fn(x, _m=m):
                return [
                    jax.lax.fori_loop(0, _m, lambda _, a: self._sqr_impl(a), x)
                ]

            cache[m] = fn
        if kernels.use_pallas():
            return kernels.fused(f"sqr_n_{m}", fn, [x], [self.n])[0]
        return fn(x)[0]

    # dlog window bits: W=4 balances kernel count (ceil(M/4) dispatches)
    # against per-kernel jaxpr size — W=8 halves the kernels but the
    # unrolled W(W-1)/2 mini-dlog squarings quadruple the per-formula trace
    # and its compile time (measured slower overall)
    _SQRT_WINDOW = 4

    def _sqrt_window_formula(self, k: int, lk: int, M: int, last: bool):
        """Cached fused formula for sqrt dlog window k: given s = t^(2^chain)
        (computed by a separate sqr_n kernel — embedding the chain fori here
        produced executables big enough to crash XLA:CPU late in long test
        processes), extract lk exponent bits with a mini bitwise dlog
        (lk(lk-1)/2 squarings + lk compares) and apply the per-bit
        corrections to t and the root accumulator r with masked constant
        muls. The windowed structure is the TPU analog of the reference's
        table-based sqrt (field-sqrt.ts:113-265): lookup tables become
        masked multiplies by hoisted constants, and the O(M^2/2) squaring
        chain of the bitwise method drops to ~M^2/(2*W).
        Outputs [t', r', bits-plane] (bits-plane = window digit, int32)."""
        cache = self.__dict__.setdefault("_sqrt_win_cache", {})
        key = (k, lk, M, last)
        fn = cache.get(key)
        if fn is not None:
            return fn
        g_pows = np.asarray(self.sqrt_g_inv_pows)  # (M, n, 1) host consts
        W = self._SQRT_WINDOW

        def fn(t, r, s, _k=k, _lk=lk, _last=last):
            one = jnp.broadcast_to(
                jnp.asarray(self.one_mont).reshape(
                    (self.n,) + (1,) * (t.ndim - 1)
                ),
                t.shape,
            )
            digit = jnp.zeros((1, *t.shape[1:]), jnp.int32)
            v = s
            for i in range(_lk):
                chk = v
                for _ in range(_lk - 1 - i):
                    chk = self._sqr_impl(chk)
                bit = jnp.logical_not(self.is_equal(chk, one))
                bitp = bit.astype(jnp.int32)[None]
                digit = digit | (bitp << i)
                j = _k * W + i  # global exponent bit position
                if i < _lk - 1:  # v only feeds higher bits of this window
                    gl = jnp.asarray(g_pows[M - _lk + i]).reshape(
                        (self.n,) + (1,) * (t.ndim - 1)
                    )
                    v = self._sel(bit, self._mul_impl(v, jnp.broadcast_to(gl, v.shape)), v)
                if not _last:  # t only feeds later windows
                    gj = jnp.asarray(g_pows[j]).reshape(
                        (self.n,) + (1,) * (t.ndim - 1)
                    )
                    t = self._sel(bit, self._mul_impl(t, jnp.broadcast_to(gj, t.shape)), t)
                if j >= 1:  # root correction g^(-2^(j-1)); j=0 is the parity bit
                    gr = jnp.asarray(g_pows[j - 1]).reshape(
                        (self.n,) + (1,) * (t.ndim - 1)
                    )
                    r = self._sel(bit, self._mul_impl(r, jnp.broadcast_to(gr, r.shape)), r)
            return [t, r, digit]

        cache[key] = fn
        return fn

    def sqrt(self, x: Array):
        """Square roots over the batch; returns (root_mont, is_square_mask).

        x in Montgomery form, in [0, 2p). Pohlig-Hellman dlog in the 2-Sylow
        subgroup with 4-bit windows: ceil(M/4) fused kernels total (one per
        window), each containing its squaring chain, mini-dlog, and masked
        constant corrections — the TPU re-design of the reference's
        table-based sqrt for high-2-adicity fields (field-sqrt.ts:113-265).
        For non-squares the root output is 0. root satisfies root^2 == x.
        """
        from . import kernels

        M, q = self.sqrt_M, self.sqrt_q_odd
        assert self.sqrt_g_inv_pows is not None, "sqrt not precomputed"
        zmask = self.is_zero(x)
        one = self.bc(self.one_mont, x)
        x_safe = self._sel(zmask, jnp.broadcast_to(one, x.shape), x)

        # u = x^q lies in the 2-Sylow subgroup; r0 = x^((q+1)/2)
        w_half = self.exp_const(x_safe, (q - 1) // 2)
        u = self.mul(x_safe, self.mul(w_half, w_half))  # x^q
        r0 = self.mul(x_safe, w_half)  # x^((q+1)/2)

        if M == 0:
            # p == 2 or trivial; x^((q+1)/2) is already the root
            return self._sel(zmask, jnp.zeros_like(r0), r0), jnp.ones_like(zmask)

        W = self._SQRT_WINDOW
        t, r = u, r0
        parity = None
        done = 0
        k = 0
        while done < M:
            lk = min(W, M - done)
            chain = M - done - lk
            last = done + lk >= M
            s = self.sqr_n(t, chain) if chain > 0 else t
            fn = self._sqrt_window_formula(k, lk, M, last)
            if kernels.use_pallas():
                t, r, digit = kernels.fused(
                    f"sqrt_win_{M}_{k}_{lk}", fn, [t, r, s],
                    [self.n, self.n, 1],
                )
            else:
                t, r, digit = fn(t, r, s)
            if k == 0:
                parity = (digit[0] & 1) != 0
            done += lk
            k += 1

        is_square = jnp.logical_not(parity)
        r = self._sel(is_square, r, jnp.zeros_like(r))
        r = self._sel(zmask, jnp.zeros_like(r), r)
        is_square = jnp.logical_or(is_square, zmask)
        return r, is_square

    # ------------------------------------------------------------------- I/O

    def pack(self, values, to_mont: bool = False) -> Array:
        arr = jnp.asarray(codec.pack(values, self.mp))
        return self.jitted("to_montgomery")(arr) if to_mont else arr

    def unpack(self, arr, from_mont: bool = False) -> list[int]:
        if from_mont:
            arr = self.jitted("from_montgomery")(jnp.asarray(arr))
        return [v % self.p for v in codec.unpack(np.asarray(arr), self.mp)]


_FIELD_OPS_CACHE: dict = {}


def create_field_ops(p: int, w: int = 12, min_extra_bits: int = 2) -> FieldOps:
    """Build FieldOps with all constants precomputed (host side).

    Analog of createMsmField (reference field-msm.ts:20-133).

    Memoized per (p, w, min_extra_bits): FieldOps is immutable apart from
    formula/executable caches, and SHARING the instance means every context
    built on the same field reuses one set of compiled kernels (the reference
    similarly shares one wasm module per field across curves/threads,
    parallel.ts:51-53). This is what makes the test suite finishable: each
    test file building its own contexts no longer recompiles every formula."""
    key = (p, w, min_extra_bits)
    cached = _FIELD_OPS_CACHE.get(key)
    if cached is not None:
        return cached
    mp = montgomery_params(p, w, min_extra_bits)
    # require >= 6 bits of slack (R > 64p) so the lazy add/sub variants can
    # feed mont-mul with operands up to ~8p (a*b*p < R analysis); add a limb
    # if the natural rounding did not provide it
    if mp.K < mp.length_p + 6:
        mp = montgomery_params(p, w, mp.K + w - mp.length_p)
    assert mp.R > 64 * p
    p_limbs = codec.pack_scalar(p, mp)
    two_p_limbs = codec.pack_scalar(2 * p, mp)
    four_p_limbs = codec.pack_scalar(4 * p, mp)
    r2_limbs = codec.pack_scalar(mp.R2, mp)
    one_mont = codec.pack_scalar(mp.R_mod_p, mp)

    # 2-Sylow structure for sqrt
    M, q_odd = 0, p - 1
    if p > 2:
        while q_odd % 2 == 0:
            q_odd //= 2
            M += 1
        z = 2
        while pow(z, (p - 1) // 2, p) == 1:
            z += 1
        g = pow(z, q_odd, p)  # generator of 2-Sylow, order 2^M
        g_inv = pow(g, -1, p)
        pows = []
        cur = g_inv
        for _ in range(max(M, 1)):
            pows.append(codec.pack_scalar(cur * mp.R % p, mp))  # mont form
            cur = cur * cur % p
        g_inv_pows = np.stack(pows, axis=0) if pows else None
    else:
        q_odd, g_inv_pows = 1, None

    fops = FieldOps(
        mp=mp,
        p_limbs=p_limbs,
        two_p_limbs=two_p_limbs,
        four_p_limbs=four_p_limbs,
        r2_limbs=r2_limbs,
        one_mont=one_mont,
        sqrt_M=M,
        sqrt_q_odd=q_odd,
        sqrt_g_inv_pows=g_inv_pows,
    )
    _FIELD_OPS_CACHE[key] = fops
    return fops
