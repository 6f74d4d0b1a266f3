"""Device-side scalar pipeline: packed bytes -> limbs -> GLV halves -> signed
window digits, fully vectorized over the scalar batch (no per-scalar Python).

TPU re-design of the reference's scalar Wasm module (scalar-glv.ts:19-51 +
wasm/glv.ts glvGeneral + wasm/field-helpers.ts extractBitSlice): the per-
pointer Wasm calls become jnp ops over int32 limb planes (n_limbs, N).

The GLV decomposition uses truncated most-significant-limb multiplication
with precomputed fixed-point reciprocals (the reference's multiplyMsb /
findMsbCutoff technique, wasm/glv.ts:35-229 + wasm/barrett.ts:219-254),
re-derived for int32 limb planes:

    c_i = floor(s * g_i / 2^m),   g_i = floor(2^m * |v_i| / |det|)

with two guard limbs in the truncated convolution, so c_i differs from the
exact rounded lattice coefficient by at most 2; the residual bound grows
accordingly (see GlvDevice.max_bits_eff).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..bigint.util import ceil_div, to_limbs
from .glv import GlvParams

Array = jax.Array


# --------------------------------------------------------------------------
# numpy ingestion: bytes / ints -> limb planes (vectorized, no per-scalar loop)
# --------------------------------------------------------------------------


def bytes_to_limbs_np(data: bytes | np.ndarray, n_bytes: int, w: int, n_limbs: int) -> np.ndarray:
    """Packed little-endian bytes -> (n_limbs, N) int32 limb planes
    (vectorized; shared implementation in ops/limbs.py bytes_to_limbs)."""
    from ..ops.limbs import bytes_to_limbs

    return bytes_to_limbs(data, n_bytes, w, n_limbs)


def ints_to_limbs_np(values, bits: int, w: int, n_limbs: int | None = None) -> np.ndarray:
    """Python ints -> (n_limbs, N) int32 limb planes (via a single bytes blob)."""
    if n_limbs is None:
        n_limbs = ceil_div(bits, w)
    nb = ceil_div(bits, 8)
    blob = b"".join(int(v).to_bytes(nb, "little") for v in values)
    return bytes_to_limbs_np(blob, nb, w, n_limbs)


# --------------------------------------------------------------------------
# generic device limb arithmetic (standalone; any limb count)
# --------------------------------------------------------------------------


def _shift_down(a: Array, d: int) -> Array:
    if d == 0:
        return a
    if d >= a.shape[0]:
        return jnp.zeros_like(a)
    return jnp.concatenate([jnp.zeros_like(a[:d]), a[:-d]], axis=0)


def ks_carry(S: Array, w: int, bound: int) -> Array:
    """Carry propagation for NON-NEGATIVE limbs (value taken mod 2^(len*w)):
    staged squeeze to single-bit carries, then Kogge-Stone. Same scheme as
    FieldOps.carry_wide, standalone for arbitrary limb counts."""
    mask = (1 << w) - 1
    B = bound
    while B >= (1 << (w + 1)):
        S = (S & mask) + _shift_down(S >> w, 1)
        B = mask + (B >> w) + 1
    n = S.shape[0]
    g = S >> w
    r = S & mask
    p = jnp.where(r == mask, 1, 0)  # int32 0/1: Mosaic cannot shift i1 vectors
    d = 1
    while d < n:
        g = g | (p & _shift_down(g, d))
        p = p & _shift_down(p, d)
        d <<= 1
    return (r + _shift_down(g, 1)) & mask


def carry_signed(S: Array, w: int, n_passes: int) -> Array:
    """Ripple carry/borrow passes for SIGNED limbs; result limbs in [0, 2^w)
    interpreting the value mod 2^(len*w) (two's complement). jnp >> on int32
    is arithmetic, & extracts low bits, so each pass preserves the value."""
    mask = (1 << w) - 1
    for _ in range(n_passes):
        S = (S & mask) + _shift_down(S >> w, 1)
    return S & mask


def conv_mul_const(x: Array, y_limbs, w: int, k_lo: int = 0, k_hi: int | None = None) -> Array:
    """Truncated product of a limb-plane batch x (a, N) with a constant
    (python limb list y, length b): output limbs k in [k_lo, k_hi) of the
    full (a+b)-limb schoolbook product, carried. Truncation drops carry-in
    from below k_lo — callers must budget for an error of up to
    min(a,b) * 2^w at limb k_lo (the reference's findMsbCutoff analysis,
    wasm/barrett.ts:219-254)."""
    from ..ops.field import _conv_tree

    a = x.shape[0]
    b = len(y_limbs)
    if k_hi is None:
        k_hi = a + b
    out_len = k_hi - k_lo
    terms = []
    for j, yj in enumerate(y_limbs):
        yj = int(yj)
        if yj == 0:
            continue
        # x[i] contributes to limb i + j: keep i in [k_lo - j, k_hi - j)
        i0 = max(0, k_lo - j)
        i1 = min(a, k_hi - j)
        if i0 >= i1:
            continue
        terms.append((i0 + j - k_lo, x[i0:i1] * yj))
    if not terms:
        return jnp.zeros((out_len, *x.shape[1:]), dtype=jnp.int32)
    # balanced merge tree of shifted terms (no dynamic-update-slice: the
    # formula must stay Mosaic-fusable and XLA compiles DUS chains slowly)
    T = _conv_tree(terms, out_len)
    bound = len(terms) << (2 * w)
    assert bound < (1 << 31), "limb size too large for int32 accumulation"
    return ks_carry(T, w, bound)


def twos_complement_abs(S: Array, w: int) -> tuple[Array, Array]:
    """Canonical two's-complement limbs (n, N) in [0,2^w) -> (|value|, neg
    mask). The value must fit in n*w - 1 bits (sign = top bit of top limb).
    No dynamic-update-slice (the formula must be Mosaic-fusable)."""
    n = S.shape[0]
    neg = (S[n - 1] >> (w - 1)) > 0
    mask = (1 << w) - 1
    comp = mask - S
    comp = jnp.concatenate([comp[:1] + 1, comp[1:]], axis=0)
    comp = carry_signed(comp, w, n)
    return jnp.where(neg[None], comp, S), neg


# --------------------------------------------------------------------------
# signed window digits on device
# --------------------------------------------------------------------------


def extract_windows(limbs: Array, w: int, b_bits: int, c: int) -> Array:
    """(nl, N) w-bit limbs -> (K, N) unsigned c-bit windows, K = ceil((b+1)/c)
    (analog of extractBitSlice, wasm/field-helpers.ts:307-358; shifts are
    static per window so the whole extraction is K fused gathers+shifts)."""
    nl = limbs.shape[0]
    K = ceil_div(b_bits + 1, c)
    cmask = (1 << c) - 1
    rows = []
    for k in range(K):
        off = k * c
        l0, sh = off // w, off % w
        if l0 >= nl:
            rows.append(jnp.zeros_like(limbs[0]))
            continue
        val = limbs[l0] >> sh
        have = w - sh
        t = 1
        while have < c and l0 + t < nl:
            val = val | ((limbs[l0 + t] & ((1 << min(w, c - have)) - 1)) << have)
            have += w
            t += 1
        rows.append(val & cmask)
    return jnp.stack(rows, axis=0)


def signed_digits_device(limbs: Array, w: int, b_bits: int, c: int,
                         sign: Array | None = None) -> Array:
    """(nl, N) limbs -> (K, N) signed digits in [-2^(c-1), 2^(c-1)]; if
    `sign` (N,) of +-1 is given every digit is multiplied by it (folding a
    scalar's sign into its digits). Mirrors the signed-digit carry loop
    (msm-batched-affine.ts:180-203)."""
    d = extract_windows(limbs, w, b_bits, c)
    half = 1 << (c - 1)
    full = 1 << c

    def step(carry, dk):
        dk = dk + carry
        over = jnp.where(dk > half, 1, 0)
        return over, dk - over * full

    carry, d = jax.lax.scan(step, jnp.zeros_like(d[0]), d)
    # carry must be 0 for b_bits-bit values with K = ceil((b+1)/c) windows
    if sign is not None:
        d = d * sign[None, :]
    return d


# --------------------------------------------------------------------------
# GLV decomposition on device
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class GlvDevice:
    """Precomputed constants for the device GLV decompose at limb size w."""

    g: GlvParams
    w: int
    ns: int  # limbs of an input scalar (covers bit_length(q))
    m_limbs: int  # fixed-point shift in limbs (m = m_limbs * w)
    k0: int  # truncated-conv start limb (m_limbs - 2 guard limbs)
    nu: int  # limbs of the lattice coefficients c1, c2
    nw: int  # limbs of the two's-complement residual accumulators
    g1_limbs: tuple  # floor(2^m * |v11| / |det|)
    g2_limbs: tuple  # floor(2^m * |v10| / |det|)
    sgn1: int  # sign of v11/det  (c1 = sgn1 * u1)
    sgn2: int  # sign of -v10/det (c2 = sgn2 * u2)
    # s0 = s - c1*v00 - c2*v01 ; s1 = -c1*v10 - c2*v11  (exact ints)
    coef0: tuple  # (-sgn1*v00, -sgn2*v01)
    coef1: tuple  # (-sgn1*v10, -sgn2*v11)
    max_bits_eff: int  # rigorous |s0|,|s1| bound incl. truncation slack


def glv_device(g: GlvParams, w: int = 12) -> GlvDevice:
    bq = g.q.bit_length()
    ns = ceil_div(bq, w)
    m_limbs = ns + 1  # 2^m >= 2^(bq + w) so s/2^m << 1
    m = m_limbs * w
    det = abs(g.det)
    r1_num, r2_num = g.v11, -g.v10
    if g.det < 0:
        r1_num, r2_num = -r1_num, -r2_num
    sgn1 = 1 if r1_num >= 0 else -1
    sgn2 = 1 if r2_num >= 0 else -1
    g1 = (1 << m) * abs(r1_num) // det
    g2 = (1 << m) * abs(r2_num) // det
    nu = ceil_div(g.max_bits + 4, w)
    ng = ceil_div(max(g1.bit_length(), g2.bit_length(), 1), w)
    # c_i error budget: fixed-point floor (<=1) + rounding-vs-floor (<=1/2)
    # + truncated-conv carry loss (< 1 with 2 guard limbs) => |c_i - round| <= 2,
    # so |s0| <= 2^max_bits + 2*(|v00|+|v01|) and similarly s1.
    b0 = (1 << g.max_bits) + 2 * (abs(g.v00) + abs(g.v01))
    b1 = (1 << g.max_bits) + 2 * (abs(g.v10) + abs(g.v11))
    max_bits_eff = max(b0.bit_length(), b1.bit_length())
    nw = ceil_div(max_bits_eff + 2, w)
    return GlvDevice(
        g=g, w=w, ns=ns, m_limbs=m_limbs, k0=m_limbs - 2, nu=nu, nw=nw,
        g1_limbs=tuple(to_limbs(g1, w, ng)),
        g2_limbs=tuple(to_limbs(g2, w, ng)),
        sgn1=sgn1, sgn2=sgn2,
        coef0=(-sgn1 * g.v00, -sgn2 * g.v01),
        coef1=(-sgn1 * g.v10, -sgn2 * g.v11),
        max_bits_eff=max_bits_eff,
    )


def decompose_device(gd: GlvDevice, s_limbs: Array) -> tuple[Array, Array, Array, Array]:
    """Vectorized GLV decompose: s (ns, N) -> (|s0|, sign0, |s1|, sign1) with
    s0 + s1*lambda = s (mod q), |s_i| < 2^max_bits_eff.
    (reference wasm/glv.ts:35-229 glvGeneral)"""
    w, nw = gd.w, gd.nw

    def msb_mul(glimbs):
        # u = floor(s * g / 2^m), truncated conv from limb k0 (2 guard limbs)
        T = conv_mul_const(s_limbs, glimbs, w, k_lo=gd.k0,
                           k_hi=gd.m_limbs + gd.nu)
        return T[gd.m_limbs - gd.k0 :]  # (nu, N)

    u1 = msb_mul(gd.g1_limbs)
    u2 = msb_mul(gd.g2_limbs)

    def residual(coefs, include_s):
        # value = (include_s ? s : 0) + coef[0]*u1 + coef[1]*u2, mod 2^(nw*w)
        # (no dynamic-update-slice: keeps the formula Mosaic-fusable)
        if include_s:
            m = min(nw, gd.ns)
            acc = s_limbs[:m]
            if nw > m:
                acc = jnp.concatenate(
                    [acc, jnp.zeros((nw - m, *s_limbs.shape[1:]), jnp.int32)],
                    axis=0,
                )
        else:
            acc = jnp.zeros((nw, *s_limbs.shape[1:]), dtype=jnp.int32)
        for coef, u in ((coefs[0], u1), (coefs[1], u2)):
            if coef == 0:
                continue
            limbs = to_limbs(abs(coef), w, ceil_div(abs(coef).bit_length(), w) or 1)
            T = conv_mul_const(u, limbs, w, k_lo=0, k_hi=nw)  # (nw, N), low part
            acc = acc + (T if coef > 0 else -T)
        acc = carry_signed(acc, w, nw + 2)
        return twos_complement_abs(acc, w)

    a0, n0 = residual(gd.coef0, include_s=True)
    a1, n1 = residual(gd.coef1, include_s=False)
    return a0, n0, a1, n1


def _signed_windows_inline(limbs: Array, w: int, b_bits: int, c: int,
                           sgn: Array) -> Array:
    """extract_windows + signed-digit carry, python-unrolled (K static) so
    the whole thing inlines into a fused kernel (lax.scan is not
    Mosaic-fusable)."""
    d = extract_windows(limbs, w, b_bits, c)
    half, full = 1 << (c - 1), 1 << c
    carry = jnp.zeros_like(d[0])
    rows = []
    for k in range(d.shape[0]):
        dk = d[k] + carry
        over = jnp.where(dk > half, 1, 0)  # no bool->i32 astype in Mosaic
        rows.append((dk - over * full) * sgn)
        carry = over
    return jnp.stack(rows, axis=0)


def digits_glv_device(gd: GlvDevice, s_limbs: Array, c: int) -> Array:
    """(ns, N) scalar limbs -> (K, 2N) signed digits for the GLV-expanded
    point list [P..., phi(P)...] (column i: digits of s0_i; column N+i:
    digits of s1_i). Fully on device; on the TPU path the ENTIRE pipeline
    (msb-mul lattice coefficients, residuals, two's-complement abs, window
    slicing, signed-digit carry) runs as ONE fused kernel emitting both
    halves' digit planes (the analog of the reference's scalar Wasm module
    being a single instantiated unit, scalar-glv.ts:19-51)."""
    import os

    from ..ops import kernels

    K = ceil_div(gd.max_bits_eff + 1, c)

    # The whole-pipeline fused kernel is OFF by default on the compiled
    # Pallas path: Mosaic compile of the conv-tree-heavy decompose measured
    # >10 min on TPU (vs ~10 ms of runtime saved). Callback/interpret test
    # modes still take the fused branch (it exercises the same formula);
    # set MSM_FUSED_DIGITS=1 to force it on TPU.
    fuse = kernels.use_pallas() and (
        kernels._MODE != "compiled"
        or os.environ.get("MSM_FUSED_DIGITS", "0") == "1"
    )
    if fuse:
        cache = gd.__dict__.setdefault("_digit_formulas", {})
        fn = cache.get(c)
        if fn is None:

            def fn(sl, _gd=gd, _c=c):
                a0, n0, a1, n1 = decompose_device(_gd, sl)
                s0 = jnp.where(n0, -1, 1).astype(jnp.int32)
                s1 = jnp.where(n1, -1, 1).astype(jnp.int32)
                d0 = _signed_windows_inline(a0, _gd.w, _gd.max_bits_eff, _c, s0)
                d1 = _signed_windows_inline(a1, _gd.w, _gd.max_bits_eff, _c, s1)
                return [d0, d1]

            cache[c] = fn
        d0, d1 = kernels.fused(f"glv_digits_{c}", fn, [s_limbs], [K, K])
        return jnp.concatenate([d0, d1], axis=-1)

    a0, n0, a1, n1 = decompose_device(gd, s_limbs)
    mags = jnp.concatenate([a0, a1], axis=-1)
    sign = jnp.concatenate([n0, n1], axis=-1)
    sgn = jnp.where(sign, -1, 1).astype(jnp.int32)
    return signed_digits_device(mags, gd.w, gd.max_bits_eff, c, sign=sgn)
