"""Constant-iteration safegcd (Bernstein-Yang divstep) modular inverse.

TPU re-design of the reference's fast-inverse experiment
(inverse/faster-inverse.ts:76-166 + faster-inverse-wasm.ts): the 2-adic
divstep iteration, batched into k-step transition matrices so the full-width
state is touched only once per k steps (the reference batches 62 steps per
i64 word; here K_BATCH is sized so matrix-entry x limb products fit int32).

Like the reference's version, this is an EXPLORATION wired into the
micro-benchmarks and tests, not the production path — the production single
inverse stays the fused Fermat ladder (ops/field.py inv), amortized to ~1.5
muls/element through the batch-inversion tree. The measured comparison lives
in scripts/micro_bench.py (section "altmul"/"inverse").

Algorithm (BY19, "Fast constant-time gcd computation and modular
inversion"): state (delta, f, g), f = p (odd), g = x; each divstep:

    if delta > 0 and g odd: (delta, f, g) <- (1-delta, g, (g-f)/2)
    else:                   (delta, f, g) <- (1+delta, f, (g + (g&1) f)/2)

After iterations(d) steps (d = bits(p)) f = +-gcd(p, x). The k-step
transition matrix M (|u|+|v| <= 2^k per row) is accumulated on low words,
then applied to the full-width (f, g) (exact /2^k) and to the mod-p
coefficient pair (v, r) (Montgomery-style exact shift), preserving
f == v*x (mod p) up to shared scaling; at the end v*sign(f) == x^{-1}.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..bigint.util import to_limbs
from .field import Array, FieldOps

# matrix-batch size: |u|,|v|,|q|,|r| <= 2^k after k steps; entry x limb
# products and their 2-term sums must fit signed int32: k + w + 1 <= 30
K_BATCH = 16


def iterations(d: int) -> int:
    """Proven sufficient divstep count for d-bit inputs (BY19 Thm 11.2)."""
    return (49 * d + 57) // 17 if d < 46 else (49 * d + 80) // 17


@dataclass(frozen=True, eq=False)
class DivstepParams:
    f: FieldOps
    iters: int
    n_batches: int
    pprime: int  # -p^{-1} mod 2^K_BATCH


def divstep_params(f: FieldOps) -> DivstepParams:
    """Raises ValueError when the int32 headroom preconditions fail; callers
    (FieldOps.inv_root) fall back to the Fermat ladder then.

    - matrix-entry x limb products and their 2-term sums must fit signed
      int32: K_BATCH + w + 1 <= 30 (w >= 14 breaks this);
    - the final binary-descent reduction and the NV = n+1 row headroom
      assume accumulated v/r growth < 2^7 * p: n_batches <= 127 (moduli
      beyond ~590 bits break this)."""
    p = f.p
    it = iterations(p.bit_length())
    nb = -(-it // K_BATCH)
    if K_BATCH + f.w + 1 > 30:
        raise ValueError(
            f"divstep needs K_BATCH + w + 1 <= 30 (got w={f.w})"
        )
    if nb > 127:
        raise ValueError(f"divstep needs n_batches <= 127 (got {nb})")
    pprime = (-pow(p, -1, 1 << K_BATCH)) % (1 << K_BATCH)
    return DivstepParams(f=f, iters=it, n_batches=nb, pprime=pprime)


def _inv_formula(dp: DivstepParams, x):
    """x (n, N) PLAIN-domain canonical limbs in [0, p) -> x^{-1} mod p
    (plain domain, [0, p)); 0 -> 0. Pure jnp int32 formula (fusable)."""
    fo = dp.f
    n, w = fo.n, fo.w
    mask = (1 << w) - 1
    NR = n + 2  # f/g rows (signed two's complement, headroom)
    NV = n + 1  # v/r rows (values grow to ~(batches)*p, ~7 extra bits)
    KB = K_BATCH

    def shd(a, d=1):
        return jnp.concatenate([jnp.zeros_like(a[:d]), a[:-d]], axis=0)

    def normalize(S):
        """Signed limb plane (|limb| < 2^30) -> canonical two's complement
        limbs in [0, 2^w), value preserved mod 2^(rows*w). Exact: two
        signed squeezes, then the bias trick (adding 2^w-1 to every limb
        adds 2^(rows*w) - 1 == -1; +1 at limb 0 restores the value) makes
        everything non-negative single-carry for a Kogge-Stone pass."""
        S = (S & mask) + shd(S >> w)  # carries |.| <= 2^17
        S = (S & mask) + shd(S >> w)  # carries |.| <= ~2^5
        S = S + mask
        S = jnp.concatenate([S[:1] + 1, S[1:]], axis=0)
        S = (S & mask) + shd(S >> w)  # limbs in [0, 2^w + 2]
        S = (S & mask) + shd(S >> w)  # limbs in [0, 2^w + 1)
        g = S >> w
        r = S & mask
        pr = jnp.where(r == mask, 1, 0)
        d = 1
        rows = S.shape[0]
        while d < rows:
            g = g | (pr & shd(g, d))
            pr = pr & shd(pr, d)
            d <<= 1
        return (r + shd(g)) & mask

    def low_word(S, bits):
        need = -(-bits // w)
        acc = S[0]
        shift = w
        for i in range(1, need):
            acc = acc | (S[i] << shift)
            shift += w
        return acc & ((1 << bits) - 1)

    def shr_canonical(S, k, sign_extend):
        """Shift the represented value right by k bits (canonical limbs).
        sign_extend: two's-complement arithmetic shift (else zero fill)."""
        d, r = divmod(k, w)
        rows = S.shape[0]
        if sign_extend:
            fill = jnp.where(S[rows - 1] >= (1 << (w - 1)), mask, 0)
        else:
            fill = jnp.zeros_like(S[0])
        out = []
        for i in range(rows):
            lo = S[i + d] if i + d < rows else fill
            if r == 0:
                out.append(lo)
            else:
                hi = S[i + d + 1] if i + d + 1 < rows else fill
                out.append(((lo >> r) | (hi << (w - r))) & mask)
        return jnp.stack(out, axis=0)

    p_limbs_nr = np.array(to_limbs(fo.p, w, NR), dtype=np.int32).reshape(NR, 1)
    p_limbs_nv = np.array(to_limbs(fo.p, w, NV), dtype=np.int32).reshape(NV, 1)
    p_nr = jnp.asarray(p_limbs_nr)
    p_nv = jnp.asarray(p_limbs_nv)

    batch = x.shape[1:]
    fpl = jnp.broadcast_to(p_nr, (NR, *batch))
    gpl = jnp.concatenate(
        [x, jnp.zeros((NR - n, *batch), jnp.int32)], axis=0
    )
    vpl = jnp.zeros((NV, *batch), jnp.int32)
    rpl = jnp.concatenate(
        [jnp.ones((1, *batch), jnp.int32), jnp.zeros((NV - 1, *batch), jnp.int32)],
        axis=0,
    )
    delta = jnp.ones(batch, jnp.int32)

    def batch_step(_, state):
        fpl, gpl, vpl, rpl, delta = state
        fw = low_word(fpl, KB + 2)
        gw = low_word(gpl, KB + 2)
        u = jnp.ones_like(delta)
        vm = jnp.zeros_like(delta)
        q = jnp.zeros_like(delta)
        rm = jnp.ones_like(delta)
        for _ in range(KB):
            odd = (gw & 1) != 0
            swap = (delta > 0) & odd
            delta = jnp.where(swap, 1 - delta, 1 + delta)
            fw, gw, u, vm, q, rm = (
                jnp.where(swap, gw, fw),
                jnp.where(swap, (gw - fw) >> 1,
                          jnp.where(odd, (gw + fw) >> 1, gw >> 1)),
                jnp.where(swap, 2 * q, 2 * u),
                jnp.where(swap, 2 * rm, 2 * vm),
                jnp.where(swap, q - u, jnp.where(odd, q + u, q)),
                jnp.where(swap, rm - vm, jnp.where(odd, rm + vm, rm)),
            )
        ub, vb, qb, rb = u[None], vm[None], q[None], rm[None]
        # (f, g) <- M (f, g) / 2^k  — exact division, arithmetic shift
        f_new = shr_canonical(normalize(ub * fpl + vb * gpl), KB, True)
        g_new = shr_canonical(normalize(qb * fpl + rb * gpl), KB, True)

        # (v, r) <- M (v, r) / 2^k mod p: t += (t*p' mod 2^k)*p makes t
        # divisible by 2^k (values grow by <= p per batch; NV headroom)
        def shift_mod_p(t):
            t = normalize(t)
            m = (low_word(t, KB) * dp.pprime) & ((1 << KB) - 1)
            t = normalize(t + m[None] * p_nv)
            return shr_canonical(t, KB, True)

        v_new = shift_mod_p(ub * vpl + vb * rpl)
        r_new = shift_mod_p(qb * vpl + rb * rpl)
        return f_new, g_new, v_new, r_new, delta

    fpl, gpl, vpl, rpl, delta = jax.lax.fori_loop(
        0, dp.n_batches, batch_step, (fpl, gpl, vpl, rpl, delta)
    )

    # f = +-1; result = sign(f)*v mod p in [0, p)
    f_neg = fpl[NR - 1] >= (1 << (w - 1))
    neg_v = normalize(-vpl)
    v = jnp.where(f_neg[None], neg_v, vpl)
    # v in (-2^7 p, 2^7 p) two's complement: add 2^7 p, then binary-descent
    # conditional subtracts of 2^j p, j = 7..0
    big = np.array(to_limbs((1 << 7) * fo.p, w, NV), dtype=np.int32).reshape(NV, 1)
    v = normalize(v + jnp.asarray(big))
    for j in range(7, -1, -1):
        pj = jnp.asarray(
            np.array(to_limbs((1 << j) * fo.p, w, NV), dtype=np.int32).reshape(NV, 1)
        )
        ge = _geq_planes(v, pj)
        v = jnp.where(ge[None], normalize(v - pj), v)
    out = v[:n]
    zero_in = jnp.all(x == 0, axis=0)
    return [jnp.where(zero_in[None], jnp.zeros_like(out), out)]


def _geq_planes(a, b_plane):
    b = jnp.broadcast_to(b_plane, a.shape)
    gt = a > b
    eq = a == b
    res = gt[0] | eq[0]
    for i in range(1, a.shape[0]):
        res = gt[i] | (eq[i] & res)
    return res


def inv_divstep(dp: DivstepParams, x: Array) -> Array:
    """Plain-domain batched inverse via constant-iteration divstep; ONE
    fused kernel on TPU. x canonical limbs in [0, p); zeros map to zero."""
    from . import kernels

    cache = dp.__dict__.setdefault("_fused", {})
    fn = cache.get("inv")
    if fn is None:

        def fn(xa, _dp=dp):
            return _inv_formula(_dp, xa)

        cache["inv"] = fn
    if kernels.use_pallas():
        return kernels.fused("divstep_inv", fn, [x], [dp.f.n])[0]
    return fn(x)[0]


def inv_mont_divstep(dp: DivstepParams, x_mont: Array) -> Array:
    """Montgomery-domain inverse via divstep: for x = a*R, from_montgomery
    gives a, divstep gives a^{-1}, to_montgomery (mont-mul by R^2) gives
    a^{-1}*R — the Montgomery form of the inverse."""
    f = dp.f
    plain = f.reduce(f.from_montgomery(x_mont))
    return f.to_montgomery(inv_divstep(dp, plain))
