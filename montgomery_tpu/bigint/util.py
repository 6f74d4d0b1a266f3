"""Basic big-integer helpers shared by the oracle layer and the kernel builders.

Mirrors the role of the reference's `src/bigint/field-util.ts` (mod,
montgomeryParams) — re-derived for TPU limb sizes: on TPU the VPU multiplies
int32 x int32, so limb sizes are chosen so products and deferred-carry
accumulations fit in 32-bit (signed-positive) accumulators, the analog of the
reference's 64-bit-accumulator analysis (doc/zprize22.md:117-149).
"""

from __future__ import annotations

import math
from dataclasses import dataclass


def bit_length(x: int) -> int:
    return x.bit_length()


def ceil_div(a: int, b: int) -> int:
    return -(-a // b)


def mod(x: int, p: int) -> int:
    """x mod p, always in [0, p). (reference: bigint/field-util.ts:8-11)"""
    r = x % p
    return r + p if r < 0 else r


@dataclass(frozen=True)
class MontgomeryParams:
    """Montgomery representation parameters for a modulus p with w-bit limbs.

    n: number of limbs; K = n*w; R = 2^K (Montgomery radix, R > 4p by default
    so field elements can be kept lazily reduced in [0, 2p)).
    (reference: bigint/field-util.ts:18-42)
    """

    p: int
    w: int
    n: int
    K: int
    R: int
    word_max: int
    length_p: int
    n_packed_bytes: int
    # mu = -p^-1 mod 2^w, the Montgomery constant used to compute q_i
    mu: int
    # R^2 mod p — multiply by this to enter Montgomery form
    R2: int
    # R mod p — the Montgomery form of 1
    R_mod_p: int


def montgomery_params(p: int, w: int, min_extra_bits: int = 2) -> MontgomeryParams:
    """Compute limb count n and Montgomery constants for modulus p, limb size w.

    On TPU we require w <= 15 so that the product of two limbs fits a signed
    int32 with headroom for deferred carries; see `n_safe_terms`.
    """
    if not (1 <= w <= 15):
        raise ValueError("TPU limb size must satisfy 1 <= w <= 15 (int32 products)")
    length_p = bit_length(p)
    min_k = length_p + min_extra_bits  # want R = 2^K > 4p (lazy reduction in [0,2p))
    n = ceil_div(min_k, w)
    K = n * w
    R = 1 << K
    mu = (-pow(p, -1, 1 << w)) % (1 << w)
    return MontgomeryParams(
        p=p,
        w=w,
        n=n,
        K=K,
        R=R,
        word_max=(1 << w) - 1,
        length_p=length_p,
        n_packed_bytes=ceil_div(length_p, 8),
        mu=mu,
        R2=(R * R) % p,
        R_mod_p=R % p,
    )


def n_safe_terms(w: int, acc_bits: int = 31) -> int:
    """How many products of two w-bit limbs can be accumulated in an
    `acc_bits`-bit non-negative accumulator before a carry is required.

    Analog of the reference's nSafeTerms = 2^(64-2w) analysis
    (wasm/multiply-montgomery.ts:44-48) redone for int32: products are
    < 2^(2w), so k terms stay below 2^acc_bits iff k <= 2^(acc_bits - 2w).
    """
    return 1 << max(acc_bits - 2 * w, 0)


def to_limbs(x: int, w: int, n: int) -> list[int]:
    """Split x into n w-bit limbs, little-endian."""
    mask = (1 << w) - 1
    return [(x >> (w * i)) & mask for i in range(n)]


def from_limbs(limbs, w: int) -> int:
    """Recombine little-endian w-bit limbs into an int (limbs may be unreduced
    or negative — this is the exact value Σ limbs[i] * 2^(w i))."""
    x = 0
    for i, l in enumerate(limbs):
        x += int(l) << (w * i)
    return x


def bytes_to_int_le(b: bytes) -> int:
    return int.from_bytes(b, "little")


def int_to_bytes_le(x: int, length: int) -> bytes:
    return x.to_bytes(length, "little")


def log2_ceil(x: int) -> int:
    return max(0, (x - 1).bit_length())


def is_power_of_two(x: int) -> bool:
    return x > 0 and (x & (x - 1)) == 0


def next_power_of_two(x: int) -> int:
    return 1 << log2_ceil(x)


def round_up(x: int, m: int) -> int:
    return ceil_div(x, m) * m


def round_half_to_even_div(a: int, b: int) -> int:
    """round(a / b) with exact rational rounding (ties away from zero),
    for signed a, positive b. Used by GLV decomposition."""
    assert b > 0
    q, r = divmod(a, b)  # python: r in [0, b)
    if 2 * r >= b:
        q += 1
    return q
