"""Limb codec: python bigints <-> int32 limb-plane arrays.

Layout decision (TPU-first, see SURVEY.md §7.1): a batch of N field elements is
an int32 array of shape (n_limbs, N) — "limb planes", with the batch on the
minor (lane) axis so every vector instruction processes 8x128 *points* at
once. This is the opposite of the reference's AoS pointer layout and is the
lesson of its failed limb-axis SIMD experiment
(reference wasm/experiments/multiply-schoolbook-simd.ts:5-9).

Analog of the reference's fromPackedBytes/toPackedBytes
(wasm/field-helpers.ts:211-301).
"""

from __future__ import annotations

import numpy as np

from ..bigint.util import MontgomeryParams, from_limbs, to_limbs


def bytes_to_limbs(data, n_bytes: int, w: int, n_limbs: int) -> np.ndarray:
    """Packed little-endian bytes (N elements x n_bytes each) -> (n_limbs, N)
    int32 limb planes, vectorized over N (analog of fromPackedBytes,
    wasm/field-helpers.ts:211-260). `data` may be bytes or a uint8 array."""
    B = np.frombuffer(bytes(data), dtype=np.uint8).reshape(-1, n_bytes)
    out = np.zeros((n_limbs, B.shape[0]), dtype=np.int32)
    mask = (1 << w) - 1
    for j in range(n_limbs):
        off = j * w
        s, r = off // 8, off % 8
        if s >= n_bytes:
            break
        val = B[:, s].astype(np.int32) >> r
        have = 8 - r
        t = 1
        while have < w and s + t < n_bytes:
            val = val | (B[:, s + t].astype(np.int32) << have)
            have += 8
            t += 1
        out[j] = val & mask
    return out


def pack(values, mp: MontgomeryParams) -> np.ndarray:
    """Pack a list of python ints (each in [0, 2^K)) into an (n, N) int32
    array. Vectorized: ints -> one little-endian byte blob (C-level
    int.to_bytes per value) -> numpy limb extraction; the former per-value
    30-limb python loop was minutes of host time at 2^20 points."""
    n, w = mp.n, mp.w
    nb = -(-(n * w) // 8)
    blob = b"".join(int(v).to_bytes(nb, "little") for v in values)
    return bytes_to_limbs(blob, nb, w, n)


def unpack(arr, mp: MontgomeryParams) -> list[int]:
    """Recombine an (n, N) limb array into python ints (exact signed value)."""
    a = np.asarray(arr)
    assert a.shape[0] == mp.n, (a.shape, mp.n)
    return [from_limbs(a[:, j], mp.w) for j in range(a.shape[1])]


def pack16(x, n: int):
    """(n, M) canonical w<=16-bit limb planes -> (ceil(n/2), M) int32 with
    TWO limbs per row (limb j | limb j+ceil(n/2) << 16): halves are
    contiguous row blocks, so packing is shift/mask only (no sublane
    interleave). Shared by the packed point forms (AffineOps / EdwardsOps)."""
    import jax.numpy as jnp

    h = (n + 1) // 2
    lo = x[:h]
    hi = x[h:]
    if hi.shape[0] < h:
        hi = jnp.concatenate(
            [hi, jnp.zeros((h - hi.shape[0], *x.shape[1:]), x.dtype)], axis=0
        )
    return lo | (hi << 16)


def unpack16(p, n: int):
    """Inverse of pack16: (ceil(n/2), M) -> (n, M)."""
    import jax.numpy as jnp

    h = (n + 1) // 2
    lo = p & 0xFFFF
    hi = (p >> 16) & 0xFFFF
    return jnp.concatenate([lo, hi[: n - h]], axis=0)


def pack_scalar(value: int, mp: MontgomeryParams) -> np.ndarray:
    """Pack a single int as an (n, 1) constant plane (broadcastable)."""
    return pack([value], mp)


def pack_const(value: int, mp: MontgomeryParams) -> np.ndarray:
    """Pack a single int as an (n,) constant vector; field ops reshape it to
    broadcast against any (n, *batch) array rank."""
    return np.array(to_limbs(value, mp.w, mp.n), dtype=np.int32)


def pack_bytes(data: bytes, mp: MontgomeryParams, count: int) -> np.ndarray:
    """Packed little-endian bytes (count elements of n_packed_bytes each) ->
    (n, count) limb array. Analog of fromPackedBytes."""
    nb = mp.n_packed_bytes
    assert len(data) == count * nb
    vals = [int.from_bytes(data[i * nb : (i + 1) * nb], "little") for i in range(count)]
    return pack(vals, mp)


def to_bytes(arr, mp: MontgomeryParams) -> bytes:
    """(n, N) limb array -> packed little-endian bytes (analog of toPackedBytes)."""
    vals = unpack(arr, mp)
    nb = mp.n_packed_bytes
    return b"".join(int(v).to_bytes(nb, "little") for v in vals)
