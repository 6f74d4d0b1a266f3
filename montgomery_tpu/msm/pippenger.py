"""Single-chip Pippenger MSM engine (sort + pair-halving + triangle/row).

TPU re-design of the reference's bucket method (msm-batched-affine.ts /
msm-basic.ts), with pointers and atomics replaced by sort/segment primitives
(SURVEY.md §7.1):

- The counting-sort scatter (msm-batched-affine.ts:423-502) becomes ONE
  lax.sort of (window, bucket) keys over all windows of a chunk at once.
- The pair-batched bucket accumulation rounds m = 1, 2, 4, ...
  (msm-batched-affine.ts:243-283) become index-computed "pair-halving"
  rounds: in each round, adjacent elements of every bucket run are paired
  and added with ONE batched group add; positions come from cumsums of the
  per-bucket counts, not pointer lists. A few rounds run with shrinking
  static shapes (python-level), the tail runs in a lax.while_loop at fixed
  shape until every bucket has a single element.
- The triangle+row bucket reduction (msm-batched-affine.ts:556-583) becomes
  a reverse associative_scan (suffix sums) over the bucket axis plus a
  log-depth fold, vectorized over ALL windows simultaneously.
- The final window combine is a Horner scan: c doublings + 1 add per window
  (msm-batched-affine.ts:322-334).

Windows are processed in chunks via lax.scan so the traced program is ONE
chunk regardless of K (the scan re-uses the compiled body).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def window_size(field_bits: int, log2_n: int) -> int:
    """Window size table (re-tuned analog of reference msm-common.ts:8-41;
    formula fallback max(log2_n - 1, 1))."""
    table = {
        10: 9, 11: 10, 12: 10, 13: 11, 14: 12, 15: 12,
        16: 13, 17: 13, 18: 14, 19: 14, 20: 15, 21: 15,
    }
    c = table.get(log2_n, max(log2_n - 1, 1))
    return max(1, min(c, 16))


def _excl_cumsum(x):
    c = jnp.cumsum(x)
    return jnp.concatenate([jnp.zeros((1,), dtype=x.dtype), c[:-1]])


def _round_sizes(M0: int, G: int, max_python_rounds: int = 8):
    """Static sizes for the shrinking pair-halving rounds. Each round maps
    M elements to at most (M + #buckets)/2 survivors."""
    sizes = [M0]
    while len(sizes) <= max_python_rounds:
        M = sizes[-1]
        nxt = min(M, (M + min(G, M)) // 2 + 1)
        if nxt >= M * 0.75:
            break
        sizes.append(nxt)
    return sizes


def msm_digits(group, points, digits: jax.Array, c: int, window_chunk: int | None = None):
    """MSM from precomputed signed digits.

    group: ProjectiveAdapter / EdwardsAdapter
    points: group point batch with trailing dim N (output of group.from_points)
    digits: (K, N) int32 signed digits in [-2^(c-1), 2^(c-1)]
    returns: group point batch with trailing shape (1,) = sum_i s_i P_i
    """
    buckets, K_pad, L = bucket_accumulate(group, points, digits, c, window_chunk)
    return reduce_buckets(group, buckets, c, K_pad, L)


def msm_digits_affine(aff_group, proj_group, points, digits: jax.Array, c: int,
                      window_chunk: int | None = None):
    """MSM with batched-affine accumulation (the reference's flagship path):
    pair-halving rounds use affine adds + shared batch inversion
    (AffineAccumAdapter), the bucket reduction runs in complete projective
    coordinates. points: AffineBatch."""
    buckets, K_pad, L = bucket_accumulate(aff_group, points, digits, c, window_chunk)
    return reduce_buckets(proj_group, aff_group.to_projective(buckets), c, K_pad, L)


def bucket_accumulate(group, points, digits: jax.Array, c: int, window_chunk: int | None = None):
    """Phase 1+2 of Pippenger: sort + pair-halving bucket accumulation.
    Returns (buckets tree with leaves (n, K_pad, L), K_pad, L). On a mesh this
    runs per device on its point shard; the bucket trees are then combined
    bucket-wise with group adds (parallel/sharded.py)."""
    K, N = digits.shape
    L = 1 << (c - 1)

    KC = window_chunk if window_chunk else K
    KC = min(KC, K)
    C = -(-K // KC)
    K_pad = C * KC
    if K_pad != K:
        digits = jnp.concatenate(
            [digits, jnp.zeros((K_pad - K, N), dtype=digits.dtype)], axis=0
        )
    digits = digits.reshape(C, KC, N)

    G = KC * (L + 1)  # live bucket slots per chunk (b=0 slots are dead)
    Gd = G + 1  # + 1 dead slot for zero digits
    M0 = KC * N
    sizes = _round_sizes(M0, G)

    def pair_round(P_cur, counts, starts, size_out, src_transform=None):
        """One pair-halving round: combine adjacent elements per bucket run."""
        new_counts = (counts + 1) // 2
        new_starts = _excl_cumsum(new_counts)
        ends = starts + counts
        delta = starts - 2 * new_starts
        j = jnp.arange(size_out, dtype=jnp.int32)
        bid = jnp.searchsorted(new_starts, j, side="right").astype(jnp.int32) - 1
        bid = jnp.clip(bid, 0, Gd - 1)
        src = 2 * j + delta[bid]
        src = jnp.clip(src, 0, None)
        has_pair = (src + 1) < ends[bid]
        if src_transform is None:
            A = group.gather(P_cur, src)
            B = group.gather(P_cur, jnp.where(has_pair, src + 1, src))
        else:
            A = src_transform(src)
            B = src_transform(jnp.where(has_pair, src + 1, src))
        added = group.add(A, B)
        P_new = group.select(has_pair, added, A)
        return P_new, new_counts, new_starts

    def chunk_body(_, digits_chunk):
        # digits_chunk: (KC, N)
        b = jnp.abs(digits_chunk)
        sign = (digits_chunk < 0).astype(jnp.int32)
        win = jax.lax.broadcasted_iota(jnp.int32, (KC, N), 0)
        key = jnp.where(b > 0, win * (L + 1) + b, G).reshape(-1)
        idx = jax.lax.broadcasted_iota(jnp.int32, (KC, N), 1).reshape(-1)
        sign = sign.reshape(-1)

        key_s, idx_s, sign_s = jax.lax.sort((key, idx, sign), num_keys=1)
        counts = jnp.bincount(key, length=Gd).astype(jnp.int32)
        counts = counts.at[G].set(0)  # dead bucket: never accumulated
        starts = _excl_cumsum(counts)

        # round 0: reads original points through the sorted index (avoids
        # materializing K*N gathered points; signs applied on the fly)
        def src_from_points(src):
            pt = group.gather(points, jnp.take(idx_s, src))
            return group.neg_where(pt, jnp.take(sign_s, src).astype(bool))

        P_cur, counts, starts = pair_round(
            None, counts, starts, sizes[1] if len(sizes) > 1 else M0,
            src_transform=src_from_points,
        )
        # shrinking python-level rounds
        for size_out in sizes[2:]:
            P_cur, counts, starts = pair_round(P_cur, counts, starts, size_out)

        # fixed-shape tail rounds until every bucket has <= 1 element
        M_B = sizes[-1] if len(sizes) > 1 else M0

        def cond(state):
            _, counts, _ = state
            return jnp.max(counts) > 1

        def body(state):
            P_cur, counts, starts = state
            return pair_round(P_cur, counts, starts, M_B)

        P_cur, counts, starts = jax.lax.while_loop(
            cond, body, (P_cur, counts, starts)
        )

        # extract buckets: window k, bucket l in [1, L]
        gid = (
            jax.lax.broadcasted_iota(jnp.int32, (KC, L), 0) * (L + 1)
            + jax.lax.broadcasted_iota(jnp.int32, (KC, L), 1)
            + 1
        ).reshape(-1)
        Bpt = group.gather(P_cur, jnp.take(starts, gid))
        valid = jnp.take(counts, gid) == 1
        Bpt = group.select(valid, Bpt, group.zero_like((KC * L,)))
        return None, Bpt

    _, buckets = jax.lax.scan(chunk_body, None, digits)
    # buckets leaves: (C, n, KC*L) -> (n, K_pad, L)
    n = group.f.n

    def fix(a):
        if a.ndim == 3 and a.shape[1] == n:
            return a.transpose(1, 0, 2).reshape(n, K_pad, L)
        return a.reshape(K_pad, L)  # masks (C, KC*L)

    buckets = jax.tree.map(fix, buckets)
    return buckets, K_pad, L


def reduce_buckets(group, buckets, c: int, K_pad: int, L: int):
    """Phase 3+4 of Pippenger: triangle+row bucket reduction and Horner
    window combine. buckets: tree with leaves (n, K_pad, L)."""
    # triangle + row, all windows at once, as two Hillis-Steele suffix scans
    # (ONE add instantiation each — compile-friendly; reference triangle+row:
    # msm-batched-affine.ts:556-583):
    #   suffix[l] = sum_{j >= l} B_j ; window_sum = suffix-scan(suffix)[0]
    log2L = max(L.bit_length() - 1, 0)

    def suffix_scan(P):
        def body(s, T):
            d = jnp.left_shift(jnp.int32(1), s)

            def sh(a):
                pad = jnp.concatenate([a, jnp.zeros_like(a)], axis=-1)
                return jax.lax.dynamic_slice_in_dim(pad, d, L, axis=a.ndim - 1)

            Tsh = jax.tree.map(sh, T)
            # shifted-in zeros must be the group identity, not all-zero limbs
            idx = jax.lax.broadcasted_iota(jnp.int32, (K_pad, L), 1)
            ident = group.zero_like((K_pad, L))
            Tsh = group.select((idx + d < L).reshape(K_pad, L), Tsh, ident)
            return group.add(T, Tsh)

        return jax.lax.fori_loop(0, log2L, body, P)

    suffix = suffix_scan(buckets)
    totals = suffix_scan(suffix)
    window_sums = jax.tree.map(lambda a: a[..., :1], totals)  # (n, K_pad, 1)

    # horner combine over windows, high to low
    def horner_step(S, k):
        def dbl(_, P):
            return group.double(P)

        S = jax.lax.fori_loop(0, c, dbl, S)
        Wk = jax.tree.map(
            lambda a: jax.lax.dynamic_index_in_dim(a, k, axis=-2, keepdims=False)
            if a.ndim >= 2
            else a,
            window_sums,
        )
        return group.add(S, Wk), None

    top = jax.tree.map(
        lambda a: jax.lax.dynamic_index_in_dim(a, K_pad - 1, axis=-2, keepdims=False),
        window_sums,
    )
    if K_pad == 1:
        return top
    ks = jnp.arange(K_pad - 2, -1, -1, dtype=jnp.int32)
    S, _ = jax.lax.scan(horner_step, top, ks)
    return S
