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
    formula fallback max(log2_n - 1, 1)).

    Provenance: TPU v5e sweeps. 2^16 (.logs/c_sweep_r4.log): c=10 138.8,
    c=11 135.8, c=12 136.2, c=13 138.5 ms. 2^20 with the 8-way super-round
    (.logs/c_sweep_r5.log, .logs/bench_r5_fresh3.log): c=13 1.887 s,
    c=14 2.054 s, c=15 2.009 s — GLV leaves ~129 scalar bits, so K stays
    10 for c in {13,14} (c=14 buys nothing) and the K=9 saving at c=15
    loses to the 4x bucket space. Entries at unmeasured sizes interpolate;
    re-measure when hardware changes (the reference tuned its table the
    same way, msm-common.ts:21)."""
    table = {
        10: 9, 11: 9, 12: 10, 13: 10, 14: 11, 15: 11,
        16: 11, 17: 12, 18: 12, 19: 13, 20: 13, 21: 14,
    }
    c = table.get(log2_n, max(log2_n - 1, 1))
    return max(1, min(c, 16))


def _excl_cumsum(x):
    c = jnp.cumsum(x)
    return jnp.concatenate([jnp.zeros((1,), dtype=x.dtype), c[:-1]])


def _next_pow2(m: int) -> int:
    return 1 << max(0, (m - 1).bit_length())


def _pad_pow2(group, P, size: int, batch_shape):
    """Pad the trailing axis from `size` to the next power of two with the
    group identity (so pairwise tree reduction stays balanced)."""
    target = _next_pow2(size)
    if target == size:
        return P
    ident = group.zero_like((*batch_shape, target - size))
    return jax.tree.map(
        lambda a, z: jnp.concatenate([a, z], axis=-1), P, ident
    )


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
                      window_chunk: int | None = None, prepacked: bool = False):
    """MSM with batched-affine accumulation (the reference's flagship path):
    pair-halving rounds use affine adds + shared batch inversion
    (AffineAccumAdapter), the bucket reduction runs in complete projective
    coordinates. points: AffineBatch, or a prepacked (rows, 2N) array with
    prepacked=True."""
    buckets, K_pad, L = bucket_accumulate(aff_group, points, digits, c, window_chunk,
                                          prepacked=prepacked)
    return reduce_buckets(proj_group, aff_group.to_projective(buckets), c, K_pad, L)


def bucket_accumulate(group, points, digits: jax.Array, c: int,
                      window_chunk: int | None = None, prepacked: bool = False):
    """Phase 1+2 of Pippenger: sort + pair-halving bucket accumulation.
    Returns (buckets tree with leaves (n, K_pad, L), K_pad, L). On a mesh this
    runs per device on its point shard; the bucket trees are then combined
    bucket-wise with group adds (parallel/sharded.py).

    Adapters exposing pack_rows/add_packed (batched-affine) take the packed
    fast path: points live in ONE (rows, M) array, so every pair round costs
    one fused lane gather + two fused add kernels + one batch inversion."""
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

    G = KC * L  # live buckets per chunk
    Gd = KC * (L + 1)  # slot space: + 1 per-window dead slot for zero digits
    M0 = KC * N
    sizes = _round_sizes(M0, G)
    use_packed = hasattr(group, "pack_rows")
    # prepacked=True: `points` is already a packed (rows, N) array (produced
    # by a fused prep kernel like AffineOps.pack_rows_glv) — the packed path
    # only ever reads points through P_rows
    assert not (prepacked and not use_packed), "prepacked needs a packed group"
    if use_packed:
        P_rows = points if prepacked else group.pack_rows(points)
    else:
        P_rows = None

    def pair_indices(counts, starts, size_out):
        """Output-slot -> (src, has_pair, new bookkeeping) for one round.

        The output-slot -> bucket map is a step function over sorted
        boundaries; since the queries are arange(size_out) it is computed as
        bincount + cumsum (2 cheap passes) instead of searchsorted, whose
        XLA lowering (a gather-per-probe while loop) measured ~44 ms per
        round at 2^16 MSM scale."""
        new_counts = (counts + 1) // 2
        new_starts = _excl_cumsum(new_counts)
        ends = starts + counts
        delta = starts - 2 * new_starts
        hist = jnp.bincount(jnp.clip(new_starts, 0, size_out), length=size_out + 1)
        bid = jnp.cumsum(hist[:size_out]).astype(jnp.int32) - 1
        bid = jnp.clip(bid, 0, Gd - 1)
        j = jnp.arange(size_out, dtype=jnp.int32)
        # one stacked table gather for (delta, ends) instead of two
        de = jnp.take(jnp.stack([delta, ends]), bid, axis=1)
        src = jnp.clip(2 * j + de[0], 0, None)
        has_pair = (src + 1) < de[1]
        return src, has_pair, new_counts, new_starts

    def pair_round(P_cur, counts, starts, size_out, src_transform=None):
        """One pair-halving round (tree-of-planes path: projective/Edwards
        adapters): combine adjacent elements per bucket run."""
        src, has_pair, new_counts, new_starts = pair_indices(
            counts, starts, size_out
        )
        if src_transform is None:
            A = group.gather(P_cur, src)
            B = group.gather(P_cur, jnp.where(has_pair, src + 1, src))
        else:
            A = src_transform(src)
            B = src_transform(jnp.where(has_pair, src + 1, src))
        added = group.add(A, B, valid=has_pair)
        P_new = group.select(has_pair, added, A)
        return P_new, new_counts, new_starts

    def pair_round_packed(P_cur, counts, starts, size_out, perm=None):
        """Packed-path pair round: ONE lane gather for both operands (64+
        limb rows move in a single take), signs/pass-through folded into the
        fused add kernels. `perm` on round 0 is the SORTED key array whose
        low bits are (point index << 1 | sign): one small gather recovers
        both, and the points are read through the composed permutation with
        on-the-fly negation (reference reads points via the sorted index
        the same way, msm-batched-affine.ts:456-502)."""
        src, has_pair, new_counts, new_starts = pair_indices(
            counts, starts, size_out
        )
        both = jnp.concatenate([src, jnp.where(has_pair, src + 1, src)])
        if perm is not None:
            perm_flat, nb = perm
            pv = jnp.take(perm_flat, both)
            AB = jnp.take(P_rows, (pv >> 1) & ((1 << nb) - 1), axis=-1)
            sg = (pv & 1)[None]
            sA, sB = sg[:, :size_out], sg[:, size_out:]
        else:
            AB = jnp.take(P_cur, both, axis=-1)
            sA = sB = jnp.zeros((1, size_out), jnp.int32)
        A, B = AB[:, :size_out], AB[:, size_out:]
        hp = has_pair.astype(jnp.int32)[None]
        P_new = group.add_packed(A, B, sA, sB, hp)
        return P_new, new_counts, new_starts

    def super_round_packed(counts, starts, size_out, perm, F: int):
        """F-way merge round (packed path, round 0): gather the F operands
        of log2(F) pair-halving LEVELS in ONE take, then run the levels as
        add_packed stages on CONTIGUOUS halves. Rationale (measured,
        .logs/prim_probe.log): gathers cost ~23-38 ns/column while
        contiguous-half slicing streams at ~0.8 ns/column, so fusing 3
        rounds into one gather removes ~40% of the engine's gathered
        columns at 2^20. Operand blocks are laid out in bit-reversed order
        [t=0,4,2,6,1,5,3,7] so every level's operands are the two
        contiguous halves of the previous stage's output.

        Validity: output slot j covers run elements [src0, src0+F) with
        src0 = F*rank; r = elements remaining = end - src0. Level masks:
        the pair (first t, second t') merges iff r > t' (second operand
        exists in the run); pass-through chains preserve the survivor."""
        Fl = F.bit_length() - 1  # levels (F = 8 -> 3)
        new_counts = (counts + F - 1) // F
        new_starts = _excl_cumsum(new_counts)
        ends = starts + counts
        delta = starts - F * new_starts
        hist = jnp.bincount(jnp.clip(new_starts, 0, size_out),
                            length=size_out + 1)
        bid = jnp.cumsum(hist[:size_out]).astype(jnp.int32) - 1
        bid = jnp.clip(bid, 0, Gd - 1)
        j = jnp.arange(size_out, dtype=jnp.int32)
        de = jnp.take(jnp.stack([delta, ends]), bid, axis=1)
        src0 = F * j + de[0]
        r = de[1] - src0  # elements remaining from this slot's base

        # bit-reversed block order: level-l operand pairs are contiguous
        bitrev = sorted(range(F), key=lambda t: int(f"{t:0{Fl}b}"[::-1], 2))
        both = jnp.concatenate(
            [jnp.clip(src0 + t, 0, None) for t in bitrev]
        )
        perm_flat, nb = perm
        pv = jnp.take(perm_flat, both)
        X = jnp.take(P_rows, (pv >> 1) & ((1 << nb) - 1), axis=-1)
        sg = (pv & 1)[None]
        half = (F // 2) * size_out
        C, sA, sB = X, sg[:, :half], sg[:, half:]
        blocks = bitrev
        s = size_out
        for lvl in range(Fl):
            nblk = len(blocks) // 2
            a_blk, b_blk = blocks[:nblk], blocks[nblk:]
            # pair (a_blk[i], b_blk[i]) merges iff the second element exists
            hp = jnp.concatenate(
                [r > t2 for t2 in b_blk]
            ).astype(jnp.int32)[None]
            w = nblk * s
            A, B = C[:, :w], C[:, w:]
            if lvl > 0:
                sA = sB = jnp.zeros((1, w), jnp.int32)
            C = group.add_packed(A, B, sA, sB, hp)
            # surviving block t of the pair keeps the FIRST operand's id
            blocks = a_blk
        return C, new_counts, new_starts

    def chunk_body(_, digits_chunk):
        # digits_chunk: (KC, N)
        b = jnp.abs(digits_chunk)
        sign = (digits_chunk < 0).astype(jnp.int32)
        idx = jax.lax.broadcasted_iota(jnp.int32, (KC, N), 1)
        # per-window batched row sort (dimension=1): ~30% less comparator
        # work than one flat sort of KC*N keys, and when (c + 1 + log2 N)
        # fits 31 bits everything packs into a SINGLE int32 operand.
        # Bucket-slot layout: window k's buckets at k*(L+1) + loc with
        # loc = |d|-1 in [0, L-1]; zero digits go to the per-window dead
        # slot loc = L (sorted to each window's end).
        loc = jnp.where(b > 0, b - 1, L)
        nb = max((N - 1).bit_length(), 1)
        lb = (L).bit_length()  # loc in [0, L] needs c bits
        import os as _os

        if (lb + 1 + nb <= 31
                and _os.environ.get("MSM_PACKED_SORT", "1") == "1"):
            packed = (loc << (nb + 1)) | (idx << 1) | sign
            (packed_s,) = jax.lax.sort((packed,), dimension=1, num_keys=1)
            perm2d = packed_s & ((1 << (nb + 1)) - 1)  # idx<<1 | sign
            loc_s = packed_s >> (nb + 1)
        else:
            payload = (idx << 1) | sign
            loc_s, perm2d = jax.lax.sort((loc, payload), dimension=1, num_keys=1)
        perm_flat = perm2d.reshape(-1)

        # counts/starts per bucket slot from the SORTED locs via a
        # vectorized binary search: R[b] = first position with loc >= b,
        # counts[b] = R[b+1] - R[b]. Measured on TPU v5e at (12, 2^17):
        # binary search ~5.4 ms vs 16.2 ms for the previous RLE second sort
        # and 22.5 ms for a flat bincount; no key-packing width constraint,
        # so 2^20 takes the same path. Hand-rolled log2(N) gather steps —
        # jnp.searchsorted under vmap inside the window scan hung XLA
        # lowering for >20 min.
        probes = jnp.arange(L + 2, dtype=jnp.int32)[None, :]  # (1, L+2)
        lo_b = jnp.zeros((KC, L + 2), jnp.int32)
        hi_b = jnp.full((KC, L + 2), N, jnp.int32)
        # search space is [0, N] = N+1 candidate positions -> N.bit_length()
        # halving steps
        for _ in range(max(N.bit_length(), 1)):
            mid = (lo_b + hi_b) >> 1
            val = jnp.take_along_axis(loc_s, mid, axis=1)
            ge = val >= probes
            hi_b = jnp.where(ge, mid, hi_b)
            lo_b = jnp.where(ge, lo_b, mid + 1)
        R = hi_b
        starts_w = R[:, : L + 1]
        counts_w = R[:, 1 : L + 2] - starts_w
        woff = jnp.arange(KC, dtype=jnp.int32)[:, None] * N
        starts = (starts_w + woff).reshape(-1)
        counts = counts_w.reshape(-1)
        # dead slots (zero digits, loc == L) are excluded from pairing
        slot_loc = jnp.arange(Gd, dtype=jnp.int32) % (L + 1)
        counts = jnp.where(slot_loc == L, 0, counts)

        size1 = sizes[1] if len(sizes) > 1 else M0
        M_B = sizes[-1] if len(sizes) > 1 else M0
        if use_packed:
            # 8-way first round once the points-per-bucket ratio makes the
            # +G-per-level slot padding negligible; below that the plain
            # pair round 0 wins (threshold measured: 2^20 c=13 accumulate
            # 2.38 s -> 1.82 s, .logs/bench_2pow20_super.log).
            # MSM_SUPER=0 disables (debug bisection knob).
            import os as _os

            F0 = 8 if (M0 >= 64 * G
                       and _os.environ.get("MSM_SUPER", "1") == "1") else 2
            if F0 > 2:
                size_s = M0 // F0 + G + 2
                P_cur, counts, starts = super_round_packed(
                    counts, starts, size_s, (perm_flat, nb), F0
                )
                tail_sizes = _round_sizes(size_s, G)
                for size_out in tail_sizes[1:]:
                    P_cur, counts, starts = pair_round_packed(
                        P_cur, counts, starts, size_out
                    )
                M_B = tail_sizes[-1]
            else:
                P_cur, counts, starts = pair_round_packed(
                    None, counts, starts, size1, perm=(perm_flat, nb)
                )
                for size_out in sizes[2:]:
                    P_cur, counts, starts = pair_round_packed(
                        P_cur, counts, starts, size_out
                    )
            round_fn = pair_round_packed
        else:
            # round 0: reads original points through the sorted index (avoids
            # materializing K*N gathered points; signs applied on the fly)
            def src_from_points(src):
                pv = jnp.take(perm_flat, src)
                pt = group.gather(points, (pv >> 1) & ((1 << nb) - 1))
                return group.neg_where(pt, (pv & 1).astype(bool))

            P_cur, counts, starts = pair_round(
                None, counts, starts, size1, src_transform=src_from_points
            )
            for size_out in sizes[2:]:
                P_cur, counts, starts = pair_round(P_cur, counts, starts, size_out)
            round_fn = pair_round

        # fixed-shape tail rounds until every bucket has <= 1 element
        def cond(state):
            _, counts, _ = state
            return jnp.max(counts) > 1

        def body(state):
            P_cur, counts, starts = state
            return round_fn(P_cur, counts, starts, M_B)

        P_cur, counts, starts = jax.lax.while_loop(
            cond, body, (P_cur, counts, starts)
        )

        # extract buckets: window k, bucket l in [1, L] lives at slot
        # k*(L+1) + (l-1)
        gid = (
            jax.lax.broadcasted_iota(jnp.int32, (KC, L), 0) * (L + 1)
            + jax.lax.broadcasted_iota(jnp.int32, (KC, L), 1)
        ).reshape(-1)
        valid = jnp.take(counts, gid) == 1
        if use_packed:
            Bp = jnp.take(P_cur, jnp.take(starts, gid), axis=-1)
            Bpt = group.buckets_from_packed(Bp, valid)
        else:
            Bpt = group.gather(P_cur, jnp.take(starts, gid))
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


def _suffix_scan(group, P, size: int, batch_shape):
    """Hillis-Steele suffix sums over the trailing axis (static unrolled:
    `size` is small — at most 2^(c/2)). Shifted-in elements are the group
    identity."""
    s = 1
    while s < size:
        def sh(a, d=s):
            pad = jnp.concatenate([a, jnp.zeros_like(a)], axis=-1)
            return jax.lax.dynamic_slice_in_dim(pad, d, size, axis=a.ndim - 1)

        Psh = jax.tree.map(sh, P)
        idx = jax.lax.broadcasted_iota(jnp.int32, (*batch_shape, size), len(batch_shape))
        ident = group.zero_like((*batch_shape, size))
        Psh = group.select(idx + s < size, Psh, ident)
        P = group.add(P, Psh)
        s <<= 1
    return P


def _tree_reduce_axis(group, P, size: int, axis_from_end: int):
    """Log-depth pairwise sum over an axis (counted from the end of the
    batch dims, e.g. 1 = second-to-last). `size` must be a power of two."""
    m = size
    while m > 1:
        h = m // 2

        def lo(a, h=h):
            ax = a.ndim - 1 - axis_from_end
            return jax.lax.slice_in_dim(a, 0, h, axis=ax)

        def hi(a, h=h, m=m):
            ax = a.ndim - 1 - axis_from_end
            return jax.lax.slice_in_dim(a, h, m, axis=ax)

        P = group.add(jax.tree.map(lo, P), jax.tree.map(hi, P))
        m = h
    return P


def reduce_buckets(group, buckets, c: int, K_pad: int, L: int):
    """Phase 3+4 of Pippenger: bucket reduction and Horner window combine.
    buckets: tree with leaves (n, K_pad, L); position j holds bucket l = j+1.
    Split into window_sums + combine_windows so the multi-chip path can
    reduce-scatter windows over devices and all-gather the tiny sums."""
    W = window_sums(group, buckets, K_pad, L)
    W = jax.tree.map(
        lambda a: a.reshape(*a.shape[:-2], a.shape[-2]), W
    )  # leaves (n, K_pad)
    return combine_windows(group, W, c, K_pad)


def window_sums(group, buckets, K_pad: int, L: int):
    """Per-window weighted bucket sum W_k = sum_j (j+1) B_{k,j}.

    Work-efficient two-level reduction (O(L) group adds per window — the
    TPU-shaped equivalent of the reference's triangle+row,
    msm-batched-affine.ts:556-583): write j = u*S + v, then
        sum_j (j+1) B_j = S * sum_u u*R_u + sum_v (v+1)*C_v
    with row sums R_u = sum_v B[u,v] and column sums C_v = sum_u B[u,v],
    both computed by log-depth pairwise trees (2*L adds); the two small
    weighted sums use Hillis-Steele suffix scans at size U and S
    (U*logU + S*logS adds); the factor S is log2(S) doublings."""
    log2L = max(L.bit_length() - 1, 0)
    log2S = log2L // 2
    S = 1 << log2S
    U = L // S

    B4 = jax.tree.map(
        lambda a: a.reshape(*a.shape[:-1], U, S), buckets
    )  # leaves (n, K_pad, U, S)

    # row sums over v -> (n, K_pad, U); column sums over u -> (n, K_pad, S)
    R = _tree_reduce_axis(group, B4, S, axis_from_end=0)
    R = jax.tree.map(lambda a: a.reshape(*a.shape[:-2], U), R)
    Cs = _tree_reduce_axis(group, B4, U, axis_from_end=1)
    Cs = jax.tree.map(lambda a: a.reshape(*a.shape[:-2], S), Cs)

    # sum_u u * R_u  =  sum over suffix sums starting at index 1
    if U > 1:
        Rsuf = _suffix_scan(group, R, U, (K_pad,))
        Rsuf = jax.tree.map(lambda a: jax.lax.slice_in_dim(a, 1, U, axis=a.ndim - 1), Rsuf)
        high = _tree_reduce_axis(group, _pad_pow2(group, Rsuf, U - 1, (K_pad,)),
                                 _next_pow2(U - 1), axis_from_end=0)
        # multiply by S: log2(S) doublings
        for _ in range(log2S):
            high = group.double(high)
    else:
        high = group.zero_like((K_pad, 1))
    # sum_v (v+1) * C_v  =  sum over ALL suffix sums
    Csuf = _suffix_scan(group, Cs, S, (K_pad,))
    low = _tree_reduce_axis(group, Csuf, S, axis_from_end=0)
    return group.add(high, low)  # (n, K_pad, 1)


def combine_windows(group, W, c: int, K_pad: int):
    """Window combine: S = sum_k 2^(ck) W_k, log-depth halves pairing instead
    of the sequential Horner scan (reference msm-batched-affine.ts:322-334
    does K_pad-1 sequential rounds of c doublings + 1 add; at ~O(1) fixed
    cost per device op that is ~3*K_pad dispatches on 1-lane arrays). Here:
    split k = i + (K2/2) j and fold halves, W_i += 2^(c*K2/2) W_{i+K2/2} —
    each level is ONE fused double_n kernel + ONE add at contiguous slices,
    so the whole combine is 2*log2(K2) kernels (lane width is padded to the
    vector tile anyway, so the extra doubling lanes are free).
    W: tree with leaves (n, K_pad)."""
    K2 = _next_pow2(K_pad)
    if K2 != K_pad:
        ident = group.zero_like((K2 - K_pad,))
        W = jax.tree.map(lambda a, z: jnp.concatenate([a, z], axis=-1), W, ident)
    m = K2
    while m > 1:
        h = m // 2

        def lo(a, h=h):
            return jax.lax.slice_in_dim(a, 0, h, axis=a.ndim - 1)

        def hi(a, h=h, m=m):
            return jax.lax.slice_in_dim(a, h, m, axis=a.ndim - 1)

        top = jax.tree.map(hi, W)
        if hasattr(group, "double_n"):
            top = group.double_n(top, c * h)
        else:
            top = jax.lax.fori_loop(
                0, c * h, lambda _, P: group.double(P), top
            )
        W = group.add(jax.tree.map(lo, W), top)
        m = h
    return W
