#!/usr/bin/env python
"""Stage-by-stage timing of the packed bucket_accumulate at LARGE N (handles
the two-array sort regime that 2^20 forces). Jit prefixes of the pipeline and
difference them. Mirrors montgomery_tpu/msm/pippenger.py chunk_body exactly.

Usage: python scripts/profile_acc20.py [log2n] [c] [stages...]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from montgomery_tpu.utils.timing import enable_compilation_cache, sync, timeit

enable_compilation_cache()


def main():
    import jax
    import jax.numpy as jnp

    from montgomery_tpu.concrete import BLS12_377
    from montgomery_tpu.msm import WeierstrassMsm, window_size
    from montgomery_tpu.msm.pippenger import _excl_cumsum, _round_sizes
    from montgomery_tpu.scalar.device import digits_glv_device
    from montgomery_tpu.curves.projective import AffineBatch

    log2n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    N = 1 << log2n
    ctx = WeierstrassMsm(BLS12_377)
    c = int(sys.argv[2]) if len(sys.argv) > 2 else window_size(
        ctx.fops.mp.length_p, log2n
    )
    group = ctx.aff_adapter_unsafe

    z = np.load(f".bench_cache/points_{log2n}_w{ctx.fops.w}.npz")
    pts = AffineBatch(jnp.asarray(z["x"]), jnp.asarray(z["y"]),
                      jnp.asarray(z["inf"]))
    rng = np.random.default_rng(7)
    scalars = [int(s) % BLS12_377.order
               for s in rng.integers(0, 1 << 62, size=N)]
    limbs = jnp.asarray(ctx.scalars_to_limbs(scalars))
    digits = jax.jit(lambda sl: digits_glv_device(ctx.glv_dev, sl, c))(limbs)
    P_rows = jax.jit(group.pack_rows)(
        jax.jit(ctx.expand_points_glv)(pts))
    sync(P_rows); sync(digits)

    K, Nd = digits.shape
    L = 1 << (c - 1)
    Gd = K * (L + 1)
    M0 = K * Nd
    sizes = _round_sizes(M0, K * L)
    nb = max((Nd - 1).bit_length(), 1)
    lb = L.bit_length()
    packed_keys = lb + 1 + nb <= 31
    print(f"N=2^{log2n} c={c} K={K} M0={M0} packed_keys={packed_keys} "
          f"sizes={sizes}", flush=True)

    def pair_indices(counts, starts, size_out):
        new_counts = (counts + 1) // 2
        new_starts = _excl_cumsum(new_counts)
        ends = starts + counts
        delta = starts - 2 * new_starts
        hist = jnp.bincount(jnp.clip(new_starts, 0, size_out),
                            length=size_out + 1)
        bid = jnp.cumsum(hist[:size_out]).astype(jnp.int32) - 1
        bid = jnp.clip(bid, 0, Gd - 1)
        j = jnp.arange(size_out, dtype=jnp.int32)
        de = jnp.take(jnp.stack([delta, ends]), bid, axis=1)
        src = jnp.clip(2 * j + de[0], 0, None)
        has_pair = (src + 1) < de[1]
        return src, has_pair, new_counts, new_starts

    def pair_round(P_cur, counts, starts, size_out, perm=None):
        src, has_pair, new_counts, new_starts = pair_indices(
            counts, starts, size_out
        )
        both = jnp.concatenate([src, jnp.where(has_pair, src + 1, src)])
        if perm is not None:
            perm_flat = perm
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

    def stage(n_rounds, tail=False, extract=False, counts_too=True):
        def run(digits):
            b = jnp.abs(digits)
            sign = (digits < 0).astype(jnp.int32)
            idx = jax.lax.broadcasted_iota(jnp.int32, (K, Nd), 1)
            loc = jnp.where(b > 0, b - 1, L)
            if packed_keys:
                packed = (loc << (nb + 1)) | (idx << 1) | sign
                (packed_s,) = jax.lax.sort((packed,), dimension=1, num_keys=1)
                perm2d = packed_s & ((1 << (nb + 1)) - 1)
                loc_s = packed_s >> (nb + 1)
            else:
                payload = (idx << 1) | sign
                loc_s, perm2d = jax.lax.sort((loc, payload), dimension=1,
                                             num_keys=1)
            perm_flat = perm2d.reshape(-1)
            if not counts_too:
                return loc_s, perm_flat

            probes = jnp.arange(L + 2, dtype=jnp.int32)[None, :]
            lo_b = jnp.zeros((K, L + 2), jnp.int32)
            hi_b = jnp.full((K, L + 2), Nd, jnp.int32)
            for _ in range(max(Nd.bit_length(), 1)):
                mid = (lo_b + hi_b) >> 1
                val = jnp.take_along_axis(loc_s, mid, axis=1)
                ge = val >= probes
                hi_b = jnp.where(ge, mid, hi_b)
                lo_b = jnp.where(ge, lo_b, mid + 1)
            R = hi_b
            starts_w = R[:, : L + 1]
            counts_w = R[:, 1 : L + 2] - starts_w
            woff = jnp.arange(K, dtype=jnp.int32)[:, None] * Nd
            starts = (starts_w + woff).reshape(-1)
            counts = counts_w.reshape(-1)
            slot_loc = jnp.arange(Gd, dtype=jnp.int32) % (L + 1)
            counts = jnp.where(slot_loc == L, 0, counts)
            if n_rounds == 0:
                return perm_flat, counts
            size1 = sizes[1] if len(sizes) > 1 else M0
            P_cur, counts, starts = pair_round(
                None, counts, starts, size1, perm=perm_flat,
            )
            for size_out in sizes[2 : n_rounds + 1]:
                P_cur, counts, starts = pair_round(P_cur, counts, starts,
                                                   size_out)
            if tail:
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
            if extract:
                gid = (
                    jax.lax.broadcasted_iota(jnp.int32, (K, L), 0) * (L + 1)
                    + jax.lax.broadcasted_iota(jnp.int32, (K, L), 1)
                ).reshape(-1)
                Bp = jnp.take(P_cur, jnp.take(starts, gid), axis=-1)
                valid = jnp.take(counts, gid) == 1
                return Bp, valid
            return P_cur

        return jax.jit(run)

    which = sys.argv[3:] or ["sort", "counts", "r0", "r1", "rall", "tail",
                             "extract"]
    stages = []
    if "sort" in which:
        stages.append(("sort only", stage(0, counts_too=False)))
    if "counts" in which:
        stages.append(("sort+counts", stage(0)))
    if "r0" in which:
        stages.append(("round0", stage(1)))
    if "r1" in which and len(sizes) > 2:
        stages.append(("round1", stage(2)))
    if "rall" in which:
        stages.append((f"rounds..{len(sizes)-1}", stage(len(sizes) - 1)))
    if "tail" in which:
        stages.append(("while tail", stage(len(sizes) - 1, tail=True)))
    if "extract" in which:
        stages.append(("extract", stage(len(sizes) - 1, tail=True,
                                        extract=True)))

    prev = 0.0
    for name, fn in stages:
        t0 = time.time()
        sync(fn(digits))
        tc = time.time() - t0
        t = timeit(fn, digits, reps=3, warmup=1, inner=2)
        print(f"{name:20s} cum {t*1e3:8.1f} ms   delta {(t-prev)*1e3:8.1f} ms"
              f"   (compile {tc:.0f}s)", flush=True)
        prev = t


if __name__ == "__main__":
    main()
