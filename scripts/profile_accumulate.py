#!/usr/bin/env python
"""Stage-by-stage timing of the PACKED bucket_accumulate: jit prefixes of the
pipeline (sort, round 0, round 1, ..., while tail, extraction) and difference
them. Mirrors the engine in montgomery_tpu/msm/pippenger.py (packed path).

Usage: python scripts/profile_accumulate.py [log2n] [c]
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

    log2n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    N = 1 << log2n
    ctx = WeierstrassMsm(BLS12_377)
    c = int(sys.argv[2]) if len(sys.argv) > 2 else window_size(
        ctx.fops.mp.length_p, log2n
    )
    group = ctx.aff_adapter_unsafe

    z = np.load(f".bench_cache/points_{log2n}.npz")
    pts = AffineBatch(jnp.asarray(z["x"]), jnp.asarray(z["y"]),
                      jnp.asarray(z["inf"]))
    rng = np.random.default_rng(7)
    scalars = [int(s) % BLS12_377.order
               for s in rng.integers(0, 1 << 62, size=N)]
    limbs = jnp.asarray(ctx.scalars_to_limbs(scalars))
    digits = jax.jit(lambda sl: digits_glv_device(ctx.glv_dev, sl, c))(limbs)
    points = jax.jit(ctx.expand_points_glv)(pts)
    P_rows = jax.jit(group.pack_rows)(points)

    K, Nd = digits.shape
    L = 1 << (c - 1)
    Gd = K * (L + 1)
    M0 = K * Nd
    sizes = _round_sizes(M0, Gd - K)
    print(f"N=2^{log2n} c={c} K={K} M0={M0} sizes={sizes}", flush=True)

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

    def pair_round(P_cur, counts, starts, size_out, perm=None, prows=None):
        src, has_pair, new_counts, new_starts = pair_indices(
            counts, starts, size_out
        )
        both = jnp.concatenate([src, jnp.where(has_pair, src + 1, src)])
        if perm is not None:
            idx_s, sign_s = perm
            AB = jnp.take(prows, jnp.take(idx_s, both), axis=-1)
            sg = jnp.take(sign_s, both)[None]
            sA, sB = sg[:, :size_out], sg[:, size_out:]
        else:
            AB = jnp.take(P_cur, both, axis=-1)
            sA = sB = jnp.zeros((1, size_out), jnp.int32)
        A, B = AB[:, :size_out], AB[:, size_out:]
        hp = has_pair.astype(jnp.int32)[None]
        P_new = group.add_packed(A, B, sA, sB, hp)
        return P_new, new_counts, new_starts

    def stage(n_rounds, tail=False, extract=False):
        def run(prows, digits):
            b = jnp.abs(digits)
            sign = (digits < 0).astype(jnp.int32)
            idx = jax.lax.broadcasted_iota(jnp.int32, (K, Nd), 1)
            loc = jnp.where(b > 0, b - 1, L)
            nb = max((Nd - 1).bit_length(), 1)
            lb = L.bit_length()
            assert lb + 1 + nb <= 31
            packed = (loc << (nb + 1)) | (sign << nb) | idx
            (packed_s,) = jax.lax.sort((packed,), dimension=1, num_keys=1)
            idx_s = (packed_s & ((1 << nb) - 1)).reshape(-1)
            sign_s = ((packed_s >> nb) & 1).reshape(-1)
            win = jax.lax.broadcasted_iota(jnp.int32, (K, Nd), 0)
            g = win * (L + 1) + loc
            counts_full = jnp.bincount(g.reshape(-1), length=Gd).astype(jnp.int32)
            starts = _excl_cumsum(counts_full)
            slot_loc = jnp.arange(Gd, dtype=jnp.int32) % (L + 1)
            counts = jnp.where(slot_loc == L, 0, counts_full)
            if n_rounds == 0:
                return idx_s, sign_s, counts
            P_cur, counts, starts = pair_round(
                None, counts, starts, sizes[1] if len(sizes) > 1 else M0,
                perm=(idx_s, sign_s), prows=prows,
            )
            for size_out in sizes[2 : n_rounds + 1]:
                P_cur, counts, starts = pair_round(P_cur, counts, starts, size_out)
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

    prev = 0.0
    stages = [("sort+counts", stage(0))]
    for r in range(1, len(sizes)):
        stages.append((f"round{r-1} ->{sizes[r]}", stage(r)))
    stages.append(("while tail", stage(len(sizes) - 1, tail=True)))
    stages.append(("extract", stage(len(sizes) - 1, tail=True, extract=True)))

    for name, fn in stages:
        t0 = time.time()
        sync(fn(P_rows, digits))
        tc = time.time() - t0
        t = timeit(fn, P_rows, digits, reps=3, warmup=1, inner=4)
        print(f"{name:20s} cum {t*1e3:8.1f} ms   delta {(t-prev)*1e3:8.1f} ms"
              f"   (compile {tc:.0f}s)", flush=True)
        prev = t


if __name__ == "__main__":
    main()
