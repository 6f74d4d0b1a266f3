#!/usr/bin/env python
"""Stage-by-stage timing of bucket_accumulate: jit prefixes of the pipeline
(sort, round 0, round 1, ..., while tail, extraction) and difference them.

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
    from montgomery_tpu.msm.pippenger import (
        _excl_cumsum, _round_sizes, window_size,
    )
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

    K, Nd = digits.shape
    L = 1 << (c - 1)
    G = K * (L + 1)
    Gd = G + 1
    M0 = K * Nd
    sizes = _round_sizes(M0, G)
    print(f"N=2^{log2n} c={c} K={K} M0={M0} G={G} sizes={sizes}", flush=True)

    def pair_round(P_cur, counts, starts, size_out, src_transform=None):
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
        added = group.add(A, B, valid=has_pair)
        P_new = group.select(has_pair, added, A)
        return P_new, new_counts, new_starts

    def stage(n_rounds, tail=False, extract=False):
        def run(points, digits):
            b = jnp.abs(digits)
            sign = (digits < 0).astype(jnp.int32)
            win = jax.lax.broadcasted_iota(jnp.int32, (K, Nd), 0)
            key = jnp.where(b > 0, win * (L + 1) + b, G).reshape(-1)
            idx = jax.lax.broadcasted_iota(jnp.int32, (K, Nd), 1).reshape(-1)
            payload = (idx << 1) | sign.reshape(-1)
            key_s, payload_s = jax.lax.sort((key, payload), num_keys=1)
            idx_s, sign_s = payload_s >> 1, payload_s & 1
            counts = jnp.bincount(key, length=Gd).astype(jnp.int32)
            counts = counts.at[G].set(0)
            starts = _excl_cumsum(counts)
            if n_rounds == 0:
                return key_s, payload_s, counts

            def src_from_points(src):
                pt = group.gather(points, jnp.take(idx_s, src))
                return group.neg_where(pt, jnp.take(sign_s, src).astype(bool))

            P_cur, counts, starts = pair_round(
                None, counts, starts, sizes[1] if len(sizes) > 1 else M0,
                src_transform=src_from_points,
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
                    + 1
                ).reshape(-1)
                Bpt = group.gather(P_cur, jnp.take(starts, gid))
                valid = jnp.take(counts, gid) == 1
                Bpt = group.select(valid, Bpt, group.zero_like((K * L,)))
                return Bpt
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
        sync(fn(points, digits))
        tc = time.time() - t0
        t = timeit(fn, points, digits, reps=3, warmup=1)
        print(f"{name:20s} cum {t*1e3:8.1f} ms   delta {(t-prev)*1e3:8.1f} ms"
              f"   (compile {tc:.0f}s)", flush=True)
        prev = t


if __name__ == "__main__":
    main()
