#!/usr/bin/env python
"""Micro-profile of pair-round-0 internals at 2^20 MSM shapes: bookkeeping,
gathers (lane-axis vs transposed layout), fused add kernels, batch-inv tree.

Usage: python scripts/profile_round0.py [log2n] [c]
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
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 13
    group = ctx.aff_adapter_unsafe
    f = ctx.fops

    z = np.load(f".bench_cache/points_{log2n}_w{f.w}.npz")
    pts = AffineBatch(jnp.asarray(z["x"]), jnp.asarray(z["y"]),
                      jnp.asarray(z["inf"]))
    rng = np.random.default_rng(7)
    scalars = [int(s) % BLS12_377.order
               for s in rng.integers(0, 1 << 62, size=N)]
    limbs = jnp.asarray(ctx.scalars_to_limbs(scalars))
    digits = jax.jit(lambda sl: digits_glv_device(ctx.glv_dev, sl, c))(limbs)
    P_rows = jax.jit(group.pack_rows)(jax.jit(ctx.expand_points_glv)(pts))
    sync(P_rows); sync(digits)

    K, Nd = digits.shape
    L = 1 << (c - 1)
    Gd = K * (L + 1)
    M0 = K * Nd
    sizes = _round_sizes(M0, K * L)
    size1 = sizes[1]
    nb = max((Nd - 1).bit_length(), 1)
    R = P_rows.shape[0]
    print(f"N=2^{log2n} c={c} K={K} M0={M0} size1={size1} rows={R}",
          flush=True)

    # --- fixed inputs for the stages: run sort+counts once, materialize ---
    def sortcounts(digits):
        b = jnp.abs(digits)
        sign = (digits < 0).astype(jnp.int32)
        idx = jax.lax.broadcasted_iota(jnp.int32, (K, Nd), 1)
        loc = jnp.where(b > 0, b - 1, L)
        payload = (idx << 1) | sign
        loc_s, perm2d = jax.lax.sort((loc, payload), dimension=1, num_keys=1)
        perm_flat = perm2d.reshape(-1)
        probes = jnp.arange(L + 2, dtype=jnp.int32)[None, :]
        lo_b = jnp.zeros((K, L + 2), jnp.int32)
        hi_b = jnp.full((K, L + 2), Nd, jnp.int32)
        for _ in range(max(Nd.bit_length(), 1)):
            mid = (lo_b + hi_b) >> 1
            val = jnp.take_along_axis(loc_s, mid, axis=1)
            ge = val >= probes
            hi_b = jnp.where(ge, mid, hi_b)
            lo_b = jnp.where(ge, lo_b, mid + 1)
        Rb = hi_b
        starts_w = Rb[:, : L + 1]
        counts_w = Rb[:, 1 : L + 2] - starts_w
        woff = jnp.arange(K, dtype=jnp.int32)[:, None] * Nd
        starts = (starts_w + woff).reshape(-1)
        counts = counts_w.reshape(-1)
        slot_loc = jnp.arange(Gd, dtype=jnp.int32) % (L + 1)
        counts = jnp.where(slot_loc == L, 0, counts)
        return perm_flat, counts, starts

    perm_flat, counts, starts = jax.jit(sortcounts)(digits)
    sync((perm_flat, counts, starts))

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

    # stage fns -----------------------------------------------------------
    def s_bookkeeping(counts, starts):
        src, has_pair, nc, ns = pair_indices(counts, starts, size1)
        return src, has_pair

    def s_pv(perm_flat, counts, starts):
        src, has_pair, _, _ = pair_indices(counts, starts, size1)
        both = jnp.concatenate([src, jnp.where(has_pair, src + 1, src)])
        pv = jnp.take(perm_flat, both)
        return pv

    def s_gather(P_rows, perm_flat, counts, starts):
        pv = s_pv(perm_flat, counts, starts)
        AB = jnp.take(P_rows, (pv >> 1) & ((1 << nb) - 1), axis=-1)
        return AB

    def s_gather_T(P_rows_T, perm_flat, counts, starts):
        pv = s_pv(perm_flat, counts, starts)
        AB = jnp.take(P_rows_T, (pv >> 1) & ((1 << nb) - 1), axis=0)
        return AB

    def s_full(P_rows, perm_flat, counts, starts):
        src, has_pair, nc, ns = pair_indices(counts, starts, size1)
        both = jnp.concatenate([src, jnp.where(has_pair, src + 1, src)])
        pv = jnp.take(perm_flat, both)
        AB = jnp.take(P_rows, (pv >> 1) & ((1 << nb) - 1), axis=-1)
        sg = (pv & 1)[None]
        sA, sB = sg[:, :size1], sg[:, size1:]
        A, B = AB[:, :size1], AB[:, size1:]
        hp = has_pair.astype(jnp.int32)[None]
        return group.add_packed(A, B, sA, sB, hp)

    # add_packed on PREMATERIALIZED operands (isolates kernels+inv)
    def s_add(AB, hp_i, sg):
        A, B = AB[:, :size1], AB[:, size1:]
        sA, sB = sg[:, :size1], sg[:, size1:]
        return group.add_packed(A, B, sA, sB, hp_i)

    # batch_inv alone at size1 lanes
    def s_inv(x):
        return f.batch_inv(x)

    P_rows_T = jnp.asarray(np.ascontiguousarray(np.asarray(P_rows).T))
    X1 = jnp.asarray(rng.integers(0, 1 << f.w, size=(f.n, size1),
                                  dtype=np.int32))

    stages = [
        ("bookkeeping", jax.jit(s_bookkeeping), (counts, starts)),
        ("bk+perm-compose", jax.jit(s_pv), (perm_flat, counts, starts)),
        ("bk+gather (31,M)", jax.jit(s_gather), (P_rows, perm_flat, counts, starts)),
        ("bk+gather (M,31)T", jax.jit(s_gather_T), (P_rows_T, perm_flat, counts, starts)),
        ("batch_inv @size1", jax.jit(s_inv), (X1,)),
        ("round0 full", jax.jit(s_full), (P_rows, perm_flat, counts, starts)),
    ]
    for name, fn, args in stages:
        t0 = time.time()
        sync(fn(*args))
        tc = time.time() - t0
        t = timeit(fn, *args, reps=3, warmup=1, inner=2)
        print(f"{name:22s} {t*1e3:8.1f} ms   (compile {tc:.0f}s)", flush=True)

    # add kernels alone on materialized AB
    AB = jax.jit(s_gather)(P_rows, perm_flat, counts, starts)
    pv = jax.jit(s_pv)(perm_flat, counts, starts)
    sg = (pv & 1)[None]
    src, has_pair, _, _ = jax.jit(
        lambda c_, s_: pair_indices(c_, s_, size1)[:2] + ((), ())[:0] or
        pair_indices(c_, s_, size1)
    )(counts, starts)[:4] if False else (None, None, None, None)
    hp = jax.jit(lambda c_, s_: pair_indices(c_, s_, size1)[1].astype(
        jnp.int32)[None])(counts, starts)
    sync((AB, sg, hp))
    fn = jax.jit(s_add)
    t0 = time.time()
    sync(fn(AB, hp, sg))
    tc = time.time() - t0
    t = timeit(fn, AB, hp, sg, reps=3, warmup=1, inner=2)
    print(f"{'add_packed @size1':22s} {t*1e3:8.1f} ms   (compile {tc:.0f}s)",
          flush=True)


if __name__ == "__main__":
    main()
