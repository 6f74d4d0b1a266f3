#!/usr/bin/env python
"""Twisted-Edwards MSM benchmark (ed-on-bls12-377) — the reference's flagship
ZPrize'23 engine (80 ms @ 2^16, 322 ms @ 2^18 on its laptop/16-thread bars,
doc/zprize23.md:25,110-115).

Protocol mirrors bench.py: cached device-generated points, N=16 oracle spot
check, warmup + median-of-10 steady state, one JSON line.

Usage: MSM_LOG2N=16 python scripts/bench_te.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from montgomery_tpu.utils.timing import enable_compilation_cache, sync, timeit

enable_compilation_cache()


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from montgomery_tpu.bigint import TwistedEdwardsCurve, msm as oracle_msm
    from montgomery_tpu.concrete import ED_ON_BLS12_377
    from montgomery_tpu.curves.edwards import EdwardsBatch
    from montgomery_tpu.curves.random import random_points_fast_edwards
    from montgomery_tpu.msm import EdwardsMsm, window_size

    log("devices:", jax.devices())
    log2n = int(os.environ.get("MSM_LOG2N", "16"))
    N = 1 << log2n
    ctx = EdwardsMsm(ED_ON_BLS12_377)
    c = int(os.environ.get("MSM_C", "0")) or window_size(
        ctx.fops.mp.length_p, log2n
    )
    from montgomery_tpu.scalar.slicing import num_windows

    K = num_windows(ctx.scalar_bits, c)
    log(f"config: TE N=2^{log2n}, c={c}, K={K} (no GLV), w={ctx.fops.w}")

    t0 = time.time()
    cache = f".bench_cache/ed_points_{log2n}_w{ctx.fops.w}.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        P = EdwardsBatch(*(jnp.asarray(z[k]) for k in ("X", "Y", "Z", "T")))
        log("points loaded from cache in %.1fs" % (time.time() - t0))
    else:
        P = random_points_fast_edwards(ctx.ed, N, seed=42)
        sync(P)
        os.makedirs(".bench_cache", exist_ok=True)
        np.savez(cache, X=np.asarray(P.X), Y=np.asarray(P.Y),
                 Z=np.asarray(P.Z), T=np.asarray(P.T))
        log("points generated in %.1fs" % (time.time() - t0))

    rng = np.random.default_rng(7)
    raw = rng.integers(0, 256, size=N * 32, dtype=np.uint8).tobytes()
    scalars = [
        int.from_bytes(raw[32 * i : 32 * (i + 1)], "little")
        % ED_ON_BLS12_377.order
        for i in range(N)
    ]
    limbs = jnp.asarray(ctx.scalars_to_limbs(scalars))

    # spot check at N=16
    E = TwistedEdwardsCurve(ED_ON_BLS12_377)
    n_chk = 16
    chk = ctx.ed.to_host(jax.tree.map(lambda a: a[..., :n_chk], P))
    fn_chk = jax.jit(lambda p, sl: ctx.msm_device_full(p, sl, c))
    got = ctx.ed.to_host(
        fn_chk(jax.tree.map(lambda a: a[..., :n_chk], P), limbs[:, :n_chk])
    )[0]
    exp = oracle_msm(E, scalars[:n_chk], chk)
    assert E.equal(got, exp), "TE MSM != oracle at N=16"
    log("correctness spot check passed (N=16 vs oracle)")

    fn = jax.jit(lambda p, sl: ctx.msm_device_full(p, sl, c))
    t0 = time.time()
    out = fn(P, limbs)
    sync(out)
    log("msm compile+first run %.1fs" % (time.time() - t0))

    inner = 16 if log2n <= 17 else (4 if log2n <= 18 else 1)
    for _ in range(3):
        sync(fn(P, limbs))
    times = []
    for _ in range(10):
        t0 = time.time()
        out = None
        for _ in range(inner):
            out = fn(P, limbs)
        sync(out)
        times.append((time.time() - t0) / inner)
    med = float(np.median(times))
    log("msm: median %.4fs  std %.4fs  (inner=%d)" % (
        med, float(np.std(times)), inner))

    baseline = {16: 0.080, 17: 0.160, 18: 0.322}.get(log2n,
                                                     0.080 * (N / (1 << 16)))
    result = {
        "metric": f"ed-on-bls12-377_msm_2^{log2n}_ops_per_s",
        "value": round(1.0 / med, 4),
        "unit": "msm/s",
        "vs_baseline": round(baseline / med, 4),
        "extras": {"msm_median_s": round(med, 4), "c": c, "K": K,
                   "w": ctx.fops.w},
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
