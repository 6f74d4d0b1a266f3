#!/usr/bin/env python
"""Benchmark driver: BLS12-377 MSM + Montgomery-mul throughput on one chip.

Protocol mirrors the reference's benchmark scripts
(scripts/msm-weierstrass.ts:28-48): warmup runs, then timed runs, median.
Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

vs_baseline compares against the reference's published BLS12-377 2^16 MSM
time of 122 ms (8 threads, node — doc/zprize23.md:118-123), scaled by
(N / 2^16) when run at other sizes.

Env knobs: MSM_LOG2N (default 16), MSM_C (default: window table).
"""

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    log("devices:", jax.devices())

    from montgomery_tpu.bigint import WeierstrassCurve, msm as oracle_msm
    from montgomery_tpu.concrete import BLS12_377
    from montgomery_tpu.curves.random import random_points_fast
    from montgomery_tpu.msm import WeierstrassMsm, msm_digits, window_size
    from montgomery_tpu.scalar.slicing import num_windows

    log2n = int(os.environ.get("MSM_LOG2N", "16"))
    N = 1 << log2n
    ctx = WeierstrassMsm(BLS12_377)
    c = int(os.environ.get("MSM_C", "0")) or window_size(
        ctx.fops.mp.length_p, log2n
    )
    K = num_windows(ctx.scalar_bits, c)
    log(f"config: N=2^{log2n}, c={c}, K={K}, n_limbs={ctx.fops.n}, w={ctx.fops.w}")

    # ---- inputs (device-generated points; random digits) ----
    t0 = time.time()
    pts = random_points_fast(ctx.proj, N, seed=42)
    P = ctx.adapter.from_points(pts)
    jax.block_until_ready(P)
    log("points generated in %.1fs" % (time.time() - t0))

    rng = np.random.default_rng(7)
    half = 1 << (c - 1)
    digits = rng.integers(-half, half + 1, size=(K, N), dtype=np.int32)
    digits = jnp.asarray(digits)

    # ---- correctness spot check at small N (reference msm-weierstrass.ts:97-107)
    C = WeierstrassCurve(BLS12_377)
    n_chk = 16
    d_chk = np.asarray(digits[:, :n_chk])
    chk_pts = ctx.proj.affine_to_host(jax.tree.map(lambda a: a[..., :n_chk], pts))
    sc_chk = [
        sum(int(d_chk[k, j]) << (k * c) for k in range(K)) % BLS12_377.order
        for j in range(n_chk)
    ]
    fn_chk = jax.jit(lambda p, d: msm_digits(ctx.adapter, p, d, c))
    got = ctx.proj.to_host(
        fn_chk(
            jax.tree.map(lambda a: a[..., :n_chk], P), jnp.asarray(d_chk)
        )
    )[0]
    exp = oracle_msm(C, sc_chk, chk_pts)
    assert C.equal(got, exp), "bench MSM does not match oracle at N=16"
    log("correctness spot check passed (N=16 vs oracle)")

    # ---- MSM timing ----
    fn = jax.jit(lambda p, d: msm_digits(ctx.adapter, p, d, c))
    t0 = time.time()
    out = fn(P, digits)
    jax.block_until_ready(out)
    log("msm compile+first run %.1fs" % (time.time() - t0))

    for _ in range(3):
        jax.block_until_ready(fn(P, digits))
    times = []
    for _ in range(10):
        t0 = time.time()
        jax.block_until_ready(fn(P, digits))
        times.append(time.time() - t0)
    med = float(np.median(times))
    std = float(np.std(times))
    log("msm: median %.4fs  std %.4fs  (%s)" % (med, std, ["%.4f" % t for t in times]))

    # ---- Montgomery mul throughput ----
    f = ctx.fops
    Nm = 1 << 18
    R_CHAIN = 30
    X = jnp.asarray(
        np.random.default_rng(1).integers(0, 1 << f.w, size=(f.n, Nm), dtype=np.int32)
    )

    @jax.jit
    def chain(x):
        y = x
        for _ in range(R_CHAIN):
            y = f.mul(y, x)
        return y

    jax.block_until_ready(chain(X))
    tms = []
    for _ in range(5):
        t0 = time.time()
        jax.block_until_ready(chain(X))
        tms.append(time.time() - t0)
    tmul = float(np.median(tms))
    muls_per_sec = R_CHAIN * Nm / tmul
    log("montgomery mul: %.1f M muls/s (chain of %d over N=%d, %.4fs)" % (
        muls_per_sec / 1e6, R_CHAIN, Nm, tmul))

    # reference baseline: 122 ms for 2^16 MSM (doc/zprize23.md:118-123),
    # scaled linearly in N for other sizes
    baseline_time = 0.122 * (N / (1 << 16))
    result = {
        "metric": f"bls12-377_msm_2^{log2n}_ops_per_s",
        "value": round(1.0 / med, 4),
        "unit": "msm/s",
        "vs_baseline": round(baseline_time / med, 4),
        "extras": {
            "msm_median_s": round(med, 4),
            "msm_std_s": round(std, 4),
            "mont_muls_per_sec": round(muls_per_sec, 0),
            "c": c,
            "K": K,
            "w": f.w,
            "n_limbs": f.n,
        },
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
