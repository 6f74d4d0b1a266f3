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

from montgomery_tpu.utils.timing import sync, timeit as timeit_sync
from montgomery_tpu.utils.timing import enable_compilation_cache

enable_compilation_cache()


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

    # default 2^20: BASELINE.json's primary metric is BLS12-377 MSM ops/s at
    # 2^20 points (MSM_LOG2N=16 for the 122 ms-bar configuration)
    log2n = int(os.environ.get("MSM_LOG2N", "20"))
    N = 1 << log2n
    w_env = int(os.environ.get("MSM_W", "0"))
    ctx = WeierstrassMsm(BLS12_377, w=w_env) if w_env else WeierstrassMsm(BLS12_377)
    c = int(os.environ.get("MSM_C", "0")) or window_size(
        ctx.fops.mp.length_p, log2n
    )
    K = num_windows(ctx.glv_dev.max_bits_eff, c)  # GLV-halved windows
    log(f"config: N=2^{log2n}, c={c}, K={K} (glv), n_limbs={ctx.fops.n}, w={ctx.fops.w}")

    # ---- inputs (device-generated points, disk-cached across runs) ----
    from montgomery_tpu.curves.projective import AffineBatch

    t0 = time.time()
    # cache holds Montgomery-form limb planes -> keyed by limb size w
    cache = f".bench_cache/points_{log2n}_w{ctx.fops.w}.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        pts = AffineBatch(jnp.asarray(z["x"]), jnp.asarray(z["y"]),
                          jnp.asarray(z["inf"]))
        log("points loaded from cache in %.1fs" % (time.time() - t0))
    else:
        pts = random_points_fast(ctx.proj, N, seed=42)
        sync(pts)
        os.makedirs(".bench_cache", exist_ok=True)
        np.savez(cache, x=np.asarray(pts.x), y=np.asarray(pts.y),
                 inf=np.asarray(pts.inf))
        log("points generated in %.1fs" % (time.time() - t0))
    P = pts  # AffineBatch — msm_device_full expands GLV variants itself

    # random order-sized scalars; device pipeline consumes limb planes
    rng = np.random.default_rng(7)
    raw = rng.integers(0, 256, size=N * 32, dtype=np.uint8).tobytes()
    scalars = [
        int.from_bytes(raw[32 * i : 32 * (i + 1)], "little") % BLS12_377.order
        for i in range(N)
    ]
    limbs = jnp.asarray(ctx.scalars_to_limbs(scalars))
    affine = os.environ.get("MSM_AFFINE", "1") == "1"
    unsafe = os.environ.get("MSM_UNSAFE", "1") == "1"

    # ---- correctness spot check at small N (reference msm-weierstrass.ts:97-107)
    C = WeierstrassCurve(BLS12_377)
    n_chk = 16
    chk_pts = ctx.proj.affine_to_host(jax.tree.map(lambda a: a[..., :n_chk], pts))
    fn_chk = jax.jit(
        lambda p, sl: ctx.msm_device_full(p, sl, c, affine=affine, unsafe=unsafe)
    )
    got = ctx.proj.to_host(
        fn_chk(jax.tree.map(lambda a: a[..., :n_chk], P), limbs[:, :n_chk])
    )[0]
    exp = oracle_msm(C, scalars[:n_chk], chk_pts)
    assert C.equal(got, exp), "bench MSM does not match oracle at N=16"
    log("correctness spot check passed (N=16 vs oracle)")

    # ---- MSM timing (end-to-end: GLV decompose + slicing + MSM on device) ----
    fn = jax.jit(lambda p, sl: ctx.msm_device_full(p, sl, c, affine=affine,
                                                    unsafe=unsafe))
    t0 = time.time()
    out = fn(P, limbs)
    sync(out)
    log("msm compile+first run %.1fs" % (time.time() - t0))

    # Steady-state throughput: `inner` back-to-back async dispatches per rep,
    # one sync (the sync fetch costs a full ~27 ms tunnel round trip — a
    # harness artifact, not device work; residual bias ~27/inner ms is still
    # INCLUDED in the reported time). One-shot latency (single dispatch +
    # sync) is reported alongside for transparency.
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
    std = float(np.std(times))
    lat = []
    for _ in range(5):
        t0 = time.time()
        sync(fn(P, limbs))
        lat.append(time.time() - t0)
    log("msm: median %.4fs  std %.4fs  (inner=%d; %s)" % (
        med, std, inner, ["%.4f" % t for t in times]))
    log("msm one-shot latency (incl. %.0fms-RTT sync): median %.4fs" % (
        27.0, float(np.median(lat))))

    # ---- FULL-size validation (round-4 verdict item #3): the timed result
    # must prove itself at full N, not just the N=16 slice. The expected
    # affine answer is cached on disk (inputs are deterministic: cached
    # points + seed-7 scalars); on first run it is cross-checked by the
    # OTHER engine (projective-safe vs packed-affine — independent past the
    # digit pipeline). Reference checks results against bigint MSM after
    # timing (scripts/msm-weierstrass.ts:97-107).
    if os.environ.get("MSM_VALIDATE", "1") == "1":
        got = ctx.proj.to_host(out)[0]
        expfile = f".bench_cache/expected_{log2n}.json"
        if os.path.exists(expfile):
            with open(expfile) as fh:
                e = json.load(fh)
            exp_pt = (int(e["x"], 16), int(e["y"], 16))
            ok = (not got.is_zero) and (got.x, got.y) == exp_pt
            if not ok:
                log("FULL-N VALIDATION FAILED vs cached expected result")
                sys.exit(1)
            log(f"full-N validation passed (cached expected, N=2^{log2n})")
        else:
            t0 = time.time()
            # window_chunk keeps the (unpacked projective) check engine's
            # working set inside HBM at large N (full-K at 2^20 OOMed 16G)
            wc2 = 2 if log2n >= 18 else None
            fn2 = jax.jit(
                lambda p, sl: ctx.msm_device_full(p, sl, c, affine=not affine,
                                                  unsafe=False,
                                                  window_chunk=wc2)
            )
            got2 = ctx.proj.to_host(fn2(P, limbs))[0]
            if not C.equal(got, got2):
                log("FULL-N VALIDATION FAILED: engines disagree "
                    f"(affine-{'unsafe' if unsafe else 'safe'} vs "
                    "projective-safe)")
                sys.exit(1)
            with open(expfile, "w") as fh:
                json.dump({"x": "%x" % got.x, "y": "%x" % got.y}, fh)
            log("full-N validation passed (cross-engine, %.0fs) and cached"
                % (time.time() - t0))

    # ---- phase split + memory watermark (reference deferred logs,
    #      msm-common.ts:176-214; watermark memory-helpers.ts:266-276) ----
    from montgomery_tpu.utils.memory import print_max_size_used

    print_max_size_used(log=log)
    if os.environ.get("MSM_PHASES", "1") == "1":
        _, phases = ctx.msm_phases(P, limbs, c, affine=affine, unsafe=unsafe)
        log("--- phase split ---\n" + phases.report())

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

    tmul = timeit_sync(chain, X, reps=5, warmup=2, inner=4)
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
