#!/usr/bin/env python
"""CLI MSM benchmark/eval, mirroring the reference's scripts
(scripts/run-msm-377.ts / msm-weierstrass.ts:28-48 protocol: warmup runs,
timed runs, median +- stddev, optional oracle check for small n).

Usage:
    python scripts/run_msm.py [curve] [log2n] [--c C] [--evaluate]
                              [--projective] [--no-glv]

curve: bls12-377 (default) | bls12-381 | pallas | ed-on-bls12-377
"""

import argparse
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("curve", nargs="?", default="bls12-377")
    ap.add_argument("log2n", nargs="?", type=int, default=14)
    ap.add_argument("--c", type=int, default=0)
    ap.add_argument("--evaluate", action="store_true",
                    help="check the result against the bigint oracle")
    ap.add_argument("--projective", action="store_true",
                    help="projective accumulation instead of batched-affine")
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--runs", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from montgomery_tpu.msm import window_size
    from montgomery_tpu.serve import get_curve
    from montgomery_tpu.msm.api import WeierstrassMsm

    N = 1 << args.log2n
    ctx = get_curve(args.curve)
    c = args.c or window_size(ctx.fops.mp.length_p, args.log2n)
    print(f"{args.curve}  N=2^{args.log2n}  c={c}", file=sys.stderr)

    rng = np.random.default_rng(0)
    scalars = [
        int.from_bytes(rng.integers(0, 256, 32, dtype=np.uint8).tobytes(), "little")
        % ctx.params.order
        for i in range(N)
    ]
    limbs = jnp.asarray(ctx.scalars_to_limbs(scalars))

    if isinstance(ctx, WeierstrassMsm):
        from montgomery_tpu.curves.random import random_points_fast

        pts = random_points_fast(ctx.proj, N, seed=1)
        P = pts
        fn = jax.jit(
            lambda p, sl: ctx.msm_device_full(p, sl, c, affine=not args.projective)
        )
        to_host = lambda S: ctx.proj.to_host(S)[0]
    else:
        from montgomery_tpu.bigint.twisted_edwards import TwistedEdwardsCurve
        import random as pyrandom

        E = TwistedEdwardsCurve(ctx.params)
        prng = pyrandom.Random(1)
        base = [E.random_point(prng) for _ in range(4)]
        host_pts = [
            E.add(base[i % 4], E.scale(i + 1, base[(i + 1) % 4])) for i in range(N)
        ]
        P = ctx.ed.to_device(host_pts)
        fn = jax.jit(lambda p, sl: ctx.msm_device_full(p, sl, c))
        to_host = lambda S: ctx.ed.to_host(S)[0]

    t0 = time.time()
    out = fn(P, limbs)
    jax.block_until_ready(out)
    print(f"compile+first run: {time.time()-t0:.1f}s", file=sys.stderr)

    for _ in range(args.warmup):
        jax.block_until_ready(fn(P, limbs))
    times = []
    for _ in range(args.runs):
        t0 = time.time()
        jax.block_until_ready(fn(P, limbs))
        times.append(time.time() - t0)
    med, std = float(np.median(times)), float(np.std(times))
    print(f"msm: {med*1e3:.1f} ms +- {std*1e3:.1f} ms  ({args.runs} runs)")

    if args.evaluate:
        if args.log2n > 14:
            print("(--evaluate capped at 2^14; skipping)", file=sys.stderr)
            return
        result = to_host(out)
        if isinstance(ctx, WeierstrassMsm):
            from montgomery_tpu.bigint import WeierstrassCurve, msm as oracle_msm

            C = WeierstrassCurve(ctx.params)
            host_points = ctx.proj.affine_to_host(P)
            exp = oracle_msm(C, scalars, host_points)
            ok = C.equal(result, exp)
        else:
            from montgomery_tpu.bigint.msm import msm as oracle_msm

            exp = oracle_msm(E, scalars, host_pts)
            ok = E.equal(result, exp)
        print("results are consistent!" if ok else "MISMATCH vs oracle!",
              file=sys.stderr)
        if not ok:
            sys.exit(1)


if __name__ == "__main__":
    main()
