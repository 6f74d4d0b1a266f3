#!/usr/bin/env python
"""Multi-chip MSM scaling benchmark: msm/s at 1, 2, 4, ... devices and
scaling efficiency vs 1 device (the BASELINE.json >=70% target).

On this dev environment only ONE real TPU chip is visible, so the real
numbers come from running this on a pod slice; the script also runs on the
virtual CPU mesh (MSM_VIRTUAL=8) to validate the sharded pipeline's
structure and correctness at small N (virtual-device timings share one
host and are NOT scaling evidence).

Usage: python scripts/bench_sharded.py [log2n] [c]
Env:   MSM_VIRTUAL=<d>  force a d-device virtual CPU mesh
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("MSM_VIRTUAL"):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={os.environ['MSM_VIRTUAL']}"
    )

from montgomery_tpu.utils.timing import enable_compilation_cache, sync, timeit

enable_compilation_cache()


def main():
    import contextlib

    import jax

    cm = contextlib.nullcontext()
    if os.environ.get("MSM_VIRTUAL"):
        jax.config.update("jax_platforms", "cpu")
        # virtual-mesh structure validation: callback-mode kernels (the
        # fully inlined pipeline takes minutes of XLA CPU compile)
        from montgomery_tpu.ops import kernels

        cm = kernels.force_pallas(True, callback=True)
    cm.__enter__()
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from montgomery_tpu.bigint import WeierstrassCurve, msm as oracle_msm
    from montgomery_tpu.concrete import BLS12_377
    from montgomery_tpu.msm import WeierstrassMsm, window_size
    from montgomery_tpu.parallel import make_mesh, msm_full_sharded

    log2n = int(sys.argv[1]) if len(sys.argv) > 1 else (
        10 if os.environ.get("MSM_VIRTUAL") else 16
    )
    N = 1 << log2n
    ctx = WeierstrassMsm(BLS12_377)
    c = int(sys.argv[2]) if len(sys.argv) > 2 else window_size(
        ctx.fops.mp.length_p, log2n
    )
    n_dev = len(jax.devices())
    print(f"devices={n_dev} N=2^{log2n} c={c}", flush=True)

    import random

    rng = random.Random(5)
    C = WeierstrassCurve(BLS12_377)
    base = [C.scale(rng.randrange(1, 1 << 62), C.generator) for _ in range(64)]
    pts = [base[i % 64] if i % 64 else C.scale(2 + i, base[i % 64])
           for i in range(N)]
    sc = [rng.randrange(BLS12_377.order) for _ in range(N)]
    A_host = ctx.proj.affine_to_device(pts)
    limbs_host = jnp.asarray(ctx.scalars_to_limbs(sc))

    results = {}
    d = 1
    while d <= n_dev:
        mesh = make_mesh(d)

        def put(a):
            return jax.device_put(
                a, NamedSharding(mesh, P(*([None] * (a.ndim - 1) + ["dp"])))
            )

        A = jax.tree.map(put, A_host)
        limbs = put(limbs_host)
        fn = jax.jit(
            lambda a, sl, _m=mesh: msm_full_sharded(ctx, a, sl, c, _m, unsafe=True)
        )
        t0 = time.time()
        out = fn(A, limbs)
        sync(out)
        print(f"d={d}: compile+first {time.time()-t0:.1f}s", flush=True)
        t = timeit(fn, A, limbs, reps=5, warmup=2, inner=2)
        results[d] = t
        eff = results[1] / (t * d) if 1 in results else 1.0
        print(f"d={d}: {t*1e3:8.1f} ms/msm   {1/t:6.2f} msm/s   "
              f"scaling eff vs 1dev: {eff*100:5.1f}%", flush=True)
        if log2n <= 12:
            got = ctx.proj.to_host(out)[0]
            assert C.equal(got, oracle_msm(C, sc, pts)), "sharded != oracle"
            print(f"d={d}: oracle check OK", flush=True)
        d *= 2


if __name__ == "__main__":
    main()
