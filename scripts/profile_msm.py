#!/usr/bin/env python
"""Per-phase timing of the BLS12-377 MSM pipeline on the current backend.

Reproduces the reference's phase-split measurement (doc/zprize22.md:257-263:
8% prep / 12% sort / 65% accumulation / 15% reduction) for the TPU pipeline,
by jitting each phase separately and timing it on real inputs.

Usage: python scripts/profile_msm.py [log2n] [c]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from montgomery_tpu.utils.timing import sync, timeit
from montgomery_tpu.utils.timing import enable_compilation_cache

enable_compilation_cache()


def main():
    import jax
    import jax.numpy as jnp

    log2n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    N = 1 << log2n

    from montgomery_tpu.concrete import BLS12_377
    from montgomery_tpu.curves.random import random_points_fast
    from montgomery_tpu.msm import WeierstrassMsm, window_size
    from montgomery_tpu.msm.pippenger import bucket_accumulate, reduce_buckets
    from montgomery_tpu.scalar.device import digits_glv_device

    ctx = WeierstrassMsm(BLS12_377)
    c = int(sys.argv[2]) if len(sys.argv) > 2 else window_size(
        ctx.fops.mp.length_p, log2n
    )
    print(f"backend={jax.default_backend()} N=2^{log2n} c={c}", flush=True)

    cache = f".bench_cache/points_{log2n}.npz"
    if os.path.exists(cache):
        from montgomery_tpu.curves.projective import AffineBatch

        z = np.load(cache)
        pts = AffineBatch(jnp.asarray(z["x"]), jnp.asarray(z["y"]),
                          jnp.asarray(z["inf"]))
    else:
        pts = random_points_fast(ctx.proj, N, seed=42)
    rng = np.random.default_rng(7)
    scalars = [int(s) % BLS12_377.order
               for s in rng.integers(0, 1 << 62, size=N)]
    limbs = jnp.asarray(ctx.scalars_to_limbs(scalars))

    # phase 1: GLV decompose + digit slicing
    f_digits = jax.jit(lambda sl: digits_glv_device(ctx.glv_dev, sl, c))
    t_digits = timeit(f_digits, limbs)
    digits = f_digits(limbs)

    # phase 1b: GLV point expansion (endomorphism)
    f_expand = jax.jit(ctx.expand_points_glv)
    t_expand = timeit(f_expand, pts)
    P2 = f_expand(pts)

    # phase 2: bucket accumulation (sort + pair-halving) — affine
    f_acc = jax.jit(lambda p, d: bucket_accumulate(ctx.aff_adapter, p, d, c)[0])
    t0 = time.time()
    buckets = f_acc(P2, digits)
    sync(buckets)
    K_pad, L = int(digits.shape[0]), 1 << (c - 1)
    print(f"accumulate compile+run: {time.time()-t0:.1f}s", flush=True)
    t_acc = timeit(f_acc, P2, digits)

    # phase 3: bucket reduction + horner — projective
    f_red = jax.jit(
        lambda b: reduce_buckets(
            ctx.adapter, ctx.aff_adapter.to_projective(b), c, K_pad, L
        )
    )
    t_red = timeit(f_red, buckets)

    # sub-phase: the sort alone (window-key sort over all windows)
    K = digits.shape[0]
    Ltot = K * ((1 << (c - 1)) + 1)

    def sort_only(d):
        b = jnp.abs(d)
        win = jax.lax.broadcasted_iota(jnp.int32, d.shape, 0)
        key = jnp.where(b > 0, win * ((1 << (c - 1)) + 1) + b, Ltot).reshape(-1)
        idx = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1).reshape(-1)
        sgn = (d < 0).astype(jnp.int32).reshape(-1)
        return jax.lax.sort((key, idx, sgn), num_keys=1)

    t_sort = timeit(jax.jit(sort_only), digits)

    # sub-phase: one batched-affine add at the full pair width (M0/2 lanes)
    M0 = int(digits.shape[0]) * int(digits.shape[1])
    half = M0 // 2
    idxh = jnp.arange(half, dtype=jnp.int32)
    A = jax.tree.map(lambda a: jnp.take(a, idxh % P2.x.shape[-1], axis=-1), P2)
    B = jax.tree.map(
        lambda a: jnp.take(a, (idxh + 1) % P2.x.shape[-1], axis=-1), P2
    )
    t_add1 = timeit(jax.jit(ctx.affine.batch_add), A, B)

    # sub-phase: batch inversion alone at the same width
    t_binv = timeit(jax.jit(lambda x: ctx.fops.batch_inv(x)), A.x)

    # sub-phase: gather cost (3 coordinate planes, full width)
    src = jnp.asarray(
        np.random.default_rng(0).integers(0, P2.x.shape[-1], size=M0, dtype=np.int32)
    )
    f_gather = jax.jit(
        lambda p, s: jax.tree.map(lambda a: jnp.take(a, s, axis=-1), p)
    )
    t_gather = timeit(f_gather, P2, src)

    total = t_digits + t_expand + t_acc + t_red
    print(f"\n--- phase split (sum {total*1e3:.1f} ms) ---")
    for name, t in [
        ("digits (GLV+slice)", t_digits),
        ("expand (endo)", t_expand),
        ("accumulate", t_acc),
        ("reduce+horner", t_red),
    ]:
        print(f"{name:22s} {t*1e3:8.1f} ms  {100*t/total:5.1f}%")
    print("--- sub-phases ---")
    print(f"{'sort (K*N keys)':22s} {t_sort*1e3:8.1f} ms")
    print(f"{'1 affine add @M0/2':22s} {t_add1*1e3:8.1f} ms")
    print(f"{'batch_inv @M0/2':22s} {t_binv*1e3:8.1f} ms")
    print(f"{'gather 3planes @M0':22s} {t_gather*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
