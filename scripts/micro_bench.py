#!/usr/bin/env python
"""TPU primitive micro-benchmarks: the measurements behind the MSM engine's
design choices (gather layout, sort strategy, kernel launch overhead,
Montgomery mul/square rates vs the elementwise-int32 speed of light).

The reference chose its limb size and window sizes from exactly this kind of
sweep (doc/zprize22.md:184-185, scripts/field-benchmarks/field-benchmark.ts).

Usage: python scripts/micro_bench.py [section ...]
Sections: rtt launch mul gather sort  (default: all)
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
    from montgomery_tpu.ops.field import create_field_ops

    sections = sys.argv[1:] or ["rtt", "launch", "mul", "altmul", "gather", "sort"]
    print(f"backend={jax.default_backend()}", flush=True)

    f = create_field_ops(BLS12_377.modulus, w=12)
    n = f.n
    rng = np.random.default_rng(1)
    N = 1 << 18
    X = jnp.asarray(rng.integers(0, 1 << f.w, size=(n, N), dtype=np.int32))
    Y = jnp.asarray(rng.integers(0, 1 << f.w, size=(n, N), dtype=np.int32))

    if "rtt" in sections:
        # tunnel round-trip: fetch 1 element of a committed tiny array
        tiny = jnp.zeros((1,), jnp.int32) + 1
        sync(tiny)
        ts = []
        for _ in range(10):
            t0 = time.perf_counter()
            np.asarray(tiny[0])
            ts.append(time.perf_counter() - t0)
        print(f"host<->device RTT (1 elem fetch): {np.median(ts)*1e3:.2f} ms")

    if "launch" in sections:
        # k chained trivial pallas kernels -> slope = per-launch overhead
        def chain_k(k):
            def run(x):
                y = x
                for _ in range(k):
                    y = f.add(y, x)
                return y
            return jax.jit(run)

        t1 = timeit(chain_k(1), X, reps=5)
        t20 = timeit(chain_k(20), X, reps=5)
        print(f"add chain: 1 -> {t1*1e3:.2f} ms, 20 -> {t20*1e3:.2f} ms, "
              f"per-op {(t20-t1)/19*1e3:.3f} ms @N=2^18")

    if "mul" in sections:
        R_CHAIN = 30

        def chain(op):
            def run(x, y):
                z = x
                for _ in range(R_CHAIN):
                    z = op(z, y)
                return z
            return jax.jit(run)

        # elementwise int32 mul speed-of-light (one op = n*N muls)
        ew = chain(lambda a, b: (a * b + a) & 0x7FFFFFF)
        t = timeit(ew, X, Y, reps=5)
        print(f"elementwise i32 mul+add+and: {R_CHAIN*N/t/1e6:.0f} M lanes/s "
              f"({R_CHAIN*n*N/t/1e9:.1f} G i32-mul/s)")

        t = timeit(chain(f.mul), X, Y, reps=5)
        print(f"mont mul:    {R_CHAIN*N/t/1e6:.1f} M muls/s  ({t*1e3:.1f} ms/chain)")
        t = timeit(chain(lambda a, _: f.square(a)), X, Y, reps=5)
        print(f"mont square: {R_CHAIN*N/t/1e6:.1f} M sqrs/s")
        t = timeit(chain(lambda a, b: f.add(a, b)), X, Y, reps=5)
        print(f"field add:   {R_CHAIN*N/t/1e6:.1f} M adds/s")
        t = timeit(jax.jit(lambda x: f.batch_inv(x)), X, reps=3)
        print(f"batch_inv:   {N/t/1e6:.1f} M inv/s ({t*1e3:.1f} ms @2^18)")

    if "altmul" in sections:
        # alternative multipliers (reference field-benchmark.ts:28-120
        # montgomery vs barrett vs schoolbook validation sweep)
        from montgomery_tpu.ops.alt_mul import (
            barrett_mul, barrett_params, schoolbook_product,
        )

        bp = barrett_params(f)
        R_CHAIN = 10

        def chain(op):
            def run(x, y):
                z = x
                for _ in range(R_CHAIN):
                    z = op(z, y)
                return z
            return jax.jit(run)

        t = timeit(chain(f.mul), X, Y, reps=5)
        print(f"montgomery mul:   {R_CHAIN*N/t/1e6:8.1f} M muls/s")
        t = timeit(chain(lambda a, b: barrett_mul(bp, a, b)), X, Y, reps=5)
        print(f"barrett mul:      {R_CHAIN*N/t/1e6:8.1f} M muls/s")
        t = timeit(
            chain(lambda a, b: schoolbook_product(f, a, b)[: f.n]), X, Y,
            reps=5,
        )
        print(f"schoolbook (low): {R_CHAIN*N/t/1e6:8.1f} M prods/s")

    if "gather" in sections:
        M = 1 << 20
        idx = jnp.asarray(rng.integers(0, N, size=M, dtype=np.int32))
        idx_sorted = jnp.sort(idx)
        planes = jnp.asarray(
            rng.integers(0, 1 << 12, size=(96, N), dtype=np.int32)
        )
        rows = jnp.asarray(
            rng.integers(0, 1 << 12, size=(N, 128), dtype=np.int32)
        )

        t = timeit(jax.jit(lambda p, i: jnp.take(p, i, axis=-1)), planes, idx)
        print(f"gather lanes  (96,N) take[{M}] random: {t*1e3:8.1f} ms "
              f"({M*96*4/t/1e9:.1f} GB/s)")
        t = timeit(jax.jit(lambda p, i: jnp.take(p, i, axis=-1)), planes,
                   idx_sorted)
        print(f"gather lanes  (96,N) take[{M}] sorted: {t*1e3:8.1f} ms")
        t = timeit(jax.jit(lambda p, i: jnp.take(p, i, axis=0)), rows, idx)
        print(f"gather rows   (N,128) take[{M}] random: {t*1e3:8.1f} ms "
              f"({M*128*4/t/1e9:.1f} GB/s)")
        t = timeit(jax.jit(lambda p, i: jnp.take(p, i, axis=0)), rows,
                   idx_sorted)
        print(f"gather rows   (N,128) take[{M}] sorted: {t*1e3:8.1f} ms")
        # transpose cost between the two layouts at MSM scale
        t = timeit(jax.jit(lambda p: p.T.copy()), rows)
        print(f"transpose (N,128)->(128,N): {t*1e3:8.1f} ms")

    if "sort" in sections:
        for log2m in [17, 20]:
            M = 1 << log2m
            keys = jnp.asarray(rng.integers(0, 1 << 31, size=M, dtype=np.int32))
            t = timeit(jax.jit(lambda k: jax.lax.sort((k,), num_keys=1)), keys)
            print(f"lax.sort 1xint32 2^{log2m}: {t*1e3:8.1f} ms")
            kv = jnp.asarray(rng.integers(0, 1 << 31, size=M, dtype=np.int32))
            t = timeit(
                jax.jit(lambda k, v: jax.lax.sort((k, v), num_keys=1)), keys, kv
            )
            print(f"lax.sort k+v    2^{log2m}: {t*1e3:8.1f} ms")
            # small-key sort (bucket ids only: 17 bits)
            keys17 = keys & ((1 << 17) - 1)
            t = timeit(
                jax.jit(lambda k, v: jax.lax.sort((k, v), num_keys=1)), keys17, kv
            )
            print(f"lax.sort 17bit+v 2^{log2m}: {t*1e3:8.1f} ms")
        # argsort via iota payload at MSM shape (10, 131072) rows
        keys2d = jnp.asarray(
            rng.integers(0, 1 << 30, size=(10, 131072), dtype=np.int32)
        )
        t = timeit(
            jax.jit(lambda k: jax.lax.sort((k,), dimension=1, num_keys=1)),
            keys2d,
        )
        print(f"lax.sort (10,2^17) rows:   {t*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
