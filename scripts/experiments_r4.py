#!/usr/bin/env python
"""Round-4 design experiments on the real TPU.

Answers, with measurements (design-driving, like scripts/micro_bench.py):
  1. counts via second RLE sort vs plain bincount at production shape
  2. Montgomery mul throughput at w=12 (n=32) vs w=13 (n=30)
  3. raw VPU i32-mul vs f32-mul throughput inside a Pallas kernel
     (feasibility of an f32-limb multiplier)
  4. scatter-min cost for boundary tables (alternative to sort #2)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from montgomery_tpu.utils.timing import enable_compilation_cache, timeit

enable_compilation_cache()


def main():
    import jax
    import jax.numpy as jnp

    print("backend:", jax.default_backend(), flush=True)

    KC, N, c = 10, 1 << 17, 13
    L = 1 << (c - 1)
    rng = np.random.default_rng(0)
    loc = jnp.asarray(rng.integers(0, L + 1, size=(KC, N), dtype=np.int32))

    # --- 1a: single-key row sort (sort #1 cost, for reference)
    def sort1(loc):
        nb = 18
        idx = jax.lax.broadcasted_iota(jnp.int32, loc.shape, 1)
        packed = (loc << nb) | idx
        (s,) = jax.lax.sort((packed,), dimension=1, num_keys=1)
        return s

    t = timeit(jax.jit(sort1), loc, reps=5, inner=2)
    print(f"sort1 (KC,N) single-key:      {t*1e3:8.2f} ms", flush=True)
    loc_s = jax.jit(sort1)(loc) >> 18

    # --- 1b: RLE second sort for counts (current path)
    nb = 18

    def counts_rle(loc_s):
        prev = jnp.concatenate(
            [jnp.full((KC, 1), -1, jnp.int32), loc_s[:, :-1]], axis=1
        )
        isb = loc_s != prev
        idx = jax.lax.broadcasted_iota(jnp.int32, loc_s.shape, 1)
        big = ((L + 2) << nb) | ((1 << nb) - 1)
        bkey = jnp.where(isb, (loc_s << nb) | idx, big)
        (bkey_s,) = jax.lax.sort((bkey,), dimension=1, num_keys=1)
        bnd = bkey_s[:, : L + 1]
        loc_b = jnp.clip(bnd >> nb, 0, L + 2)
        pos_b = bnd & ((1 << nb) - 1)
        win_b = jax.lax.broadcasted_iota(jnp.int32, loc_b.shape, 0)
        S = jnp.full((KC, L + 3), N, jnp.int32)
        S = S.at[win_b, loc_b].min(pos_b)
        S = S.at[:, L + 2].set(N)
        R = jax.lax.cummin(S[:, ::-1], axis=1)[:, ::-1]
        return R[:, 1 : L + 2] - R[:, : L + 1]

    t = timeit(jax.jit(counts_rle), loc_s, reps=5, inner=2)
    print(f"counts via RLE sort:          {t*1e3:8.2f} ms", flush=True)

    # --- 1c: counts via flat bincount
    def counts_bc(loc):
        win = jax.lax.broadcasted_iota(jnp.int32, loc.shape, 0)
        g = win * (L + 1) + loc
        return jnp.bincount(g.reshape(-1), length=KC * (L + 1))

    t = timeit(jax.jit(counts_bc), loc, reps=5, inner=2)
    print(f"counts via bincount:          {t*1e3:8.2f} ms", flush=True)

    # --- 1d: scatter-min boundary directly from sorted locs (no 2nd sort)
    def counts_scatter(loc_s):
        idx = jax.lax.broadcasted_iota(jnp.int32, loc_s.shape, 1)
        win = jax.lax.broadcasted_iota(jnp.int32, loc_s.shape, 0)
        S = jnp.full((KC, L + 2), N, jnp.int32)
        S = S.at[win.reshape(-1), loc_s.reshape(-1)].min(idx.reshape(-1))
        R = jax.lax.cummin(S[:, ::-1], axis=1)[:, ::-1]
        return R[:, 1 : L + 1] - R[:, :L]

    t = timeit(jax.jit(counts_scatter), loc_s, reps=5, inner=2)
    print(f"counts via scatter-min:       {t*1e3:8.2f} ms", flush=True)

    # --- 2: mont mul w=12 vs w=13
    from montgomery_tpu.concrete import BLS12_377
    from montgomery_tpu.ops.field import create_field_ops

    Nm = 1 << 18
    for w in (12, 13):
        f = create_field_ops(BLS12_377.modulus, w=w)
        X = jnp.asarray(
            rng.integers(0, 1 << w, size=(f.n, Nm), dtype=np.int32)
        )

        @jax.jit
        def chain(x, f=f):
            y = x
            for _ in range(30):
                y = f.mul(y, x)
            return y

        t = timeit(chain, X, reps=5, warmup=2, inner=2)
        print(f"mont mul w={w} (n={f.n}):       {30*Nm/t/1e6:8.1f} M muls/s",
              flush=True)

        @jax.jit
        def chain_sq(x, f=f):
            y = x
            for _ in range(30):
                y = f.square(y)
            return y

        t = timeit(chain_sq, X, reps=5, warmup=2, inner=2)
        print(f"mont sqr w={w} (n={f.n}):       {30*Nm/t/1e6:8.1f} M sqrs/s",
              flush=True)

    # --- 3: raw VPU i32 vs f32 mul inside one Pallas kernel
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ROWS, COLS, REPS = 8, 512, 512

    def mk(dtype):
        def kern(x_ref, o_ref):
            x = x_ref[:]
            y = x
            for _ in range(REPS):
                y = y * x + y
            o_ref[:] = y

        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec((ROWS, COLS), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((ROWS, COLS), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            grid=(64,),
            out_shape=jax.ShapeDtypeStruct((ROWS, COLS * 64), dtype),
        )

    for dtype, name in ((jnp.int32, "i32"), (jnp.float32, "f32")):
        X = jnp.ones((ROWS, COLS * 64), dtype)
        fn = jax.jit(mk(dtype))
        t = timeit(fn, X, reps=5, warmup=2, inner=4)
        ops = ROWS * COLS * 64 * REPS
        print(f"VPU {name} mul+add chain:       {ops/t/1e9:8.1f} G mul/s",
              flush=True)


if __name__ == "__main__":
    main()
