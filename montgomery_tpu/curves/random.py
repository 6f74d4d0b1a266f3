"""Device-side random point generation.

TPU re-design of reference `src/curve-random.ts` / curve-affine.ts:155-190:
draw random x, solve the curve equation with the vectorized masked sqrt,
compact the successes with an argsort (rejection sampling under static
shapes, SURVEY.md §7.3 item 5), and clear the cofactor with a scanned
double-and-add over the batch.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..ops import limbs as codec
from .edwards import EdwardsBatch, EdwardsOps
from .projective import AffineBatch, ProjectiveOps


def _table_indices(rng: np.random.Generator, N: int,
                   n_tables: int, table_size: int) -> np.ndarray:
    """(n_tables, N) independent uniform table indices. The combination
    space table_size^n_tables must be LARGE (the defaults give 72 bits of
    entropy per point, like the reference's ~K tables x 2^c entries,
    curve-random.ts:14-92): with a small space (the round-4 3x256 = 24
    bits), not only do duplicate points birthday-collide (~33k pairs at
    2^20), but SMALL INTEGER COMBINATIONS of points collide too — two
    partial sums inside one bucket with equal per-table coefficient vectors
    are the same curve point, which zeroes the unsafe chord denominator and
    poisons the shared batch-inversion tree (found as the round-5 c=15 /
    fresh-2^16 validation failures; a bijective low-entropy enumeration is
    even worse). At 72 bits both failure modes are < 2^-40."""
    assert table_size ** n_tables >= (1 << 64), "combination space too small"
    return rng.integers(0, table_size, size=(n_tables, N))


def random_points_fast(proj: ProjectiveOps, N: int, seed: int = 0,
                       n_tables: int = 8, table_size: int = 512) -> AffineBatch:
    """Fast random subgroup points: each output is the sum of one entry from
    each of `n_tables` multiple-tables of random base points
    (reference curve-random.ts randomPointsFast :14-92) with 72-bit
    combination entropy (see _table_indices: small spaces break the
    msmUnsafe contract through colliding partial sums).

    Compile-light (one small scan + gathers) — used for benchmarking at
    2^20 scale where the sqrt path's compile cost is not worth paying.
    """
    import random as pyrandom

    from ..bigint.weierstrass import WeierstrassCurve

    rng = pyrandom.Random(seed)
    C = WeierstrassCurve(proj.params)
    bases = [C.random_point(rng) for _ in range(n_tables)]
    B = proj.from_affine(proj.affine_to_device(bases))  # (n, n_tables)

    @jax.jit
    def build_tables(B):
        def step(acc, _):
            nxt = proj.add(acc, B)
            return nxt, nxt

        init = proj.add(B, B)  # start at 2*base (avoid zero/base duplicates)
        _, tab = jax.lax.scan(step, init, None, length=table_size)
        return tab  # leaves (table_size, n, n_tables)

    tab = build_tables(B)
    nprng = np.random.default_rng(seed)
    idx = _table_indices(nprng, N, n_tables, table_size)

    @jax.jit
    def combine(tab, idx):
        def pick(t):
            sl = jax.tree.map(lambda a: a[:, :, t], tab)  # (table_size, n)
            return jax.tree.map(
                lambda a: jnp.take(a, idx[t], axis=0).T, sl
            )  # (n, N)

        acc = pick(0)
        for t in range(1, n_tables):
            acc = proj.add(acc, pick(t))
        return proj.to_affine(acc)

    return combine(tab, jnp.asarray(idx.astype(np.int32)))


def _uniform_field_vals(rng: np.random.Generator, M: int, p: int) -> list[int]:
    """M (statistically) uniform field elements: full random bytes with 64
    bits of slack, reduced mod p (bias < 2^-64; matches the reference's
    uniform sampling contract, curve-random.ts:151-194 — the earlier 62-bit
    word packing left bits 62-63 of every word structurally zero)."""
    nbytes = (p.bit_length() + 7) // 8 + 8
    raw = rng.bytes(M * nbytes)
    return [
        int.from_bytes(raw[i * nbytes : (i + 1) * nbytes], "little") % p
        for i in range(M)
    ]


def random_points_fast_edwards(ed: EdwardsOps, N: int, seed: int = 0,
                               n_tables: int = 8,
                               table_size: int = 512) -> EdwardsBatch:
    """Fast random TE subgroup points (reference curve-random.ts
    randomPointsFast analog for the Edwards path): each output is the sum of
    one entry from each of `n_tables` multiple-tables of host-generated base
    points (72-bit combination entropy — see _table_indices).
    Compile-light (no sqrt kernels) — used for benchmarking."""
    import random as pyrandom

    from ..bigint.twisted_edwards import TwistedEdwardsCurve

    rng = pyrandom.Random(seed)
    E = TwistedEdwardsCurve(ed.params)
    bases = [E.random_point(rng) for _ in range(n_tables)]
    B = ed.to_device(bases)  # leaves (n, n_tables)

    @jax.jit
    def build_tables(B):
        def step(acc, _):
            nxt = ed.add(acc, B)
            return nxt, nxt

        init = ed.add(B, B)
        _, tab = jax.lax.scan(step, init, None, length=table_size)
        return tab

    tab = build_tables(B)
    nprng = np.random.default_rng(seed)
    idx = _table_indices(nprng, N, n_tables, table_size)

    @jax.jit
    def combine(tab, idx):
        def pick(t):
            sl = jax.tree.map(lambda a: a[:, :, t], tab)
            return jax.tree.map(lambda a: jnp.take(a, idx[t], axis=0).T, sl)

        acc = pick(0)
        for t in range(1, n_tables):
            acc = ed.add(acc, pick(t))
        return acc

    return combine(tab, jnp.asarray(idx.astype(np.int32)))


def random_points_edwards(
    ed: EdwardsOps, N: int, seed: int = 0, oversample: float = 2.5
) -> EdwardsBatch:
    """N random twisted-Edwards subgroup points, fully on device (reference
    curve-twisted-edwards.ts:269-312 randomPoints): draw random x, solve
    y^2 = (1 + x^2) / (1 - d x^2)  (a = -1 curve equation rearranged),
    take the masked windowed sqrt, compact successes, clear the cofactor.
    """
    f = ed.f
    M = int(N * oversample) + 16
    rng = np.random.default_rng(seed)
    X = jnp.asarray(codec.pack(_uniform_field_vals(rng, M, f.p), f.mp))

    @jax.jit
    def solve(X):
        xm = f.to_montgomery(X)
        one = f.bc_full(f.one_mont, xm)
        (xx,) = f.mul_list([(xm, xm)])
        num = f.add(one, xx)
        den = f.sub(one, f.mul_const(xx, ed.d_mont))
        y2 = f.mul(num, f.batch_inv(den, handle_zero=True))
        y, ok = f.sqrt(y2)
        # den == 0 (x on the asymptote) is not a valid point
        ok = ok & jnp.logical_not(f.is_zero(den))
        return xm, y, ok

    Xm, Y, ok = solve(X)
    okh = np.asarray(ok)
    assert int(okh.sum()) >= N, "oversample too small for sqrt success rate"
    order = np.argsort(~okh, kind="stable")[:N]
    idx = jnp.asarray(order.astype(np.int32))

    @jax.jit
    def finish(Xm, Y, idx):
        P = ed.from_affine_arrays(
            jnp.take(Xm, idx, axis=-1), jnp.take(Y, idx, axis=-1)
        )
        if ed.params.cofactor != 1:
            P = ed.scale(ed.params.cofactor, P)
        return P

    return finish(Xm, Y, idx)


def random_points_weierstrass(
    proj: ProjectiveOps, N: int, seed: int = 0, oversample: float = 2.5
) -> AffineBatch:
    """N random points on y^2 = x^3 + a x + b (cofactor-cleared, affine).

    Host RNG draws candidate x values; everything else runs on device.
    """
    f = proj.f
    params = proj.params
    M = int(N * oversample) + 16
    rng = np.random.default_rng(seed)
    X = jnp.asarray(codec.pack(_uniform_field_vals(rng, M, f.p), f.mp))

    @jax.jit
    def solve(X):
        Xm = f.to_montgomery(X)
        xx, = f.mul_list([(Xm, Xm)])
        rhs, = f.mul_list([(xx, Xm)])
        if not proj.a_is_zero:
            rhs = f.add(rhs, f.mul_const(Xm, proj.a_mont))
        rhs = f.add(rhs, f.bc_full(proj.b_mont, Xm))
        y, ok = f.sqrt(rhs)
        return Xm, y, ok

    Xm, Y, ok = solve(X)
    okh = np.asarray(ok)
    assert int(okh.sum()) >= N, "oversample too small for sqrt success rate"
    order = np.argsort(~okh, kind="stable")[:N]
    idx = jnp.asarray(order.astype(np.int32))

    @jax.jit
    def finish(Xm, Y, idx):
        A = AffineBatch(
            jnp.take(Xm, idx, axis=-1),
            jnp.take(Y, idx, axis=-1),
            jnp.zeros((N,), dtype=bool),
        )
        if params.cofactor != 1:
            P = proj.scale(params.cofactor, proj.from_affine(A))
            return proj.to_affine(P)
        return A

    return finish(Xm, Y, idx)
