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
from .projective import AffineBatch, ProjectiveOps


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
    # random field elements via rejection-free biased sampling (uniform over
    # [0, 2^length) then mod p — negligible bias for bench/test purposes)
    xs = rng.integers(0, 1 << 62, size=(M, (f.p.bit_length() // 62) + 1), dtype=np.int64)
    vals = [int.from_bytes(b"".join(int(v).to_bytes(8, "little") for v in row), "little") % f.p
            for row in xs]
    X = jnp.asarray(codec.pack(vals, f.mp))

    @jax.jit
    def solve(X):
        Xm = f.to_montgomery(X)
        xx, = f.mul_list([(Xm, Xm)])
        rhs, = f.mul_list([(xx, Xm)])
        if not proj.a_is_zero:
            rhs = f.add(rhs, f.mul_const(Xm, proj.a_mont))
        one = f.bc_full(f.one_mont, Xm)
        rhs = f.add(rhs, f.mul_const(one, proj.b_mont))
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
