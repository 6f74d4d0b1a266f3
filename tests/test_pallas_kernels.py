"""Pallas kernel-wrapper tests (interpret mode on CPU).

The production TPU path runs every field/group formula through
ops/kernels.py: jaxpr tracing with constant hoisting, (rows, TILE) blocking,
zero-lane padding, pallas_call caching. These tests execute that exact
wrapper in the Pallas INTERPRETER (ops/kernels.py force_pallas(True,
interpret=True)) so the kernel plumbing — not just the formulas — is
verified on CPU: block specs, const packing/restore, padding lanes, and
multi-output splitting.

Also covers callback mode (each formula as one pure_callback op), which the
pipeline tests rely on for fast compiles.
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from montgomery_tpu.bigint import WeierstrassCurve
from montgomery_tpu.concrete import BLS12_377
from montgomery_tpu.msm import WeierstrassMsm
from montgomery_tpu.ops import kernels
from montgomery_tpu.ops.field import create_field_ops

P377 = BLS12_377.modulus


@pytest.fixture(scope="module")
def fops():
    return create_field_ops(P377, w=12)


def _rand_elems(rng, n):
    return [rng.randrange(P377) for _ in range(n)]


def test_pallas_interpret_mul_square(fops, rng):
    """mont mul + square through the full pallas_call wrapper (interpret):
    N=9 lanes forces zero-padding to TILE=512 and the restore slice."""
    N = 9
    xs, ys = _rand_elems(rng, N), _rand_elems(rng, N)
    X, Y = fops.pack(xs), fops.pack(ys)
    R = fops.mp.R
    with kernels.force_pallas(True, interpret=True):
        Z = fops.mul(X, Y)
        S = fops.square(X)
    got_mul = fops.unpack(Z)
    got_sqr = fops.unpack(S)
    for i in range(N):
        assert got_mul[i] == xs[i] * ys[i] * pow(R, -1, P377) % P377
        assert got_sqr[i] == xs[i] * xs[i] * pow(R, -1, P377) % P377


def test_pallas_interpret_exp_ladder(fops, rng):
    """Fused Fermat inversion ladder as ONE interpreted pallas kernel
    (the fori_loop + iota-select structure must survive Mosaic-style
    tracing with hoisted one_mont constant)."""
    N = 5
    xs = _rand_elems(rng, N)
    xs[0] = 1
    X = fops.pack(xs)  # plain domain: x^e semantics still hold via mont form
    Xm = fops.jitted("to_montgomery")(X)
    with kernels.force_pallas(True, interpret=True):
        Zm = fops.inv(Xm)
    got = fops.unpack(Zm, from_mont=True)
    for i in range(N):
        assert got[i] == pow(xs[i], -1, P377), f"lane {i}"


def test_pallas_interpret_batch_inv(fops, rng):
    """batch_inv = mul-tree kernels + one ladder kernel, all interpreted."""
    N = 20
    xs = _rand_elems(rng, N)
    Xm = fops.jitted("to_montgomery")(fops.pack(xs))
    with kernels.force_pallas(True, interpret=True):
        Zm = fops.batch_inv(Xm)
    got = fops.unpack(Zm, from_mont=True)
    for i in range(N):
        assert got[i] == pow(xs[i], -1, P377)


def test_pallas_interpret_rcb_add(rng):
    """Projective RCB complete add as an interpreted fused kernel, incl. the
    hoisted b3 constant, vs the oracle (add, double, zero, cancel lanes)."""
    C = WeierstrassCurve(BLS12_377)
    ctx = WeierstrassMsm(BLS12_377)
    A = C.scale(rng.randrange(1, 1 << 62), C.generator)
    B = C.scale(rng.randrange(1, 1 << 62), C.generator)
    from montgomery_tpu.bigint.weierstrass import AffinePoint

    g = [A, B, A, A, AffinePoint.zero()]
    h = [B, A, A, C.neg(A), B]
    G = ctx.proj.from_affine(ctx.proj.affine_to_device(g))
    H = ctx.proj.from_affine(ctx.proj.affine_to_device(h))
    with kernels.force_pallas(True, interpret=True):
        S = ctx.proj.add(G, H)
    got = ctx.proj.to_host(S)
    for i, (a, b) in enumerate(zip(g, h)):
        assert C.equal(got[i], C.add(a, b)), f"lane {i}"


def test_pallas_interpret_packed_affine_add(rng):
    """The packed-row batched-affine add family (the MSM hot kernel):
    pack16 -> pre/post kernels with sign + pass-through planes -> unpack,
    interpreted, safe and unsafe variants, vs the oracle."""
    C = WeierstrassCurve(BLS12_377)
    ctx = WeierstrassMsm(BLS12_377)
    N = 6
    g = [C.scale(rng.randrange(1, 1 << 62), C.generator) for _ in range(N)]
    h = [C.scale(rng.randrange(1, 1 << 62), C.generator) for _ in range(N)]
    G = ctx.proj.affine_to_device(g)
    H = ctx.proj.affine_to_device(h)
    aff = ctx.affine
    sA = jnp.zeros((1, N), jnp.int32)
    sB = jnp.asarray(np.array([[0, 1, 0, 1, 0, 0]], dtype=np.int32))
    hp = jnp.asarray(np.array([[1, 1, 1, 1, 0, 1]], dtype=np.int32))
    for unsafe in (False, True):
        with kernels.force_pallas(True, interpret=True):
            PR_G = aff.pack_rows(G)
            PR_H = aff.pack_rows(H)
            out = aff.add_packed(PR_G, PR_H, sA, sB, hp, unsafe=unsafe)
            res = aff.unpack_rows(out)
        got = ctx.proj.affine_to_host(res)
        for i in range(N):
            b = C.neg(h[i]) if int(sB[0, i]) else h[i]
            want = C.add(g[i], b) if int(hp[0, i]) else g[i]
            assert C.equal(got[i], want), f"unsafe={unsafe} lane {i}"


def test_pallas_interpret_packed_edwards_add(rng):
    """The packed twisted-Edwards add (MSM hot kernel for the TE engine):
    [X|Y|Z|T] pack16 -> ONE fused inversion-free hwcd add with sign +
    pass-through planes -> unpack, interpreted, vs the oracle."""
    from montgomery_tpu.bigint import TwistedEdwardsCurve
    from montgomery_tpu.concrete import ED_ON_BLS12_377
    from montgomery_tpu.msm import EdwardsMsm

    E = TwistedEdwardsCurve(ED_ON_BLS12_377)
    ctx = EdwardsMsm(ED_ON_BLS12_377)
    N = 6
    g = [E.scale(rng.randrange(1, 1 << 62), E.generator) for _ in range(N)]
    h = [E.scale(rng.randrange(1, 1 << 62), E.generator) for _ in range(N)]
    h[2] = g[2]  # doubling lane (the unified add must handle it)
    G = ctx.ed.to_device(g)
    H = ctx.ed.to_device(h)
    sA = jnp.zeros((1, N), jnp.int32)
    sB = jnp.asarray(np.array([[0, 1, 0, 1, 0, 0]], dtype=np.int32))
    hp = jnp.asarray(np.array([[1, 1, 1, 1, 0, 1]], dtype=np.int32))
    with kernels.force_pallas(True, interpret=True):
        PR_G = ctx.ed.pack_rows(G)
        PR_H = ctx.ed.pack_rows(H)
        out = ctx.ed.add_packed(PR_G, PR_H, sA, sB, hp)
        res = ctx.ed.unpack_rows(out)
    got = ctx.ed.to_host(res)
    for i in range(N):
        b = E.neg(h[i]) if int(sB[0, i]) else h[i]
        want = E.add(g[i], b) if int(hp[0, i]) else g[i]
        assert E.equal(got[i], want), f"lane {i}"


def test_callback_mode_matches_inline(fops, rng):
    """Callback mode (pure_callback per formula) must agree with the inline
    path — the fast-compile mode used by the pipeline/sharded tests."""
    N = 7
    xs, ys = _rand_elems(rng, N), _rand_elems(rng, N)
    X, Y = fops.pack(xs), fops.pack(ys)
    inline = fops.mul(X, Y)
    with kernels.force_pallas(True, callback=True):
        cb = jax.jit(fops.mul)(X, Y)
    assert np.array_equal(np.asarray(inline), np.asarray(cb))
