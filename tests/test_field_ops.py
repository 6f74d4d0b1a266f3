"""Field-kernel equivalence tests vs the bigint oracle.

Mirror of reference src/field.test.ts: for a set of example fields and a sweep
of limb sizes w, every kernel (add/sub/sub_positive/reduce/mul/square/
left_shift/is_equal/is_zero/inv/batch_inv/exp/sqrt) is checked bit-compatible
with the oracle on adversarial inputs, including unreduced values in [0, 2p).
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from montgomery_tpu.bigint.field import Field
from montgomery_tpu.concrete import example_fields
from montgomery_tpu.ops import limbs as codec
from montgomery_tpu.ops.field import create_field_ops
from montgomery_tpu.testing.equivalence import assert_in_range
from montgomery_tpu.testing.generators import sample_field_elements

# reference sweeps w in 26..31 for 64-bit accumulators (field.test.ts:19);
# our int32 analog is w in 11..13. The default matrix covers the two
# production limb sizes (w=13 is the MSM default, w=12 the dot-form default);
# the full historical sweep value w=11 runs under -m slow (each extra
# (field, w) pair compiles its own kernel set — the dominant suite cost).
FIELDS = ["small", "babybear", "goldilocks", "pastaFp", "pastaFq", "f25519",
          "secp256k1", "bls12377", "bls12381", "edBls12377"]
W_SWEEP = [12, 13]
W_SLOW = [11]

N = 64


def make(name, w):
    p = example_fields()[name].p
    return p, create_field_ops(p, w=w)


def unpack_modp(ops, arr):
    return [v % ops.p for v in codec.unpack(np.asarray(arr), ops.mp)]


@pytest.mark.parametrize("w", W_SWEEP)
@pytest.mark.parametrize("name", FIELDS)
def test_add_sub_reduce(name, w, rng):
    p, ops = make(name, w)
    xs = sample_field_elements(p, N, rng, unreduced=True)
    ys = sample_field_elements(p, N, rng, unreduced=True)
    X, Y = jnp.asarray(codec.pack(xs, ops.mp)), jnp.asarray(codec.pack(ys, ops.mp))

    Z = jax.jit(ops.add)(X, Y)
    assert unpack_modp(ops, Z) == [(a + b) % p for a, b in zip(xs, ys)]
    assert_in_range(ops, Z, 2 * p, "add")

    Z = jax.jit(ops.sub)(X, Y)
    assert unpack_modp(ops, Z) == [(a - b) % p for a, b in zip(xs, ys)]
    assert_in_range(ops, Z, 2 * p, "sub")

    Z = jax.jit(ops.sub_positive)(X, Y)
    vals = codec.unpack(np.asarray(Z), ops.mp)
    assert vals == [a - b + 2 * p for a, b in zip(xs, ys)]

    Z = jax.jit(ops.reduce)(X)
    assert unpack_modp(ops, Z) == [a % p for a in xs]
    assert_in_range(ops, Z, p, "reduce")

    Z = jax.jit(ops.neg)(X)
    assert unpack_modp(ops, Z) == [(-a) % p for a in xs]
    assert_in_range(ops, Z, 2 * p, "neg")


@pytest.mark.parametrize("w", W_SWEEP)
@pytest.mark.parametrize("name", FIELDS)
def test_montgomery_mul(name, w, rng):
    p, ops = make(name, w)
    R_inv = pow(ops.mp.R, -1, p)
    xs = sample_field_elements(p, N, rng, unreduced=True)
    ys = sample_field_elements(p, N, rng, unreduced=True)
    X, Y = jnp.asarray(codec.pack(xs, ops.mp)), jnp.asarray(codec.pack(ys, ops.mp))

    Z = jax.jit(ops.mul)(X, Y)
    assert unpack_modp(ops, Z) == [(a * b * R_inv) % p for a, b in zip(xs, ys)]
    assert_in_range(ops, Z, 2 * p, "mul")

    Z = jax.jit(ops.square)(X)
    assert unpack_modp(ops, Z) == [(a * a * R_inv) % p for a in xs]

    # montgomery roundtrip
    rt = unpack_modp(ops, jax.jit(ops.from_montgomery)(jax.jit(ops.to_montgomery)(X)))
    assert rt == [a % p for a in xs]


@pytest.mark.parametrize("name", ["small", "pastaFp", "bls12377"])
def test_left_shift_and_predicates(name, rng):
    p, ops = make(name, 12)
    xs = sample_field_elements(p, N, rng, unreduced=True)
    X = jnp.asarray(codec.pack(xs, ops.mp))
    for k in [1, 7, 64]:
        Z = jax.jit(lambda a: ops.left_shift(a, k))(X)
        # left_shift acts on the plain (pre-Montgomery) value via mont-mul:
        # mont_mul(x, 2^k * R) = x * 2^k mod p
        assert unpack_modp(ops, Z) == [(a << k) % p for a in xs]

    ys = [xs[i] if i % 2 == 0 else (xs[i] + p) for i in range(N)]  # same mod p
    Y = jnp.asarray(codec.pack([y % (2 * p) for y in ys], ops.mp))
    eq = np.asarray(jax.jit(ops.is_equal)(X, Y))
    expected = [(a - b) % p == 0 for a, b in zip(xs, [y % (2 * p) for y in ys])]
    assert list(eq) == expected

    zs = [0, p, 1, 2 * p - 1] * (N // 4)
    Zp = jnp.asarray(codec.pack(zs, ops.mp))
    assert list(np.asarray(jax.jit(ops.is_zero)(Zp))) == [z % p == 0 for z in zs]


@pytest.mark.parametrize(
    "name,w",
    [("small", 12), ("goldilocks", 13), ("pastaFp", 12), ("bls12377", 12)],
)
def test_inverse_and_exp(name, w, rng):
    p, ops = make(name, w)
    xs = sample_field_elements(p, N, rng)
    Xm = ops.pack(xs, to_mont=True)

    inv = ops.unpack(jax.jit(ops.inv)(Xm), from_mont=True)
    for a, got in zip(xs, inv):
        if a % p != 0:
            assert got == pow(a % p, -1, p)

    binv = ops.unpack(
        jax.jit(lambda v: ops.batch_inv(v, handle_zero=True))(Xm), from_mont=True
    )
    for a, got in zip(xs, binv):
        assert got == (0 if a % p == 0 else pow(a % p, -1, p))

    # non-power-of-two batch size
    Xm3 = Xm[:, : N - 3]
    binv3 = ops.unpack(
        jax.jit(lambda v: ops.batch_inv(v, handle_zero=True))(Xm3), from_mont=True
    )
    assert binv3 == binv[: N - 3]

    for e in [0, 1, 5, p - 2]:
        got = ops.unpack(jax.jit(lambda v: ops.exp_const(v, e))(Xm), from_mont=True)
        assert got == [pow(a % p, e, p) for a in xs]


@pytest.mark.parametrize("name", ["small", "babybear", "pastaFp", "bls12377"])
def test_sqrt(name, rng):
    p, ops = make(name, 12)
    F = Field(p)
    xs = sample_field_elements(p, 32, rng)
    # include guaranteed squares
    xs = [F.square(x) for x in xs[:16]] + xs[16:]
    Xm = ops.pack(xs, to_mont=True)
    root, is_sq = jax.jit(ops.sqrt)(Xm)
    roots = ops.unpack(root, from_mont=True)
    flags = list(np.asarray(is_sq))
    for a, r, f in zip(xs, roots, flags):
        assert f == F.is_square(a), (name, a)
        if f:
            assert (r * r) % p == a % p, (name, a)


@pytest.mark.slow
@pytest.mark.parametrize("w", W_SLOW)
@pytest.mark.parametrize("name", FIELDS)
def test_mul_w_sweep_slow(name, w, rng):
    """Full limb-size sweep (historical w=11 point) — slow-marked: each
    (field, w) pair compiles a fresh kernel set."""
    p, ops = make(name, w)
    R_inv = pow(ops.mp.R, -1, p)
    xs = sample_field_elements(p, N, rng, unreduced=True)
    ys = sample_field_elements(p, N, rng, unreduced=True)
    X, Y = jnp.asarray(codec.pack(xs, ops.mp)), jnp.asarray(codec.pack(ys, ops.mp))
    Z = jax.jit(ops.mul)(X, Y)
    assert unpack_modp(ops, Z) == [(a * b * R_inv) % p for a, b in zip(xs, ys)]
    Z = jax.jit(ops.add)(X, Y)
    assert unpack_modp(ops, Z) == [(a + b) % p for a, b in zip(xs, ys)]
