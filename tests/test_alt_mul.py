"""Alternative-mul baselines vs the oracle (mirror of the reference's
schoolbook/barrett validation, wasm/multiply-schoolbook.ts +
wasm/barrett.ts): plain-domain schoolbook product and Barrett modular
multiply must be exact on adversarial inputs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from montgomery_tpu.concrete import example_fields
from montgomery_tpu.ops import limbs as codec
from montgomery_tpu.ops.alt_mul import (
    barrett_mul,
    barrett_params,
    barrett_reduce,
    schoolbook_product,
)
from montgomery_tpu.ops.field import create_field_ops
from montgomery_tpu.testing.generators import sample_field_elements


@pytest.mark.parametrize("name", ["small", "pastaFp", "bls12377", "bls12381"])
def test_schoolbook_and_barrett(name, rng):
    p = example_fields()[name].p
    f = create_field_ops(p, w=12)
    N = 64
    xs = sample_field_elements(p, N, rng)
    ys = sample_field_elements(p, N, rng)
    X = jnp.asarray(codec.pack(xs, f.mp))
    Y = jnp.asarray(codec.pack(ys, f.mp))

    T = jax.jit(lambda a, b: schoolbook_product(f, a, b))(X, Y)
    w = f.w
    got = [
        sum(int(v) << (w * i) for i, v in enumerate(np.asarray(T)[:, j]))
        for j in range(N)
    ]
    assert got == [a * b for a, b in zip(xs, ys)]

    bp = barrett_params(f)
    Z = jax.jit(lambda a, b: barrett_mul(bp, a, b))(X, Y)
    vals = codec.unpack(np.asarray(Z), f.mp)
    assert vals == [a * b % p for a, b in zip(xs, ys)]


def test_barrett_reduce_edge_values(rng):
    """Inputs at the extremes of the 2n-limb range: (p-1)^2, 0, 1, p, 2p."""
    p = example_fields()["bls12377"].p
    f = create_field_ops(p, w=12)
    bp = barrett_params(f)
    vals = [0, 1, p - 1, p, 2 * p, (p - 1) * (p - 1), p * (p - 1)]
    n2 = 2 * f.n
    w = f.w
    arrs = []
    for v in vals:
        limbs = [(v >> (w * i)) & ((1 << w) - 1) for i in range(n2)]
        arrs.append(limbs)
    T = jnp.asarray(np.array(arrs, dtype=np.int32).T)
    Z = jax.jit(lambda t: barrett_reduce(bp, t))(T)
    got = codec.unpack(np.asarray(Z), f.mp)
    assert got == [v % p for v in vals]
