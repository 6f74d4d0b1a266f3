"""Constant-iteration divstep (safegcd) inverse vs the oracle — the
reference's fast-inverse exploration re-derived for int32 limb planes
(inverse/faster-inverse.ts:76-166)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from montgomery_tpu.concrete import example_fields
from montgomery_tpu.ops import limbs as codec
from montgomery_tpu.ops.divstep import divstep_params, inv_divstep, inv_mont_divstep
from montgomery_tpu.ops.field import create_field_ops
from montgomery_tpu.testing.generators import sample_field_elements


@pytest.mark.parametrize("name", ["small", "babybear", "pastaFp", "bls12377"])
def test_divstep_inverse(name, rng):
    p = example_fields()[name].p
    f = create_field_ops(p, w=13)
    dp = divstep_params(f)
    N = 32
    xs = sample_field_elements(p, N, rng)
    xs[0], xs[1], xs[2] = 0, 1, p - 1
    X = jnp.asarray(codec.pack([x % p for x in xs], f.mp))
    Z = jax.jit(lambda a: inv_divstep(dp, a))(X)
    got = codec.unpack(np.asarray(Z), f.mp)
    for x, g in zip(xs, got):
        want = 0 if x % p == 0 else pow(x % p, -1, p)
        assert g == want, (name, x)


def test_divstep_inverse_montgomery(rng):
    p = example_fields()["bls12377"].p
    f = create_field_ops(p, w=13)
    dp = divstep_params(f)
    xs = sample_field_elements(p, 8, rng)
    Xm = f.pack(xs, to_mont=True)
    Zm = jax.jit(lambda a: inv_mont_divstep(dp, a))(Xm)
    got = f.unpack(Zm, from_mont=True)
    for x, g in zip(xs, got):
        if x % p:
            assert g == pow(x % p, -1, p)
