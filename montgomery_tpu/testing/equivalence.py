"""jax <-> bigint equivalence harness.

Analog of the reference's WasmSpec equivalence harness
(src/testing/equivalent-wasm.ts:97-144): pack python ints into limb planes,
run the jitted kernel, unpack, and compare against the oracle mod p.
"""

from __future__ import annotations

import numpy as np

from ..ops import limbs as codec
from ..ops.field import FieldOps


def run_unop(ops: FieldOps, fn, xs, from_mont=False):
    """Apply a (n,N)->(n,N) kernel to packed xs; return python ints mod p."""
    X = codec.pack(xs, ops.mp)
    out = np.asarray(fn(X))
    if from_mont:
        import jax.numpy as jnp

        out = np.asarray(ops.from_montgomery(jnp.asarray(out)))
    return [v % ops.p for v in codec.unpack(out, ops.mp)]


def run_binop(ops: FieldOps, fn, xs, ys):
    X = codec.pack(xs, ops.mp)
    Y = codec.pack(ys, ops.mp)
    return [v % ops.p for v in codec.unpack(np.asarray(fn(X, Y)), ops.mp)]


def assert_in_range(ops: FieldOps, arr, hi: int, label: str = ""):
    """Assert every element of a limb array represents a value in [0, hi)."""
    vals = codec.unpack(np.asarray(arr), ops.mp)
    bad = [v for v in vals if not (0 <= v < hi)]
    assert not bad, f"{label}: {len(bad)} values out of [0, {hi}): max={max(bad):x}"
