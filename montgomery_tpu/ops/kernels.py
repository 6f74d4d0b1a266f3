"""Pallas TPU kernel wrapper: run batched limb-plane formulas as ONE fused
Mosaic kernel per call site.

Why this layer exists (compile-time + runtime): the field/group formulas are
big elementwise dataflows (~2-5k scalar ops per lane). Inlined into XLA HLO
they are re-optimized at EVERY instantiation — a Pippenger MSM program holds
~30 group-op instantiations and XLA compile time blows past 10 minutes
(measured: 80k-134k HLO lines -> 350-675 s on CPU, >20 min via the TPU
remote-compile path). Wrapped in `pl.pallas_call`, each call site is a single
custom call; Mosaic compiles each distinct (formula, shape) once and its
VMEM-resident dataflow is also the right runtime shape (no HBM spills between
carry stages).

This is the TPU analog of the reference's Wasm kernel layer: wasmati-generated
field/curve kernels (src/wasm/*.ts) become Pallas-wrapped limb-plane formulas.
The formula code itself stays ordinary jnp (ops/field.py, curves/*) and runs
in three modes: inline XLA (CPU tests), Pallas compiled (TPU), Pallas
interpret (kernel-logic tests on CPU).
"""

from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# lanes per grid step; (rows, TILE) blocks with rows = n_limbs (mult of 8 via
# padding inside mosaic; int32 min tile is (8, 128))
TILE = 1024

# None = auto (pallas on TPU, inline elsewhere); True/False force.
_FORCE: bool | None = None
# "compiled" | "interpret" — interpret used by CPU tests of kernel logic
_MODE = "compiled"
_IN_KERNEL = False


def use_pallas() -> bool:
    if _IN_KERNEL:
        return False
    if _FORCE is not None:
        return _FORCE
    return jax.default_backend() == "tpu"


@contextlib.contextmanager
def force_pallas(on: bool | None, interpret: bool = False):
    """Test hook: force the pallas path on/off (interpret=True runs kernels
    in the Pallas interpreter so kernel logic is testable on CPU)."""
    global _FORCE, _MODE
    old, oldm = _FORCE, _MODE
    _FORCE, _MODE = on, ("interpret" if interpret else "compiled")
    try:
        yield
    finally:
        _FORCE, _MODE = old, oldm


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.lru_cache(maxsize=None)
def _build_call(fn, name: str, in_rows: tuple, out_rows: tuple, n_pad: int,
                interpret: bool):
    """Cached pallas_call for a formula at a padded lane count."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid = n_pad // TILE
    space = {} if interpret else {"memory_space": pltpu.VMEM}

    def kernel(*refs):
        global _IN_KERNEL
        ins = refs[: len(in_rows)]
        outs = refs[len(in_rows) :]
        _IN_KERNEL = True
        try:
            res = fn(*[r[:] for r in ins])
        finally:
            _IN_KERNEL = False
        if not isinstance(res, (list, tuple)):
            res = (res,)
        for o, r in zip(outs, res):
            o[:] = r

    in_specs = [
        pl.BlockSpec((r, TILE), lambda i: (0, i), **space) for r in in_rows
    ]
    out_specs = [
        pl.BlockSpec((r, TILE), lambda i: (0, i), **space) for r in out_rows
    ]
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=tuple(out_specs) if len(out_specs) > 1 else out_specs[0],
        out_shape=tuple(
            jax.ShapeDtypeStruct((r, n_pad), jnp.int32) for r in out_rows
        )
        if len(out_rows) > 1
        else jax.ShapeDtypeStruct((out_rows[0], n_pad), jnp.int32),
        interpret=interpret,
        name=name,
    )


def pallas_map(fn, name: str, inputs: list, out_rows: list[int]):
    """Apply `fn` (a pure jnp formula on int32 (rows, B) arrays, returning a
    list of (out_rows_j, B) arrays) over the shared trailing batch of
    `inputs`, tiled into (rows, TILE) VMEM blocks.

    Inputs may have any batch rank; batch dims are flattened, padded to a
    TILE multiple (zero fill — formulas must tolerate zero lanes), and
    restored on the outputs."""
    batch_shape = inputs[0].shape[1:]
    N = int(np.prod(batch_shape)) if batch_shape else 1
    flat = [a.reshape(a.shape[0], N) for a in inputs]
    n_pad = max(_ceil_to(N, TILE), TILE)
    if n_pad != N:
        flat = [
            jnp.concatenate(
                [a, jnp.zeros((a.shape[0], n_pad - N), jnp.int32)], axis=-1
            )
            for a in flat
        ]
    call = _build_call(
        fn, name, tuple(a.shape[0] for a in flat), tuple(out_rows), n_pad,
        _MODE == "interpret",
    )
    res = call(*flat)
    if not isinstance(res, (list, tuple)):
        res = (res,)
    outs = [r[:, :N].reshape(r.shape[0], *batch_shape) for r in res]
    return outs


def fused(name: str, formula, inputs: list, out_rows: list[int]):
    """Run `formula` (pure lane-wise jnp function: int32 (rows, B) arrays ->
    list of int32 (out_rows_j, B) arrays) as ONE Pallas kernel on TPU, or
    inline on other backends / inside an enclosing kernel.

    `formula` MUST be a stable object (module function / cached bound
    closure) so the pallas_call cache hits; it must tolerate zero-filled
    padding lanes (outputs there are discarded)."""
    if not use_pallas():
        out = formula(*inputs)
        return list(out) if isinstance(out, (list, tuple)) else [out]
    return pallas_map(formula, name, list(inputs), list(out_rows))


def mask_to_plane(mask) -> Array:
    """Bool (batch...) mask -> int32 (1, batch...) row plane for kernel I/O."""
    return mask.astype(jnp.int32)[None]


def plane_to_mask(plane: Array):
    """int32 (1, batch...) row plane -> bool (batch...) mask."""
    return plane[0] != 0
