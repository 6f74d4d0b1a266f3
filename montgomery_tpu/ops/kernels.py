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
import threading

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# lanes per grid step; (rows, TILE) blocks with rows = n_limbs (mult of 8 via
# padding inside mosaic; int32 min tile is (8, 128)). 512 keeps the biggest
# kernel (RCB add: 6 in + 3 out + ~40 live intermediates) inside the ~16MB
# scoped-VMEM budget of one TPU core.
TILE = 512

# None = auto (pallas on TPU, inline elsewhere); True/False force.
_FORCE: bool | None = None
# "compiled" | "interpret" | "callback"
#   interpret — Pallas interpreter: tests the kernel wrapper logic on CPU
#   callback  — each fused formula runs as ONE jax.pure_callback op
#               (eager evaluation): keeps the enclosing XLA program tiny.
#               CPU test suites are otherwise compile-bound — a full inline
#               MSM program is ~250k HLO ops and takes 400+ s to compile.
_MODE = "compiled"


class _ThreadState(threading.local):
    """in_kernel must be thread-local: callback-mode formulas evaluate on
    runtime callback threads (one per shard under shard_map) while other
    threads may be tracing."""

    def __init__(self):
        self.in_kernel = False


_TLS = _ThreadState()


def in_kernel() -> bool:
    return _TLS.in_kernel


def use_pallas() -> bool:
    if _TLS.in_kernel:
        return False
    if _FORCE is not None:
        return _FORCE
    return jax.default_backend() == "tpu"


@contextlib.contextmanager
def force_pallas(on: bool | None, interpret: bool = False,
                 callback: bool = False):
    """Test hook: force the pallas path on/off (interpret=True runs kernels
    in the Pallas interpreter; callback=True runs each kernel as a
    pure_callback — see _MODE)."""
    global _FORCE, _MODE
    old, oldm = _FORCE, _MODE
    mode = "compiled"
    if interpret:
        mode = "interpret"
    if callback:
        mode = "callback"
    _FORCE, _MODE = on, mode
    try:
        yield
    finally:
        _FORCE, _MODE = old, oldm


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.lru_cache(maxsize=None)
def _trace_formula(fn, in_rows: tuple):
    """Trace `fn` ONCE at the (rows, TILE) block shape and hoist every
    captured constant (numpy constant planes like p/2p/b3 from FieldOps)
    out of the jaxpr, so they can be passed to pallas_call as explicit
    inputs — pl.pallas_call rejects kernels that close over array
    constants (the round-1 TPU crash)."""
    avals = [jax.ShapeDtypeStruct((r, TILE), jnp.int32) for r in in_rows]
    _TLS.in_kernel = True  # nested fused() calls must inline into this trace
    try:
        closed = jax.make_jaxpr(fn)(*avals)
    finally:
        _TLS.in_kernel = False
    consts = [np.asarray(c) for c in closed.consts]
    return closed.jaxpr, consts


def _pack_const(c: np.ndarray):
    """Constant -> (lane-padded 2-D array, restore_fn). The padded form is a
    legal VMEM block ((rows, >=128)); restore_fn recovers the original
    shape/dtype from the loaded block inside the kernel."""
    shape, dtype = c.shape, c.dtype
    if c.ndim >= 2:
        rows, cols = int(np.prod(shape[:-1])), shape[-1]
    elif c.ndim == 1:
        rows, cols = 1, shape[0]
    else:
        rows, cols = 1, 1
    c2 = c.reshape(rows, cols)
    if dtype == np.bool_:
        c2 = c2.astype(np.int32)
    cols_pad = max(_ceil_to(cols, 128), 128)
    if cols_pad != cols:
        c2 = np.pad(c2, ((0, 0), (0, cols_pad - cols)))

    def restore(v):
        v = v[:, :cols]
        if dtype == np.bool_:
            v = v != 0
        return v.reshape(shape)

    return c2, restore


@functools.lru_cache(maxsize=None)
def _build_call(fn, name: str, in_rows: tuple, out_rows: tuple, n_pad: int,
                interpret: bool):
    """Cached (pallas_call, const_arrays) for a formula at a padded lane
    count. Formula constants ride as extra inputs with grid-invariant
    blocks (index_map -> (0, 0); Mosaic hoists the fetch out of the grid
    loop)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jaxpr, consts = _trace_formula(fn, in_rows)
    packed = [_pack_const(c) for c in consts]
    const_arrays = tuple(p[0] for p in packed)
    restores = [p[1] for p in packed]

    grid = n_pad // TILE
    space = {} if interpret else {"memory_space": pltpu.VMEM}
    n_in, n_c = len(in_rows), len(const_arrays)

    def kernel(*refs):
        ins = refs[:n_in]
        crefs = refs[n_in : n_in + n_c]
        outs = refs[n_in + n_c :]
        cvals = [rest(cr[:]) for cr, rest in zip(crefs, restores)]
        res = jax.core.eval_jaxpr(jaxpr, cvals, *[r[:] for r in ins])
        for o, r in zip(outs, res):
            o[:] = r

    in_specs = [
        pl.BlockSpec((r, TILE), lambda i: (0, i), **space) for r in in_rows
    ]
    in_specs += [
        pl.BlockSpec(c.shape, lambda i: (0, 0), **space) for c in const_arrays
    ]
    out_specs = [
        pl.BlockSpec((r, TILE), lambda i: (0, i), **space) for r in out_rows
    ]
    call = pl.pallas_call(
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
    return call, const_arrays


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
    call, const_arrays = _build_call(
        fn, name, tuple(a.shape[0] for a in flat), tuple(out_rows), n_pad,
        _MODE == "interpret",
    )
    res = call(*flat, *const_arrays)
    if not isinstance(res, (list, tuple)):
        res = (res,)
    outs = [r[:, :N].reshape(r.shape[0], *batch_shape) for r in res]
    return outs


# AOT-compiled callback executables, keyed (formula, in_rows, n_pad).
# Boundedness (round-4 advisor item): formula objects are bound methods of
# MEMOIZED ops instances (utils/memo.py + create_field_ops memoization), so
# the key space is one entry set per distinct (field/curve config, shape) —
# not per constructed instance as before.
_CB_JIT_CACHE: dict = {}
_CB_RUN_LOCK = threading.Lock()


def _callback_jit(formula, in_rows: tuple, n_pad: int):
    """AOT-compiled formula for callback mode: lanes are canonicalized to
    powers of two so ~one executable per formula covers every call site.
    Ahead-of-time lower+compile (not plain jax.jit): callbacks execute on
    runtime threads whose jit trace-context differs from the main thread,
    so a jax.jit object RE-TRACES on every call there (~350 ms per callback
    measured); a compiled executable has no tracing path at all."""
    key = (formula, in_rows, n_pad)
    fn = _CB_JIT_CACHE.get(key)
    if fn is None:

        def wrapped(*args, _formula=formula):
            out = _formula(*args)
            return tuple(out) if isinstance(out, (list, tuple)) else (out,)

        avals = [
            jax.ShapeDtypeStruct((r, n_pad), jnp.int32) for r in in_rows
        ]
        lowered = jax.jit(wrapped).lower(*avals)
        # callback executables exist for CORRECTNESS (CPU test suites); at
        # XLA:CPU's default optimization level a single big field formula
        # takes 15-40 s to compile vs ~2 s at level 0 (measured,
        # .logs/optlevel_probe2.log) — the dominant cost of the old suite.
        opts = None
        import os

        lvl = os.environ.get("MSM_CB_OPT_LEVEL", "0")
        if jax.default_backend() == "cpu" and lvl != "default":
            opts = {"xla_backend_optimization_level": lvl}
        try:
            fn = lowered.compile(compiler_options=opts) if opts else lowered.compile()
        except Exception:
            fn = lowered.compile()
        _CB_JIT_CACHE[key] = fn
    return fn


def _callback_apply(formula, inputs: list, out_rows: list[int]):
    """Run the formula as ONE pure_callback op: a single opaque op at
    compile time; at runtime the callback invokes a jit-compiled version of
    the formula at a canonical lane count."""
    batch = inputs[0].shape[1:]
    result_shapes = tuple(
        jax.ShapeDtypeStruct((r, *batch), jnp.int32) for r in out_rows
    )
    N = int(np.prod(batch)) if batch else 1
    # pad to the next power of two (>= TILE): the shrinking pair-halving
    # rounds then share ~log2 distinct executables per formula instead of
    # one per round size
    n_pad = TILE
    while n_pad < N:
        n_pad <<= 1
    in_rows = tuple(a.shape[0] for a in inputs)
    # AOT-compile NOW (trace time, main thread): compiling inside the
    # callback thread while the outer program executes deadlocks the CPU
    # client (observed hang in windowed-sqrt kernels)
    _TLS.in_kernel = True
    try:
        fn = _callback_jit(formula, in_rows, n_pad)
    finally:
        _TLS.in_kernel = False

    def host_fn(*args, _fn=fn, _N=N, _n_pad=n_pad,
                _in_rows=in_rows, _out_rows=tuple(out_rows), _batch=batch):
        # _CB_RUN_LOCK: under a MULTI-DEVICE CPU mesh (shard_map dryruns /
        # tests) the runtime invokes callbacks concurrently from several
        # partition threads; concurrent entry into the CPU client from
        # callback threads intermittently DEADLOCKS the execution (observed
        # as a hung dryrun with zero CPU progress). Serializing the callback
        # bodies costs nothing single-device and makes the mesh runs
        # deterministic.
        with _CB_RUN_LOCK:
            _TLS.in_kernel = True  # nested fused() calls must run inline
            try:
                flat = [np.asarray(a).reshape(r, _N)
                        for a, r in zip(args, _in_rows)]
                if _n_pad != _N:
                    flat = [
                        np.pad(a, ((0, 0), (0, _n_pad - _N))) for a in flat
                    ]
                out = _fn(*[jnp.asarray(a) for a in flat])
                return tuple(
                    np.asarray(o)[:, :_N].reshape(r, *_batch)
                    for o, r in zip(out, _out_rows)
                )
            finally:
                _TLS.in_kernel = False

    res = jax.pure_callback(host_fn, result_shapes, *inputs)
    return list(res)


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
    if _MODE == "callback":
        # callback mode only matters under tracing (it keeps the traced
        # program small); eager calls run the formula inline directly —
        # routing them through pure_callback + per-formula jit made eager
        # field tests compile one executable per FieldOps instance
        if not any(isinstance(a, jax.core.Tracer) for a in inputs):
            out = formula(*inputs)
            return list(out) if isinstance(out, (list, tuple)) else [out]
        return _callback_apply(formula, list(inputs), list(out_rows))
    return pallas_map(formula, name, list(inputs), list(out_rows))


def mask_to_plane(mask) -> Array:
    """Bool (batch...) mask -> int32 (1, batch...) row plane for kernel I/O."""
    return mask.astype(jnp.int32)[None]


def plane_to_mask(plane: Array):
    """int32 (1, batch...) row plane -> bool (batch...) mask."""
    return plane[0] != 0
