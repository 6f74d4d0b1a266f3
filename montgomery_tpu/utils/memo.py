"""Constructor memoization for ops classes.

Ops instances (field / curve / group) are immutable apart from their
compiled-formula caches; memoizing construction per argument tuple means
every caller on the same (field, params) shares ONE set of compiled
executables — the analog of the reference sharing one wasm module per field
across curves and threads (parallel.ts:51-53). This also bounds the
process-global kernel caches (ops/kernels.py) to one entry set per distinct
configuration instead of one per constructed instance.
"""

from __future__ import annotations

_CACHE: dict = {}


class MemoizedOps:
    """Base class: `Cls(*args)` returns the cached instance for identical
    (hashable) args. Subclass __init__ must guard re-init via _ops_ready."""

    def __new__(cls, *args, **kwargs):
        key = (cls, args, tuple(sorted(kwargs.items())))
        inst = _CACHE.get(key)
        if inst is None:
            inst = super().__new__(cls)
            _CACHE[key] = inst
        return inst


def ready(obj) -> bool:
    """True if __init__ already ran for this memoized instance (and marks it)."""
    if getattr(obj, "_ops_ready", False):
        return True
    obj._ops_ready = True
    return False
