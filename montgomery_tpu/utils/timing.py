"""Phase timing utilities (analog of reference msm-common.ts createLog
:176-214 and testing/tictoc.ts): tic/toc pairs collected into a log list so
pipeline phases can be reported after the fact."""

from __future__ import annotations

import time
from contextlib import contextmanager


class PhaseLog:
    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.entries: list[tuple[str, float]] = []
        self._stack: list[tuple[str, float]] = []

    def tic(self, label: str):
        if self.enabled:
            self._stack.append((label, time.perf_counter()))

    def toc(self):
        if self.enabled and self._stack:
            label, t0 = self._stack.pop()
            self.entries.append((label, time.perf_counter() - t0))

    @contextmanager
    def phase(self, label: str):
        self.tic(label)
        try:
            yield
        finally:
            self.toc()

    def report(self) -> str:
        total = sum(t for _, t in self.entries)
        lines = [f"{label:<32s} {t * 1e3:9.2f} ms" for label, t in self.entries]
        lines.append(f"{'total':<32s} {total * 1e3:9.2f} ms")
        return "\n".join(lines)


def tic():
    return time.perf_counter()


def toc(t0: float) -> float:
    return time.perf_counter() - t0


def sync(tree) -> None:
    """Force completion of every computation `tree` depends on.

    jax.block_until_ready does not actually block on some remote platforms
    (observed on the axon TPU tunnel: it returns immediately while the device
    queue keeps executing). Fetching a single element to the host is a true
    barrier — the transfer cannot complete before the producing executable
    finishes — and moves only a few bytes over the (slow) tunnel.

    Only ONE leaf is fetched: outputs of a single jitted call all complete
    together (one executable), and each fetch costs a full tunnel round trip
    (~27 ms measured) — fetching every leaf of a 3-plane point batch was
    adding ~80 ms of pure measurement bias to every timing."""
    import jax
    import numpy as np

    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "ndim"):
            np.asarray(leaf[(0,) * leaf.ndim])
            return


def timeit(fn, *args, reps: int = 5, warmup: int = 2, inner: int = 1) -> float:
    """Median wall time of fn(*args) with true device sync (see sync()).

    `inner` > 1 enqueues that many back-to-back async dispatches per rep and
    syncs once, amortizing the ~27 ms tunnel round trip of the sync fetch
    over `inner` executions (JAX async dispatch pipelines the executions)."""
    import numpy as np

    for _ in range(warmup):
        sync(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = None
        for _ in range(inner):
            out = fn(*args)
        sync(out)
        ts.append((time.perf_counter() - t0) / inner)
    return float(np.median(ts))


def enable_compilation_cache(path: str | None = None) -> None:
    """Enable JAX's persistent compilation cache (kernels here are
    compile-heavy; Mosaic compiles of the fused ladder/group kernels take
    tens of seconds and must be paid once per machine, not per process)."""
    import os

    import jax

    if path is None:
        path = os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(path))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
