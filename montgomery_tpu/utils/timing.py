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
