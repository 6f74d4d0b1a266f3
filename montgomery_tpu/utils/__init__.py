"""Utilities: phase timing logs, memory watermarks."""

from .memory import device_memory_stats, print_max_size_used
from .timing import PhaseLog, enable_compilation_cache, sync, tic, timeit, toc
