"""Device memory watermark reporting.

TPU analog of the reference's allocator watermarks
(memory-helpers.ts:266-276 printMaxSizeUsed): per-device live/peak bytes from
the JAX runtime, formatted like the reference's MB + percentage report.
"""

from __future__ import annotations

import jax


def device_memory_stats(device=None) -> dict:
    """Raw memory_stats() of a device ({} where unsupported, e.g. CPU)."""
    d = device or jax.devices()[0]
    try:
        return d.memory_stats() or {}
    except Exception:
        return {}


def print_max_size_used(device=None, log=print) -> str:
    """One-line watermark report: peak/limit bytes and percentage."""
    st = device_memory_stats(device)
    if not st:
        # backends without memory_stats (e.g. the axon tunnel): report the
        # LIVE device-array footprint as a lower bound on the watermark
        live = sum(
            a.nbytes for a in jax.live_arrays() if hasattr(a, "nbytes")
        )
        msg = (
            f"device memory: peak stats unavailable on this backend; "
            f"live arrays {live / 2**20:.0f} MB (lower bound)"
        )
        log(msg)
        return msg
    peak = st.get("peak_bytes_in_use", 0)
    live = st.get("bytes_in_use", 0)
    limit = st.get("bytes_limit", 0) or 1
    msg = (
        f"device memory: live {live / 2**20:.0f} MB, "
        f"peak {peak / 2**20:.0f} MB = {100 * peak / limit:.0f}% "
        f"of {limit / 2**30:.1f} GB"
    )
    log(msg)
    return msg
