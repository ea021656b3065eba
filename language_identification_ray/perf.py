"""Process-level performance tuning for worker processes.

This sandbox's host (gVisor-style virtualization) makes *fresh* page faults
very expensive (~100x RAM speed on first touch) while steady-state compute is
native speed.  glibc returns large (>128 KiB) allocations to the OS on free,
so every numpy temporary in a hot batch loop re-faults its pages — and under
a 30-actor pool those faults contend and roughly double per-task wall time
(measured: 1.0 core-ms/doc at 6 actors vs 2.0 at 30).

``tune_malloc()`` raises the mmap + trim thresholds so big allocations are
served from the (already-faulted) sbrk heap and reused.  Call it once per
worker process — stage ``__init__`` is the natural place.  No-op off glibc.
"""

from __future__ import annotations

_done = False


def tune_malloc(threshold_bytes: int = 1 << 30) -> bool:
    """mallopt(M_MMAP_THRESHOLD / M_TRIM_THRESHOLD, 1 GiB); idempotent."""
    global _done
    if _done:
        return True
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        libc.mallopt(-3, threshold_bytes)  # M_MMAP_THRESHOLD
        libc.mallopt(-1, threshold_bytes)  # M_TRIM_THRESHOLD
        _done = True
        return True
    except Exception:
        return False
