"""Per-process worker-environment tuning shared by the Arrow kernels.

Lives outside any operator module: both the kNN and the similarity
kernels need it, and it is process-level infrastructure, not operator
logic.
"""

from __future__ import annotations

_malloc_tuned = False


def tune_malloc() -> None:
    """Raise glibc's mmap/trim thresholds in THIS process (each Python
    worker) so the multi-MB NumPy scratch arrays of the vectorized
    kernels are reused from the heap instead of mmap'd and returned per
    batch. Without this, 32 concurrent workers spend most of their time
    in kernel page-zeroing + cross-core TLB shootdowns (measured: ~28
    of 32 cores in system time, and local[32] SLOWER than local[8])."""
    global _malloc_tuned
    if _malloc_tuned:
        return
    _malloc_tuned = True
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6")
        libc.mallopt(-3, 512 * 1024 * 1024)  # M_MMAP_THRESHOLD
        libc.mallopt(-1, 512 * 1024 * 1024)  # M_TRIM_THRESHOLD
    except Exception:
        pass
