"""Per-worker GC + allocator tuning for the geometry hot stages.

The parse/clip/build kernels allocate millions of small Python objects
(Line/PFeature wrappers, tiny ndarrays) with essentially no reference
cycles; CPython's default gen-0 threshold (700) makes the collector
walk them constantly (~10% of stage wall time measured). Each stage
calls ``tune_gc()`` once per worker process from its constructor:
``gc.freeze()`` moves the already-imported world out of collection and
the raised thresholds cut collection frequency ~100x. GC stays ENABLED
(cycles still get reclaimed eventually) so long-lived actors don't
leak.

The mallopt tuning targets a measured pathology: the deferred-quantize
scratch arrays in big batches exceed glibc's M_MMAP_THRESHOLD dynamic
cap (32 MiB on 64-bit), so EVERY batch mmap()s, first-touch
page-faults, and munmap()s tens of MB — and on shared VMs a fault storm
can cost seconds per batch. Raising the threshold keeps big blocks on
the brk heap, and disabling trim keeps those pages faulted-in for
reuse, so the steady state allocates hot memory only once per worker.
"""

from __future__ import annotations

import ctypes
import gc
import os

_done = False

_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3


def tune_gc() -> None:
    global _done
    if _done:
        return
    _done = True
    gc.freeze()
    gc.set_threshold(100_000, 50, 50)
    if os.environ.get("GVT_NO_MALLOPT"):
        return
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        libc.mallopt(_M_MMAP_THRESHOLD, 1 << 30)
        # trim threshold 64 MiB, not unbounded: still amortizes the
        # per-batch mmap/fault/munmap churn, but bounds how much idle
        # heap a long-lived pooled worker retains (32 workers x 64 MiB
        # worst case, vs. peak-forever with trim disabled)
        libc.mallopt(_M_TRIM_THRESHOLD, 64 << 20)
    except Exception:
        pass  # non-glibc platform: skip, pure perf tweak
