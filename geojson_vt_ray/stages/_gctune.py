"""Per-worker GC tuning for the geometry hot stages.

The parse/clip/build kernels allocate millions of small Python objects
(Line/PFeature wrappers, tiny ndarrays) with essentially no reference
cycles; CPython's default gen-0 threshold (700) makes the collector
walk them constantly (~10% of stage wall time measured). Each stage
calls ``tune_gc()`` once per worker process from its constructor:
``gc.freeze()`` moves the already-imported world out of collection and
the raised thresholds cut collection frequency ~100x. GC stays ENABLED
(cycles still get reclaimed eventually) so long-lived actors don't
leak.
"""

from __future__ import annotations

import gc

_done = False


def tune_gc() -> None:
    global _done
    if _done:
        return
    _done = True
    gc.freeze()
    gc.set_threshold(100_000, 50, 50)
