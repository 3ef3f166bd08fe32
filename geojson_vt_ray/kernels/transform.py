"""Tile-space quantization (M9).

Reference: /root/reference/src/transform.js:37-41 —
``Math.round(extent * (x * z2 - tx))``. JS Math.round is floor(x + 0.5)
(round-half-up, so -0.5 -> -0 == 0), NOT banker's rounding; numpy's
``np.round`` would diverge on exact halves, hence the explicit
floor(v + 0.5) (SURVEY.md §7 "hard parts": fixtures contain -64 buffer
edges that depend on this).
"""

from __future__ import annotations

import numpy as np


def quantize(arr: np.ndarray, extent: int, z2: int, tx: int,
             ty: int) -> np.ndarray:
    """(n, 2) world coords -> (n, 2) int32 tile coords.

    Canonical reference-parity kernel. The hot paths inline the SAME
    float64 op order (extent * (v * z2 - t), floor(+0.5)) over whole
    tiles at once — stages/build.py TileRowAccum (deferred quantize)
    and local_index.py tile_to_json — and the golden conformance suite
    pins their output byte-exactly; change one, change all three."""
    n = len(arr)
    if n <= 32:
        # scalar path: same floor(v + 0.5) arithmetic, no numpy dispatch
        from math import floor
        flat = arr.reshape(-1).tolist()
        out = np.empty((n, 2), dtype=np.int32)
        o = out.reshape(-1)
        for i in range(n):
            o[2 * i] = floor(extent * (flat[2 * i] * z2 - tx) + 0.5)
            o[2 * i + 1] = floor(extent * (flat[2 * i + 1] * z2 - ty) + 0.5)
        return out
    out = np.empty_like(arr)
    out[:, 0] = extent * (arr[:, 0] * z2 - tx)
    out[:, 1] = extent * (arr[:, 1] * z2 - ty)
    return np.floor(out + 0.5).astype(np.int32)
