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
    """(n, 2) world coords -> (n, 2) int32 tile coords."""
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


def transform_tile_features(features, z: int, x: int, y: int,
                            extent: int) -> list:
    """Quantize built TFeatures' geometry in a new list of (geometry, ...)
    tuples; point geometry is one (n,2) array, line/polygon geometry a
    list of (n,2) ring arrays (transform.js:11-29)."""
    z2 = 1 << z
    out = []
    for f in features:
        if f.type == 1:
            g = quantize(f.geometry, extent, z2, x, y)
        else:
            g = [quantize(r, extent, z2, x, y) for r in f.geometry]
        out.append((g, f))
    return out
