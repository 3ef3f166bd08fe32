"""Web-Mercator projection to [0, 1] world coordinates (M1).

Reference: /root/reference/src/convert.js:131-139. projectY clamps to
[0, 1] so poles at |lat| >= ~85.05 land exactly on the edges
(exercised by collection.json's MultiPoint at lat ±90).
"""

from __future__ import annotations

import math

import numpy as np


def project_x(lng):
    return np.asarray(lng, dtype=np.float64) / 360.0 + 0.5


def _libm_log(arr: np.ndarray) -> np.ndarray:
    """Scalar libm log. numpy's SIMD np.log diverges from libm (and V8's
    fdlibm-derived Math.log) by 1 ulp on ~20% of inputs, which breaks
    bit-exact golden parity for lineMetrics fractions; math.log matches V8
    on every sampled input. np.sin has no such divergence (measured over
    2e5 samples), so only log pays the scalar loop."""
    out = np.empty(len(arr), dtype=np.float64)
    log = math.log
    vals = arr.tolist()
    for i, v in enumerate(vals):
        if v > 0.0 and v != math.inf:
            out[i] = log(v)
        elif v == 0.0:
            out[i] = -math.inf
        elif v == math.inf:
            out[i] = math.inf
        else:
            out[i] = math.nan
    return out


def project_y(lat):
    a = np.asarray(lat, dtype=np.float64)
    scalar = a.ndim == 0
    a = np.atleast_1d(a)
    s = np.sin(a * (math.pi / 180.0))
    with np.errstate(divide="ignore", invalid="ignore"):
        y = 0.5 - 0.25 * _libm_log((1.0 + s) / (1.0 - s)) / math.pi
    # lat=90 -> log(inf)=inf -> y=-inf -> clamp 0; lat=-90 -> log(0) -> 1
    y = np.clip(y, 0.0, 1.0)
    return float(y[0]) if scalar else y
