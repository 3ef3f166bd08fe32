"""Douglas–Peucker *marking* pass (M4).

Reference: /root/reference/src/simplify.js. Nothing is deleted here: the
max squared segment distance of each chosen pivot is written into the
vertex's third slot, and later stages thin by comparing that slot against a
per-zoom threshold (src/tile.js:96). Endpoints are forced to 1 by the
caller (src/convert.js:114-116).

The reference recurses; we run an explicit stack. Pivot choice on
equal-distance ties follows src/simplify.js:22-31 (the issue-#104
degenerate-input guard) EXACTLY, including its subtlety: the
closest-to-midpoint distance (`minPosToMid`) is never reset when a new
strict maximum is found, so ties at the final max are judged against a
possibly-stale bound from earlier max levels. Only a sequential scan
reproduces that, so tied ranges always run the scalar loop
(`scalar_pick`); the vectorized distance kernel is used solely when the
range's maximum is attained exactly once, where the subtlety is
unreachable.
"""

from __future__ import annotations

import numpy as np

from . import native as _native


def _sq_seg_dist(px, py, ax, ay, bx, by):
    """Vectorized squared distance from points (px, py) to segment a-b
    (reference kernel: src/simplify.js:42-65)."""
    dx = bx - ax
    dy = by - ay
    denom = dx * dx + dy * dy
    if denom != 0.0:
        t = ((px - ax) * dx + (py - ay) * dy) / denom
        cx = np.where(t > 1.0, bx, np.where(t > 0.0, ax + dx * t, ax))
        cy = np.where(t > 1.0, by, np.where(t > 0.0, ay + dy * t, ay))
    else:
        cx, cy = ax, ay
    ex = px - cx
    ey = py - cy
    return ex * ex + ey * ey


# below this range length the scalar loop beats numpy dispatch overhead
_SCALAR_MAX = 64


def simplify_mark(v: np.ndarray, sq_tolerance: float) -> None:
    """Mark DP squared distances in-place on v[:, 2] for interior vertices.

    v: (n, 3) float64 array; operates on the full range [0, n-1] like the
    reference call simplify(out, 0, last, tolerance) (src/convert.js:115).

    Dispatches to the C kernel (_native.c:gvt_simplify, an exact port of
    the scalar branch below) when available; `GVT_NO_NATIVE=1` or a
    non-contiguous input falls back to this hybrid Python path.

    Hybrid: ranges <= _SCALAR_MAX run the reference's scalar loop 1:1
    (src/simplify.js:4-39, flat-index midpoint tie-break included) —
    DP recursion bottoms out in tiny ranges, where per-call numpy
    dispatch costs ~30us while the scalar loop costs ~1us/vertex. Long
    ranges use the vectorized distance kernel.
    """
    if (_native.LIB is not None and v.dtype == np.float64
            and v.flags.c_contiguous and v.flags.writeable):
        # writeable matters: the C kernel writes through a raw pointer,
        # so a read-only zero-copy Arrow view must take the Python path
        # (which raises loudly instead of corrupting a shared buffer)
        return _native.simplify_mark_native(v, sq_tolerance)
    n = len(v)
    if n < 3:
        return
    xs = v[:, 0]
    ys = v[:, 1]
    fx = xs.tolist()
    fy = ys.tolist()
    def scalar_pick(first: int, last: int) -> tuple[int, float]:
        # exact scalar port of the reference loop (flat offsets: the
        # reference steps i by 3 and measures |i - mid| in the flat
        # array, so tie distance is |3j - floor(3*span/2)|). Note
        # minpos is deliberately NOT reset when a new strict max is
        # found — the reference keeps it stale across max levels
        # (src/simplify.js:7,26-29), which changes the winner among
        # ties at the final max on degenerate inputs.
        span = last - first
        ax = fx[first]
        ay = fy[first]
        bx = fx[last]
        by = fy[last]
        dx0 = bx - ax
        dy0 = by - ay
        denom = dx0 * dx0 + dy0 * dy0
        maxd = sq_tolerance
        mid3 = 3 * first + ((3 * span) >> 1)
        minpos = 3 * span
        pivot = -1
        for i in range(first + 1, last):
            px = fx[i]
            py = fy[i]
            cx = ax
            cy = ay
            if denom != 0.0:
                t = ((px - ax) * dx0 + (py - ay) * dy0) / denom
                if t > 1.0:
                    cx = bx
                    cy = by
                elif t > 0.0:
                    cx = ax + dx0 * t
                    cy = ay + dy0 * t
            ex = px - cx
            ey = py - cy
            d = ex * ex + ey * ey
            if d > maxd:
                pivot = i
                maxd = d
            elif d == maxd:
                pos = abs(3 * i - mid3)
                if pos < minpos:
                    pivot = i
                    minpos = pos
        return pivot, maxd

    stack = [(0, n - 1)]
    while stack:
        first, last = stack.pop()
        span = last - first
        if span < 2:
            continue

        if span <= _SCALAR_MAX:
            pivot, maxd = scalar_pick(first, last)
        else:
            d = _sq_seg_dist(xs[first + 1:last], ys[first + 1:last],
                             xs[first], ys[first], xs[last], ys[last])
            dmax = d.max()
            if dmax <= sq_tolerance:
                continue
            if int((d == dmax).sum()) == 1:
                # unique max: later == events cannot override it, so
                # the stale-minpos subtlety is unreachable
                pivot, maxd = first + 1 + int(np.argmax(d)), float(dmax)
            else:
                # tied max (degenerate collinear/duplicate geometry):
                # only the sequential loop reproduces the reference's
                # stale-minpos tie-break exactly — rerun the range
                pivot, maxd = scalar_pick(first, last)

        if maxd > sq_tolerance and pivot >= 0:
            v[pivot, 2] = maxd
            # push right first so the left interval is processed first,
            # matching the reference's in-order recursion
            if last - pivot > 1:
                stack.append((pivot, last))
            if pivot - first > 1:
                stack.append((first, pivot))
