"""Axis-aligned stripe clipping with buffer (K1).

Reference: /root/reference/src/clip.js. Clips a feature list to the slab
``k1 <= coord[axis] <= k2`` one axis at a time. Per-feature bbox trivial
accept/reject (clip.js:30-35); lines split into slices with interpolated
entry/exit points whose sqdist slot is forced to 1 (clip.js:190-200);
polygon rings are re-closed when clipping opened them (clip.js:160-164);
Multi* types demote when a single part survives (clip.js:69-79).

Unlike the reference's per-segment scalar loop, each Line is clipped with
vectorized segment classification: every vertex/segment's emissions
(kept vertex, entry intersection, exit intersection) are computed as
numpy arrays and assembled by boolean compaction; slice boundaries fall
out of the exit-event positions. Semantics (emission order per segment:
entry-or-vertex first, then exit) match the reference exactly.
"""

from __future__ import annotations

import numpy as np

from .geom import (GT_LINESTRING, GT_MULTILINESTRING, GT_MULTIPOINT,
                   GT_MULTIPOLYGON, GT_POINT, GT_POLYGON, Line, PFeature,
                   create_feature)


def clip_points(line: Line, k1: float, k2: float, axis: int) -> Line | None:
    a = line.v[:, axis]
    mask = (a >= k1) & (a <= k2)
    if not mask.any():
        return None
    return Line(line.v[mask].copy())


# below this run length the scalar loop (exact port of clip.js:98-170)
# beats the vectorized kernel's numpy dispatch overhead
_SCALAR_MAX = 48


def _clip_line_scalar(line: Line, k1: float, k2: float, axis: int,
                      is_polygon: bool, track_metrics: bool) -> list[Line]:
    """1:1 scalar port of the reference clipLine (src/clip.js:98-170):
    identical emission order (entry-or-vertex, then exit), identical
    float arithmetic for intersections and lineMetrics."""
    from math import sqrt

    v = line.v
    n = len(v)
    if n == 0:
        return []
    vx = v[:, 0].tolist()
    vy = v[:, 1].tolist()
    vz = v[:, 2].tolist()

    out: list[Line] = []
    pts: list[float] = []
    sl_start = line.start
    sl_end = line.end
    length = line.start
    seg_len = 0.0
    t = 0.0

    for i in range(n - 1):
        ax = vx[i]
        ay = vy[i]
        az = vz[i]
        bx = vx[i + 1]
        by = vy[i + 1]
        a = ax if axis == 0 else ay
        b = bx if axis == 0 else by
        exited = False

        if track_metrics:
            seg_len = sqrt((ax - bx) * (ax - bx) + (ay - by) * (ay - by))

        if a < k1:
            if b > k1:  # enters from the left
                t = (k1 - a) / (b - a)
                if axis == 0:
                    pts += (k1, ay + (by - ay) * t, 1.0)
                else:
                    pts += (ax + (bx - ax) * t, k1, 1.0)
                if track_metrics:
                    sl_start = length + seg_len * t
        elif a > k2:
            if b < k2:  # enters from the right
                t = (k2 - a) / (b - a)
                if axis == 0:
                    pts += (k2, ay + (by - ay) * t, 1.0)
                else:
                    pts += (ax + (bx - ax) * t, k2, 1.0)
                if track_metrics:
                    sl_start = length + seg_len * t
        else:
            pts += (ax, ay, az)
        if b < k1 and a >= k1:  # exits to the left
            t = (k1 - a) / (b - a)
            if axis == 0:
                pts += (k1, ay + (by - ay) * t, 1.0)
            else:
                pts += (ax + (bx - ax) * t, k1, 1.0)
            exited = True
        if b > k2 and a <= k2:  # exits to the right
            t = (k2 - a) / (b - a)
            if axis == 0:
                pts += (k2, ay + (by - ay) * t, 1.0)
            else:
                pts += (ax + (bx - ax) * t, k2, 1.0)
            exited = True

        if not is_polygon and exited:
            sl = line.copy_meta(
                np.asarray(pts, dtype=np.float64).reshape(-1, 3))
            sl.start = sl_start
            if track_metrics:
                sl.end = length + seg_len * t
            else:
                sl.end = line.end
            out.append(sl)
            pts = []
            sl_start = line.start
            sl_end = line.end

        if track_metrics:
            length += seg_len

    # last point
    ax = vx[n - 1]
    ay = vy[n - 1]
    a = ax if axis == 0 else ay
    if k1 <= a <= k2:
        pts += (ax, ay, vz[n - 1])

    # close the polygon if clipping separated its endpoints
    if is_polygon and len(pts) >= 6 and (pts[-3] != pts[0]
                                         or pts[-2] != pts[1]):
        pts += (pts[0], pts[1], pts[2])

    if pts:
        sl = line.copy_meta(np.asarray(pts, dtype=np.float64).reshape(-1, 3))
        sl.start = sl_start
        sl.end = sl_end
        out.append(sl)
    return out


def _clip_line_py(line: Line, k1: float, k2: float, axis: int,
                  is_polygon: bool, track_metrics: bool) -> list[Line]:
    """Pure-Python clip_line (scalar port + vectorized path); kept as the
    no-gcc fallback and the parity baseline for the C kernel."""
    v = line.v
    n = len(v)
    if n == 0:
        return []
    if n <= _SCALAR_MAX:
        return _clip_line_scalar(line, k1, k2, axis, is_polygon,
                                 track_metrics)
    coord = v[:, axis]
    in_range = (coord >= k1) & (coord <= k2)
    if n == 1:
        return [line.copy_meta(v.copy())] if in_range[0] else []

    a = coord[:-1]
    b = coord[1:]
    # entry events per segment (a outside, crossing in): slot 0
    enter_lo = (a < k1) & (b > k1)
    enter_hi = (a > k2) & (b < k2)
    # exit events per segment (b outside, crossing out): slot 1
    exit_lo = (b < k1) & (a >= k1)
    exit_hi = (b > k2) & (a <= k2)
    enter_any = enter_lo | enter_hi
    exit_any = exit_lo | exit_hi

    if not enter_any.any() and not exit_any.any():
        if in_range[0]:
            # fully inside: one slice, values copied verbatim — but the
            # scalar port still re-closes an open polygon ring, so match it
            if is_polygon and (v[-1, 0] != v[0, 0] or v[-1, 1] != v[0, 1]):
                return [line.copy_meta(
                    np.concatenate([v, v[0:1]], axis=0))]
            return [line.copy_meta(v.copy())]
        return []  # fully outside

    # interpolation parameters t for entry/exit (clip.js:190-200)
    other = v[:, 1 - axis]
    ao, bo = other[:-1], other[1:]
    with np.errstate(divide="ignore", invalid="ignore"):
        k_enter = np.where(enter_lo, k1, k2)
        t_enter = (k_enter - a) / (b - a)
        k_exit = np.where(exit_lo, k1, k2)
        t_exit = (k_exit - a) / (b - a)
        o_enter = ao + (bo - ao) * t_enter
        o_exit = ao + (bo - ao) * t_exit

    m = n - 1
    # emission slots: for segment i -> slot 2i (entry-intersect XOR kept
    # vertex i) and slot 2i+1 (exit intersect); final vertex -> slot 2m
    nslots = 2 * m + 1
    present = np.zeros(nslots, dtype=bool)
    px = np.zeros(nslots)
    py = np.zeros(nslots)
    pz = np.zeros(nslots)

    slot0_vertex = in_range[:-1]  # a in range -> vertex emitted
    present[0:2 * m:2] = slot0_vertex | enter_any
    present[1:2 * m:2] = exit_any
    present[2 * m] = in_range[n - 1]

    # slot-0 values: vertex when in range else entry intersection
    if axis == 0:
        sx0 = np.where(slot0_vertex, v[:-1, 0], k_enter)
        sy0 = np.where(slot0_vertex, v[:-1, 1], o_enter)
        sx1 = k_exit
        sy1 = o_exit
    else:
        sx0 = np.where(slot0_vertex, v[:-1, 0], o_enter)
        sy0 = np.where(slot0_vertex, v[:-1, 1], k_enter)
        sx1 = o_exit
        sy1 = k_exit
    sz0 = np.where(slot0_vertex, v[:-1, 2], 1.0)
    px[0:2 * m:2] = sx0
    py[0:2 * m:2] = sy0
    pz[0:2 * m:2] = sz0
    px[1:2 * m:2] = sx1
    py[1:2 * m:2] = sy1
    pz[1:2 * m:2] = 1.0
    px[2 * m] = v[n - 1, 0]
    py[2 * m] = v[n - 1, 1]
    pz[2 * m] = v[n - 1, 2]

    keep = np.flatnonzero(present)
    out = np.empty((len(keep), 3), dtype=np.float64)
    out[:, 0] = px[keep]
    out[:, 1] = py[keep]
    out[:, 2] = pz[keep]

    if is_polygon:
        # single slice; re-close if clipping separated the endpoints
        if len(out) == 0:
            return []
        last = len(out) - 1
        if last >= 1 and (out[last, 0] != out[0, 0] or out[last, 1] != out[0, 1]):
            out = np.concatenate([out, out[0:1]], axis=0)
        return [line.copy_meta(out)]

    # line: break a slice after each exit event (clip.js:143-147)
    if track_metrics:
        seg_dx = v[1:, 0] - v[:-1, 0]
        seg_dy = v[1:, 1] - v[:-1, 1]
        seg_len = np.sqrt(seg_dx * seg_dx + seg_dy * seg_dy)
        # seed the cumsum with line.start so the float64 association is
        # ((start + s0) + s1) + ... — bit-identical to the scalar path's
        # running `length += seg_len` (and to the C kernel)
        len_before = np.cumsum(np.concatenate(([line.start], seg_len)))[:-1]

    # position (in compacted coords) just after each slot
    after = np.cumsum(present)
    exit_slots = np.flatnonzero(exit_any)  # segment indices with an exit
    breaks = after[2 * exit_slots + 1]  # compacted offset after the exit pt
    bounds = np.concatenate(([0], breaks, [len(out)]))

    slices: list[Line] = []
    enter_segs = np.flatnonzero(enter_any)
    for si in range(len(bounds) - 1):
        lo, hi = bounds[si], bounds[si + 1]
        if hi <= lo:
            continue
        sl = line.copy_meta(out[lo:hi].copy())
        if track_metrics:
            # start: first entry event inside this slice (clip.js:121,127).
            # An entry on the same segment as the previous slice's exit
            # belongs to the previous slice (slot order), hence the
            # strict lower bound.
            lo_seg = -1 if si == 0 else exit_slots[si - 1]
            hi_seg = exit_slots[si] if si < len(exit_slots) else m
            ent = enter_segs[(enter_segs > lo_seg) & (enter_segs <= hi_seg)]
            if len(ent):
                j = ent[0]
                sl.start = len_before[j] + seg_len[j] * t_enter[j]
            if si < len(exit_slots):
                j = exit_slots[si]
                sl.end = len_before[j] + seg_len[j] * t_exit[j]
        slices.append(sl)
    return slices


from . import native as _native  # noqa: E402  (needs Line defined above via geom)

if _native.LIB is not None:
    clip_line = _native.clip_line_native
else:  # pragma: no cover - exercised via GVT_NO_NATIVE parity tests
    clip_line = _clip_line_py


def clip_feature(feature: PFeature, k1: float, k2: float, axis: int,
                 line_metrics: bool) -> list[PFeature]:
    """Clip one feature; returns 0..n features (n > 1 only when
    line_metrics splits a LineString, clip.js:62-67)."""
    fmin = feature.minx if axis == 0 else feature.miny
    fmax = feature.maxx if axis == 0 else feature.maxy
    if fmin >= k1 and fmax < k2:  # trivial accept (clip.js:30-32)
        return [feature]
    if fmax < k1 or fmin >= k2:  # trivial reject (clip.js:33-35)
        return []

    gtype = feature.gtype
    g = feature.geometry

    if gtype in (GT_POINT, GT_MULTIPOINT):
        ln = clip_points(g, k1, k2, axis)
        if ln is None:
            return []
        new_type = GT_POINT if len(ln) == 1 else GT_MULTIPOINT
        return [create_feature(feature.fid, new_type, ln, feature.tags,
                               like=feature)]

    if gtype == GT_LINESTRING:
        slices = clip_line(g, k1, k2, axis, False, line_metrics)
        if not slices:
            return []
        if line_metrics:
            outs = []
            for i, sl in enumerate(slices):
                nf = create_feature(feature.fid, GT_LINESTRING, sl,
                                    feature.tags, like=feature)
                # distinct ordering keys for the split rows (SURVEY §2.6)
                nf.okey = feature.okey + i.to_bytes(4, "big")
                outs.append(nf)
            return outs
        if len(slices) == 1:
            return [create_feature(feature.fid, GT_LINESTRING, slices[0],
                                   feature.tags, like=feature)]
        return [create_feature(feature.fid, GT_MULTILINESTRING, slices,
                               feature.tags, like=feature)]

    if gtype == GT_MULTILINESTRING:
        slices = []
        for ln in g:
            slices.extend(clip_line(ln, k1, k2, axis, False, False))
        if not slices:
            return []
        new_type = GT_LINESTRING if len(slices) == 1 else GT_MULTILINESTRING
        geom = slices[0] if new_type == GT_LINESTRING else slices
        return [create_feature(feature.fid, new_type, geom, feature.tags,
                               like=feature)]

    if gtype == GT_POLYGON:
        rings = []
        for ln in g:
            rings.extend(clip_line(ln, k1, k2, axis, True, False))
        if not rings:
            return []
        return [create_feature(feature.fid, GT_POLYGON, rings, feature.tags,
                               like=feature)]

    if gtype == GT_MULTIPOLYGON:
        polys = []
        for poly in g:
            rings = []
            for ln in poly:
                rings.extend(clip_line(ln, k1, k2, axis, True, False))
            if rings:
                polys.append(rings)
        if not polys:
            return []
        return [create_feature(feature.fid, GT_MULTIPOLYGON, polys,
                               feature.tags, like=feature)]

    raise AssertionError(f"unknown geometry type code {gtype}")


def clip_features(features: list[PFeature], scale: float, k1: float,
                  k2: float, axis: int, min_all: float, max_all: float,
                  line_metrics: bool = False) -> list[PFeature] | None:
    """List-level clip with global trivial accept/reject (clip.js:14-21).

    Returns the *same list object* on trivial accept and None on trivial
    reject / empty result, mirroring the reference's contract."""
    k1 = k1 / scale
    k2 = k2 / scale
    if min_all >= k1 and max_all < k2:
        return features
    if max_all < k1 or min_all >= k2:
        return None
    clipped: list[PFeature] = []
    for f in features:
        clipped.extend(clip_feature(f, k1, k2, axis, line_metrics))
    return clipped if clipped else None
