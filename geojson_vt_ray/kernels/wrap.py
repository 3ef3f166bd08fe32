"""Antimeridian wrapping (K2).

Reference: /root/reference/src/wrap.js. Clip world copies at
[-1-b, b] and [1-b, 2+b] (b = buffer/extent); if either is non-empty,
re-clip the center to [-b, 1+b] and concatenate
shift(left, +1) ++ center ++ shift(right, -1). Output feature order is
therefore (world copy, input order) — the distributed pipeline encodes the
world rank into the ordering key (SURVEY §2.6).
"""

from __future__ import annotations

from ..config import TileOptions
from .clip import clip_features
from .geom import (GT_MULTIPOLYGON, GT_POINT, GT_MULTIPOINT, GT_LINESTRING,
                   Line, PFeature, create_feature)


def _shift_line(ln: Line, offset: float) -> Line:
    v = ln.v.copy()
    v[:, 0] += offset
    return ln.copy_meta(v)


def shift_feature(f: PFeature, offset: float) -> PFeature:
    g = f.geometry
    if f.gtype in (GT_POINT, GT_MULTIPOINT, GT_LINESTRING):
        ng = _shift_line(g, offset)
    elif f.gtype == GT_MULTIPOLYGON:
        ng = [[_shift_line(ln, offset) for ln in poly] for poly in g]
    else:
        ng = [_shift_line(ln, offset) for ln in g]
    return create_feature(f.fid, f.gtype, ng, f.tags, like=f)


def wrap_features(features: list[PFeature],
                  options: TileOptions) -> list[PFeature]:
    buffer = options.buffer / options.extent
    lm = options.line_metrics
    left = clip_features(features, 1, -1 - buffer, buffer, 0, -1, 2, lm)
    right = clip_features(features, 1, 1 - buffer, 2 + buffer, 0, -1, 2, lm)

    if left is None and right is None:
        return features

    merged = clip_features(features, 1, -buffer, 1 + buffer, 0, -1, 2, lm) or []
    if left is not None:
        merged = [shift_feature(f, 1.0) for f in left] + merged
    if right is not None:
        merged = merged + [shift_feature(f, -1.0) for f in right]
    return merged
