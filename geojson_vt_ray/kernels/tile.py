"""Tile build (K3 = M6 tiny-feature filter + M7 sqdist thinning + M8 ring
rewind + M10 lineMetrics tags).

Reference: /root/reference/src/tile.js. Zoom-scaled tolerance is 0 at
max_zoom (tile.js:3) so the deepest zoom keeps every vertex. Output
features carry vector-tile type codes (1=point, 2=line, 3=polygon,
tile.js:74-76) and still-world-unit [x, y] pair geometry; quantization to
integer tile coordinates happens in transform.py at serve time.
"""

from __future__ import annotations

import numpy as np

from ..config import TileOptions
from . import native as _native
from .geom import (GT_LINESTRING, GT_MULTILINESTRING, GT_MULTIPOINT,
                   GT_MULTIPOLYGON, GT_POINT, GT_POLYGON, Line, PFeature)


class TFeature:
    """Built tile feature: geometry is a flat (n,2) array for points or a
    list of (n,2) ring arrays for lines/polygons (pre-quantization)."""

    __slots__ = ("geometry", "type", "tags", "fid", "seq", "okey", "doc_id",
                 "spans")

    def __init__(self, geometry, type_code: int, tags, fid):
        self.geometry = geometry
        self.type = type_code
        self.tags = tags
        self.fid = fid
        self.seq = 0
        self.okey = b""
        self.doc_id = ""
        self.spans = None


class Tile:
    """Per-tile container + stats (reference: src/tile.js:4-18)."""

    __slots__ = ("features", "num_points", "num_simplified", "num_features",
                 "source", "x", "y", "z", "transformed", "minx", "miny",
                 "maxx", "maxy")

    def __init__(self, z: int, x: int, y: int):
        self.features: list = []
        self.num_points = 0
        self.num_simplified = 0
        self.num_features = 0
        self.source = None
        self.x = x
        self.y = y
        self.z = z
        self.transformed = False
        self.minx = 2.0
        self.miny = 1.0
        self.maxx = -1.0
        self.maxy = 0.0


def _thin_line(ln: Line, tolerance: float, sq_tolerance: float,
               is_polygon: bool, is_outer: bool, tile: Tile):
    """One ring/line -> kept [x, y] pairs, or None when dropped as tiny
    (tile.js:85-106)."""
    n = len(ln)
    if tolerance > 0.0 and ln.size < (sq_tolerance if is_polygon else tolerance):
        tile.num_points += n
        return None
    if _native.LIB is not None:
        keep = _native.thin_rewind_native(ln, tolerance == 0.0, sq_tolerance,
                                          is_polygon, is_outer)
        tile.num_simplified += n if tolerance == 0.0 else len(keep)
        tile.num_points += n
        return keep
    if tolerance == 0.0:
        keep = ln.v[:, 0:2].copy()
        tile.num_simplified += n
    else:
        mask = ln.v[:, 2] > sq_tolerance
        keep = ln.v[mask, 0:2]
        tile.num_simplified += len(keep)
    tile.num_points += n
    if is_polygon:
        _rewind(keep, is_outer)
    return keep


def _rewind(ring: np.ndarray, clockwise: bool) -> None:
    """Signed-area winding enforcement, in place (tile.js:108-123): outer
    rings clockwise in tile space (y grows down), inner rings CCW."""
    if len(ring) == 0:
        return
    x = ring[:, 0]
    y = ring[:, 1]
    # shoelace via slices (np.roll allocates + is slow on small rings).
    # Summation is SEQUENTIAL (cumsum, not np.sum's pairwise tree) so the
    # sign matches the reference's running `sum +=` — and the C kernel —
    # bit-for-bit even on near-zero-area degenerate rings.
    terms = (x[1:] - x[:-1]) * (y[1:] + y[:-1])
    seq = float(np.cumsum(terms)[-1]) if len(terms) else 0.0
    area = seq + (x[0] - x[-1]) * (y[0] + y[-1])
    if (area > 0) == clockwise:
        ring[:] = ring[::-1]


def add_feature_to_tile(tile: Tile, feature: PFeature,
                        tolerance: float, options: TileOptions) -> TFeature | None:
    """Build one tile feature (tile.js:25-83); updates tile stats; returns
    the built feature or None when everything simplified away."""
    g = feature.geometry
    gtype = feature.gtype
    sq_tolerance = tolerance * tolerance

    tile.minx = min(tile.minx, feature.minx)
    tile.miny = min(tile.miny, feature.miny)
    tile.maxx = max(tile.maxx, feature.maxx)
    tile.maxy = max(tile.maxy, feature.maxy)

    simplified = None
    rings: list[np.ndarray] = []

    if gtype in (GT_POINT, GT_MULTIPOINT):
        simplified = g.v[:, 0:2].copy()
        tile.num_points += len(g)
        tile.num_simplified += len(g)
        if len(simplified) == 0:
            simplified = None
    elif gtype == GT_LINESTRING:
        r = _thin_line(g, tolerance, sq_tolerance, False, False, tile)
        if r is not None:
            rings.append(r)
    elif gtype in (GT_MULTILINESTRING, GT_POLYGON):
        is_poly = gtype == GT_POLYGON
        for i, ln in enumerate(g):
            r = _thin_line(ln, tolerance, sq_tolerance, is_poly, i == 0, tile)
            if r is not None:
                rings.append(r)
    elif gtype == GT_MULTIPOLYGON:
        for poly in g:
            for i, ln in enumerate(poly):
                r = _thin_line(ln, tolerance, sq_tolerance, True, i == 0, tile)
                if r is not None:
                    rings.append(r)

    geometry = simplified if simplified is not None else (rings or None)
    if geometry is None:
        return None

    tags = feature.tags if feature.tags is not None else None
    if gtype == GT_LINESTRING and options.line_metrics:
        tags = dict(feature.tags) if feature.tags else {}
        tags["mapbox_clip_start"] = feature.geometry.start / feature.geometry.size
        tags["mapbox_clip_end"] = feature.geometry.end / feature.geometry.size

    type_code = (3 if gtype in (GT_POLYGON, GT_MULTIPOLYGON) else
                 2 if gtype in (GT_LINESTRING, GT_MULTILINESTRING) else 1)
    tf = TFeature(geometry, type_code, tags, feature.fid)
    tf.seq = feature.seq
    tf.okey = feature.okey
    tf.doc_id = feature.doc_id
    tf.spans = feature.spans
    tile.features.append(tf)
    return tf


def create_tile(features: list[PFeature], z: int, x: int, y: int,
                options: TileOptions) -> Tile:
    """Reference entry point createTile (tile.js:2-23)."""
    tolerance = 0.0 if z == options.max_zoom else (
        options.tolerance / ((1 << z) * options.extent))
    tile = Tile(z, x, y)
    tile.num_features = len(features)
    for f in features:
        add_feature_to_tile(tile, f, tolerance, options)
    return tile
