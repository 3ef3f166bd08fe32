"""GeoJSON → projected feature list (S1 + M1-M5).

Reference: /root/reference/src/convert.js. Accepts a FeatureCollection,
Feature, bare geometry or GeometryCollection; drops null-geometry and
empty-coordinate features (convert.js:26-29); raises on unknown geometry
types (convert.js:81-83). Projection + per-ring shoelace-area/length
accumulation + DP marking happen here so a single pass owns all
per-vertex math.
"""

from __future__ import annotations

import numpy as np

from ..config import TileOptions
from .geom import (GT_CODE, GT_LINESTRING, GT_MULTILINESTRING, GT_MULTIPOINT,
                   GT_MULTIPOLYGON, GT_POINT, GT_POLYGON, Line, PFeature,
                   create_feature)
from .project import project_x, project_y
from .simplify import simplify_mark


def convert_geojson(data: dict, options: TileOptions,
                    base_index: int = 0) -> list[PFeature]:
    """Convert one GeoJSON document. ``base_index`` offsets the
    generateId index so documents sharded across batches still receive
    their FeatureCollection-position ids (convert.js:37-38)."""
    out: list[PFeature] = []
    t = data.get("type")
    if t == "FeatureCollection":
        for i, f in enumerate(data["features"]):
            _convert_feature(out, f, options, base_index + i)
    elif t == "Feature":
        _convert_feature(out, data, options, base_index)
    else:
        _convert_feature(out, {"geometry": data}, options, base_index)
    return out


def _project_ring(ring, is_polygon: bool, sq_tolerance: float) -> Line:
    """Project one coordinate ring, accumulate its size (|area| for rings,
    length for lines — convert.js:92-121) and run the DP marking pass."""
    arr = np.asarray(ring, dtype=np.float64)
    n = len(arr)
    v = np.zeros((n, 3), dtype=np.float64)
    v[:, 0] = project_x(arr[:, 0])
    v[:, 1] = project_y(arr[:, 1])
    xs = v[:, 0]
    ys = v[:, 1]
    if n > 1:
        if is_polygon:
            # shoelace /2, accumulated pairwise like the reference to keep
            # float summation order identical (convert.js:104)
            terms = (xs[:-1] * ys[1:] - xs[1:] * ys[:-1]) / 2.0
        else:
            terms = np.sqrt((xs[1:] - xs[:-1]) ** 2 + (ys[1:] - ys[:-1]) ** 2)
        size = 0.0
        for term in terms:
            size += term
    else:
        size = 0.0
    v[0, 2] = 1.0
    simplify_mark(v, sq_tolerance)
    v[n - 1, 2] = 1.0
    return Line(v, abs(size), 0.0, abs(size))


def _project_point(coords) -> Line:
    v = np.zeros((1, 3), dtype=np.float64)
    v[0, 0] = project_x(coords[0])
    v[0, 1] = project_y(coords[1])
    return Line(v)


def _concat_points(lines: list[Line]) -> Line:
    return Line(np.concatenate([ln.v for ln in lines], axis=0))


def _convert_feature(out: list[PFeature], geojson: dict, options: TileOptions,
                     index: int) -> None:
    geometry = geojson.get("geometry")
    if not geometry:
        return
    coords = geometry.get("coordinates")
    if coords is not None and len(coords) == 0:
        return

    gtype_name = geometry.get("type")
    sq_tol = options.sq_tolerance
    fid = geojson.get("id")
    if options.promote_id:
        fid = (geojson.get("properties") or {}).get(options.promote_id)
    elif options.generate_id:
        fid = index or 0

    tags = geojson.get("properties")

    if gtype_name == "GeometryCollection":
        for single in geometry["geometries"]:
            _convert_feature(out, {"id": fid, "geometry": single,
                                   "properties": tags}, options, index)
        return

    if gtype_name == "Point":
        geom = _project_point(coords)
    elif gtype_name == "MultiPoint":
        geom = _concat_points([_project_point(p) for p in coords])
    elif gtype_name == "LineString":
        geom = _project_ring(coords, False, sq_tol)
    elif gtype_name == "MultiLineString":
        if options.line_metrics:
            # explode so per-line metrics survive (convert.js:52-60)
            for line in coords:
                out.append(create_feature(
                    fid, GT_LINESTRING, _project_ring(line, False, sq_tol),
                    tags))
            return
        geom = [_project_ring(line, False, sq_tol) for line in coords]
    elif gtype_name == "Polygon":
        geom = [_project_ring(ring, True, sq_tol) for ring in coords]
    elif gtype_name == "MultiPolygon":
        geom = [[_project_ring(ring, True, sq_tol) for ring in polygon]
                for polygon in coords]
    else:
        raise ValueError("Input data is not a valid GeoJSON object.")

    out.append(create_feature(fid, GT_CODE[gtype_name], geom, tags))
