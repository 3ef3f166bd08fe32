"""Kernel unit tests mirroring the reference's layer-2 suite
(test/test-clip.js, test/test-simplify.js — SURVEY.md §5)."""

import json
import math

import numpy as np
import pytest

from geojson_vt_ray.kernels.clip import clip_features
from geojson_vt_ray.kernels.geom import (GT_LINESTRING, GT_MULTIPOINT,
                                         GT_POLYGON, Line, create_feature)
from geojson_vt_ray.kernels.simplify import simplify_mark
from geojson_vt_ray.kernels.project import project_x, project_y

# test-clip.js:9-10
GEOM1 = [0, 0, 0, 50, 0, 0, 50, 10, 0, 20, 10, 0, 20, 20, 0, 30, 20, 0,
         30, 30, 0, 50, 30, 0, 50, 40, 0, 25, 40, 0, 25, 50, 0, 0, 50, 0,
         0, 60, 0, 25, 60, 0]
GEOM2 = [0, 0, 0, 50, 0, 0, 50, 10, 0, 0, 10, 0]


def _line(flat, **kw):
    return Line(np.asarray(flat, dtype=np.float64).reshape(-1, 3), **kw)


def _flat(ln):
    return ln.v.reshape(-1).tolist()


def _geojson_vt_feature(flat, gtype, tags, closed=False):
    if closed:
        ring = flat + flat[:3]
        return create_feature(None, GT_POLYGON, [_line(ring)], tags)
    return create_feature(None, gtype, _line(flat), tags)


def test_clips_polylines():
    f1 = _geojson_vt_feature(GEOM1, GT_LINESTRING, 1)
    f2 = _geojson_vt_feature(GEOM2, GT_LINESTRING, 2)
    clipped = clip_features([f1, f2], 1, 10, 40, 0, -math.inf, math.inf)

    assert len(clipped) == 2
    a, b = clipped
    assert a.gtype == 4 and b.gtype == 4  # MultiLineString
    assert [_flat(ln) for ln in a.geometry] == [
        [10, 0, 1, 40, 0, 1],
        [40, 10, 1, 20, 10, 0, 20, 20, 0, 30, 20, 0, 30, 30, 0, 40, 30, 1],
        [40, 40, 1, 25, 40, 0, 25, 50, 0, 10, 50, 1],
        [10, 60, 1, 25, 60, 0]]
    assert [_flat(ln) for ln in b.geometry] == [
        [10, 0, 1, 40, 0, 1],
        [40, 10, 1, 10, 10, 1]]
    assert (a.minx, a.miny, a.maxx, a.maxy) == (10, 0, 40, 60)
    assert (b.minx, b.miny, b.maxx, b.maxy) == (10, 0, 40, 10)
    assert a.tags == 1 and b.tags == 2


def test_clips_lines_with_line_metrics():
    size = 0.0
    pts = np.asarray(GEOM1, dtype=np.float64).reshape(-1, 3)
    for i in range(len(pts) - 1):
        size += math.hypot(pts[i + 1, 0] - pts[i, 0], pts[i + 1, 1] - pts[i, 1])
    ln = _line(GEOM1, size=size, start=0.0, end=size)
    f = create_feature(None, GT_LINESTRING, ln, None)
    clipped = clip_features([f], 1, 10, 40, 0, -math.inf, math.inf,
                            line_metrics=True)
    assert [[g.geometry.start, g.geometry.end] for g in clipped] == \
        [[10, 40], [70, 130], [160, 200], [230, 245]]


def test_clips_polygons():
    f1 = _geojson_vt_feature(GEOM1, None, 1, closed=True)
    f2 = _geojson_vt_feature(GEOM2, None, 2, closed=True)
    clipped = clip_features([f1, f2], 1, 10, 40, 0, -math.inf, math.inf)

    assert [_flat(ln) for ln in clipped[0].geometry] == [
        [10, 0, 1, 40, 0, 1, 40, 10, 1, 20, 10, 0, 20, 20, 0, 30, 20, 0,
         30, 30, 0, 40, 30, 1, 40, 40, 1, 25, 40, 0, 25, 50, 0, 10, 50, 1,
         10, 60, 1, 25, 60, 0, 10, 24, 1, 10, 0, 1]]
    assert [_flat(ln) for ln in clipped[1].geometry] == [
        [10, 0, 1, 40, 0, 1, 40, 10, 1, 10, 10, 1, 10, 0, 1]]


def test_clips_points():
    f1 = _geojson_vt_feature(GEOM1, GT_MULTIPOINT, 1)
    f2 = _geojson_vt_feature(GEOM2, GT_MULTIPOINT, 2)
    clipped = clip_features([f1, f2], 1, 10, 40, 0, -math.inf, math.inf)

    assert len(clipped) == 1
    assert _flat(clipped[0].geometry) == [
        20, 10, 0, 20, 20, 0, 30, 20, 0, 30, 30, 0, 25, 40, 0, 25, 50, 0,
        25, 60, 0]
    assert (clipped[0].minx, clipped[0].miny, clipped[0].maxx,
            clipped[0].maxy) == (20, 10, 30, 60)


# test-simplify.js
POINTS = [
    [0.22455, 0.25015], [0.22691, 0.24419], [0.23331, 0.24145],
    [0.23498, 0.23606], [0.24421, 0.23276], [0.26259, 0.21531],
    [0.26776, 0.21381], [0.27357, 0.20184], [0.27312, 0.19216],
    [0.27762, 0.18903], [0.28036, 0.18141], [0.28651, 0.17774],
    [0.29241, 0.15937], [0.29691, 0.15564], [0.31495, 0.15137],
    [0.31975, 0.14516], [0.33033, 0.13757], [0.34148, 0.13996],
    [0.36998, 0.13789], [0.38739, 0.14251], [0.39128, 0.13939],
    [0.40952, 0.14114], [0.41482, 0.13975], [0.42772, 0.12730],
    [0.43960, 0.11974], [0.47493, 0.10787], [0.48651, 0.10675],
    [0.48920, 0.10945], [0.49379, 0.10863], [0.50474, 0.11966],
    [0.51296, 0.12235], [0.51863, 0.12089], [0.52409, 0.12688],
    [0.52957, 0.12786], [0.53421, 0.14093], [0.53927, 0.14724],
    [0.56769, 0.14891], [0.57525, 0.15726], [0.58062, 0.15815],
    [0.60153, 0.15685], [0.61774, 0.15986], [0.62200, 0.16704],
    [0.62955, 0.19460], [0.63890, 0.19561], [0.64126, 0.20081],
    [0.65177, 0.20456], [0.67155, 0.22255], [0.68368, 0.21745],
    [0.69525, 0.21915], [0.70064, 0.21798], [0.70312, 0.21436],
    [0.71226, 0.21587], [0.72149, 0.21281], [0.72781, 0.21336],
    [0.72998, 0.20873], [0.73532, 0.20820], [0.73994, 0.20477],
    [0.76998, 0.20842], [0.77960, 0.21687], [0.78420, 0.21816],
    [0.80024, 0.21462], [0.81053, 0.21973], [0.81719, 0.22682],
    [0.82077, 0.23617], [0.82723, 0.23616], [0.82989, 0.23989],
    [0.85100, 0.24894], [0.85988, 0.25549], [0.86521, 0.26853],
    [0.85795, 0.28030], [0.86548, 0.29145], [0.86681, 0.29866],
    [0.86468, 0.30271], [0.86779, 0.30617], [0.85987, 0.31137],
    [0.86008, 0.31435], [0.85829, 0.31494], [0.85810, 0.32760],
    [0.85454, 0.33540], [0.86092, 0.34300], [0.85643, 0.35015],
    [0.85142, 0.35296], [0.84984, 0.35959], [0.85456, 0.36553],
    [0.84974, 0.37038], [0.84409, 0.37189], [0.84475, 0.38044],
    [0.84152, 0.38367], [0.83957, 0.39040], [0.84559, 0.39905],
    [0.84840, 0.40755], [0.84371, 0.41130], [0.84409, 0.41988],
    [0.83951, 0.43276], [0.84133, 0.44104], [0.84762, 0.44922],
    [0.84716, 0.45844], [0.85138, 0.46279], [0.85397, 0.47115],
    [0.86636, 0.48077]]

SIMPLIFIED = [
    [0.22455, 0.25015], [0.26776, 0.21381], [0.29691, 0.15564],
    [0.33033, 0.13757], [0.40952, 0.14114], [0.4396, 0.11974],
    [0.48651, 0.10675], [0.52957, 0.12786], [0.53927, 0.14724],
    [0.56769, 0.14891], [0.61774, 0.15986], [0.62955, 0.1946],
    [0.67155, 0.22255], [0.72781, 0.21336], [0.73994, 0.20477],
    [0.76998, 0.20842], [0.7842, 0.21816], [0.80024, 0.21462],
    [0.82077, 0.23617], [0.85988, 0.25549], [0.86521, 0.26853],
    [0.85795, 0.2803], [0.86779, 0.30617], [0.85829, 0.31494],
    [0.85454, 0.3354], [0.86092, 0.343], [0.84984, 0.35959],
    [0.85456, 0.36553], [0.84409, 0.37189], [0.83957, 0.3904],
    [0.8484, 0.40755], [0.83951, 0.43276], [0.85397, 0.47115],
    [0.86636, 0.48077]]


def test_simplify_golden():
    v = np.zeros((len(POINTS), 3))
    v[:, 0:2] = POINTS
    v[0, 2] = 1.0
    v[-1, 2] = 1.0
    simplify_mark(v, 0.001 * 0.001)
    kept = v[v[:, 2] > 0.005 * 0.005][:, 0:2]
    assert kept.tolist() == SIMPLIFIED


def test_simplify_degenerate_no_blowup():
    # test-simplify.js:68-77 (issue #104): repeated square must not blow
    # the stack / take superlinear tie scans
    sq = [[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]] * 1400
    v = np.zeros((len(sq), 3))
    v[:, 0:2] = sq
    simplify_mark(v, 2e-15)


def test_projection_values():
    assert project_x(-540.0) == -1.0
    assert project_x(540.0) == 2.0
    assert project_y(90.0) == 0.0
    assert project_y(-90.0) == 1.0
    assert project_y(0.0) == 0.5


def test_quantize_pool_all_empty_rings():
    """Regression: _quantize_all with only zero-length rings must return
    an empty array (not crash initializing the pool on a fresh thread)."""
    import threading

    import numpy as np

    from geojson_vt_ray.config import TileOptions
    from geojson_vt_ray.stages.build import TileRowAccum

    acc = TileRowAccum(TileOptions())
    acc.ring_world = [np.empty((0, 2)), np.empty((0, 2))]
    acc.ring_z2 = [1.0, 1.0]
    acc.ring_tx = [0.0, 0.0]
    acc.ring_ty = [0.0, 0.0]

    out = {}

    def run():
        try:
            out["res"] = acc._quantize_all()
        except Exception as e:  # pragma: no cover - the regression
            out["err"] = e

    t = threading.Thread(target=run)  # fresh thread -> fresh pool
    t.start()
    t.join()
    assert "err" not in out, out.get("err")
    assert out["res"].dtype == np.int32 and len(out["res"]) == 0
