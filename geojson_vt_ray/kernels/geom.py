"""Internal projected-feature containers.

Reference data model (SURVEY.md §1.1): a feature is
``{id, type, geometry, tags, minX..maxY}`` where geometry is nested flat
[x, y, z] triple arrays per type (/root/reference/src/feature.js:2-34), and
each flat array carries side-band ``size``/``start``/``end`` metadata
(/root/reference/src/convert.js:118-120).

Here a flat triple array is a ``Line``: an (n, 3) float64 ndarray plus the
three metadata floats as real attributes. Geometry nesting mirrors the
reference:

- Point / MultiPoint / LineString      -> one Line
- MultiLineString / Polygon            -> list[Line]
- MultiPolygon                         -> list[list[Line]]
"""

from __future__ import annotations

import numpy as np

# internal geometry type tags (uint8 codes used in Arrow columns)
GT_POINT = 1
GT_MULTIPOINT = 2
GT_LINESTRING = 3
GT_MULTILINESTRING = 4
GT_POLYGON = 5
GT_MULTIPOLYGON = 6

GT_NAME = {
    GT_POINT: "Point",
    GT_MULTIPOINT: "MultiPoint",
    GT_LINESTRING: "LineString",
    GT_MULTILINESTRING: "MultiLineString",
    GT_POLYGON: "Polygon",
    GT_MULTIPOLYGON: "MultiPolygon",
}
GT_CODE = {v: k for k, v in GT_NAME.items()}


class Line:
    """A run of vertices: (n, 3) float64 [x, y, sqdist] + ring metadata."""

    __slots__ = ("v", "size", "start", "end", "vp")

    def __init__(self, v: np.ndarray, size: float = 0.0, start: float = 0.0,
                 end: float = 0.0):
        self.v = v  # shape (n, 3), float64, C-contiguous
        self.size = size
        self.start = start
        self.end = end
        # lazily-cached raw data pointer for the C kernels: a Line's
        # buffer is never reassigned after construction (simplify marks
        # in place, same allocation), and ndarray.ctypes costs ~1.5us
        # per lookup — a visible fraction of a 20-point ring's kernel
        self.vp = None

    def __len__(self) -> int:
        return len(self.v)

    def data_ptr(self) -> int:
        """Raw float64 pointer; 0 when v needs the numpy fallback."""
        p = self.vp
        if p is None:
            v = self.v
            p = (v.ctypes.data
                 if v.dtype == np.float64 and v.flags.c_contiguous else 0)
            self.vp = p
        return p

    def copy_meta(self, v: np.ndarray) -> "Line":
        return Line(v, self.size, self.start, self.end)


class PFeature:
    """Projected feature row (reference: src/feature.js:2-12) plus the
    carriage columns our distributed pipeline threads through every stage
    (doc_id / seq / okey ordering key / opaque spans payload)."""

    __slots__ = ("fid", "gtype", "geometry", "tags", "minx", "miny", "maxx",
                 "maxy", "doc_id", "seq", "okey", "spans")

    def __init__(self, fid, gtype: int, geometry, tags, minx, miny, maxx, maxy,
                 doc_id: str = "", seq: int = 0, okey: bytes = b"", spans=None):
        self.fid = fid
        self.gtype = gtype
        self.geometry = geometry
        self.tags = tags
        self.minx = minx
        self.miny = miny
        self.maxx = maxx
        self.maxy = maxy
        self.doc_id = doc_id
        self.seq = seq
        self.okey = okey
        self.spans = spans

    def lines(self):
        """Iterate every Line regardless of nesting."""
        g = self.geometry
        if self.gtype in (GT_POINT, GT_MULTIPOINT, GT_LINESTRING):
            yield g
        elif self.gtype == GT_MULTIPOLYGON:
            for poly in g:
                yield from poly
        else:
            yield from g

    def n_vertices(self) -> int:
        return sum(len(ln) for ln in self.lines())


def _bbox_fold_np(bb: np.ndarray, v: np.ndarray) -> None:
    bb[0] = min(bb[0], v[:, 0].min())
    bb[2] = max(bb[2], v[:, 0].max())
    bb[1] = min(bb[1], v[:, 1].min())
    bb[3] = max(bb[3], v[:, 1].max())


def _bbox_lines(lines) -> tuple[float, float, float, float]:
    if _native.EXT is not None:
        lines = list(lines)  # ext may consume a generator before raising
        ext_bb = _native.bbox_lines_ext(lines)
        if ext_bb is not None:
            return ext_bb
    bb = np.array([np.inf, np.inf, -np.inf, -np.inf])
    native_fold = None if _native.LIB is None else _native.LIB.gvt_bbox
    bbp = bb.ctypes.data
    for ln in lines:
        n = len(ln.v)
        if n == 0:
            continue
        p = ln.data_ptr() if native_fold is not None else 0
        if p:
            native_fold(p, n, bbp)
        else:
            _bbox_fold_np(bb, ln.v)
    return bb[0], bb[1], bb[2], bb[3]


def create_feature(fid, gtype: int, geometry, tags,
                   like: PFeature | None = None) -> PFeature:
    """Build a feature computing its bbox (reference: src/feature.js:2-43).

    Polygon bboxes use only the outer ring (feature.js:17-19, 26-30): the
    outer ring contains all inner rings by GeoJSON convention.
    """
    if gtype in (GT_POINT, GT_MULTIPOINT, GT_LINESTRING):
        bbox_src = [geometry]
    elif gtype == GT_POLYGON:
        bbox_src = geometry[:1]
    elif gtype == GT_MULTILINESTRING:
        bbox_src = geometry
    elif gtype == GT_MULTIPOLYGON:
        bbox_src = [poly[0] for poly in geometry if poly]
    else:
        bbox_src = []
    minx, miny, maxx, maxy = _bbox_lines(bbox_src)
    f = PFeature(None if fid is None else fid, gtype, geometry, tags,
                 minx, miny, maxx, maxy)
    if like is not None:
        f.doc_id = like.doc_id
        f.seq = like.seq
        f.okey = like.okey
        f.spans = like.spans
    return f


from . import native as _native  # noqa: E402  (native itself imports Line
#                                  from this module; by this point Line is
#                                  defined, so the circular import resolves)
