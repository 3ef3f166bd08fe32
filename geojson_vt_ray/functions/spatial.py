"""Spatial index + join operators (SURVEY.md §2.4, north rule).

No h3/s2 native libs exist in this environment, so the cell scheme is
the engine's own web-mercator quadtree: cell = tile_id(level, ix, iy)
with ix/iy = floor(world_coord * 2^level) clamped — the same id space as
the tile pyramid, which makes raster<->vector overlay a plain equi-join
on the cell key. All kernels are vectorized numpy over Arrow batches.

Join strategies:
- small side (dimension-sized polygons / query points / raster tiles):
  broadcast via ray.put once, lookup inside map_batches — no shuffle.
- both sides large: Dataset.join (hash shuffle, available in this Ray)
  on the cell key; skew handling = salt hot cells (documented per call).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..arrowio import table_from_pandas
from ..kernels.project import project_x, project_y
from ..kernels.tileid import tile_id_vec


# ---------------------------------------------------------------- cells
def cell_ids(lon: np.ndarray, lat: np.ndarray, level: int) -> np.ndarray:
    """Quad-cell assignment at a zoom level (vectorized M1 + floor)."""
    x = project_x(lon)
    y = project_y(lat)
    n = 1 << level
    ix = np.clip(np.floor(x * n), 0, n - 1).astype(np.int64)
    iy = np.clip(np.floor(y * n), 0, n - 1).astype(np.int64)
    return tile_id_vec(np.full(len(ix), level, dtype=np.int64), ix, iy)


class AssignCells:
    """map_batches stage: adds cell_id (+ ix/iy) from lon/lat columns."""

    def __init__(self, level: int, lon_col: str = "lon", lat_col: str = "lat"):
        self.level = level
        self.lon_col = lon_col
        self.lat_col = lat_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch.column(self.lon_col).to_numpy(zero_copy_only=False)
        lat = batch.column(self.lat_col).to_numpy(zero_copy_only=False)
        x = project_x(lon)
        y = project_y(lat)
        n = 1 << self.level
        ix = np.clip(np.floor(x * n), 0, n - 1).astype(np.int64)
        iy = np.clip(np.floor(y * n), 0, n - 1).astype(np.int64)
        cid = tile_id_vec(np.full(len(ix), self.level, dtype=np.int64), ix, iy)
        batch = batch.append_column("cell_x", pa.array(ix))
        batch = batch.append_column("cell_y", pa.array(iy))
        return batch.append_column("cell_id", pa.array(cid))


# ------------------------------------------------------------------ PIP
def points_in_ring(px: np.ndarray, py: np.ndarray,
                   ring: np.ndarray) -> np.ndarray:
    """Even-odd ray casting, all points against one ring at once.
    ring: (m, 2) closed or open (implicitly closed)."""
    inside = np.zeros(len(px), dtype=bool)
    x1 = ring[:, 0]
    y1 = ring[:, 1]
    x2 = np.roll(x1, -1)
    y2 = np.roll(y1, -1)
    for j in range(len(ring)):
        a, b, c, d = x1[j], y1[j], x2[j], y2[j]
        cond = (b > py) != (d > py)
        if cond.any():
            with np.errstate(divide="ignore", invalid="ignore"):
                xs = (c - a) * (py - b) / (d - b) + a
            inside ^= cond & (px < xs)
    return inside


def points_in_polygon(px, py, rings: list[np.ndarray]) -> np.ndarray:
    """Polygon with holes: XOR of rings (even-odd rule)."""
    inside = np.zeros(len(px), dtype=bool)
    for r in rings:
        inside ^= points_in_ring(px, py, r)
    return inside


class PIPJoin:
    """Broadcast point-in-polygon join stage.

    ``polygons``: list of dicts {key, rings: [(m,2) lon/lat arrays],
    minx, miny, maxx, maxy} — broadcast once via ray.put and fetched in
    __init__ (once per actor, never per batch). Emits one output row per
    (point, containing polygon)."""

    def __init__(self, polygons_ref, lon_col: str = "lon",
                 lat_col: str = "lat", key_col: str = "poly_key",
                 keep_cols: tuple[str, ...] = ()):
        import ray
        self.polygons = (ray.get(polygons_ref)
                         if isinstance(polygons_ref, ray.ObjectRef)
                         else polygons_ref)
        self.lon_col = lon_col
        self.lat_col = lat_col
        self.key_col = key_col
        self.keep_cols = keep_cols
        # pin the key type so zero-match batches don't emit a null-typed
        # column (pa.array([]) infers null, which breaks block-schema
        # unification on the streaming executor's fast path)
        self.key_type = (pa.array([p["key"] for p in self.polygons]).type
                         if self.polygons else pa.int64())

    def __call__(self, batch: pa.Table) -> pa.Table:
        px = batch.column(self.lon_col).to_numpy(zero_copy_only=False)
        py = batch.column(self.lat_col).to_numpy(zero_copy_only=False)
        out_idx = []
        out_key = []
        for poly in self.polygons:
            # bbox prefilter (vectorized trivial reject)
            m = ((px >= poly["minx"]) & (px <= poly["maxx"]) &
                 (py >= poly["miny"]) & (py <= poly["maxy"]))
            cand = np.flatnonzero(m)
            if len(cand) == 0:
                continue
            hit = points_in_polygon(px[cand], py[cand], poly["rings"])
            hits = cand[hit]
            out_idx.append(hits)
            out_key.extend([poly["key"]] * len(hits))
        if out_idx:
            idx = np.concatenate(out_idx)
        else:
            idx = np.empty(0, dtype=np.int64)
        taken = batch.take(pa.array(idx))
        cols = {c: taken.column(c) for c in
                (self.keep_cols or batch.column_names)}
        cols[self.key_col] = pa.array(out_key, self.key_type)
        return pa.table(cols)


def polygons_from_features(features) -> list[dict]:
    """Projected-feature list -> broadcastable polygon records (rings in
    raw lon/lat NOT required: caller chooses coordinate space; here the
    rings are whatever space the caller built them in)."""
    out = []
    for i, f in enumerate(features):
        rings = [ln.v[:, 0:2] for ln in f.lines()]
        out.append({"key": f.fid if f.fid is not None else i,
                    "rings": rings, "minx": f.minx, "miny": f.miny,
                    "maxx": f.maxx, "maxy": f.maxy})
    return out


# ------------------------------------------------------------------ kNN
class KNNPartial:
    """Per-batch brute-force top-k against a broadcast query matrix.

    Emits (query_id, point_id, dist2) partial top-k rows; the driver (or
    a tiny follow-up groupby) merges partials — classic scalable top-k:
    shuffle size is O(batches * queries * k), never O(points)."""

    def __init__(self, queries_ref, k: int, lon_col: str = "lon",
                 lat_col: str = "lat", id_col: str = "event_id"):
        import ray
        q = (ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef)
             else queries_ref)
        self.qid = np.asarray([r[0] for r in q])
        self.qx = np.asarray([r[1] for r in q], dtype=np.float64)
        self.qy = np.asarray([r[2] for r in q], dtype=np.float64)
        self.k = k
        self.lon_col = lon_col
        self.lat_col = lat_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        px = batch.column(self.lon_col).to_numpy(zero_copy_only=False)
        py = batch.column(self.lat_col).to_numpy(zero_copy_only=False)
        pid = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        o_q, o_p, o_d = [], [], []
        for qi in range(len(self.qid)):
            d2 = (px - self.qx[qi]) ** 2 + (py - self.qy[qi]) ** 2
            k = min(self.k, len(d2))
            if k == 0:
                continue
            # partial top-k with (dist2, id) tie-break
            part = np.lexsort((pid, d2))[:k]
            o_q.extend([self.qid[qi]] * k)
            o_p.extend(pid[part])
            o_d.extend(d2[part])
        return pa.table({
            "query_id": pa.array(o_q, pa.int64()),
            "point_id": pa.array(o_p, pa.int64()),
            "dist2": pa.array(o_d, pa.float64()),
        })


def knn_merge(partials: pa.Table, k: int) -> pa.Table:
    """Merge partial top-k rows to final (query_id, point_id, rnk)."""
    import pandas as pd
    df = partials.to_pandas()
    if not len(df):
        return pa.table({"query_id": pa.array([], pa.int64()),
                         "point_id": pa.array([], pa.int64()),
                         "rnk": pa.array([], pa.int64())})
    df = df.sort_values(["query_id", "dist2", "point_id"],
                        kind="mergesort")
    df["rnk"] = df.groupby("query_id").cumcount() + 1
    df = df[df["rnk"] <= k]
    return table_from_pandas(df[["query_id", "point_id", "rnk"]],
                                preserve_index=False)


class KNNJoinPartial:
    """Vectorized per-batch exact top-k against a LARGE broadcast query
    set (a kNN *join*: every query point gets its k nearest corpus
    points).

    KNNPartial loops per query in Python — fine for a handful of probe
    points, ruinous for a query table. This computes the full
    (batch x queries) distance matrix with one broadcasted numpy
    expression and extracts each query's exact (dist2, id)-ordered
    top-k without any per-row Python:
      1. k-th smallest distance per query via np.partition (column-wise)
      2. gather every entry at-or-under that bound (so boundary TIES are
         kept — exactness under duplicate distances)
      3. one global lexsort by (query, dist2, point_id), then a
         searchsorted rank-within-group cut to k.
    The distance expression keeps the scalar IEEE op order
    ((px-qx)^2 + (py-qy)^2, no matmul expansion) so tie-breaks agree
    bit-for-bit with a SQL oracle computing the same formula.

    Scale contract: the query side is the bounded reference set (eval /
    probe points), broadcast once via ray.put and fetched per actor in
    __init__; the corpus side streams. Shuffle output is
    O(batches * queries * k) partial rows, never O(corpus); the final
    merge is a groupby(query_id) over that bounded partial set."""

    def __init__(self, queries_ref, k: int, lon_col: str = "lon",
                 lat_col: str = "lat", id_col: str = "event_id"):
        import ray
        q = (ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef)
             else queries_ref)
        self.qid = np.asarray([r[0] for r in q], dtype=np.int64)
        self.qx = np.asarray([r[1] for r in q], dtype=np.float64)
        self.qy = np.asarray([r[2] for r in q], dtype=np.float64)
        self.k = k
        self.lon_col = lon_col
        self.lat_col = lat_col
        self.id_col = id_col

    def _empty(self) -> pa.Table:
        return pa.table({"query_id": pa.array([], pa.int64()),
                         "point_id": pa.array([], pa.int64()),
                         "dist2": pa.array([], pa.float64())})

    # hard cap on the live distance-matrix (~64 MB float64) so a large
    # query table cannot blow worker heaps
    _MAX_MATRIX_ELEMS = 8_000_000
    # preferred live-matrix size: QUERY-axis chunks sized so the matrix
    # plus temporaries stay ~cache-resident per task. A 15k-query x
    # 1.5k-point block as ONE matrix is 180 MB of temporaries streamed
    # 5+ times through DRAM; with 32+ concurrent tasks that saturates
    # single-socket bandwidth and the UDF runs 50x slower than compute
    # (measured: 16 s/block mean vs ~0.3 s here at sf0.1)
    _CHUNK_ELEMS = 250_000

    def _chunk_candidates(self, q0, q1, px, py, pid):
        """Exact top-k candidates for query rows [q0, q1) against ALL
        batch points, (dist2, id)-boundary ties INCLUDED. Because every
        query chunk sees the whole batch, chunks are independent and
        complete — no cross-chunk merge is needed (unlike point-axis
        slicing, which must re-rank a concatenation).

        Queries-major orientation so np.partition runs along contiguous
        rows, with in-place temporaries — two live matrices instead of
        five. (qx-px)^2 is bit-identical to (px-qx)^2 (negation then
        square), so oracle tie-breaks hold."""
        d2 = self.qx[q0:q1, None] - px[None, :]
        d2 *= d2
        dy = self.qy[q0:q1, None] - py[None, :]
        dy *= dy
        d2 += dy
        kk = min(self.k, len(px))
        kth = np.partition(d2, kk - 1, axis=1)[:, kk - 1]
        qi, pi = np.nonzero(d2 <= kth[:, None])
        return qi + q0, pid[pi], d2[qi, pi]

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        nq = len(self.qid)
        if n == 0 or nq == 0:
            return self._empty()
        px = batch.column(self.lon_col).to_numpy(zero_copy_only=False)
        py = batch.column(self.lat_col).to_numpy(zero_copy_only=False)
        pid = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        qstep = max(min(self._MAX_MATRIX_ELEMS, self._CHUNK_ELEMS) // n, 1)
        parts = [self._chunk_candidates(i, min(i + qstep, nq), px, py, pid)
                 for i in range(0, nq, qstep)]
        qi = np.concatenate([p[0] for p in parts])
        pv = np.concatenate([p[1] for p in parts])
        dv = np.concatenate([p[2] for p in parts])
        # chunks are already complete per query; the lexsort + rank cut
        # only canonicalizes order and trims excess boundary ties to the
        # exact (dist2, point_id) top-k
        order = np.lexsort((pv, dv, qi))
        qi, pv, dv = qi[order], pv[order], dv[order]
        starts = np.searchsorted(qi, np.arange(nq), side="left")
        keep = (np.arange(len(qi)) - starts[qi]) < min(self.k, n)
        return pa.table({
            "query_id": pa.array(self.qid[qi[keep]], pa.int64()),
            "point_id": pa.array(pv[keep].astype(np.int64), pa.int64()),
            "dist2": pa.array(dv[keep], pa.float64()),
        })
