"""PFeature <-> Arrow batch conversion (SURVEY.md §1.2 schema).

One row per projected feature. Geometry is flattened into three parallel
list columns instead of the reference's 3-level JS nesting
(src/feature.js / convert.js): ``part_lens`` (vertices per ring/line),
``poly_idx`` (which polygon a ring belongs to, MultiPolygon only) and
``xyz`` (all [x, y, sqdist] triples concatenated). ``sizes/starts/ends``
materialize the reference's array expando props (convert.js:118-120) as
real columns. Carriage columns (doc_id, seq, okey, spans) ride along
untouched; ``okey`` is the binary ordering key that makes output order
reconstructible after any shuffle (SURVEY.md §2.6).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .kernels.geom import (GT_LINESTRING, GT_MULTIPOINT, GT_MULTIPOLYGON,
                           GT_POINT, Line, PFeature)

SPAN_TYPE = pa.list_(pa.struct([
    ("kind", pa.string()),
    ("text", pa.string()),
    ("media_ref", pa.string()),
    ("offset", pa.int32()),
]))

FEATURE_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("seq", pa.int64()),
    ("okey", pa.binary()),
    ("fid_json", pa.string()),
    ("gtype", pa.uint8()),
    ("part_lens", pa.list_(pa.int32())),
    ("poly_idx", pa.list_(pa.int32())),
    ("xyz", pa.list_(pa.float64())),
    ("sizes", pa.list_(pa.float64())),
    ("starts", pa.list_(pa.float64())),
    ("ends", pa.list_(pa.float64())),
    ("minx", pa.float64()),
    ("miny", pa.float64()),
    ("maxx", pa.float64()),
    ("maxy", pa.float64()),
    ("tags_json", pa.string()),
    ("spans", SPAN_TYPE),
    ("n_points", pa.int32()),
    ("z", pa.int16()),
    ("x", pa.int32()),
    ("y", pa.int32()),
])


class FeatureRowBuilder:
    """Accumulates (feature, z, x, y) rows and emits one Arrow table."""

    def __init__(self):
        self.doc_id = []
        self.seq = []
        self.okey = []
        self.fid_json = []
        self.gtype = []
        self.part_lens = []
        self.poly_idx = []
        self.xyz_chunks = []
        self.sizes = []
        self.starts = []
        self.ends = []
        self.bbox = []
        self.tags_json = []
        self.z = []
        self.x = []
        self.y = []
        self.n_points = []
        self.src_idx = []  # row index into the stage's input batch

    def add(self, f: PFeature, z: int, x: int, y: int,
            fid_json: str | None = None, tags_json: str | None = None,
            src_idx: int = -1) -> None:
        import json
        self.doc_id.append(f.doc_id)
        self.seq.append(f.seq)
        self.okey.append(f.okey)
        if fid_json is None and f.fid is not None:
            fid_json = json.dumps(f.fid)
        self.fid_json.append(fid_json)
        self.gtype.append(f.gtype)

        lens = []
        pidx = []
        npts = 0
        if f.gtype in (GT_POINT, GT_MULTIPOINT, GT_LINESTRING):
            lines = [f.geometry]
            pidx = [0]
        elif f.gtype == GT_MULTIPOLYGON:
            lines = []
            for pi, poly in enumerate(f.geometry):
                for ln in poly:
                    lines.append(ln)
                    pidx.append(pi)
        else:
            lines = list(f.geometry)
            pidx = [0] * len(lines)
        sizes = []
        starts = []
        ends = []
        for ln in lines:
            lens.append(len(ln))
            npts += len(ln)
            sizes.append(ln.size)
            starts.append(ln.start)
            ends.append(ln.end)
            self.xyz_chunks.append(ln.v.reshape(-1))
        self.part_lens.append(lens)
        self.poly_idx.append(pidx)
        self.sizes.append(sizes)
        self.starts.append(starts)
        self.ends.append(ends)
        self.n_points.append(npts)
        self.bbox.append((f.minx, f.miny, f.maxx, f.maxy))
        self.tags_json.append(tags_json)
        self.z.append(z)
        self.x.append(x)
        self.y.append(y)
        self.src_idx.append(src_idx)

    def __len__(self):
        return len(self.seq)

    def table(self, carry: pa.Table | None = None,
              carry_cols: tuple[str, ...] = ("doc_id", "tags_json", "spans",
                                             "fid_json", "seq"),
              ) -> pa.Table:
        """Build the Arrow table. When ``carry`` (the stage's input batch)
        is given, passthrough columns are gathered from it by src_idx at
        the Arrow level — spans never round-trip through Python."""
        bbox = np.asarray(self.bbox, dtype=np.float64).reshape(-1, 4)
        xyz = (np.concatenate(self.xyz_chunks)
               if self.xyz_chunks else np.empty(0, dtype=np.float64))
        n = len(self.seq)
        cols = {
            "doc_id": pa.array(self.doc_id, pa.string()),
            "seq": pa.array(self.seq, pa.int64()),
            "okey": pa.array(self.okey, pa.binary()),
            "fid_json": pa.array(self.fid_json, pa.string()),
            "gtype": pa.array(self.gtype, pa.uint8()),
            "part_lens": pa.array(self.part_lens, pa.list_(pa.int32())),
            "poly_idx": pa.array(self.poly_idx, pa.list_(pa.int32())),
            "xyz": _list_from_flat(xyz, [sum(l) * 3 for l in self.part_lens]),
            "sizes": pa.array(self.sizes, pa.list_(pa.float64())),
            "starts": pa.array(self.starts, pa.list_(pa.float64())),
            "ends": pa.array(self.ends, pa.list_(pa.float64())),
            "minx": pa.array(bbox[:, 0]) if n else pa.array([], pa.float64()),
            "miny": pa.array(bbox[:, 1]) if n else pa.array([], pa.float64()),
            "maxx": pa.array(bbox[:, 2]) if n else pa.array([], pa.float64()),
            "maxy": pa.array(bbox[:, 3]) if n else pa.array([], pa.float64()),
            "tags_json": pa.array(self.tags_json, pa.string()),
            "spans": pa.array([None] * n, SPAN_TYPE),
            "n_points": pa.array(self.n_points, pa.int32()),
            "z": pa.array(self.z, pa.int16()),
            "x": pa.array(self.x, pa.int32()),
            "y": pa.array(self.y, pa.int32()),
        }
        if carry is not None:
            idx = pa.array(np.asarray(self.src_idx, dtype=np.int64))
            for c in carry_cols:
                if c in carry.column_names:
                    cols[c] = carry.column(c).take(idx)
        return pa.table({k: cols[k] for k in FEATURE_SCHEMA.names})


def table_from_pandas(df, **kw) -> pa.Table:
    """``pa.Table.from_pandas`` with the pandas schema metadata stripped.

    Schemas carrying metadata are UNHASHABLE in this pyarrow build
    (``hash(schema)`` raises "unhashable type: 'dict'"), which knocks
    Ray Data's ``unify_schemas`` off its set()-based fast path and logs
    a warning per unification (ray/data/_internal/arrow_ops/
    transform_pyarrow.py:176-181). Every block-producing UDF should
    build tables through this helper instead of from_pandas directly."""
    kw.setdefault("preserve_index", False)
    return pa.Table.from_pandas(df, **kw).replace_schema_metadata(None)


def strip_schema_metadata(t: pa.Table) -> pa.Table:
    """Zero-copy schema-metadata strip for pass-through batches.

    Parquet files written by pandas embed a ``pandas`` key in the file
    schema; ReadParquet blocks inherit it and every pass-through
    transform (``append_column``/``filter``/``select``) preserves it.
    Such schemas are unhashable here (see ``table_from_pandas``), so
    any downstream sort/aggregate/join concat pays the slow
    ``unify_schemas`` path per block. Fused right after a read this is
    one metadata-only call per block."""
    return (t.replace_schema_metadata(None) if t.schema.metadata else t)


def flat_list_column(batch: pa.Table, name: str):
    """(offsets, values) numpy views of a list column; offsets are
    parent-relative, values are the unsliced child (the pyarrow
    .offsets/.values contract both decode_features and the native
    split stage rely on)."""
    arr = batch.column(name)
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    return (arr.offsets.to_numpy(zero_copy_only=False),
            arr.values.to_numpy(zero_copy_only=False))


def _list_from_flat(flat: np.ndarray, lens: list[int]) -> pa.ListArray:
    offsets = np.zeros(len(lens) + 1, dtype=np.int32)
    if lens:
        np.cumsum(np.asarray(lens, dtype=np.int32), out=offsets[1:])
    return pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                    pa.array(flat, pa.float64()))


def decode_features(batch: pa.Table, with_tags: bool = False) -> list[PFeature]:
    """Decode geometry columns into PFeature objects whose Line arrays are
    zero-copy views into the Arrow buffers (read-only: kernels copy on
    write). Carriage columns doc_id/tags/spans are NOT decoded — stages
    re-attach them by src_idx."""
    import json

    n = batch.num_rows
    gtype = batch.column("gtype").to_numpy(zero_copy_only=False)
    seq = batch.column("seq").to_numpy(zero_copy_only=False)
    okey = batch.column("okey").to_pylist()
    fid_json = batch.column("fid_json").to_pylist()
    tags_json = batch.column("tags_json").to_pylist() if with_tags else None
    minx = batch.column("minx").to_numpy(zero_copy_only=False)
    miny = batch.column("miny").to_numpy(zero_copy_only=False)
    maxx = batch.column("maxx").to_numpy(zero_copy_only=False)
    maxy = batch.column("maxy").to_numpy(zero_copy_only=False)

    pl_off, pl_vals = flat_list_column(batch, "part_lens")
    _, pi_vals = flat_list_column(batch, "poly_idx")
    _, sz_vals = flat_list_column(batch, "sizes")
    _, st_vals = flat_list_column(batch, "starts")
    _, en_vals = flat_list_column(batch, "ends")
    xz_off, xz_vals = flat_list_column(batch, "xyz")

    feats: list[PFeature] = []
    for i in range(n):
        p0, p1 = pl_off[i], pl_off[i + 1]
        lens = pl_vals[p0:p1]
        pidx = pi_vals[p0:p1]
        sizes = sz_vals[p0:p1]
        starts = st_vals[p0:p1]
        ends = en_vals[p0:p1]
        xyz = xz_vals[xz_off[i]:xz_off[i + 1]].reshape(-1, 3)
        gt = int(gtype[i])

        lines = []
        off = 0
        for j in range(len(lens)):
            ln_len = int(lens[j])
            lines.append(Line(xyz[off:off + ln_len], float(sizes[j]),
                              float(starts[j]), float(ends[j])))
            off += ln_len

        if gt in (GT_POINT, GT_MULTIPOINT, GT_LINESTRING):
            geometry = lines[0] if lines else Line(np.empty((0, 3)))
        elif gt == GT_MULTIPOLYGON:
            geometry = []
            for j, ln in enumerate(lines):
                pi = int(pidx[j])
                while len(geometry) <= pi:
                    geometry.append([])
                geometry[pi].append(ln)
        else:
            geometry = lines

        fid = None if fid_json[i] is None else json.loads(fid_json[i])
        tags = None
        if tags_json is not None and tags_json[i] is not None:
            tags = json.loads(tags_json[i])
        f = PFeature(fid, gt, geometry, tags, float(minx[i]), float(miny[i]),
                     float(maxx[i]), float(maxy[i]), doc_id="",
                     seq=int(seq[i]), okey=okey[i])
        feats.append(f)
    return feats
