"""Format-agnostic tabular source: read any registry table from
parquet, CSV, or line-delimited JSON into the SAME canonical Arrow
schema, so every pipeline in the query registry runs unchanged over a
CSV export or a JSONL dump.

Distributed shape: delegates to the matching Ray Data reader
(`read_parquet` / `read_csv` / `read_json`) — each is a streaming,
per-file/per-row-group parallel read — then applies one vectorized
normalization `map_batches` that casts every present column to the
canonical type (CSV/JSON readers infer int32/large_string/timestamp
variants that would otherwise poison downstream joins and unions) and
strips schema metadata (the repo-wide unhashable-metadata guard).
Nothing is collected on the driver.
"""

from __future__ import annotations

import os

import pyarrow as pa

from ..arrowio import strip_schema_metadata

# canonical column types per registry table (the testdata parquet
# schemas — the contract every queries.py operator assumes)
CANONICAL: dict[str, dict[str, pa.DataType]] = {
    "documents": {"doc_id": pa.int64(), "text": pa.string(),
                  "lang": pa.string(), "source": pa.string(),
                  "n_chars": pa.int64()},
    "events": {"event_id": pa.int64(), "ts": pa.timestamp("us"),
               "user_id": pa.int64(), "event_type": pa.string(),
               "value": pa.float64(), "props": pa.string()},
    "orders": {"o_orderkey": pa.int64(), "o_custkey": pa.int64(),
               "o_orderstatus": pa.string(),
               "o_totalprice": pa.float64(),
               "o_orderdate": pa.timestamp("us"),
               "o_orderpriority": pa.string()},
    "lineitem": {"l_orderkey": pa.int64(), "l_partkey": pa.int64(),
                 "l_suppkey": pa.int64(), "l_linenumber": pa.int32(),
                 "l_quantity": pa.float64(),
                 "l_extendedprice": pa.float64(),
                 "l_discount": pa.float64(), "l_tax": pa.float64(),
                 "l_returnflag": pa.string(),
                 "l_linestatus": pa.string(),
                 "l_shipdate": pa.timestamp("us")},
}

_EXT_FORMAT = {".parquet": "parquet", ".csv": "csv",
               ".jsonl": "json", ".ndjson": "json", ".json": "json",
               ".arrow": "arrow", ".feather": "arrow", ".ipc": "arrow"}


def _detect_format(path: str) -> str:
    if os.path.isdir(path):
        found = {_EXT_FORMAT[e] for e in (
            os.path.splitext(f)[1] for f in os.listdir(path))
            if e in _EXT_FORMAT}
        if not found:
            raise ValueError(f"no readable tabular files under {path}")
        if len(found) > 1:
            raise ValueError(
                f"mixed tabular formats under {path}: {sorted(found)} "
                "— pass fmt= explicitly or split the directory")
        return found.pop()
    ext = os.path.splitext(path)[1]
    if ext not in _EXT_FORMAT:
        raise ValueError(f"unsupported tabular extension: {path}")
    return _EXT_FORMAT[ext]


class _Normalize:
    """Vectorized cast of every canonical column present in the batch
    (plain function-of-table, picklable by field list)."""

    def __init__(self, types: dict[str, pa.DataType]):
        self.types = types

    def __call__(self, b: pa.Table) -> pa.Table:
        b = strip_schema_metadata(b)
        cols = {}
        for name in b.column_names:
            col = b.column(name)
            want = self.types.get(name)
            if want is not None and col.type != want:
                if pa.types.is_timestamp(want) and (
                        pa.types.is_integer(col.type)):
                    # integer epoch micros in CSV/JSON dumps
                    col = col.cast(pa.int64()).cast(want)
                else:
                    col = col.cast(want)
            cols[name] = col
        return pa.table(cols)


def _decode_ipc(b: pa.Table) -> pa.Table:
    """One binary row per IPC file -> that file's record batches.
    Accepts both the IPC *file* format (feather v2, seekable footer)
    and the IPC *stream* format."""
    tables = []
    for v in b.column("bytes"):
        buf = pa.py_buffer(v.as_py())
        try:
            t = pa.ipc.open_file(pa.BufferReader(buf)).read_all()
        except pa.ArrowInvalid:
            t = pa.ipc.open_stream(pa.BufferReader(buf)).read_all()
        tables.append(t)
    return strip_schema_metadata(pa.concat_tables(tables))


def write_table_arrow(ds, out_dir: str, key_col: str,
                      rows_per_file: int = 100_000):
    """Sharded Arrow IPC (feather v2) sink: shard = key // rows_per_file,
    ONE coarse groupby co-locates each shard, a task per shard writes
    part-NNNNNN.arrow via tmp-file + atomic rename (a killed run never
    publishes a partial shard — the geojsonseq sink contract). Returns
    the (shard, path, rows) manifest as a pa.Table. Round-trips through
    ``read_table(out_dir, table)`` exactly."""
    import numpy as np
    import ray.data as rd

    os.makedirs(out_dir, exist_ok=True)
    if isinstance(ds, pa.Table):
        ds = rd.from_arrow(ds)

    sch = ds.schema()
    ktype = dict(zip(sch.names, sch.types)).get(key_col)
    if ktype is not None and not pa.types.is_integer(ktype):
        raise TypeError(
            f"write_table_arrow key column {key_col!r} is {ktype} — "
            "must be integer (float keys would be silently floored "
            "into shards)")

    def add_shard(b: pa.Table) -> pa.Table:
        key = b.column(key_col).to_numpy(zero_copy_only=False)
        if len(key) and key.min() < 0:
            # negative keys floor-divide to negative shard ids, producing
            # malformed part--00001.arrow names whose lexical order
            # diverges from the manifest's numeric order
            raise ValueError(
                f"write_table_arrow key column {key_col!r} has negative "
                f"values (min {key.min()}); shard ids must be >= 0")
        return b.append_column(
            "_shard", pa.array((key // rows_per_file).astype(np.int64)))

    def write_shard(g: pa.Table) -> pa.Table:
        shard = int(g.column("_shard")[0].as_py())
        g = g.drop_columns(["_shard"])
        path = os.path.join(out_dir, f"part-{shard:06d}.arrow")
        tmp = path + ".tmp"
        with pa.OSFile(tmp, "wb") as f:
            with pa.ipc.new_file(f, g.schema) as w:
                w.write_table(g)
        os.replace(tmp, path)
        return pa.table({"shard": pa.array([shard], pa.int64()),
                         "path": pa.array([path], pa.string()),
                         "rows": pa.array([g.num_rows], pa.int64())})

    manifest = (ds.map_batches(add_shard, batch_format="pyarrow")
                .groupby("_shard")
                .map_groups(write_shard, batch_format="pyarrow")
                .to_pandas())
    if "shard" not in manifest.columns:      # empty input dataset
        return pa.table({"shard": pa.array([], pa.int64()),
                         "path": pa.array([], pa.string()),
                         "rows": pa.array([], pa.int64())})
    manifest = manifest.sort_values("shard", ignore_index=True)
    return pa.table({
        "shard": pa.array(manifest["shard"].to_numpy(), pa.int64()),
        "path": pa.array(manifest["path"].to_numpy(), pa.string()),
        "rows": pa.array(manifest["rows"].to_numpy(), pa.int64())})


def read_table(path: str, table: str, fmt: str | None = None,
               columns: list[str] | None = None):
    """Read registry table ``table`` from ``path`` (file or directory
    of files) in parquet / CSV / JSONL, normalized to the canonical
    schema. ``columns`` prunes at the read where the format supports
    it (parquet); CSV/JSON prune post-read (the formats are row-major
    — there is nothing to skip on disk)."""
    import ray.data as rd

    if table not in CANONICAL:
        raise ValueError(f"unknown registry table: {table!r}; "
                         f"canonical tables: {sorted(CANONICAL)}")
    fmt = fmt or _detect_format(path)
    if fmt == "parquet":
        ds = rd.read_parquet(path, columns=columns)
    elif fmt == "csv":
        ds = rd.read_csv(path)
    elif fmt == "json":
        # file_extensions=None: Ray's default filter rejects .ndjson
        ds = rd.read_json(path, file_extensions=None)
    elif fmt == "arrow":
        # Arrow IPC (feather v2 / .arrow): no native Ray reader, so
        # parallelize per FILE — read_binary_files streams one row per
        # file and the decode map_batches expands it to the file's
        # record batches (shard-sized files are the unit of
        # parallelism, same as any IPC-based interchange)
        ds = rd.read_binary_files(path, file_extensions=None)
        ds = ds.map_batches(_decode_ipc, batch_format="pyarrow")
    else:
        raise ValueError(f"unsupported format: {fmt!r}")
    ds = ds.map_batches(_Normalize(CANONICAL[table]),
                        batch_format="pyarrow")
    if columns and fmt != "parquet":
        ds = ds.select_columns(columns)
    return ds
