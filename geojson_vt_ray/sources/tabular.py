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
               ".jsonl": "json", ".ndjson": "json", ".json": "json"}


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
    else:
        raise ValueError(f"unsupported format: {fmt!r}")
    ds = ds.map_batches(_Normalize(CANONICAL[table]),
                        batch_format="pyarrow")
    if columns and fmt != "parquet":
        ds = ds.select_columns(columns)
    return ds
