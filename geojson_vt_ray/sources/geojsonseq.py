"""Line-delimited GeoJSON source (GeoJSONSeq / .geojsonl / .ndjson —
the streaming interchange format tippecanoe and ogr2ogr emit, one
Feature per line).

Distributed shape: line formats carry no row index, so parallelism is
per FILE (the standard layout: a big export is already sharded into
many .geojsonl files). Two passes:

1. a cheap line-COUNT pass over the sorted file list (parallel Ray
   tasks, one small count per file) whose exclusive prefix sums give
   each file its global seq base — file-list-sized driver state only;
2. a parse pass (one task per file) that builds the same
   (doc_id, seq, spans) doc table `doc_table_from_geojson` builds, with
   seq = file_base + line_index — so a corpus split across N files
   yields BYTE-IDENTICAL doc tables to the single-FeatureCollection
   path (asserted in tests).

For one monolithic multi-GB file the upgrade path is byte-range splits
with a newline-count prefix scan (same two-pass shape, ranges instead
of files); not needed while exports ship sharded.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa


def _seq_files(path) -> list[str]:
    if isinstance(path, (list, tuple)):
        return sorted(str(p) for p in path)
    if os.path.isdir(path):
        return sorted(
            os.path.join(path, f) for f in os.listdir(path)
            if f.endswith((".geojsonl", ".ndjson", ".geojsons",
                           ".jsonl")))
    return [path]


def _count_lines(path: str) -> int:
    n = 0
    with open(path, "rb") as f:
        for line in f:
            if line.strip():
                n += 1
    return n


def _parse_file(path: str, base: int, prefix: str) -> pa.Table:
    from ..arrowio import SPAN_TYPE
    from .docs import _spans_for
    doc_ids, seqs, spans = [], [], []
    i = base
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            item = json.loads(line)
            doc_id = f"{prefix}-{i:06d}"
            doc_ids.append(doc_id)
            seqs.append(i)
            spans.append(_spans_for(doc_id, json.dumps(item), i))
            i += 1
    return pa.table({
        "doc_id": pa.array(doc_ids, pa.string()),
        "seq": pa.array(seqs, pa.int64()),
        "spans": pa.array(spans, SPAN_TYPE),
    })


def read_docs_geojsonseq(path, prefix: str = "doc"):
    """GeoJSONSeq file(s)/dir -> doc-table Dataset, order-stable: seq
    follows (sorted file rank, line number), identical to parsing the
    concatenation as one FeatureCollection."""
    import ray
    import ray.data as rd

    files = _seq_files(path)
    if not files:
        raise FileNotFoundError(f"no .geojsonl/.ndjson files in {path}")

    count_task = ray.remote(num_cpus=0.25)(_count_lines)
    counts = ray.get([count_task.remote(p) for p in files])
    bases, acc = [], 0
    for c in counts:
        bases.append(acc)
        acc += c

    items = [{"path": p, "base": b} for p, b in zip(files, bases)]

    def parse(batch) -> pa.Table:
        tables = [_parse_file(p, int(b), prefix)
                  for p, b in zip(batch["path"], batch["base"])]
        return pa.concat_tables(tables)

    return (rd.from_items(items)
            .repartition(len(items))
            .map_batches(parse, batch_format="numpy", batch_size=1))


def write_docs_geojsonseq(ds, out_dir: str,
                          rows_per_file: int = 10000) -> "object":
    """Inverse of read_docs_geojsonseq: export a doc-table Dataset (or
    pa.Table) as a sharded line-delimited GeoJSON tree — one Feature
    per line, one `part-NNNNNN.geojsonl` per contiguous seq range —
    the interchange format tippecanoe/ogr2ogr consume.

    Distributed shape: shard = seq // rows_per_file, ONE coarse
    groupby co-locates each shard, and a task per shard streams its
    lines out in seq order (tmp-file + atomic rename, so a killed run
    never publishes a partial shard). File rank equals shard rank, so
    `read_docs_geojsonseq(out_dir)` reproduces the IDENTICAL doc
    table (doc_id/seq/spans) — asserted in tests. Returns the
    (shard, path, rows) manifest as a pa.Table (driver-held,
    file-list-sized)."""
    import pyarrow.compute as pc
    import ray.data as rd

    os.makedirs(out_dir, exist_ok=True)
    if isinstance(ds, pa.Table):
        ds = rd.from_arrow(ds)

    def add_shard(b: pa.Table) -> pa.Table:
        seq = b.column("seq").to_numpy(zero_copy_only=False)
        return b.append_column(
            "shard", pa.array((seq // rows_per_file).astype("int64")))

    def write_shard(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(g, sort_keys=[("seq", "ascending")])
        g = g.take(order)
        shard = int(g.column("shard")[0].as_py())
        path = os.path.join(out_dir, f"part-{shard:06d}.geojsonl")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            for spans in g.column("spans").to_pylist():
                geo = [s["text"] for s in spans if s["kind"] == "geo"]
                if not geo:
                    raise ValueError(
                        "doc without a geo span cannot export to "
                        "GeoJSONSeq (spans kinds: "
                        f"{[s['kind'] for s in spans]})")
                f.write(geo[0] + "\n")
        os.replace(tmp, path)
        return pa.table({"shard": pa.array([shard], pa.int64()),
                         "path": pa.array([path], pa.string()),
                         "rows": pa.array([g.num_rows], pa.int64())})

    manifest = (ds.map_batches(add_shard, batch_format="pyarrow")
                .groupby("shard")
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
