"""Store maintenance: small-file compaction for partitioned parquet.

The small-file problem is the canonical failure mode of long-lived
streaming stores (a tile store appended per-shard, an event log
flushed per-task): millions of KB-sized parquet files whose open/footer
overhead dominates every later read. `compact_parquet` rewrites each
hive partition's fragments into files of ~`target_rows` rows while
preserving content exactly.

Distributed shape: the driver holds only the LEAF-DIRECTORY list (one
entry per hive partition — bounded by the partition scheme, never by
rows); each leaf compacts in its own Ray task, STREAMING its fragments
row-group-by-row-group through a rolling writer (a leaf larger than
worker memory never materializes — peak memory is one row group plus
one output buffer). Output is written to a NEW tree, one `part-NNNN`
series per leaf, and a leaf whose output directory already exists is
skipped — so a killed compaction resumes by rerunning, finished
partitions cost a directory stat (the same resumability contract as
the pyramid store).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq


def _leaf_dirs(root: str) -> list[str]:
    """Directories under root that directly contain parquet files,
    as root-relative paths ('' for a flat, unpartitioned dir)."""
    out = []
    for cur, _dirs, files in os.walk(root):
        if any(f.endswith(".parquet") for f in files):
            out.append(os.path.relpath(cur, root))
    return sorted(out)


def _compact_leaf(src_leaf: str, dst_leaf: str,
                  target_rows: int) -> dict:
    """Stream every fragment of one leaf through a rolling writer.
    Returns a manifest row. Runs inside a Ray task."""
    files = sorted(os.path.join(src_leaf, f)
                   for f in os.listdir(src_leaf)
                   if f.endswith(".parquet"))
    tmp = dst_leaf + ".inprogress"
    os.makedirs(tmp, exist_ok=True)
    writer = None
    part = n_rows = rows_in_part = 0
    schema = None
    try:
        for path in files:
            pf = pq.ParquetFile(path)
            if schema is None:
                schema = pf.schema_arrow
            for rg in range(pf.num_row_groups):
                tbl = pf.read_row_group(rg)
                # tolerate benign fragment-schema drift (field order)
                tbl = tbl.select(schema.names).cast(schema)
                if writer is None:
                    writer = pq.ParquetWriter(
                        os.path.join(tmp, f"part-{part:04d}.parquet"),
                        schema)
                writer.write_table(tbl)
                n_rows += tbl.num_rows
                rows_in_part += tbl.num_rows
                if rows_in_part >= target_rows:
                    writer.close()
                    writer = None
                    part += 1
                    rows_in_part = 0
    finally:
        if writer is not None:
            writer.close()
    os.rename(tmp, dst_leaf)   # atomic publish: resume sees all-or-none
    return {"leaf": os.path.basename(dst_leaf) or dst_leaf,
            "files_in": len(files), "files_out": part + 1,
            "rows": n_rows}


def compact_parquet(src_dir: str, dst_dir: str,
                    target_rows: int = 1_000_000) -> list[dict]:
    """Compact every hive leaf of ``src_dir`` into ``dst_dir`` (same
    relative layout). Returns one manifest dict per COMPACTED leaf;
    leaves whose destination already exists are skipped (resume)."""
    import ray

    leaves = _leaf_dirs(src_dir)
    if not leaves:
        raise FileNotFoundError(f"no parquet leaves under {src_dir}")

    @ray.remote
    def work(rel: str) -> dict:
        return _compact_leaf(os.path.join(src_dir, rel),
                             os.path.join(dst_dir, rel), target_rows)

    todo = []
    for rel in leaves:
        dst_leaf = os.path.join(dst_dir, rel)
        if os.path.isdir(dst_leaf):
            continue                       # finished in a prior run
        os.makedirs(os.path.dirname(dst_leaf) or dst_dir, exist_ok=True)
        todo.append(rel)
    return ray.get([work.remote(rel) for rel in todo])
