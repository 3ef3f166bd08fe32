"""Store maintenance: small-file compaction for partitioned parquet.

The small-file problem is the canonical failure mode of long-lived
streaming stores (a tile store appended per-shard, an event log
flushed per-task): millions of KB-sized parquet files whose open/footer
overhead dominates every later read. `compact_parquet` rewrites each
hive partition's fragments into files of ~`target_rows` rows (and
row groups coalesced to the same size — tiny input row groups do NOT
survive) while preserving content exactly.

Distributed shape: the driver holds only the LEAF-DIRECTORY list (one
entry per hive partition — bounded by the partition scheme, never by
rows); each leaf compacts in its own Ray task, STREAMING its fragments
row-group-by-row-group into a bounded buffer that flushes every
`target_rows` rows (peak memory is one output file's rows, never the
leaf). A leaf is published by moving its finished parts into place and
writing a `_SUCCESS` marker LAST — so a killed compaction resumes by
rerunning: finished partitions (marker present) cost one stat; a leaf
with a stale half-written tmp dir or a crashed partial publish is
rebuilt from scratch (stale state is deleted, never reused).
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

_MARKER = "_SUCCESS"


def _leaf_dirs(root: str) -> list[str]:
    """Directories under root that directly contain parquet files,
    as root-relative paths ('' for a flat, unpartitioned dir)."""
    out = []
    for cur, _dirs, files in os.walk(root):
        if any(f.endswith(".parquet") for f in files):
            rel = os.path.relpath(cur, root)
            out.append("" if rel == "." else rel)
    return sorted(out)


def _compact_leaf(src_leaf: str, dst_leaf: str, rel: str,
                  target_rows: int) -> dict:
    """Stream every fragment of one leaf through a rolling buffer.
    Returns a manifest row. Runs inside a Ray task."""
    files = sorted(os.path.join(src_leaf, f)
                   for f in os.listdir(src_leaf)
                   if f.endswith(".parquet"))
    tmp = dst_leaf.rstrip(os.sep) + ".inprogress"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)        # stale tmp from a killed run: never reuse
    os.makedirs(tmp)
    part = n_rows = 0
    buf: list[pa.Table] = []
    buf_rows = 0
    schema = None

    def _flush():
        nonlocal part, buf, buf_rows
        if not buf:
            return
        pq.write_table(pa.concat_tables(buf),
                       os.path.join(tmp, f"part-{part:04d}.parquet"),
                       row_group_size=target_rows)
        part += 1
        buf, buf_rows = [], 0

    for path in files:
        pf = pq.ParquetFile(path)
        if schema is None:
            schema = pf.schema_arrow
        for rg in range(pf.num_row_groups):
            tbl = pf.read_row_group(rg)
            # tolerate benign fragment-schema drift (field order)
            tbl = tbl.select(schema.names).cast(schema)
            buf.append(tbl)
            buf_rows += tbl.num_rows
            n_rows += tbl.num_rows
            if buf_rows >= target_rows:
                _flush()
    _flush()
    # Publish: move parts into place, write the marker LAST. A crash
    # between the two leaves parquet files but no marker — the resume
    # path treats that as unfinished and rebuilds the leaf.
    os.makedirs(dst_leaf, exist_ok=True)
    for f in os.listdir(dst_leaf):           # clear a crashed partial publish
        if f.startswith("part-") and f.endswith(".parquet"):
            os.remove(os.path.join(dst_leaf, f))
    for f in sorted(os.listdir(tmp)):
        os.replace(os.path.join(tmp, f), os.path.join(dst_leaf, f))
    with open(os.path.join(dst_leaf, _MARKER), "w"):
        pass
    os.rmdir(tmp)
    return {"leaf": rel or ".", "files_in": len(files),
            "files_out": part, "rows": n_rows}


def compact_parquet(src_dir: str, dst_dir: str,
                    target_rows: int = 1_000_000) -> list[dict]:
    """Compact every hive leaf of ``src_dir`` into ``dst_dir`` (same
    relative layout; a flat src compacts into dst_dir itself). Returns
    one manifest dict per COMPACTED leaf; leaves whose destination
    holds a ``_SUCCESS`` marker are skipped (resume)."""
    import ray

    leaves = _leaf_dirs(src_dir)
    if not leaves:
        raise FileNotFoundError(f"no parquet leaves under {src_dir}")

    @ray.remote
    def work(rel: str) -> dict:
        return _compact_leaf(os.path.join(src_dir, rel) if rel else src_dir,
                             os.path.join(dst_dir, rel) if rel else dst_dir,
                             rel, target_rows)

    todo = [rel for rel in leaves
            if not os.path.isfile(os.path.join(dst_dir, rel, _MARKER))]
    return ray.get([work.remote(rel) for rel in todo])


# ------------------------------------------------------------ IVM
def ivm_update(store: str, delta, key_cols: list[str],
               sum_cols: list[str], count_col: str = "n_rows"):
    """Incremental view maintenance for SUM/COUNT aggregates: fold a
    delta Dataset into a persistent per-key aggregate store WITHOUT
    re-scanning history — the materialized-view refresh every nightly
    pipeline reimplements. Invariant (tested):
    ivm_update(agg(base), delta) == agg(base UNION delta), exactly.

    Store layout: ``store/v{NNNN}/`` parquet version dirs, each a
    complete (key_cols..., sum_cols..., count_col) table published
    with a ``_SUCCESS`` marker LAST — the same crash contract as
    compact_parquet: readers always see the latest COMPLETE version;
    a killed update leaves a stale marker-less dir that the next run
    deletes and rebuilds.

    Distributed shape: the delta collapses to per-batch per-key
    partials (vectorized pandas groupby — the SUM/COUNT algebra is
    mergeable, so re-executed blocks never double-count inside one
    Ray execution); the current store version streams in as-is (its
    rows are themselves partials); ONE distributed Sum-aggregate
    groupby over the union merges everything; the result lands as
    partitioned parquet (one file per block — resumable-output
    contract). Driver holds only paths."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd
    from ray.data.aggregate import Sum

    os.makedirs(store, exist_ok=True)

    def _versions(root: str) -> list[str]:
        out = []
        for d in sorted(os.listdir(root)):
            if d.startswith("v") and os.path.isfile(
                    os.path.join(root, d, _MARKER)):
                out.append(d)
        return out

    # drop stale marker-less dirs from killed runs
    for d in sorted(os.listdir(store)):
        p = os.path.join(store, d)
        if (d.startswith("v") and os.path.isdir(p)
                and not os.path.isfile(os.path.join(p, _MARKER))):
            shutil.rmtree(p)

    vs = _versions(store)
    cur = os.path.join(store, vs[-1]) if vs else None
    nxt = f"v{(int(vs[-1][1:]) + 1) if vs else 0:04d}"
    dst = os.path.join(store, nxt)

    def partial(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        g = df.groupby(key_cols, sort=False, as_index=False).agg(
            **{c: (c, "sum") for c in sum_cols},
            **{count_col: (key_cols[0], "size")})
        cols = {}
        for c in key_cols:
            cols[c] = pa.array(g[c])
        for c in sum_cols + [count_col]:
            cols[c] = pa.array(g[c].to_numpy("int64"))
        return pa.table(cols)

    upd = delta.map_batches(partial, batch_format="pyarrow")
    if cur is not None:
        upd = upd.union(rd.read_parquet(cur))
    merged = upd.groupby(key_cols).aggregate(
        *[Sum(c, alias_name=c) for c in sum_cols + [count_col]])
    merged.write_parquet(dst)
    # a zero-row merge writes no files and does NOT create dst — an
    # empty first delta must still publish an (empty) version
    os.makedirs(dst, exist_ok=True)
    with open(os.path.join(dst, _MARKER), "w"):
        pass
    return dst


def read_ivm(store: str):
    """Latest COMPLETE version of an ivm_update store as a Dataset."""
    import ray.data as rd
    vs = [d for d in sorted(os.listdir(store))
          if d.startswith("v") and os.path.isfile(
              os.path.join(store, d, _MARKER))]
    if not vs:
        raise FileNotFoundError(f"no complete version under {store}")
    return rd.read_parquet(os.path.join(store, vs[-1]))
