"""Mirror of the driver's correctness gate: run every queries() entry at
sf0.001 and compare against its DuckDB oracle (row count + sorted value
equality), rows-only sanity for the non-SQL entries."""

import math

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def _to_pandas(res):
    import pyarrow as pa
    import ray.data
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con.execute(sql).fetchdf()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns), kind="mergesort",
                        ignore_index=True)
    return df


def _compare(got: pd.DataFrame, want: pd.DataFrame, name: str):
    if len(got) == 0 and len(want) == 0:
        return
    assert sorted(got.columns) == sorted(want.columns), \
        f"{name}: columns {sorted(got.columns)} != {sorted(want.columns)}"
    assert len(got) == len(want), \
        f"{name}: rows {len(got)} != {len(want)}"
    g = _canon(got)
    w = _canon(want)
    for c in g.columns:
        gv, wv = g[c], w[c]
        if gv.dtype.kind == "f" or wv.dtype.kind == "f":
            assert all(
                (math.isnan(a) and math.isnan(b)) or a == b or
                abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
                for a, b in zip(gv.astype(float), wv.astype(float))), \
                f"{name}: float column {c} differs"
        else:
            assert gv.astype(str).tolist() == wv.astype(str).tolist(), \
                f"{name}: column {c} differs"


def _entries():
    import __ray_entry__ as e
    qs = e.queries()
    oracles = e.oracle_sql()
    return qs, oracles


def test_all_queries_against_oracles(ray_session):
    qs, oracles = _entries()
    failures = []
    for name, fn in qs.items():
        got = _to_pandas(fn(SF_DIR))
        assert got is not None, name
        if name in oracles:
            want = _oracle(oracles[name])
            try:
                _compare(got, want, name)
            except AssertionError as err:
                failures.append(str(err))
        else:
            assert len(got) >= 0
    assert not failures, "\n".join(failures)


def test_entry_smoke(ray_session):
    import __ray_entry__ as e
    res = _to_pandas(e.entry())
    assert len(res) >= 0


def test_asof_join_bucket_without_orders(ray_session):
    """A coarse-hash bucket holding events whose keys match no order
    must yield no match, not an IndexError on the empty orders array
    (testdata only avoids this because user_ids are a custkey subset)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import tempfile, os, shutil
    from geojson_vt_ray.pipelines.queries import q_asof_join
    td = tempfile.mkdtemp()
    try:
        pq.write_table(pa.table({
            "o_orderkey": pa.array([1], pa.int64()),
            "o_custkey": pa.array([7], pa.int64()),
            "o_orderdate": pa.array(
                [np.datetime64("2024-01-01", "us")])}),
            os.path.join(td, "orders.parquet"))
        pq.write_table(pa.table({
            "event_id": pa.array([10, 11], pa.int64()),
            # user 7 matches; user 100007 shares no bucket orders at all
            "user_id": pa.array([7, 1_000_007], pa.int64()),
            "ts": pa.array([np.datetime64("2024-01-02", "us")] * 2)}),
            os.path.join(td, "events.parquet"))
        got = q_asof_join(td).to_pandas()
        assert got["event_id"].tolist() == [10]
        assert got["o_orderkey"].tolist() == [1]
    finally:
        shutil.rmtree(td)
