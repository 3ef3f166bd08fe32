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
