"""Edge-case tests for the round-3 session-D statistics operators:
corr_matrix, group_regression, hourly_entropy. (Oracle parity runs in
test_queries_oracle.py; these pin analytically-known corners —
perfect linearity, exact fits, degenerate distributions — that random
testdata can't reach.)"""

import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from geojson_vt_ray.pipelines import queries as Q


def _write(tmp_path, name, table):
    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    pq.write_table(table, str(d / f"{name}.parquet"))
    return str(d)


def _lineitem_table(qty, price, disc=None, tax=None, flag=None):
    n = len(qty)
    return pa.table({
        "l_orderkey": pa.array(range(n), pa.int64()),
        "l_partkey": pa.array([0] * n, pa.int64()),
        "l_suppkey": pa.array([0] * n, pa.int64()),
        "l_linenumber": pa.array([1] * n, pa.int32()),
        "l_quantity": pa.array([float(v) for v in qty], pa.float64()),
        "l_extendedprice": pa.array([float(v) for v in price],
                                    pa.float64()),
        "l_discount": pa.array(
            [float(v) for v in (disc or [0.0] * n)], pa.float64()),
        "l_tax": pa.array(
            [float(v) for v in (tax or [0.0] * n)], pa.float64()),
        "l_returnflag": pa.array(flag or ["A"] * n, pa.string()),
        "l_linestatus": pa.array(["O"] * n, pa.string()),
        "l_shipdate": pa.array(
            [np.datetime64("2024-01-01", "us")] * n)})


# --------------------------------------------------------- corr_matrix
def test_corr_matrix_perfect_linearity(ray_session, tmp_path):
    """price = 3*qty exactly -> corr(qty, price) = 1.0; an
    anti-correlated tax column reads -1.0."""
    qty = list(range(1, 11))
    sf = _write(tmp_path, "lineitem", _lineitem_table(
        qty, [3 * q for q in qty],
        disc=[0.05] * 10,                     # constant -> NaN corr
        tax=[(11 - q) / 100.0 for q in qty]))  # tax cents = 11 - qty
    out = {r["pair"]: r["corr"]
           for r in Q.q_corr_matrix(sf).to_pandas().to_dict("records")}
    assert out["qty_price"] == 1.0
    assert out["qty_tax"] == -1.0
    assert out["price_tax"] == -1.0
    # zero-variance column: correlation undefined -> NaN, not a crash
    assert math.isnan(out["qty_disc"])
    assert len(out) == 6


def test_corr_matrix_half_dollar_rounding(ray_session, tmp_path):
    """Prices ending in .50 must quantize half-away (DuckDB ROUND), not
    half-to-even: 2.50 -> 3, 3.50 -> 4 (half-to-even would give 2, 4
    and shift the moments)."""
    sf = _write(tmp_path, "lineitem", _lineitem_table(
        [1, 2], [2.50, 3.50]))
    import duckdb
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"'{sf}/lineitem.parquet'")
    want = con.execute(Q.ORACLE_SQL["corr_matrix"]).fetchdf()
    got = Q.q_corr_matrix(sf).to_pandas()
    g = got.set_index("pair")["corr"].to_dict()
    w = want.set_index("pair")["corr"].to_dict()
    for k in w:
        assert (math.isnan(w[k]) and math.isnan(g[k])) or g[k] == w[k]


# ---------------------------------------------------- group_regression
def test_group_regression_exact_fit(ray_session, tmp_path):
    """Group A: price = 7*qty + 100 exactly -> slope 7, intercept 100,
    r2 = 1. Group B: symmetric residuals around a flat line -> slope 0,
    intercept = mean(y), r2 = 0."""
    qty = [1, 2, 3, 4] + [1, 2, 3, 4]
    price = [107, 114, 121, 128] + [10, 30, 30, 10]
    flag = ["A"] * 4 + ["B"] * 4
    sf = _write(tmp_path, "lineitem",
                _lineitem_table(qty, price, flag=flag))
    out = Q.q_group_regression(sf).to_pandas().set_index("l_returnflag")
    assert out.loc["A", "slope"] == 7.0
    assert out.loc["A", "intercept"] == 100.0
    assert out.loc["A", "r2"] == 1.0
    assert out.loc["B", "slope"] == 0.0
    assert out.loc["B", "intercept"] == 20.0
    assert out.loc["B", "r2"] == 0.0


# ------------------------------------------------------ hourly_entropy
def test_hourly_entropy_degenerate_and_uniform(ray_session, tmp_path):
    """A type concentrated in ONE hour has entropy 0; a type uniform
    over 24 hours reads ln(24); counts are lifetime-exact."""
    rows = []
    eid = 0
    hour_us = 3_600_000_000
    for _ in range(5):                       # 'burst': all in hour 3
        rows.append((eid, 1, 3 * hour_us, "burst", 1.0))
        eid += 1
    for h in range(24):                      # 'flat': one per hour
        rows.append((eid, 2, h * hour_us, "flat", 1.0))
        eid += 1
    tbl = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string())})
    sf = _write(tmp_path, "events", tbl)
    out = Q.q_hourly_entropy(sf).to_pandas().set_index("event_type")
    assert out.loc["burst", "entropy"] == 0.0
    assert out.loc["burst", "n"] == 5
    assert out.loc["flat", "entropy"] == round(math.log(24), 6)
    assert out.loc["flat", "n"] == 24


# ------------------------------------------------- tokens_exploded
def test_tokens_exploded_matches_regex_semantics():
    """The vectorized explode must reproduce _RE2_TOKEN_RE.findall for
    every whitespace layout: tabs/newlines/form-feeds/CR, runs of
    separators, leading/trailing space, empty and whitespace-only
    docs, and non-ASCII spaces (U+00A0 stays INSIDE a token)."""
    from geojson_vt_ray.functions import text as T
    texts = ["a b", "a\tb\nc", "", "   ", "\t\n\f\r", "x", " lead",
             "trail ", "a  b", "nb sp", "mix \t y\r\nz", "é ü"]
    tbl = pa.table({"text": pa.array(texts, pa.string())})
    parent, flat = T.tokens_exploded(tbl)
    got = {}
    for p, tok in zip(parent, flat.to_pylist()):
        got.setdefault(int(p), []).append(tok)
    for i, t in enumerate(texts):
        assert got.get(i, []) == T._RE2_TOKEN_RE.findall(t), (i, t)
