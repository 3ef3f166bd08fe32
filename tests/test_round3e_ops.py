"""Edge-case tests for the round-3 session-E operators: moran_i,
dwell_time, new_vs_returning. (Oracle parity runs in
test_queries_oracle.py; these pin analytically-known corners —
degenerate grids, tie ordering, single-visit users — that random
testdata can't reach.)"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from geojson_vt_ray.pipelines import queries as Q


def _write(tmp_path, name, table):
    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    pq.write_table(table, str(d / f"{name}.parquet"))
    return str(d)


def _events_table(rows):
    """rows: (event_id, ts_us, user_id) triples."""
    return pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array(np.array([r[1] for r in rows],
                                dtype="datetime64[us]")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array(["view"] * len(rows), pa.string()),
        "value": pa.array([1.0] * len(rows), pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string())})


# ------------------------------------------------------------- moran_i
def test_moran_i_single_event_degenerate(ray_session, tmp_path):
    """One event -> one occupied cell: deviation d = 1*1 - 1 = 0, so
    den = 0 and Moran's I is undefined (NULL), with zero neighbor
    pairs — not a crash or a divide-by-zero."""
    sf = _write(tmp_path, "events", _events_table([(0, 10**15, 1)]))
    out = Q.q_moran_i(sf).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r["n_cells"] == 1 and r["w_pairs"] == 0
    assert r["num"] == 0.0 and r["den"] == 0.0
    assert np.isnan(r["moran_i"])


def test_moran_i_two_adjacent_cells_exact(ray_session, tmp_path):
    """Two occupied adjacent cells with counts 1 and 3: N=2, S=4,
    d = (-2, +2); queen adjacency gives w_pairs=2 (both directions),
    num = 2*(-2*2) = -8, den = 8, I = (2*-8)/(2*8) = -1.0 — perfect
    checkerboard anti-correlation. Verified against the DuckDB oracle
    on the same tiny table too."""
    import duckdb
    # event_id 0 and 64: lon -180.0 vs -173.6 -> level-6 cells x=0 and
    # x=1 at the same y (lat -80.0 vs -73.6 can differ in y, so pin
    # lat by choosing ids congruent mod 1600: 0 and 3200 share lat,
    # but 3200 % 3600 = 3200 -> lon 140, far away. Use ids 0 and 64:
    # same cell_y requires checking; compute cells via the engine's
    # own assigner instead of guessing.)
    from geojson_vt_ray.pipelines.queries import AssignCells
    # find two ids in adjacent cells on the same row of the grid
    ids = np.arange(4000, dtype=np.int64)
    lon = (ids % 3600).astype(np.float64) / 10.0 - 180.0
    lat = (ids % 1600).astype(np.float64) / 10.0 - 80.0
    tbl = pa.table({"lon": pa.array(lon), "lat": pa.array(lat),
                    "event_id": pa.array(ids)})
    cells = AssignCells(6)(tbl)
    cx = cells.column("cell_x").to_numpy(zero_copy_only=False)
    cy = cells.column("cell_y").to_numpy(zero_copy_only=False)
    # pick id A in some cell and id B in the (x+1, same y) cell
    want = {}
    for i in range(len(ids)):
        want[(int(cx[i]), int(cy[i]))] = int(ids[i])
    pair = None
    for (x, y), a in want.items():
        if (x + 1, y) in want:
            pair = (a, want[(x + 1, y)])
            break
    assert pair is not None
    a, b = pair
    rows = [(a, 10**15, 1), (b, 10**15 + 1, 1),
            (b, 10**15 + 2, 2), (b, 10**15 + 3, 3)]
    sf = _write(tmp_path, "events", _events_table(rows))
    out = Q.q_moran_i(sf).to_pandas().iloc[0]
    assert out["n_cells"] == 2 and out["w_pairs"] == 2
    assert out["num"] == -8.0 and out["den"] == 8.0
    assert out["moran_i"] == -1.0
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{sf}/events.parquet'")
    want_df = con.execute(Q._sql_moran_i()).fetchdf()
    assert want_df.iloc[0]["moran_i"] == -1.0
    assert int(want_df.iloc[0]["w_pairs"]) == 2


# ---------------------------------------------------------- dwell_time
def test_dwell_time_ties_boundaries_and_last_event(ray_session,
                                                   tmp_path):
    """A ts tie orders by event_id (dwell 0 between tied rows here);
    each user's last event dwells 0; single-event users contribute a
    zero-dwell row for their cell (the group still appears)."""
    t0 = 10**15
    rows = [
        # user 1: two events 5us apart in (possibly different) cells
        (0, t0, 1), (1, t0 + 5, 1),
        # user 2: tie at t0 (order by event_id), then +7us
        (2, t0, 2), (3, t0, 2), (4, t0 + 7, 2),
        # user 3: single event -> dwell 0
        (5, t0 + 100, 3)]
    sf = _write(tmp_path, "events", _events_table(rows))
    out = Q.q_dwell_time(sf).to_pandas()
    assert int(out["dwell_us"].sum()) == 5 + 0 + 7 + 0
    # every touched cell appears, even all-zero-dwell ones
    import duckdb
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{sf}/events.parquet'")
    want = con.execute(Q._sql_dwell_time()).fetchdf()
    g = out.sort_values("cell_id", ignore_index=True)
    w = want.sort_values("cell_id", ignore_index=True)
    assert g["cell_id"].tolist() == w["cell_id"].tolist()
    assert g["dwell_us"].tolist() == w["dwell_us"].tolist()


# ---------------------------------------------------- new_vs_returning
def test_new_vs_returning_split(ray_session, tmp_path):
    """User A active days 0,1,2 (new on 0, returning twice); user B
    active day 1 only (new); user C active days 1 and 1 (dup rows
    collapse: one new). Day 0: 1 new / 0 ret; day 1: 2 new / 1 ret;
    day 2: 0 new / 1 ret."""
    day = 86_400_000_000
    rows = [
        (0, 0 * day + 10, 100), (1, 1 * day + 10, 100),
        (2, 2 * day + 10, 100),
        (3, 1 * day + 20, 200),
        (4, 1 * day + 30, 300), (5, 1 * day + 40, 300)]
    sf = _write(tmp_path, "events", _events_table(rows))
    out = (Q.q_new_vs_returning(sf).to_pandas()
           .sort_values("day", ignore_index=True))
    assert out["day"].tolist() == [0, 1, 2]
    assert out["n_new_users"].tolist() == [1, 2, 0]
    assert out["n_returning_users"].tolist() == [0, 1, 1]


# ----------------------------------------------------------- line_dedup
def test_line_dedup_planted_segments(ray_session, tmp_path):
    """Segment duplication is CROSS-document: a segment repeated twice
    inside one doc only is not duplicated; a segment shared by two
    docs marks BOTH instances (all of them, including within-doc
    repeats); the short tail segment counts as its own segment."""
    seg_a = "alpha beta gamma delta epsilon"        # 5 words
    seg_b = "one two three four five"
    docs = [
        # doc 0: seg_a + seg_a (self-repeat only) + 2-word tail
        (0, f"{seg_a} {seg_a} tail words"),
        # doc 1: seg_b + seg_a -> its seg_a instance is cross-dup,
        # which also flips doc 0's two instances to dup
        (1, f"{seg_b} {seg_a}"),
        # doc 2: unique content, one partial segment
        (2, "lonely little doc"),
    ]
    tbl = pa.table({
        "doc_id": pa.array([d[0] for d in docs], pa.int64()),
        "text": pa.array([d[1] for d in docs], pa.string()),
        "lang": pa.array(["en"] * 3, pa.string()),
        "source": pa.array(["s"] * 3, pa.string()),
        "n_chars": pa.array([len(d[1]) for d in docs], pa.int64())})
    sf = _write(tmp_path, "documents", tbl)
    out = (Q.q_line_dedup(sf).to_pandas()
           .sort_values("doc_id", ignore_index=True))
    assert out["doc_id"].tolist() == [0, 1, 2]
    assert out["n_segments"].tolist() == [3, 2, 1]
    assert out["n_dup_segments"].tolist() == [2, 1, 0]
    # DuckDB mirror on the same table
    import duckdb
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf}/documents.parquet'")
    want = (con.execute(Q._sql_line_dedup()).fetchdf()
            .sort_values("doc_id", ignore_index=True))
    assert want["n_segments"].tolist() == [3, 2, 1]
    assert want["n_dup_segments"].tolist() == [2, 1, 0]


# ------------------------------------------------------------- ks_drift
def test_ks_drift_identical_disjoint_and_onesided(ray_session,
                                                  tmp_path):
    """Identical value distributions -> D = 0; fully disjoint value
    ranges -> D = 1.0 (d_num = n_a*n_b); a type with zero rows ->
    NULL ratio, zero numerator — all integer-exact."""
    def ev(rows):
        return pa.table({
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array(np.array([10**15] * len(rows),
                                    dtype="datetime64[us]")),
            "user_id": pa.array([1] * len(rows), pa.int64()),
            "event_type": pa.array([r[0] for r in rows], pa.string()),
            "value": pa.array([r[1] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string())})

    # identical: both types see values {1.00, 2.00}
    sf = _write(tmp_path, "events", ev([
        ("purchase", 1.0), ("purchase", 2.0),
        ("view", 1.0), ("view", 2.0)]))
    out = Q.q_ks_drift(sf).to_pandas().iloc[0]
    assert out["d_num"] == 0 and out["ks_d"] == 0.0

    # disjoint: purchases all below views
    (tmp_path / "b").mkdir()
    sf2 = _write(tmp_path / "b", "events", ev([
        ("purchase", 1.0), ("purchase", 1.5),
        ("view", 9.0), ("view", 9.5), ("view", 10.0)]))
    out2 = Q.q_ks_drift(sf2).to_pandas().iloc[0]
    assert out2["d_num"] == 2 * 3 and out2["ks_d"] == 1.0

    # one-sided: no views at all
    (tmp_path / "c").mkdir()
    sf3 = _write(tmp_path / "c", "events",
                 ev([("purchase", 1.0), ("purchase", 2.0)]))
    out3 = Q.q_ks_drift(sf3).to_pandas().iloc[0]
    assert out3["d_num"] == 0 and out3["n_b"] == 0
    assert np.isnan(out3["ks_d"])


# ------------------------------------------------------- weighted_sample
def test_weighted_sample_deterministic_and_weight_proportional(
        ray_session, tmp_path):
    """The kept set equals an independent hashlib recompute exactly
    (order-independent determinism); zero-weight rows are never kept;
    heavier rows are kept ~proportionally more often (50x weight on
    fixed hashes)."""
    import hashlib
    n = 3000
    qty = [0.0 if i % 3 == 0 else (1.0 if i % 3 == 1 else 50.0)
           for i in range(n)]
    li = pa.table({
        "l_orderkey": pa.array(range(n), pa.int64()),
        "l_partkey": pa.array([0] * n, pa.int64()),
        "l_suppkey": pa.array([0] * n, pa.int64()),
        "l_linenumber": pa.array([1] * n, pa.int32()),
        "l_quantity": pa.array(qty, pa.float64()),
        "l_extendedprice": pa.array([100.0] * n, pa.float64()),
        "l_discount": pa.array([0.0] * n, pa.float64()),
        "l_tax": pa.array([0.0] * n, pa.float64()),
        "l_returnflag": pa.array(["N"] * n, pa.string()),
        "l_linestatus": pa.array(["O"] * n, pa.string()),
        "l_shipdate": pa.array(
            [np.datetime64("2024-01-01", "us")] * n)})
    orders = pa.table({
        "o_orderkey": pa.array(range(n), pa.int64()),
        "o_custkey": pa.array([1] * n, pa.int64()),
        "o_orderstatus": pa.array(["O"] * n, pa.string()),
        "o_totalprice": pa.array([1.0] * n, pa.float64()),
        "o_orderdate": pa.array(
            [np.datetime64("2024-01-01", "us")] * n),
        "o_orderpriority": pa.array(["1-URGENT"] * n, pa.string())})
    sf = _write(tmp_path, "lineitem", li)
    _write(tmp_path, "orders", orders)
    got = Q.q_weighted_sample(sf).to_pandas()
    T = Q._WS_T
    want = {i for i in range(n)
            if int(hashlib.md5(f"{i}:1".encode()).hexdigest()[:12], 16)
            < int(qty[i]) * T}
    assert set(got["l_orderkey"].tolist()) == want
    kept_q = got.groupby("qty").size()
    assert 0 not in kept_q.index              # zero weight: never kept
    assert kept_q.get(50, 0) > 10 * kept_q.get(1, 0)


# -------------------------------------------------------- nearest_supplier
def test_nearest_supplier_tiebreak_and_exactness(ray_session, tmp_path):
    """Two suppliers equidistant from an event must assign the SMALLER
    s_suppkey; distances are exact integer decidegrees."""
    # suppliers 10 and 350: 10%340=10 vs 350%340=10 -> same sx;
    # 10%150=10 vs 350%150=50 -> sy 10*10-775=-675 vs 50*10-775=-275.
    # pick an event equidistant in ey between -675 and -275: ey=-475
    # -> event_id % 1600 = 325; also fix ex anywhere: event_id=325
    # gives ex=325-1800=-1475.
    sup = pa.table({
        "s_suppkey": pa.array([350, 10], pa.int64()),  # unsorted input
        "s_name": pa.array(["a", "b"], pa.string()),
        "s_nationkey": pa.array([0, 0], pa.int32())})
    ev = pa.table({
        "event_id": pa.array([325], pa.int64()),
        "ts": pa.array(np.array([10**15], dtype="datetime64[us]")),
        "user_id": pa.array([1], pa.int64()),
        "event_type": pa.array(["view"], pa.string()),
        "value": pa.array([1.0], pa.float64()),
        "props": pa.array(["{}"], pa.string())})
    sf = _write(tmp_path, "supplier", sup)
    _write(tmp_path, "events", ev)
    out = Q.q_nearest_supplier(sf).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    # equidistant: |(-475)-(-675)| == |(-475)-(-275)| == 200
    assert r["s_suppkey"] == 10          # smaller key wins the tie
    want_d2 = (325 - 1800 - (10 * 10 - 1695)) ** 2 + 200 ** 2
    assert r["d2"] == want_d2


# ------------------------------------------------------------- lag_corr
def test_lag_corr_planted_shift(ray_session, tmp_path):
    """Events are revenue shifted one day later: corr must be exactly
    1.0 at lag +1 (y[t+1] pairs with x[t]) and below 1 elsewhere; the
    dense grid zero-fills days absent from one series."""
    day = 86_400_000_000
    # revenue pattern over days 0..4 (non-self-similar under shift)
    pat = [1.0, 5.0, 2.0, 9.0, 3.0]
    orders = pa.table({
        "o_orderkey": pa.array(range(5), pa.int64()),
        "o_custkey": pa.array([1] * 5, pa.int64()),
        "o_orderstatus": pa.array(["O"] * 5, pa.string()),
        "o_totalprice": pa.array(pat, pa.float64()),
        "o_orderdate": pa.array(np.array(
            [d * day for d in range(5)], dtype="datetime64[us]")),
        "o_orderpriority": pa.array(["1"] * 5, pa.string())})
    # events on days 1..5: counts matching the pattern, +1 day
    rows = []
    eid = 0
    for d, c in zip(range(1, 6), (1, 5, 2, 9, 3)):
        for _ in range(c):
            rows.append((eid, d * day + 5, 1))
            eid += 1
    events = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array(np.array([r[1] for r in rows],
                                dtype="datetime64[us]")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array(["view"] * len(rows), pa.string()),
        "value": pa.array([1.0] * len(rows), pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string())})
    sf = _write(tmp_path, "orders", orders)
    _write(tmp_path, "events", events)
    out = (Q.q_lag_corr(sf).to_pandas()
           .set_index("lag").sort_index())
    # grid spans days 0..5 (6 days); lag 1 pairs 5 days
    assert out.loc[1, "n_days"] == 5
    assert out.loc[1, "corr"] == 1.0
    assert all(out.loc[lg, "corr"] < 1.0
               for lg in out.index if lg != 1)
    # DuckDB mirror on the same tables
    import duckdb
    con = duckdb.connect()
    for t in ("orders", "events"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{sf}/{t}.parquet'")
    want = con.execute(Q._sql_lag_corr()).fetchdf()
    assert want.set_index("lag").loc[1, "corr"] == 1.0


# ------------------------------------------------------------ traj_bbox
def test_traj_bbox_inside_crossing_and_singletons(ray_session,
                                                  tmp_path):
    """Segments classify by endpoint membership: inside-inside counts
    n_seg_inside and its exact squared length; inside-outside (either
    direction) counts n_seg_crossing; outside-outside counts nothing;
    single-event users emit an all-zero row."""
    # fence: ix in [1200, 2399], iy in [500, 1099]
    # event_id -> (ix, iy) = (id % 3600, id % 1600)
    # pick ids: A=1300 (ix 1300, iy 1300-OUTSIDE y)? no: iy must be in
    # range. id 2100 -> ix 2100, iy 500 (inside). id 2101 -> 2101, 501
    # (inside). id 100 -> (100, 100) outside.
    day = 10**15
    rows = [
        # user 1: inside -> inside -> outside (1 inside seg, 1 cross)
        (2100, day + 1, 1), (2101, day + 2, 1), (100, day + 3, 1),
        # user 2: outside -> outside (no counts, row still present)
        (100, day + 1, 2), (200, day + 2, 2),
        # user 3: single event
        (2100, day + 9, 3)]
    ev = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array(np.array([r[1] for r in rows],
                                dtype="datetime64[us]")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array(["view"] * len(rows), pa.string()),
        "value": pa.array([1.0] * len(rows), pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string())})
    sf = _write(tmp_path, "events", ev)
    out = (Q.q_traj_bbox(sf).to_pandas()
           .sort_values("user_id", ignore_index=True))
    assert out["user_id"].tolist() == [1, 2, 3]
    assert out["n_seg_inside"].tolist() == [1, 0, 0]
    assert out["n_seg_crossing"].tolist() == [1, 0, 0]
    assert out["sum_d2_inside"].tolist() == [2, 0, 0]  # (1,1) step
    import duckdb
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{sf}/events.parquet'")
    want = (con.execute(Q._SQL_TRAJ_BBOX).fetchdf()
            .sort_values("user_id", ignore_index=True))
    assert want["n_seg_inside"].tolist() == [1, 0, 0]
    assert want["sum_d2_inside"].tolist() == [2, 0, 0]


# ---------------------------------------------------------------- cusum
def test_cusum_planted_level_shift(ray_session, tmp_path):
    """A series of 4 days at count 1 then 4 days at count 5 shifts
    level after day 3: centered counts are n*x - S = 8x - 24, so
    C = (-16,-32,-48,-64,-48,-32,-16,0); max |C| = 64 at the shift
    boundary (day 3), telescoping to 0 at the end. A constant series
    reads cusum_max = 0 at its first day."""
    day = 86_400_000_000
    rows, eid = [], 0
    for d in range(8):
        for _ in range(1 if d < 4 else 5):
            rows.append((eid, d * day + 3, 1, "shift"))
            eid += 1
    for d in range(3):                    # constant type: 2/day
        for _ in range(2):
            rows.append((eid, d * day + 3, 1, "flat"))
            eid += 1
    ev = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array(np.array([r[1] for r in rows],
                                dtype="datetime64[us]")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([1.0] * len(rows), pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string())})
    sf = _write(tmp_path, "events", ev)
    out = (Q.q_cusum(sf).to_pandas()
           .set_index("event_type"))
    assert out.loc["shift", "n_days"] == 8
    assert out.loc["shift", "cusum_max"] == 64
    assert out.loc["shift", "change_day"] == 3
    assert out.loc["flat", "cusum_max"] == 0
    assert out.loc["flat", "change_day"] == 0
    import duckdb
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{sf}/events.parquet'")
    want = con.execute(Q._SQL_CUSUM).fetchdf().set_index("event_type")
    assert want.loc["shift", "cusum_max"] == 64
    assert want.loc["shift", "change_day"] == 3
