"""Edge-case tests for the round-4 operators. (Oracle parity runs in
test_queries_oracle.py and the full strict gate; these pin
analytically-known corners — zero denominators, exact ties, perfect
correlations, threshold strictness — that random testdata can't
reach.)"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from geojson_vt_ray.pipelines import queries as Q


def _write(tmp_path, tables: dict) -> str:
    d = tmp_path / "sf"
    d.mkdir(parents=True, exist_ok=True)
    for name, t in tables.items():
        pq.write_table(t, str(d / f"{name}.parquet"))
    return str(d)


def _events(rows):
    """rows: (event_id, ts_us, user_id, event_type, value)."""
    return pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array(np.array([r[1] for r in rows],
                                dtype="datetime64[us]")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([float(r[4]) for r in rows], pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string())})


def _lineitem(rows):
    """rows: (okey, pkey, skey, qty, ext, disc, ship_day)."""
    return pa.table({
        "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
        "l_suppkey": pa.array([r[2] for r in rows], pa.int64()),
        "l_quantity": pa.array([float(r[3]) for r in rows],
                               pa.float64()),
        "l_extendedprice": pa.array([float(r[4]) for r in rows],
                                    pa.float64()),
        "l_discount": pa.array([float(r[5]) for r in rows],
                               pa.float64()),
        "l_shipdate": pa.array(np.array(
            [np.int64(r[6]) * 86_400_000_000 for r in rows],
            dtype="datetime64[us]"))})


def _part(rows):
    """rows: (pkey, brand, ptype)."""
    return pa.table({
        "p_partkey": pa.array([r[0] for r in rows], pa.int64()),
        "p_brand": pa.array([r[1] for r in rows], pa.string()),
        "p_type": pa.array([r[2] for r in rows], pa.string())})


def _orders(rows):
    """rows: (okey, custkey, totalprice, priority, order_day)."""
    return pa.table({
        "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
        "o_totalprice": pa.array([float(r[2]) for r in rows],
                                 pa.float64()),
        "o_orderpriority": pa.array([r[3] for r in rows], pa.string()),
        "o_orderdate": pa.array(np.array(
            [np.int64(r[4]) * 86_400_000_000 for r in rows],
            dtype="datetime64[us]"))})


def _docs(rows):
    """rows: (doc_id, text, source)."""
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array(["en"] * len(rows), pa.string()),
        "source": pa.array([r[2] for r in rows], pa.string()),
        "n_chars": pa.array([len(r[1]) for r in rows], pa.int64())})


def test_promo_revenue_share(ray_session, tmp_path):
    """One month: promo units 10000 of 40000 total -> 25.0%."""
    sf = _write(tmp_path, {
        "part": _part([(1, "Brand#1", "PROMO"),
                       (2, "Brand#1", "ECONOMY")]),
        "lineitem": _lineitem([(1, 1, 1, 1, 1.00, 0.0, 0),
                               (1, 2, 1, 1, 3.00, 0.0, 0)])})
    df = Q.q_promo_revenue(sf).to_pandas()
    assert len(df) == 1
    assert df["promo_pct"].iloc[0] == 25.0
    assert df["n_items"].iloc[0] == 2


def test_small_qty_revenue_strict_threshold(ray_session, tmp_path):
    """5*q*n < sum_q is STRICT: quantities (1, 9) -> 10 < 10 fails,
    nothing qualifies; (1, 10) -> 10 < 11 passes for the q=1 line."""
    sf = _write(tmp_path, {
        "lineitem": _lineitem([(1, 1, 1, 1, 2.50, 0.0, 0),
                               (2, 1, 1, 9, 9.00, 0.0, 0)])})
    df = Q.q_small_qty_revenue(sf).to_pandas()
    assert df["n_qualifying"].iloc[0] == 0
    sf2 = _write(tmp_path / "b", {
        "lineitem": _lineitem([(1, 1, 1, 1, 2.50, 0.0, 0),
                               (2, 1, 1, 10, 9.00, 0.0, 0)])})
    df2 = Q.q_small_qty_revenue(sf2).to_pandas()
    assert df2["n_qualifying"].iloc[0] == 1
    assert df2["sum_cents"].iloc[0] == 250


def test_market_share_region_ratio(ray_session, tmp_path):
    """Region-2 supplier carries 1 of 4 revenue units -> 25.0%."""
    sup = pa.table({"s_suppkey": pa.array([1, 2], pa.int64()),
                    "s_nationkey": pa.array([0, 1], pa.int64())})
    nat = pa.table({"n_nationkey": pa.array([0, 1], pa.int64()),
                    "n_name": pa.array(["A", "B"], pa.string()),
                    "n_regionkey": pa.array([2, 0], pa.int64())})
    sf = _write(tmp_path, {
        "supplier": sup, "nation": nat,
        "lineitem": _lineitem([(1, 1, 1, 1, 1.00, 0.0, 10),
                               (1, 1, 2, 1, 3.00, 0.0, 10)])})
    df = Q.q_market_share(sf).to_pandas()
    assert len(df) == 1
    assert df["share_pct"].iloc[0] == 25.0


def test_edge_support_triangle_and_pendant(ray_session, tmp_path):
    """Order [1,2,3] makes a triangle (every edge support 1); the
    pendant edge (3,4) from order [3,4] closes nothing and is absent."""
    sf = _write(tmp_path, {
        "lineitem": _lineitem([(1, 1, 1, 1, 1.0, 0.0, 0),
                               (1, 2, 1, 1, 1.0, 0.0, 0),
                               (1, 3, 1, 1, 1.0, 0.0, 0),
                               (2, 3, 1, 1, 1.0, 0.0, 0),
                               (2, 4, 1, 1, 1.0, 0.0, 0)])})
    df = (Q.q_edge_support(sf).to_pandas()
          .sort_values(["id_a", "id_b"], ignore_index=True))
    assert list(map(tuple, df[["id_a", "id_b", "support"]]
                    .to_numpy())) == [(1, 2, 1), (1, 3, 1), (2, 3, 1)]


def test_peer_revenue_singleton_zero(ray_session, tmp_path):
    """Two-order customer: each order's peer sum is the other; a
    singleton customer reads 0."""
    sf = _write(tmp_path, {
        "orders": _orders([(1, 7, 10.00, "1-URGENT", 0),
                           (2, 7, 20.00, "1-URGENT", 1),
                           (3, 9, 5.00, "1-URGENT", 2)])})
    df = (Q.q_peer_revenue(sf).to_pandas()
          .set_index("o_orderkey"))
    assert df.loc[1, "peer_cents"] == 2000
    assert df.loc[2, "peer_cents"] == 1000
    assert df.loc[3, "peer_cents"] == 0


def test_autocorr_lag1_perfect_alternation(ray_session, tmp_path):
    """Daily counts 1,0,1,0,1 -> lag-1 pairs perfectly anti-correlated:
    acf1 = -1.0 exactly."""
    day = 86_400_000_000
    rows = [(i, i * 2 * day, 1, "view", 1.0) for i in range(3)]
    sf = _write(tmp_path, {"events": _events(rows)})
    df = Q.q_autocorr_lag1(sf).to_pandas()
    assert df["acf1"].iloc[0] == -1.0


def test_doc_top_term_df_tiebreak(ray_session, tmp_path):
    """Doc 1 has tf(a)=tf(b)=2; 'b' also appears in doc 2, so df(a)=1
    beats df(b)=2 and the keyword is 'a'. Empty docs emit nothing."""
    sf = _write(tmp_path, {
        "documents": _docs([(1, "b b a a c", "s"),
                            (2, "b", "s"),
                            (3, "", "s")])})
    df = (Q.q_doc_top_term(sf).to_pandas()
          .set_index("doc_id"))
    assert df.loc[1, "term"] == "a"
    assert df.loc[1, "tf"] == 2
    assert df.loc[2, "term"] == "b"
    assert 3 not in df.index


def test_sum_distinct_collapses_duplicates(ray_session, tmp_path):
    """Cents (100, 100, 300) in one priority: SUM(DISTINCT) = 400,
    COUNT(DISTINCT) = 2."""
    sf = _write(tmp_path, {
        "orders": _orders([(1, 1, 1.00, "P", 0),
                           (2, 2, 1.00, "P", 0),
                           (3, 3, 3.00, "P", 0)])})
    df = Q.q_sum_distinct(sf).to_pandas()
    assert df["sum_distinct_cents"].iloc[0] == 400
    assert df["n_distinct"].iloc[0] == 2


def test_cume_dist_inclusive_ties(ray_session, tmp_path):
    """Cents (100, 100, 200): both 100-rows read n_le=2 (right-
    inclusive — each counts its peer), the 200-row reads 3."""
    rows = [(0, 10, 1, "v", 1.00), (1, 20, 2, "v", 1.00),
            (2, 30, 3, "v", 2.00)]
    sf = _write(tmp_path, {"events": _events(rows)})
    df = (Q.q_cume_dist(sf).to_pandas().set_index("event_id"))
    assert df.loc[0, "n_le"] == 2
    assert df.loc[1, "n_le"] == 2
    assert df.loc[2, "n_le"] == 3
    assert (df["n_group"] == 3).all()


def test_supplier_hhi_monopoly_and_split(ray_session, tmp_path):
    """Single-supplier brand reads HHI 1.0; an even two-supplier split
    reads 0.5."""
    sf = _write(tmp_path, {
        "part": _part([(1, "Brand#M", "X"), (2, "Brand#S", "X")]),
        "lineitem": _lineitem([
            (1, 1, 5, 1, 1.0, 0.0, 0), (2, 1, 5, 1, 1.0, 0.0, 0),
            (3, 2, 6, 1, 1.0, 0.0, 0), (4, 2, 6, 1, 1.0, 0.0, 0),
            (5, 2, 7, 1, 1.0, 0.0, 0), (6, 2, 7, 1, 1.0, 0.0, 0)])})
    df = Q.q_supplier_hhi(sf).to_pandas().set_index("p_brand")
    assert df.loc["Brand#M", "hhi"] == 1.0
    assert df.loc["Brand#S", "hhi"] == 0.5


def test_brand_discount_rate_values(ray_session, tmp_path):
    """Uniform 10% discount reads 10.0; zero discount reads 0.0."""
    sf = _write(tmp_path, {
        "part": _part([(1, "Brand#D", "X"), (2, "Brand#Z", "X")]),
        "lineitem": _lineitem([(1, 1, 1, 1, 1.00, 0.10, 0),
                               (2, 1, 1, 1, 3.00, 0.10, 0),
                               (3, 2, 1, 1, 2.00, 0.00, 0)])})
    df = Q.q_brand_discount_rate(sf).to_pandas().set_index("p_brand")
    assert df.loc["Brand#D", "disc_pct"] == 10.0
    assert df.loc["Brand#Z", "disc_pct"] == 0.0


def test_pair_lift_exact_fraction(ray_session, tmp_path):
    """A and B co-occur in both their orders among 4 total: lift =
    2*4/(2*2) -> num 8, den 4."""
    sf = _write(tmp_path, {
        "lineitem": _lineitem([
            (1, 10, 1, 1, 1.0, 0.0, 0), (1, 20, 1, 1, 1.0, 0.0, 0),
            (2, 10, 1, 1, 1.0, 0.0, 0), (2, 20, 1, 1, 1.0, 0.0, 0),
            (3, 30, 1, 1, 1.0, 0.0, 0), (4, 40, 1, 1, 1.0, 0.0, 0)])})
    df = Q.q_pair_lift(sf).to_pandas()
    assert len(df) == 1
    r = df.iloc[0]
    assert (r["part_a"], r["part_b"], r["n_both"],
            r["lift_num"], r["lift_den"]) == (10, 20, 2, 8, 4)


def test_weekday_f_stat_flat_null_and_periodic(ray_session, tmp_path):
    """A constant daily series has zero within- AND between-group
    variance -> NULL; matching the oracle is covered by the strict
    gate, here we pin the NULL guard."""
    day = 86_400_000_000
    rows = [(i, i * day, 1, "flat", 1.0) for i in range(14)]
    sf = _write(tmp_path, {"events": _events(rows)})
    df = Q.q_weekday_f_stat(sf).to_pandas()
    assert np.isnan(df["f_stat"].iloc[0])


def test_brand_rank_shift_lag_chain(ray_session, tmp_path):
    """Brand A outsells B in month 1 and trails in month 2: ranks swap
    and prev_rnk carries the month-1 ranks; month-1 prev is NULL."""
    sf = _write(tmp_path, {
        "part": _part([(1, "Brand#A", "X"), (2, "Brand#B", "X")]),
        "lineitem": _lineitem([
            (1, 1, 1, 1, 9.00, 0.0, 5), (2, 2, 1, 1, 1.00, 0.0, 6),
            (3, 1, 1, 1, 1.00, 0.0, 35), (4, 2, 1, 1, 9.00, 0.0, 36)])})
    df = (Q.q_brand_rank_shift(sf).to_pandas()
          .set_index(["month", "p_brand"]))
    m1, m2 = sorted({m for m, _ in df.index})
    assert df.loc[(m1, "Brand#A"), "rnk"] == 1
    assert df.loc[(m1, "Brand#B"), "rnk"] == 2
    assert pd_isna(df.loc[(m1, "Brand#A"), "prev_rnk"])
    assert df.loc[(m2, "Brand#A"), "rnk"] == 2
    assert df.loc[(m2, "Brand#A"), "prev_rnk"] == 1
    assert df.loc[(m2, "Brand#B"), "prev_rnk"] == 2


def pd_isna(v):
    import pandas as pd
    return pd.isna(v)


def test_ngram_coverage_head(ray_session, tmp_path):
    """'x y z x y z' yields grams (xyz, yzx, zxy, xyz): the duplicate
    'x y z' leads with n=2 and 50% cumulative coverage."""
    sf = _write(tmp_path, {
        "documents": _docs([(1, "x y z x y z", "s")])})
    df = Q.q_ngram_coverage(sf).to_pandas()
    assert df["rnk"].iloc[0] == 1
    assert df["gram"].iloc[0] == "x y z"
    assert df["n"].iloc[0] == 2
    assert df["cum_pct"].iloc[0] == 50.0
    assert df["cum_pct"].iloc[-1] == 100.0


def test_oov_rate_top_v(ray_session, tmp_path):
    """v=1 keeps only the most frequent token 'a'; source s1 reads
    1 OOV of 3 tokens."""
    sf = _write(tmp_path, {
        "documents": _docs([(1, "a a b", "s1")])})
    df = Q.q_oov_rate(sf, v=1).to_pandas()
    assert df["n_tokens"].iloc[0] == 3
    assert df["n_oov"].iloc[0] == 1
    assert df["oov_pct"].iloc[0] == 33.333333


def test_record_highs_monotone_paths(ray_session, tmp_path):
    """Values 1,3,2,5 set records at 1,3,5 (3 records); a strictly
    decreasing user records only the first; an equal re-hit is NOT a
    record (strict >)."""
    rows = [(0, 10, 1, "v", 0.01), (1, 20, 1, "v", 0.03),
            (2, 30, 1, "v", 0.02), (3, 40, 1, "v", 0.05),
            (4, 10, 2, "v", 0.09), (5, 20, 2, "v", 0.04),
            (6, 10, 3, "v", 0.02), (7, 20, 3, "v", 0.02)]
    sf = _write(tmp_path, {"events": _events(rows)})
    df = Q.q_record_highs(sf).to_pandas().set_index("user_id")
    assert df.loc[1, "n_records"] == 3
    assert df.loc[2, "n_records"] == 1
    assert df.loc[3, "n_records"] == 1


def test_seasonality_index_uniform(ray_session, tmp_path):
    """One order every day over a two-month span -> every month's
    index is exactly 1.0."""
    rows = [(i + 1, 1, 1.00, "P", 18993 + i) for i in range(59)]
    # 18993 = 2022-01-01; 59 days = all of Jan + Feb 2022
    sf = _write(tmp_path, {"orders": _orders(rows)})
    df = Q.q_seasonality_index(sf).to_pandas()
    assert sorted(df["month"].tolist()) == [1, 2]
    assert (df["season_idx"] == 1.0).all()


def test_degree_assortativity_star(ray_session, tmp_path):
    """A star K1,3 (hub part 1) is perfectly disassortative:
    r = -1.0."""
    sf = _write(tmp_path, {
        "lineitem": _lineitem([
            (1, 1, 1, 1, 1.0, 0.0, 0), (1, 2, 1, 1, 1.0, 0.0, 0),
            (2, 1, 1, 1, 1.0, 0.0, 0), (2, 3, 1, 1, 1.0, 0.0, 0),
            (3, 1, 1, 1, 1.0, 0.0, 0), (3, 4, 1, 1, 1.0, 0.0, 0)])})
    df = Q.q_degree_assortativity(sf).to_pandas()
    assert df["n_incidences"].iloc[0] == 6
    assert df["assortativity"].iloc[0] == -1.0


def test_burstiness_regular_and_null(ray_session, tmp_path):
    """Perfectly regular gaps (sigma=0) read B = -1.0; a type with a
    single event has no gaps and is absent (the oracle's WHERE d IS
    NOT NULL drops it the same way)."""
    rows = [(i, i * 10_000_000, 1, "reg", 1.0) for i in range(5)]
    rows.append((99, 5_000_000, 2, "solo", 1.0))
    sf = _write(tmp_path, {"events": _events(rows)})
    df = Q.q_burstiness(sf).to_pandas().set_index("event_type")
    assert df.loc["reg", "burstiness"] == -1.0
    assert "solo" not in df.index


def test_run_lengths_streaks(ray_session, tmp_path):
    """Timeline A A B B B A: type A has 2 runs over 3 events
    (mean 1.5), B has 1 run of 3 (mean 3.0)."""
    rows = [(0, 10, 1, "A", 1.0), (1, 20, 1, "A", 1.0),
            (2, 30, 1, "B", 1.0), (3, 40, 1, "B", 1.0),
            (4, 50, 1, "B", 1.0), (5, 60, 1, "A", 1.0)]
    sf = _write(tmp_path, {"events": _events(rows)})
    df = Q.q_run_lengths(sf).to_pandas().set_index("event_type")
    assert df.loc["A", "n_runs"] == 2
    assert df.loc["A", "n_events"] == 3
    assert df.loc["A", "mean_run_len"] == 1.5
    assert df.loc["B", "n_runs"] == 1
    assert df.loc["B", "mean_run_len"] == 3.0


def test_largest_remainder_exact_budget(ray_session, tmp_path):
    """Counts (1, 1, 1) with budget 10000: floor quotas 3333 each
    leave one slot, awarded to the lexicographically smallest source
    (all remainders tie). Seats always sum to the budget."""
    sf = _write(tmp_path, {
        "documents": _docs([(1, "x", "c"), (2, "x", "a"),
                            (3, "x", "b")])})
    df = Q.q_largest_remainder(sf).to_pandas().set_index("source")
    assert df["seats"].sum() == 10_000
    assert df.loc["a", "seats"] == 3334
    assert df.loc["b", "seats"] == 3333
    assert df.loc["c", "seats"] == 3333


def test_state_dwell_attribution(ray_session, tmp_path):
    """Timeline A(t=0s) B(t=10s) A(t=30s): the 10s gap belongs to
    state A, the 20s gap to state B; the final event contributes
    nothing. Dwell is in whole seconds (sub-second residue floors
    away) so totals can't overflow int64 at fleet scale."""
    s = 1_000_000
    rows = [(0, 0 * s, 1, "A", 1.0), (1, 10 * s, 1, "B", 1.0),
            (2, 30 * s, 1, "A", 1.0)]
    sf = _write(tmp_path, {"events": _events(rows)})
    df = Q.q_state_dwell(sf).to_pandas().set_index("event_type")
    assert df.loc["A", "dwell_s"] == 10
    assert df.loc["A", "n_gaps"] == 1
    assert df.loc["B", "dwell_s"] == 20
    assert df.loc["B", "mean_dwell_s"] == 20.0


def test_max_window_gain_kadane_corners(ray_session, tmp_path):
    """Signal +1/-1/+1 over days 0..2 (all three purchases/errors):
    best window is the full span only if sum beats single days — here
    [0,2]=1 ties single days [0,0]=1 and [2,2]=1; smallest end day
    wins (end=0) and the empty-prefix base starts it at day 0. An
    all-error stream picks the first least-bad single day."""
    day = 86_400_000_000
    rows = [(0, 0 * day, 1, "purchase", 1.0),
            (1, 1 * day, 1, "error", 1.0),
            (2, 2 * day, 1, "purchase", 1.0)]
    sf = _write(tmp_path, {"events": _events(rows)})
    df = Q.q_max_window_gain(sf).to_pandas()
    assert (df["best_sum"].iloc[0], df["start_day"].iloc[0],
            df["end_day"].iloc[0]) == (1, 0, 0)

    rows2 = [(0, 0 * day, 1, "error", 1.0),
             (1, 1 * day, 1, "error", 1.0)]
    sf2 = _write(tmp_path / "b", {"events": _events(rows2)})
    df2 = Q.q_max_window_gain(sf2).to_pandas()
    # prefixes -1,-2; gains: d0 -> -1 (empty base), d1 -> -1 (base
    # first prefix): tie -> end 0, start day 0, sum -1
    assert (df2["best_sum"].iloc[0], df2["start_day"].iloc[0],
            df2["end_day"].iloc[0]) == (-1, 0, 0)

    # signal-free days are part of the day range: a leading view-only
    # day gives a zero-sum single-day window that beats any negative
    # streak (and the oracle's bounds span ALL event days)
    rows3 = [(0, 0 * day, 1, "view", 1.0),
             (1, 1 * day, 1, "error", 1.0),
             (2, 2 * day, 1, "view", 1.0)]
    sf3 = _write(tmp_path / "c", {"events": _events(rows3)})
    df3 = Q.q_max_window_gain(sf3).to_pandas()
    assert (df3["best_sum"].iloc[0], df3["start_day"].iloc[0],
            df3["end_day"].iloc[0]) == (0, 0, 0)


def test_time_series_degenerate_ranges_match_oracle(ray_session,
                                                    tmp_path):
    """A sub-week corpus gives weekday_f_stat ZERO rows (the oracle's
    whole-week grid is empty) and a single-day corpus gives
    autocorr_lag1 ZERO rows (every LEAD is NULL) — not NaN rows."""
    day = 86_400_000_000
    rows = [(i, i * day, 1, "view", 1.0) for i in range(3)]  # 3 days
    sf = _write(tmp_path, {"events": _events(rows)})
    assert len(Q.q_weekday_f_stat(sf).to_pandas()) == 0

    rows2 = [(i, i * 1000, 1, "view", 1.0) for i in range(5)]  # 1 day
    sf2 = _write(tmp_path / "b", {"events": _events(rows2)})
    assert len(Q.q_autocorr_lag1(sf2).to_pandas()) == 0
