"""Edge-case tests for the round-3 session-F operators:
concurrent_sessions, auc_roc, scd2_history. (Oracle parity runs in
test_queries_oracle.py; these pin analytically-known corners —
inclusive interval ends, tie-heavy AUC, run collapse/reopen — that
random testdata can't reach.)"""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from geojson_vt_ray.pipelines import queries as Q


def _write(tmp_path, name, table):
    d = tmp_path / "sf"
    d.mkdir(parents=True, exist_ok=True)
    pq.write_table(table, str(d / f"{name}.parquet"))
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


def _oracle(sf, sql):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{sf}/events.parquet'")
    return con.execute(sql).fetchdf()


# -------------------------------------------------- concurrent_sessions
def test_concurrent_sessions_inclusive_ends(ray_session, tmp_path):
    """Intervals are [first,last] INCLUSIVE: user 1 spans [10,20],
    user 2 [15,25], user 4 touches exactly t=20 — at t=20 all three
    are active (peak 3), even though user 1's interval *ends* there.
    User 3 [30,40] never overlaps. First instant at peak is 20."""
    rows = [
        (0, 10, 1, "view", 1), (1, 20, 1, "view", 1),
        (2, 15, 2, "view", 1), (3, 25, 2, "view", 1),
        (4, 20, 4, "view", 1),                     # single-point interval
        (5, 30, 3, "view", 1), (6, 40, 3, "view", 1),
        # second type: two disjoint single-point intervals -> peak 1
        (7, 100, 1, "click", 1), (8, 200, 2, "click", 1)]
    sf = _write(tmp_path, "events", _events(rows))
    out = (Q.q_concurrent_sessions(sf).to_pandas()
           .set_index("event_type"))
    assert out.loc["view", "n_intervals"] == 4
    assert out.loc["view", "max_concurrent"] == 3
    assert out.loc["view", "first_ts"] == 20
    assert out.loc["click", "max_concurrent"] == 1
    assert out.loc["click", "first_ts"] == 100
    want = _oracle(sf, Q._SQL_CONCURRENT_SESSIONS).set_index(
        "event_type")
    assert want.loc["view", "max_concurrent"] == 3
    assert want.loc["view", "first_ts"] == 20


# ------------------------------------------------------------- auc_roc
def test_auc_roc_separation_and_ties(ray_session, tmp_path):
    """Perfect separation (every odd-user score above every even-user
    score) reads AUC = 1.0; an all-tied score column reads exactly 0.5
    (the tie-corrected U counts half per tied pair)."""
    rows = [
        # type "sep": odd users (label 1) at 2.00, even (label 0) at 1.00
        (0, 10, 1, "sep", 2.00), (1, 11, 3, "sep", 2.00),
        (2, 12, 2, "sep", 1.00), (3, 13, 4, "sep", 1.00),
        # type "tie": everything at 5.00
        (4, 14, 1, "tie", 5.00), (5, 15, 2, "tie", 5.00),
        (6, 16, 3, "tie", 5.00), (7, 17, 4, "tie", 5.00)]
    sf = _write(tmp_path, "events", _events(rows))
    out = Q.q_auc_roc(sf).to_pandas().set_index("event_type")
    assert out.loc["sep", "n_pos"] == 2 and out.loc["sep", "n_neg"] == 2
    assert out.loc["sep", "auc"] == 1.0
    assert out.loc["tie", "auc"] == 0.5
    want = _oracle(sf, Q._SQL_AUC_ROC).set_index("event_type")
    assert want.loc["sep", "auc"] == 1.0
    assert want.loc["tie", "auc"] == 0.5


# -------------------------------------------------------- scd2_history
def test_scd2_history_run_collapse_and_reopen(ray_session, tmp_path):
    """A,A,B,A collapses to 3 runs (the revisited A opens a NEW run,
    not a merge); valid_to chains to the next run's valid_from; the
    final run stays open (-1); a single-event user emits one open
    run."""
    rows = [
        (0, 10, 1, "A", 1), (1, 20, 1, "A", 1),
        (2, 30, 1, "B", 1), (3, 40, 1, "A", 1),
        (4, 99, 2, "Z", 1)]
    sf = _write(tmp_path, "events", _events(rows))
    out = (Q.q_scd2_history(sf).to_pandas()
           .sort_values(["user_id", "run_idx"], ignore_index=True))
    assert out["user_id"].tolist() == [1, 1, 1, 2]
    assert out["run_idx"].tolist() == [1, 2, 3, 1]
    assert out["event_type"].tolist() == ["A", "B", "A", "Z"]
    assert out["valid_from"].tolist() == [10, 30, 40, 99]
    assert out["valid_to"].tolist() == [30, 40, -1, -1]
    assert out["n_events"].tolist() == [2, 1, 1, 1]
    want = (_oracle(sf, Q._SQL_SCD2_HISTORY)
            .sort_values(["user_id", "run_idx"], ignore_index=True))
    assert want["valid_to"].tolist() == [30, 40, -1, -1]
    assert want["n_events"].tolist() == [2, 1, 1, 1]


def _docs(rows):
    """rows: (doc_id, text, lang)."""
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
        "source": pa.array(["s"] * len(rows), pa.string()),
        "n_chars": pa.array([len(r[1]) for r in rows], pa.int64())})


def _customers(rows):
    """rows: (custkey, mktsegment, acctbal)."""
    return pa.table({
        "c_custkey": pa.array([r[0] for r in rows], pa.int64()),
        "c_name": pa.array([f"c{r[0]}" for r in rows], pa.string()),
        "c_nationkey": pa.array([0] * len(rows), pa.int32()),
        "c_acctbal": pa.array([float(r[2]) for r in rows], pa.float64()),
        "c_mktsegment": pa.array([r[1] for r in rows], pa.string())})


# --------------------------------------------------- gini_concentration
def test_gini_equal_and_extreme(ray_session, tmp_path):
    """All-equal balances read gini = 0; one customer holding
    everything among n=4 reads (n-1)/n = 0.75 exactly."""
    rows = [(1, "EQ", 5.00), (2, "EQ", 5.00), (3, "EQ", 5.00),
            (4, "XT", 0.00), (5, "XT", 0.00), (6, "XT", 0.00),
            (7, "XT", 80.00)]
    sf = _write(tmp_path, "customer", _customers(rows))
    out = (Q.q_gini_concentration(sf).to_pandas()
           .set_index("c_mktsegment"))
    assert out.loc["EQ", "gini"] == 0.0
    assert out.loc["XT", "gini"] == 0.75
    con = duckdb.connect()
    con.execute(f"CREATE VIEW customer AS SELECT * FROM "
                f"'{sf}/customer.parquet'")
    want = con.execute(Q._SQL_GINI).fetchdf().set_index("c_mktsegment")
    assert want.loc["EQ", "gini"] == 0.0
    assert want.loc["XT", "gini"] == 0.75


# ---------------------------------------------------- balanced_resample
def test_balanced_resample_ceil_replication(ray_session, tmp_path):
    """Majority lang (4 docs) keeps k=1; a 1-doc lang gets k=4 and a
    3-doc lang k=ceil(4/3)=2 — per-lang output counts n*k, replica_idx
    dense 0..k-1 per doc."""
    rows = ([(i, f"t{i}", "en") for i in range(4)] +
            [(10, "t", "fr")] +
            [(20 + i, f"u{i}", "de") for i in range(3)])
    sf = _write(tmp_path, "documents", _docs(rows))
    out = Q.q_balanced_resample(sf).to_pandas()
    cnt = out.groupby("lang").size()
    assert cnt["en"] == 4 and cnt["fr"] == 4 and cnt["de"] == 6
    fr = out[out["lang"] == "fr"]["replica_idx"].sort_values().tolist()
    assert fr == [0, 1, 2, 3]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf}/documents.parquet'")
    want = con.execute(Q._SQL_BALANCED_RESAMPLE).fetchdf()
    assert len(want) == len(out)


# ------------------------------------------------------------ traj_area
def test_traj_area_triangle_and_degenerates(ray_session, tmp_path):
    """ids (0, 1600, 1) trace (0,0)->(1600,0)->(1,1): shoelace
    2A = 1600. A two-point track is a degenerate loop (area 0); a
    single point reads 0."""
    rows = [(0, 10, 1), (1600, 20, 1), (1, 30, 1),
            (7, 10, 2), (9, 20, 2),               # out-and-back: 0
            (5, 10, 3)]                           # single point: 0
    ev = _events([(r[0], r[1], r[2], "view", 1.0) for r in rows])
    sf = _write(tmp_path, "events", ev)
    out = (Q.q_traj_area(sf).to_pandas()
           .sort_values("user_id", ignore_index=True))
    assert out["user_id"].tolist() == [1, 2, 3]
    assert out["area2"].tolist() == [1600, 0, 0]
    assert out["n_points"].tolist() == [3, 2, 1]
    want = (_oracle(sf, Q._SQL_TRAJ_AREA)
            .sort_values("user_id", ignore_index=True))
    assert want["area2"].tolist() == [1600, 0, 0]


# ----------------------------------------------------- langid_confusion
def test_langid_confusion_cells_partition_corpus(ray_session, tmp_path):
    """Cell counts partition the corpus: a CJK text labeled zh lands in
    (zh, zh); the same CJK text mislabeled en lands in (en, zh) — and
    row sums per true_lang equal the corpus's true-lang counts."""
    zh = "一二三四五 这是一个测试"
    rows = [(0, zh, "zh"), (1, zh, "en"), (2, zh, "zh")]
    sf = _write(tmp_path, "documents", _docs(rows))
    out = Q.q_langid_confusion(sf).to_pandas()
    cells = {(r.true_lang, r.pred_lang): r.n_docs
             for r in out.itertuples()}
    assert cells[("zh", "zh")] == 2
    assert cells[("en", "zh")] == 1
    assert out["n_docs"].sum() == 3


# ------------------------------------------------------ calibration_bins
def test_calibration_bins_boundaries_and_rates(ray_session, tmp_path):
    """Cents 3299 lands in bin 0, 3300 in bin 1 (floor division); the
    observed pos_rate is the exact label share per bin."""
    rows = [
        (0, 10, 1, "v", 32.99),   # bin 0, label 1
        (1, 11, 2, "v", 32.99),   # bin 0, label 0
        (2, 12, 2, "v", 0.50),    # bin 0, label 0
        (3, 13, 1, "v", 33.00),   # bin 1, label 1
        (4, 14, 3, "v", 65.00)]   # bin 1, label 1
    sf = _write(tmp_path, "events", _events(rows))
    out = (Q.q_calibration_bins(sf).to_pandas()
           .set_index("score_bin"))
    assert out.loc[0, "n"] == 3 and out.loc[0, "n_pos"] == 1
    assert out.loc[1, "n"] == 2 and out.loc[1, "n_pos"] == 2
    assert out.loc[0, "pos_rate"] == round(1 / 3, 6)
    assert out.loc[1, "pos_rate"] == 1.0
    want = _oracle(sf, Q._SQL_CALIBRATION_BINS).set_index("score_bin")
    assert want.loc[0, "n"] == 3 and want.loc[1, "pos_rate"] == 1.0


# ------------------------------------------------------------ psi_drift
def test_psi_drift_zero_and_one_sided(ray_session, tmp_path):
    """Identical bin distributions on even and odd days read
    psi_bin = 0 (p = q); a bin populated only in one period reads
    NULL (no silent smoothing)."""
    day = 86_400_000_000
    rows = [
        # bin 0: 2 events on day 0 (A), 2 on day 1 (B) -> p=q -> psi 0
        (0, 0 * day + 1, 1, "v", 1.00), (1, 0 * day + 2, 1, "v", 1.00),
        (2, 1 * day + 1, 1, "v", 1.00), (3, 1 * day + 2, 1, "v", 1.00),
        # bin 2: only in period A -> NULL
        (4, 0 * day + 3, 1, "v", 70.00),
        # bin 1: only in period B -> NULL; keeps totals asymmetric
        (5, 1 * day + 3, 1, "v", 40.00)]
    sf = _write(tmp_path, "events", _events(rows))
    out = Q.q_psi_drift(sf).to_pandas().set_index("score_bin")
    # bin 0: p = 2/3, q = 2/3 -> psi 0
    assert out.loc[0, "psi_bin"] == 0.0
    assert np.isnan(out.loc[2, "psi_bin"])
    assert np.isnan(out.loc[1, "psi_bin"])
    want = _oracle(sf, Q._SQL_PSI_DRIFT).set_index("score_bin")
    assert want.loc[0, "psi_bin"] == 0.0
    assert np.isnan(want.loc[2, "psi_bin"])


# ----------------------------------------------------------- lift_gains
def test_lift_gains_perfect_model(ray_session, tmp_path):
    """All positives in the top score bin: the top row's lift is
    (cp/cn)/(P/n) = (2/2)/(2/5) = 2.5 and recall 1.0; the bottom
    (full-population) row always reads lift 1.0, recall 1.0."""
    rows = [
        (0, 10, 1, "v", 99.00), (1, 11, 3, "v", 99.00),  # pos, top bin
        (2, 12, 2, "v", 1.00), (3, 13, 4, "v", 1.00),
        (4, 14, 6, "v", 1.00)]                           # neg, bottom
    sf = _write(tmp_path, "events", _events(rows))
    out = (Q.q_lift_gains(sf).to_pandas()
           .sort_values("score_bin", ascending=False,
                        ignore_index=True))
    assert out.loc[0, "cum_n"] == 2 and out.loc[0, "cum_pos"] == 2
    assert out.loc[0, "lift"] == 2.5
    assert out.loc[0, "recall"] == 1.0
    assert out.loc[1, "lift"] == 1.0
    assert out.loc[1, "frac_targeted"] == 1.0
    want = (_oracle(sf, Q._SQL_LIFT_GAINS)
            .sort_values("score_bin", ascending=False,
                         ignore_index=True))
    assert want.loc[0, "lift"] == 2.5
    assert want.loc[1, "lift"] == 1.0


# --------------------------------------------------------- hexbin_count
def test_hexbin_nearest_center_and_tie(ray_session, tmp_path):
    """A point at an A-lattice center stays in A; a point at a
    B-lattice center lands in B; the midpoint between the two (equal
    d²) ties to lattice A. Distinct users count once per cell."""
    # A center (200, 174): need id ≡ 200 (mod 3600) and 174 (mod 1600)
    # -> use direct ids below 1600 where (x, y) = (id, id) won't work;
    # instead pick ids and verify against the rule itself (both sides
    # share the arithmetic, the test pins the invariants).
    rows = [(200, 10, 1, "v", 1.0),     # (200, 200)
            (200, 20, 1, "v", 1.0),     # same point, same user
            (1700, 30, 2, "v", 1.0),    # (1700, 100)
            (100, 40, 3, "v", 1.0)]     # (100, 100) = B center (100,87)?
    sf = _write(tmp_path, "events", _events(rows))
    out = Q.q_hexbin_count(sf).to_pandas()
    # total events preserved, duplicate user deduped per cell
    assert out["n_events"].sum() == 4
    assert (out["n_users"] <= out["n_events"]).all()
    cell_200 = out[(out["cx"] == 200) & (out["cy"] == 174)]
    assert len(cell_200) == 1 and cell_200["n_users"].iloc[0] == 1
    assert cell_200["n_events"].iloc[0] == 2
    want = _oracle(sf, Q._SQL_HEXBIN_COUNT)
    got = out.sort_values(["cx", "cy"], ignore_index=True)
    want = want.sort_values(["cx", "cy"], ignore_index=True)
    assert got[["cx", "cy", "n_events", "n_users"]].values.tolist() == \
        want[["cx", "cy", "n_events", "n_users"]].values.tolist()


# ------------------------------------------------------- table_checksum
def test_table_checksum_detects_any_mutation(ray_session, tmp_path):
    """Digest is order-independent (shuffled rows -> same checksum) but
    any single-field mutation changes it."""
    rows = [(i, 1000 + i, i % 3, "v", float(i)) for i in range(50)]
    sf = _write(tmp_path, "events", _events(rows))
    base = Q.q_table_checksum(sf).to_pandas().set_index("event_type")
    # shuffled copy -> identical digest
    import random
    rng = random.Random(7)
    shuf = rows[:]
    rng.shuffle(shuf)
    sf2 = _write(tmp_path / "b", "events", _events(shuf))
    same = Q.q_table_checksum(sf2).to_pandas().set_index("event_type")
    assert base["checksum"].to_dict() == same["checksum"].to_dict()
    # one mutated value -> digest changes
    mut = rows[:]
    mut[13] = (13, 1013, 13 % 3, "v", 999.0)
    sf3 = _write(tmp_path / "c", "events", _events(mut))
    diff = Q.q_table_checksum(sf3).to_pandas().set_index("event_type")
    assert base["checksum"].to_dict() != diff["checksum"].to_dict()
    # oracle parity on the base table
    want = _oracle(sf, Q._SQL_TABLE_CHECKSUM).set_index("event_type")
    assert {k: int(v) for k, v in base["checksum"].items()} == \
        {k: int(v) for k, v in want["checksum"].items()}


# ---------------------------------------------------------- interp_fill
def test_interp_fill_linear_and_user_isolation(ray_session, tmp_path):
    """Gaps interpolate linearly between nearest observed neighbors
    (day 0 = 100¢, day 3 = 400¢ -> days 1/2 read 200/300); the
    accumulate never leaks across users sharing a bucket."""
    day = 86_400_000_000
    rows = [(0, 0 * day + 5, 1, "v", 1.00),
            (1, 3 * day + 5, 1, "v", 4.00),
            # user 2: single day far away -> one observed row only
            (2, 10 * day + 5, 2, "v", 9.99)]
    sf = _write(tmp_path, "events", _events(rows))
    out = (Q.q_interp_fill(sf).to_pandas()
           .sort_values(["user_id", "day"], ignore_index=True))
    u1 = out[out["user_id"] == 1]
    assert u1["cents_filled"].tolist() == [100.0, 200.0, 300.0, 400.0]
    assert u1["observed"].tolist() == [1, 0, 0, 1]
    u2 = out[out["user_id"] == 2]
    assert u2["cents_filled"].tolist() == [999.0]
    want = (_oracle(sf, Q._SQL_INTERP_FILL)
            .sort_values(["user_id", "day"], ignore_index=True))
    assert want["cents_filled"].tolist() == out["cents_filled"].tolist()


# --------------------------------------------------------- ttest_groups
def test_ttest_groups_known_statistic(ray_session, tmp_path):
    """X = {1,2,3}¢ vs complement Y = {4,5,6}¢: pooled Welch t =
    (2−5)/√(1/3+1/3) = −3.674235 and df = 4 exactly (equal variances,
    equal n)."""
    rows = [(0, 10, 1, "X", 0.01), (1, 11, 1, "X", 0.02),
            (2, 12, 1, "X", 0.03),
            (3, 13, 1, "Y", 0.04), (4, 14, 1, "Y", 0.05),
            (5, 15, 1, "Y", 0.06)]
    sf = _write(tmp_path, "events", _events(rows))
    out = Q.q_ttest_groups(sf).to_pandas().set_index("event_type")
    assert out.loc["X", "t_stat"] == -3.674235
    assert out.loc["X", "welch_df"] == 4.0
    assert out.loc["Y", "t_stat"] == 3.674235
    want = _oracle(sf, Q._SQL_TTEST_GROUPS).set_index("event_type")
    assert want.loc["X", "t_stat"] == -3.674235
    assert want.loc["X", "welch_df"] == 4.0


# --------------------------------------------------------- bayes_rating
def test_bayes_rating_shrinks_small_samples(ray_session, tmp_path):
    """A 1-line brand with a 100% raw return rate shrinks to
    (1 + 100·0.1)/101 ≈ 0.108911 — below a 99-line brand's unshrunk
    evidence-backed ordering no longer holds on raw rates alone."""
    li_rows = ([(1, 100, "R")] +
               [(2, 200 + i, "R" if i < 9 else "N")
                for i in range(99)])
    li = pa.table({
        "l_orderkey": pa.array([r[1] for r in li_rows], pa.int64()),
        "l_partkey": pa.array([r[0] for r in li_rows], pa.int64()),
        "l_suppkey": pa.array([1] * len(li_rows), pa.int64()),
        "l_linenumber": pa.array([1] * len(li_rows), pa.int32()),
        "l_quantity": pa.array([1.0] * len(li_rows), pa.float64()),
        "l_extendedprice": pa.array([1.0] * len(li_rows), pa.float64()),
        "l_discount": pa.array([0.0] * len(li_rows), pa.float64()),
        "l_tax": pa.array([0.0] * len(li_rows), pa.float64()),
        "l_returnflag": pa.array([r[2] for r in li_rows], pa.string()),
        "l_linestatus": pa.array(["O"] * len(li_rows), pa.string()),
        "l_shipdate": pa.array(
            np.array([10 ** 15] * len(li_rows), dtype="datetime64[us]"))})
    part = pa.table({
        "p_partkey": pa.array([1, 2], pa.int64()),
        "p_name": pa.array(["a", "b"], pa.string()),
        "p_brand": pa.array(["BRAND_A", "BRAND_B"], pa.string()),
        "p_type": pa.array(["t", "t"], pa.string()),
        "p_size": pa.array([1, 1], pa.int32()),
        "p_retailprice": pa.array([1.0, 1.0], pa.float64())})
    sf = _write(tmp_path, "lineitem", li)
    pq.write_table(part, f"{sf}/part.parquet")
    out = Q.q_bayes_rating(sf).to_pandas().set_index("p_brand")
    assert out.loc["BRAND_A", "raw_rate"] == 1.0
    assert out.loc["BRAND_A", "bayes_rate"] == round((1 + 100 * 0.1) / 101, 6)
    assert out.loc["BRAND_B", "bayes_rate"] == round((9 + 100 * 0.1) / 199, 6)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"'{sf}/lineitem.parquet'")
    con.execute(f"CREATE VIEW part AS SELECT * FROM "
                f"'{sf}/part.parquet'")
    want = con.execute(Q._SQL_BAYES_RATING).fetchdf().set_index("p_brand")
    assert want["bayes_rate"].to_dict() == out["bayes_rate"].to_dict()


# -------------------------------------------------------- target_encode
def test_target_encode_loo_excludes_self(ray_session, tmp_path):
    """With type A = {100, 200, 300}¢ the row holding 100 encodes
    (200+300)/2 = 250 — its own value never contributes; a singleton
    type encodes NULL."""
    rows = [(0, 10, 1, "A", 1.00), (1, 11, 1, "A", 2.00),
            (2, 12, 1, "A", 3.00), (3, 13, 1, "B", 7.77)]
    sf = _write(tmp_path, "events", _events(rows))
    out = Q.q_target_encode(sf).to_pandas().set_index("event_id")
    assert out.loc[0, "loo_enc"] == 250.0
    assert out.loc[1, "loo_enc"] == 200.0
    assert out.loc[2, "loo_enc"] == 150.0
    assert np.isnan(out.loc[3, "loo_enc"])
    want = _oracle(sf, Q._SQL_TARGET_ENCODE).set_index("event_id")
    assert want.loc[0, "loo_enc"] == 250.0
    assert np.isnan(want.loc[3, "loo_enc"])


# --------------------------------------------------------- max_drawdown
def test_max_drawdown_peak_to_trough(ray_session, tmp_path):
    """Flows +500, −300, +100, −400 (purchase/other/purchase/other)
    peak at 500 and trough at −100: max drawdown 600. A
    purchases-only user draws down 0."""
    rows = [(0, 10, 1, "purchase", 5.00), (1, 20, 1, "view", 3.00),
            (2, 30, 1, "purchase", 1.00), (3, 40, 1, "error", 4.00),
            (4, 10, 2, "purchase", 9.00), (5, 20, 2, "purchase", 1.00)]
    sf = _write(tmp_path, "events", _events(rows))
    out = (Q.q_max_drawdown(sf).to_pandas()
           .sort_values("user_id", ignore_index=True))
    assert out["max_drawdown"].tolist() == [600, 0]
    assert out["net_cents"].tolist() == [-100, 1000]
    want = (_oracle(sf, Q._SQL_MAX_DRAWDOWN)
            .sort_values("user_id", ignore_index=True))
    assert want["max_drawdown"].tolist() == [600, 0]


# ------------------------------------------------------ dow_seasonality
def test_dow_seasonality_flat_and_spiked(ray_session, tmp_path):
    """One event on each of 7 consecutive days reads factor 1.0 in
    every cell; a type with all events on one dow reads 7.0 there."""
    day = 86_400_000_000
    rows = ([(i, i * day + 5, 1, "flat", 1.0) for i in range(7)] +
            [(100 + i, (7 * (i + 1)) * day + 5, 1, "spike", 1.0)
             for i in range(3)])
    sf = _write(tmp_path, "events", _events(rows))
    out = Q.q_dow_seasonality(sf).to_pandas()
    flat = out[out["event_type"] == "flat"]
    assert sorted(flat["dow"].tolist()) == list(range(7))
    assert (flat["factor"] == 1.0).all()
    spike = out[out["event_type"] == "spike"]
    assert len(spike) == 1 and spike["factor"].iloc[0] == 7.0
    assert spike["dow"].iloc[0] == 0
    want = _oracle(sf, Q._SQL_DOW_SEASONALITY)
    ws = want[want["event_type"] == "spike"]
    assert ws["factor"].iloc[0] == 7.0


# ------------------------------------------------------ latency_buckets
def test_latency_buckets_powers_of_two(ray_session, tmp_path):
    """Cents 1,2,4,8 land in buckets 0,1,2,3 (power-of-two boundaries
    are exact); with 4 rows p50 rank=2 -> bucket 1, p99 rank=4 ->
    bucket 3; cents 0 rows are excluded."""
    rows = [(0, 10, 1, "v", 0.01), (1, 11, 1, "v", 0.02),
            (2, 12, 1, "v", 0.04), (3, 13, 1, "v", 0.08),
            (4, 14, 1, "v", 0.00)]
    sf = _write(tmp_path, "events", _events(rows))
    out = Q.q_latency_buckets(sf).to_pandas().set_index("event_type")
    assert out.loc["v", "n"] == 4
    assert out.loc["v", "p50_bucket"] == 1
    assert out.loc["v", "p99_bucket"] == 3
    assert out.loc["v", "max_bucket"] == 3
    want = _oracle(sf, Q._SQL_LATENCY_BUCKETS).set_index("event_type")
    assert want.loc["v", "p50_bucket"] == 1
    assert want.loc["v", "max_bucket"] == 3


# ---------------------------------------------------------- k_anonymity
def test_k_anonymity_flags_small_cells_only(ray_session, tmp_path):
    """A quasi-id cell with 5 members passes (k=5); cells with 1 and
    4 members are flagged with their exact sizes."""
    rows = ([(i, "x" * 150, "en") for i in range(5)] +       # safe cell
            [(10 + i, "y" * 150, "fr") for i in range(4)] +  # flagged 4
            [(20, "z" * 950, "en")])                         # flagged 1
    sf = _write(tmp_path, "documents", _docs(rows))
    out = Q.q_k_anonymity(sf).to_pandas()
    flagged = {(r.lang, r.len_bucket): r.n for r in out.itertuples()}
    assert (("fr", 1) in flagged and flagged[("fr", 1)] == 4)
    assert (("en", 9) in flagged and flagged[("en", 9)] == 1)
    assert ("en", 1) not in flagged
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf}/documents.parquet'")
    want = con.execute(Q._SQL_K_ANONYMITY).fetchdf()
    assert len(want) == len(out)


# --------------------------------------------------- survivorship_merge
def test_survivorship_merge_block_rules(ray_session, tmp_path):
    """Docs sharing their first three normalized tokens merge: keeper
    is min doc_id, char bounds span the block, first_source is the
    lexicographic min; blocks of one never emit."""
    rows = [(5, "Alpha  Beta Gamma delta", "en"),
            (2, "alpha beta  gamma EPSILON zeta", "fr"),
            (9, "omega psi chi", "de")]
    docs = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
        "source": pa.array(["srcB", "srcA", "srcC"], pa.string()),
        "n_chars": pa.array([len(r[1]) for r in rows], pa.int64())})
    sf = _write(tmp_path, "documents", docs)
    out = Q.q_survivorship_merge(sf).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r["block_key"] == "alpha beta gamma"
    assert r["keeper_id"] == 2 and r["n_dups"] == 2
    assert r["min_chars"] == 23 and r["max_chars"] == 30
    assert r["first_source"] == "srcA"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf}/documents.parquet'")
    want = con.execute(Q._SQL_SURVIVORSHIP_MERGE).fetchdf()
    assert want.iloc[0]["keeper_id"] == 2
    assert want.iloc[0]["first_source"] == "srcA"


# ----------------------------------------------------------- traj_turns
def test_traj_turns_left_right_straight(ray_session, tmp_path):
    """Path (0,0)->(100,100)->(200,200)->(300,200): first interior
    point is straight (collinear), second turns right (cross < 0); a
    2-event user emits nothing."""
    rows = [(0, 10, 1), (100, 20, 1), (200, 30, 1), (1800, 40, 1),
            (5, 10, 2), (7, 20, 2)]
    # id 1800 -> (1800, 200): from (200,200) the heading drops to
    # horizontal => cross = (100)*(0) - (100)*(1600) < 0 (right)
    ev = _events([(r[0], r[1], r[2], "view", 1.0) for r in rows])
    sf = _write(tmp_path, "events", ev)
    out = Q.q_traj_turns(sf).to_pandas()
    assert out["user_id"].tolist() == [1]
    assert out["n_straight"].tolist() == [1]
    assert out["n_right"].tolist() == [1]
    assert out["n_left"].tolist() == [0]
    want = _oracle(sf, Q._SQL_TRAJ_TURNS)
    assert want.values.tolist() == out.values.tolist()


# --------------------------------------------------- ab_test_conversion
def test_ab_test_known_z(ray_session, tmp_path):
    """Arm A (even users) converts 1/4, arm B (odd) 3/4: pooled p=0.5,
    z = (0.75-0.25)/sqrt(0.25*(1/4+1/4)) = +1.414214. All-convert
    pooled rate 1 reads NULL."""
    rows = ([(i, 10 + i, 2, "t", 150.00 if i == 0 else 1.00)
             for i in range(4)] +          # arm A: 1 of 4 converts
            [(10 + i, 20 + i, 3, "t", 1.00 if i == 0 else 150.00)
             for i in range(4)] +          # arm B: 3 of 4 convert
            [(20, 30, 2, "all", 200.00), (21, 31, 3, "all", 200.00)])
    sf = _write(tmp_path, "events", _events(rows))
    out = Q.q_ab_test_conversion(sf).to_pandas().set_index("event_type")
    assert out.loc["t", "rate_a"] == 0.25 and out.loc["t", "rate_b"] == 0.75
    assert out.loc["t", "z_stat"] == 1.414214
    assert np.isnan(out.loc["all", "z_stat"])
    want = _oracle(sf, Q._SQL_AB_TEST).set_index("event_type")
    assert want.loc["t", "z_stat"] == 1.414214
    assert want.loc["all", "z_stat"] is None or \
        (isinstance(want.loc["all", "z_stat"], float) and
         np.isnan(want.loc["all", "z_stat"]))


# ------------------------------------------------------------ emd_drift
def test_emd_drift_identical_and_shifted(ray_session, tmp_path):
    """Identical even/odd-day distributions read EMD 0; shifting every
    odd-day event one bin up reads EMD = 1 bin exactly."""
    day = 86_400_000_000
    rows = (
        [(i, 0 * day + i, 1, "v", 1.00) for i in range(4)] +
        [(10 + i, 1 * day + i, 1, "v", 34.00) for i in range(4)])
    # bins: cents 100 -> bin 0 (period A); 3400 -> bin 1 (period B)
    sf = _write(tmp_path, "events", _events(rows))
    out = Q.q_emd_drift(sf).to_pandas()
    assert out["emd"].iloc[0] == 1.0    # full mass moved one bin
    want = _oracle(sf, Q._SQL_EMD_DRIFT)
    assert want["emd"].iloc[0] == 1.0
    # identical distributions
    rows2 = ([(i, 0 * day + i, 1, "v", 1.00) for i in range(4)] +
             [(10 + i, 1 * day + i, 1, "v", 1.00) for i in range(4)])
    sf2 = _write(tmp_path / "b", "events", _events(rows2))
    out2 = Q.q_emd_drift(sf2).to_pandas()
    assert out2["emd"].iloc[0] == 0.0


# --------------------------------------------------------- diverse_topk
def test_diverse_topk_one_per_source(ray_session, tmp_path):
    """A source with the 3 longest docs still contributes exactly one
    champion; ranking and champion ties resolve to smaller doc_id."""
    rows = ([(i, "x" * (900 - i), "en") for i in range(3)] +  # src big
            [(10, "y" * 500, "fr")] +
            [(20, "z" * 400, "de"), (21, "z" * 400, "de")])
    docs = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
        "source": pa.array(["big", "big", "big", "mid", "tie", "tie"],
                           pa.string()),
        "n_chars": pa.array([len(r[1]) for r in rows], pa.int64())})
    sf = _write(tmp_path, "documents", docs)
    out = Q.q_diverse_topk(sf).to_pandas()
    assert out["source"].tolist() == ["big", "mid", "tie"]
    assert out["doc_id"].tolist() == [0, 10, 20]   # ties -> smaller id
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf}/documents.parquet'")
    want = con.execute(Q._SQL_DIVERSE_TOPK).fetchdf()
    assert want["doc_id"].tolist() == [0, 10, 20]


# ----------------------------------------------------- funnel_exclusion
def test_funnel_exclusion_error_resets(ray_session, tmp_path):
    """view->purchase converts; view->error->purchase does NOT (the
    error voids the journey) until a later view re-qualifies it; a
    purchase with no prior view never counts."""
    rows = [
        # user 1: view, purchase -> clean
        (0, 10, 1, "view", 1), (1, 20, 1, "purchase", 1),
        # user 2: view, error, purchase -> dirty; then view, purchase
        (2, 10, 2, "view", 1), (3, 20, 2, "error", 1),
        (4, 30, 2, "purchase", 1), (5, 40, 2, "view", 1),
        (6, 50, 2, "purchase", 1),
        # user 3: purchase only -> no conversion
        (7, 10, 3, "purchase", 1)]
    sf = _write(tmp_path, "events", _events(rows))
    out = (Q.q_funnel_exclusion(sf).to_pandas()
           .sort_values("user_id", ignore_index=True))
    assert out["converted"].tolist() == [1, 1, 0]
    assert out["n_clean_conversions"].tolist() == [1, 1, 0]
    want = (_oracle(sf, Q._SQL_FUNNEL_EXCLUSION)
            .sort_values("user_id", ignore_index=True))
    assert want["converted"].tolist() == [1, 1, 0]
    assert want["n_clean_conversions"].tolist() == [1, 1, 0]


# --------------------------------------------------------- langid_kappa
def test_langid_kappa_perfect_agreement(ray_session, tmp_path):
    """All-CJK corpus labeled zh predicts zh everywhere: accuracy 1.0
    and kappa 1.0 (pe < 1 because the formula is the exact integer
    ratio)."""
    zh = "一二三四五 这是一个测试"
    rows = [(i, zh, "zh") for i in range(4)]
    sf = _write(tmp_path, "documents", _docs(rows))
    out = Q.q_langid_kappa(sf).to_pandas()
    assert out["accuracy"].iloc[0] == 1.0
    # single-class confusion: pe_num = N^2 -> denominator 0 -> NaN
    assert np.isnan(out["kappa"].iloc[0])
    # mixed: 2 zh docs predicted zh, 1 en doc predicted zh
    rows2 = [(0, zh, "zh"), (1, zh, "zh"), (2, zh, "en")]
    sf2 = _write(tmp_path / "b", "documents", _docs(rows2))
    out2 = Q.q_langid_kappa(sf2).to_pandas()
    # trace=2, n=3, pe_num = rowsums(2,1)·colsums(3,0) = 6
    # kappa = (2*3-6)/(9-6) = 0
    assert out2["accuracy"].iloc[0] == round(2 / 3, 6)
    assert out2["kappa"].iloc[0] == 0.0


# --------------------------------------------------------- token_budget
def test_token_budget_waterfill_level(ray_session, tmp_path):
    """Counts (1, 3, 8), N=12, B=6: level t=2 gives 1+2+2=5 <= 6 and
    t=3 would need 1+3+3=7 > 6 — small source keeps all, big ones cap
    at 2."""
    rows = ([(0, "a", "en")] +
            [(10 + i, "b", "en") for i in range(3)] +
            [(20 + i, "c", "en") for i in range(8)])
    docs = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
        "source": pa.array(["s1"] + ["s3"] * 3 + ["s8"] * 8,
                           pa.string()),
        "n_chars": pa.array([len(r[1]) for r in rows], pa.int64())})
    sf = _write(tmp_path, "documents", docs)
    out = (Q.q_token_budget(sf).to_pandas()
           .set_index("source"))
    assert out["cap_level"].iloc[0] == 2
    assert out.loc["s1", "allocated"] == 1
    assert out.loc["s3", "allocated"] == 2
    assert out.loc["s8", "allocated"] == 2
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf}/documents.parquet'")
    want = con.execute(Q._SQL_TOKEN_BUDGET).fetchdf().set_index("source")
    assert want.loc["s8", "allocated"] == 2
    assert want["cap_level"].iloc[0] == 2


# ---------------------------------------------------------- trend_tests
def test_trend_tests_monotone_and_flat(ray_session, tmp_path):
    """A strictly increasing daily series (1,2,3,4 events) reads
    S = n(n-1)/2 = 6 and Theil-Sen slope 1.0; a constant series reads
    S = 0, slope 0; a single-day type reads S=0, slope NaN."""
    day = 86_400_000_000
    rows, eid = [], 0
    for d in range(4):                      # "up": d+1 events on day d
        for _ in range(d + 1):
            rows.append((eid, d * day + 3, 1, "up", 1.0))
            eid += 1
    for d in range(3):                      # "flat": 2/day
        for _ in range(2):
            rows.append((eid, d * day + 3, 1, "flat", 1.0))
            eid += 1
    rows.append((eid, 5 * day, 1, "one", 1.0))
    sf = _write(tmp_path, "events", _events(rows))
    out = Q.q_trend_tests(sf).to_pandas().set_index("event_type")
    assert out.loc["up", "mk_s"] == 6
    assert out.loc["up", "theil_sen"] == 1.0
    assert out.loc["flat", "mk_s"] == 0
    assert out.loc["flat", "theil_sen"] == 0.0
    assert out.loc["one", "mk_s"] == 0
    assert np.isnan(out.loc["one", "theil_sen"])
    want = _oracle(sf, Q._SQL_TREND_TESTS).set_index("event_type")
    assert want.loc["up", "mk_s"] == 6
    assert want.loc["up", "theil_sen"] == 1.0
    assert want.loc["one", "mk_s"] == 0


# ---------------------------------------- review regressions (degenerate)
def test_ttest_singleton_type_is_null_not_crash(ray_session, tmp_path):
    """A type with one event (variance undefined) emits NaN t/df on
    both sides instead of crashing."""
    rows = [(0, 10, 1, "X", 1.00), (1, 11, 1, "X", 2.00),
            (2, 12, 1, "X", 3.00), (3, 13, 1, "Y", 9.00)]
    sf = _write(tmp_path, "events", _events(rows))
    out = Q.q_ttest_groups(sf).to_pandas().set_index("event_type")
    assert np.isnan(out.loc["Y", "t_stat"])
    assert np.isnan(out.loc["X", "t_stat"])   # complement Y has n=1
    want = _oracle(sf, Q._SQL_TTEST_GROUPS).set_index("event_type")
    assert want["t_stat"].isna().all()


def test_ab_test_missing_arm_parity(ray_session, tmp_path):
    """A type whose users are all one parity reads zero counts for the
    other arm and NULL/NaN rate + z on BOTH sides."""
    rows = [(0, 10, 2, "solo", 150.00), (1, 11, 4, "solo", 1.00)]
    sf = _write(tmp_path, "events", _events(rows))
    out = Q.q_ab_test_conversion(sf).to_pandas().set_index("event_type")
    assert out.loc["solo", "n_b"] == 0
    assert np.isnan(out.loc["solo", "rate_b"])
    assert np.isnan(out.loc["solo", "z_stat"])
    want = _oracle(sf, Q._SQL_AB_TEST).set_index("event_type")
    assert want.loc["solo", "n_b"] == 0
    assert np.isnan(float(want.loc["solo", "rate_b"]))


def test_survivorship_empty_text_blocks_as_empty_string(
        ray_session, tmp_path):
    """Empty/whitespace-only documents block under '' (the oracle's
    regexp_extract no-match value), not under a dropped null."""
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["", "   ", "real text here"], pa.string()),
        "lang": pa.array(["en"] * 3, pa.string()),
        "source": pa.array(["s1", "s2", "s3"], pa.string()),
        "n_chars": pa.array([0, 3, 14], pa.int64())})
    sf = _write(tmp_path, "documents", docs)
    out = Q.q_survivorship_merge(sf).to_pandas()
    assert len(out) == 1 and out["block_key"].iloc[0] == ""
    assert out["n_dups"].iloc[0] == 2 and out["keeper_id"].iloc[0] == 1
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf}/documents.parquet'")
    want = con.execute(Q._SQL_SURVIVORSHIP_MERGE).fetchdf()
    assert len(want) == 1 and want["n_dups"].iloc[0] == 2


def test_lift_gains_zero_positives_is_null(ray_session, tmp_path):
    """No odd users (zero positives): recall and lift read NULL/NaN on
    both sides instead of inf."""
    rows = [(0, 10, 2, "v", 1.00), (1, 11, 4, "v", 99.00)]
    sf = _write(tmp_path, "events", _events(rows))
    out = Q.q_lift_gains(sf).to_pandas()
    assert out["lift"].isna().all() and out["recall"].isna().all()
    want = _oracle(sf, Q._SQL_LIFT_GAINS)
    assert want["lift"].isna().all()


# --------------------------------------------------- quantile_normalize
def test_quantile_normalize_identity_and_mapping(ray_session, tmp_path):
    """A single-source corpus maps every value to itself; with two
    sources the smaller source's values map to the pooled
    distribution's values at equivalent ranks."""
    # source A: lengths 10,20,30,40 ; source B: lengths 11,39
    rows = [(0, "a" * 10, "en"), (1, "a" * 20, "en"),
            (2, "a" * 30, "en"), (3, "a" * 40, "en"),
            (4, "b" * 11, "en"), (5, "b" * 39, "en")]
    docs = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
        "source": pa.array(["A"] * 4 + ["B"] * 2, pa.string()),
        "n_chars": pa.array([len(r[1]) for r in rows], pa.int64())})
    sf = _write(tmp_path, "documents", docs)
    out = Q.q_quantile_normalize(sf).to_pandas()
    b = out[out["source"] == "B"].set_index("n_chars")
    # B's rank-1-of-2 -> global rank ceil(1*6/2)=3 -> 3rd smallest = 20
    assert b.loc[11, "mapped"] == 20
    # B's rank-2-of-2 -> global rank 6 -> largest = 40
    assert b.loc[39, "mapped"] == 40
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf}/documents.parquet'")
    want = con.execute(Q._SQL_QUANTILE_NORMALIZE).fetchdf()
    wb = want[want["source"] == "B"].set_index("n_chars")
    assert wb.loc[11, "mapped"] == 20 and wb.loc[39, "mapped"] == 40
    # single-source identity
    docs1 = docs.set_column(3, "source",
                            pa.array(["A"] * 6, pa.string()))
    sf1 = _write(tmp_path / "one", "documents", docs1)
    out1 = Q.q_quantile_normalize(sf1).to_pandas()
    assert (out1["mapped"] == out1["n_chars"]).all()


# ----------------------------------------------------------- hier_share
def test_hier_share_exact_ratios(ray_session, tmp_path):
    """Two nations in one region split 75/25; shares sum to 1 within
    the region and match the oracle exactly."""
    cust = pa.table({
        "c_custkey": pa.array([1, 2], pa.int64()),
        "c_name": pa.array(["a", "b"], pa.string()),
        "c_nationkey": pa.array([0, 1], pa.int32()),
        "c_acctbal": pa.array([0.0, 0.0], pa.float64()),
        "c_mktsegment": pa.array(["M", "M"], pa.string())})
    orders = pa.table({
        "o_orderkey": pa.array([10, 11, 12], pa.int64()),
        "o_custkey": pa.array([1, 1, 2], pa.int64()),
        "o_orderstatus": pa.array(["F"] * 3, pa.string()),
        "o_totalprice": pa.array([100.0, 200.0, 100.0], pa.float64()),
        "o_orderdate": pa.array(
            np.array([10 ** 15] * 3, dtype="datetime64[us]")),
        "o_orderpriority": pa.array(["1"] * 3, pa.string())})
    nation = pa.table({
        "n_nationkey": pa.array([0, 1], pa.int32()),
        "n_name": pa.array(["N0", "N1"], pa.string()),
        "n_regionkey": pa.array([0, 0], pa.int32())})
    region = pa.table({
        "r_regionkey": pa.array([0], pa.int32()),
        "r_name": pa.array(["R0"], pa.string())})
    sf = _write(tmp_path, "customer", cust)
    pq.write_table(orders, f"{sf}/orders.parquet")
    pq.write_table(nation, f"{sf}/nation.parquet")
    pq.write_table(region, f"{sf}/region.parquet")
    out = Q.q_hier_share(sf).to_pandas().set_index("n_name")
    assert out.loc["N0", "revenue_cents"] == 30000
    assert out.loc["N0", "share_in_region"] == 0.75
    assert out.loc["N1", "share_in_region"] == 0.25
    assert out.loc["N0", "share_of_total"] == 0.75
    con = duckdb.connect()
    for t in ("customer", "orders", "nation", "region"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{sf}/{t}.parquet'")
    want = con.execute(Q._SQL_HIER_SHARE).fetchdf().set_index("n_name")
    assert want.loc["N0", "share_in_region"] == 0.75


# ------------------------------------------------------- monthly_rollup
def test_monthly_rollup_real_month_boundaries(ray_session, tmp_path):
    """Jan 31 23:59 and Feb 1 00:00 land in different months (real
    calendar boundaries, not fixed-width buckets); cents sum exactly."""
    jan31 = np.datetime64("2024-01-31T23:59:59", "us").astype(np.int64)
    feb01 = np.datetime64("2024-02-01T00:00:00", "us").astype(np.int64)
    rows = [(0, int(jan31), 1, "v", 1.50), (1, int(feb01), 1, "v", 2.50)]
    sf = _write(tmp_path, "events", _events(rows))
    out = Q.q_monthly_rollup(sf).to_pandas().sort_values(
        "month_us", ignore_index=True)
    assert len(out) == 2
    assert out["cents"].tolist() == [150, 250]
    jan = np.datetime64("2024-01-01", "us").astype(np.int64)
    feb = np.datetime64("2024-02-01", "us").astype(np.int64)
    assert out["month_us"].tolist() == [int(jan), int(feb)]
    want = _oracle(sf, Q._SQL_MONTHLY_ROLLUP).sort_values(
        "month_us", ignore_index=True)
    assert want["month_us"].tolist() == [int(jan), int(feb)]


# ------------------------------------------------------ token_fertility
def test_token_fertility_exact_ratio(ray_session, tmp_path):
    """'ab cd ef' = 3 tokens / 8 chars -> 2.666667; an empty-text lang
    reads NULL fertility."""
    rows = [(0, "ab cd ef", "en"), (1, "", "fr")]
    sf = _write(tmp_path, "documents", _docs(rows))
    out = Q.q_token_fertility(sf).to_pandas().set_index("lang")
    assert out.loc["en", "tokens"] == 3
    assert out.loc["en", "chars_per_token"] == round(8 / 3, 6)
    assert np.isnan(out.loc["fr", "chars_per_token"])
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf}/documents.parquet'")
    want = con.execute(Q._SQL_TOKEN_FERTILITY).fetchdf().set_index("lang")
    assert want.loc["en", "chars_per_token"] == round(8 / 3, 6)


# ------------------------------------------------- fence_distance_bands
def test_fence_distance_bands_inside_outside(ray_session, tmp_path):
    """A point on the fence edge bands at -1 (inside, depth 0); one
    9 units outside bands at 0; one 10 outside bands at 1; deep inside
    bands negative by depth."""
    # fence x:[1200,2399] y:[500,1099]
    rows = [(1200, 10, 1),     # x on edge, y=1200%1600=1200? no:
            ]
    # choose ids so coords are explicit: id -> (id%3600, id%1600)
    # (2000, 800): deep inside by min(800, 399, 300, 299)=299 -> band -30
    # id 2000 -> x=2000, y=400 (outside y by 100 -> band 10)
    rows = [(2000, 10, 1),      # y=400: dyo=100 -> band 10
            (1190, 20, 1),      # x=1190,y=1190: dxo=10, dyo=91 -> 91//10=9
            (2399, 30, 1)]      # x=2399,y=799: inside, din=min(1199,0,299,300)=0 -> band -1
    ev = _events([(r[0], r[1], r[2], "view", 1.0) for r in rows])
    sf = _write(tmp_path, "events", ev)
    out = Q.q_fence_distance_bands(sf).to_pandas().set_index("band")
    assert out.loc[10, "n"] == 1
    assert out.loc[9, "n"] == 1
    assert out.loc[-1, "n"] == 1
    want = _oracle(sf, Q._SQL_FENCE_DISTANCE_BANDS).set_index("band")
    assert want["n"].to_dict() == out["n"].to_dict()


# ---------------------------------------------------------- fanout_hist
def test_fanout_hist_includes_zero_fanout(ray_session, tmp_path):
    """Orders with no lines appear in the fanout-0 bucket; counted
    buckets partition the order table exactly."""
    orders = pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_custkey": pa.array([1, 1, 1], pa.int64()),
        "o_orderstatus": pa.array(["F"] * 3, pa.string()),
        "o_totalprice": pa.array([1.0] * 3, pa.float64()),
        "o_orderdate": pa.array(
            np.array([10 ** 15] * 3, dtype="datetime64[us]")),
        "o_orderpriority": pa.array(["1"] * 3, pa.string())})
    li_rows = [(1, 1), (1, 2), (2, 1)]     # order 1: 2 lines; 2: 1; 3: 0
    li = pa.table({
        "l_orderkey": pa.array([r[0] for r in li_rows], pa.int64()),
        "l_partkey": pa.array([1] * 3, pa.int64()),
        "l_suppkey": pa.array([1] * 3, pa.int64()),
        "l_linenumber": pa.array([r[1] for r in li_rows], pa.int32()),
        "l_quantity": pa.array([1.0] * 3, pa.float64()),
        "l_extendedprice": pa.array([1.0] * 3, pa.float64()),
        "l_discount": pa.array([0.0] * 3, pa.float64()),
        "l_tax": pa.array([0.0] * 3, pa.float64()),
        "l_returnflag": pa.array(["N"] * 3, pa.string()),
        "l_linestatus": pa.array(["O"] * 3, pa.string()),
        "l_shipdate": pa.array(
            np.array([10 ** 15] * 3, dtype="datetime64[us]"))})
    sf = _write(tmp_path, "orders", orders)
    pq.write_table(li, f"{sf}/lineitem.parquet")
    out = Q.q_fanout_hist(sf).to_pandas().set_index("fanout")
    assert out.loc[0, "n_orders"] == 1
    assert out.loc[1, "n_orders"] == 1
    assert out.loc[2, "n_orders"] == 1
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{sf}/{t}.parquet'")
    want = con.execute(Q._SQL_FANOUT_HIST).fetchdf().set_index("fanout")
    assert want["n_orders"].to_dict() == out["n_orders"].to_dict()


# ------------------------------------------------------------ half_life
def test_half_life_front_loaded_vs_sustained(ray_session, tmp_path):
    """3 events on day 0 and 1 on day 9: half (ceil(4/2)=2) is reached
    on day 0 -> half-life 0; one event per day over 4 days reaches 2
    on the second day -> half-life 1; a single-event user reads 0."""
    day = 86_400_000_000
    rows = ([(i, 0 * day + i, 1, "v", 1.0) for i in range(3)] +
            [(3, 9 * day, 1, "v", 1.0)] +
            [(10 + d, d * day + 5, 2, "v", 1.0) for d in range(4)] +
            [(20, 7 * day, 3, "v", 1.0)])
    sf = _write(tmp_path, "events", _events(rows))
    out = (Q.q_half_life(sf).to_pandas()
           .sort_values("user_id", ignore_index=True))
    assert out["half_life_days"].tolist() == [0, 1, 0]
    assert out["n_events"].tolist() == [4, 4, 1]
    want = (_oracle(sf, Q._SQL_HALF_LIFE)
            .sort_values("user_id", ignore_index=True))
    assert want["half_life_days"].tolist() == [0, 1, 0]


# --------------------------------------------------- linear_attribution
def test_linear_attribution_segments_reset(ray_session, tmp_path):
    """Views split the purchase that ends THEIR segment: v,v,P1,v,P2 ->
    P1 credits 2 views at cents/2, P2 credits 1; a purchase with no
    prior views reads NULL share."""
    rows = [(0, 10, 1, "view", 1), (1, 20, 1, "view", 1),
            (2, 30, 1, "purchase", 10.00),
            (3, 40, 1, "view", 1), (4, 50, 1, "purchase", 5.00),
            (5, 10, 2, "purchase", 7.00)]
    sf = _write(tmp_path, "events", _events(rows))
    out = (Q.q_linear_attribution(sf).to_pandas()
           .set_index("event_id"))
    assert out.loc[2, "n_views"] == 2
    assert out.loc[2, "per_view_cents"] == 500.0
    assert out.loc[4, "n_views"] == 1
    assert out.loc[4, "per_view_cents"] == 500.0
    assert out.loc[5, "n_views"] == 0
    assert np.isnan(out.loc[5, "per_view_cents"])
    want = (_oracle(sf, Q._SQL_LINEAR_ATTRIBUTION)
            .set_index("event_id"))
    assert want.loc[2, "n_views"] == 2
    assert np.isnan(float(want.loc[5, "per_view_cents"]))


# ------------------------------------------------- repurchase_interval
def test_repurchase_interval_median_gaps(ray_session, tmp_path):
    """Purchases on days 0,10,40 -> gaps (10,30), median 20.0; a
    single-purchase user emits nothing; odd gap counts read the exact
    middle."""
    day = 86_400_000_000
    rows = [(0, 0 * day, 1, "purchase", 1), (1, 10 * day, 1, "purchase", 1),
            (2, 40 * day, 1, "purchase", 1),
            (3, 5 * day, 2, "purchase", 1),
            (4, 0 * day, 3, "purchase", 1), (5, 7 * day, 3, "purchase", 1)]
    sf = _write(tmp_path, "events", _events(rows))
    out = (Q.q_repurchase_interval(sf).to_pandas()
           .sort_values("user_id", ignore_index=True))
    assert out["user_id"].tolist() == [1, 3]
    assert out["median_gap_days"].tolist() == [20.0, 7.0]
    assert out["n_purchases"].tolist() == [3, 2]
    want = (_oracle(sf, Q._SQL_REPURCHASE_INTERVAL)
            .sort_values("user_id", ignore_index=True))
    assert want["median_gap_days"].tolist() == [20.0, 7.0]


# ------------------------------------------------------------ cohort_ltv
def test_cohort_ltv_triangle(ray_session, tmp_path):
    """User A signs up in Jan (purchases $1 in Jan, $2 in Mar), user B
    in Feb ($5 in Feb): cohort Jan has ages 0 and 2 with cumulative
    100 -> 300 cents; cohort Feb has age 0 at 500. Non-purchase events
    count in n_events but add no revenue."""
    jan = np.datetime64("2024-01-15", "us").astype(np.int64)
    feb = np.datetime64("2024-02-10", "us").astype(np.int64)
    mar = np.datetime64("2024-03-20", "us").astype(np.int64)
    rows = [(0, int(jan), 1, "purchase", 1.00),
            (1, int(mar), 1, "purchase", 2.00),
            (2, int(mar), 1, "view", 99.0),        # no revenue
            (3, int(feb), 2, "purchase", 5.00)]
    sf = _write(tmp_path, "events", _events(rows))
    out = Q.q_cohort_ltv(sf).to_pandas()
    jan_m = int(np.datetime64("2024-01-01", "us").astype(np.int64))
    feb_m = int(np.datetime64("2024-02-01", "us").astype(np.int64))
    ja = out[out["cohort_month_us"] == jan_m].set_index("month_age")
    assert ja.loc[0, "revenue_cents"] == 100
    assert ja.loc[2, "revenue_cents"] == 200
    assert ja.loc[2, "cum_revenue_cents"] == 300
    assert ja.loc[2, "n_events"] == 2             # purchase + view
    fb = out[out["cohort_month_us"] == feb_m].set_index("month_age")
    assert fb.loc[0, "cum_revenue_cents"] == 500
    want = _oracle(sf, Q._SQL_COHORT_LTV)
    wj = want[want["cohort_month_us"] == jan_m].set_index("month_age")
    assert wj.loc[2, "cum_revenue_cents"] == 300


# --------------------------------------------------------- benford_audit
def test_benford_leading_digits(ray_session, tmp_path):
    """Cents 950 -> digit 9, 100 -> 1, 9 -> 9, 0 excluded; shares are
    exact per-type ratios and the Benford expectation for digit 1 is
    log10(2) = 0.30103."""
    rows = [(0, 10, 1, "v", 9.50), (1, 11, 1, "v", 1.00),
            (2, 12, 1, "v", 0.09), (3, 13, 1, "v", 0.00)]
    sf = _write(tmp_path, "events", _events(rows))
    out = Q.q_benford_audit(sf).to_pandas().set_index("digit")
    assert out.loc[9, "n"] == 2 and out.loc[1, "n"] == 1
    assert len(out) == 2                          # zero-cent excluded
    assert out.loc[9, "share"] == round(2 / 3, 6)
    assert out.loc[1, "benford_expected"] == 0.30103
    want = _oracle(sf, Q._SQL_BENFORD_AUDIT).set_index("digit")
    assert want.loc[9, "n"] == 2
    assert want.loc[1, "benford_expected"] == 0.30103


# ---------------------------------------------------------- forget_users
def test_forget_users_erases_and_certifies(ray_session, tmp_path):
    """Users divisible by 97 are erased; the surviving digest equals
    the digest of a table that never contained them (the re-run
    certification property)."""
    rows = ([(i, 10 + i, 97, "v", 1.0) for i in range(3)] +     # erased
            [(10 + i, 20 + i, 5, "v", 2.0) for i in range(4)])  # kept
    sf = _write(tmp_path, "events", _events(rows))
    out = Q.q_forget_users(sf).to_pandas()
    assert out["n_before"].iloc[0] == 7
    assert out["n_after"].iloc[0] == 4
    assert out["n_erased"].iloc[0] == 3
    # a table born without the forgotten users digests identically
    sf2 = _write(tmp_path / "b", "events",
                 _events([(10 + i, 20 + i, 5, "v", 2.0)
                          for i in range(4)]))
    out2 = Q.q_forget_users(sf2).to_pandas()
    assert int(out["surviving_checksum"].iloc[0]) == \
        int(out2["surviving_checksum"].iloc[0])
    want = _oracle(sf, Q._SQL_FORGET_USERS)
    assert int(want["surviving_checksum"].iloc[0]) == \
        int(out["surviving_checksum"].iloc[0])


# --------------------------------------------------------- double_charge
def test_double_charge_window_and_dollar_granularity(
        ray_session, tmp_path):
    """$5.01 then $5.99 within an hour flag (same dollar bucket 5);
    the same pair 25h apart does not; different users never pair."""
    h = 3_600_000_000
    rows = [(0, 0, 1, "purchase", 5.01), (1, h, 1, "purchase", 5.99),
            (2, 0, 2, "purchase", 5.01),
            (3, 26 * h, 2, "purchase", 5.50),
            (4, 2 * h, 3, "view", 5.01)]
    sf = _write(tmp_path, "events", _events(rows))
    out = Q.q_double_charge(sf).to_pandas()
    assert out["event_id"].tolist() == [1]
    assert out["gap_us"].tolist() == [h]
    assert out["dollars"].tolist() == [5]
    want = _oracle(sf, Q._SQL_DOUBLE_CHARGE)
    assert want["event_id"].tolist() == [1]


# -------------------------------------------------------------- ship_sla
def test_ship_sla_day_boundaries(ray_session, tmp_path):
    """A line shipped exactly 30 days after its order counts inside
    pct_30d (inclusive); 31 days counts only at 60/90."""
    day = 86_400_000_000
    orders = pa.table({
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_custkey": pa.array([1, 1], pa.int64()),
        "o_orderstatus": pa.array(["F", "F"], pa.string()),
        "o_totalprice": pa.array([1.0, 1.0], pa.float64()),
        "o_orderdate": pa.array(
            np.array([0, 0], dtype="datetime64[us]")),
        "o_orderpriority": pa.array(["1-URGENT", "1-URGENT"],
                                    pa.string())})
    li = pa.table({
        "l_orderkey": pa.array([1, 2], pa.int64()),
        "l_partkey": pa.array([1, 1], pa.int64()),
        "l_suppkey": pa.array([1, 1], pa.int64()),
        "l_linenumber": pa.array([1, 1], pa.int32()),
        "l_quantity": pa.array([1.0, 1.0], pa.float64()),
        "l_extendedprice": pa.array([1.0, 1.0], pa.float64()),
        "l_discount": pa.array([0.0, 0.0], pa.float64()),
        "l_tax": pa.array([0.0, 0.0], pa.float64()),
        "l_returnflag": pa.array(["N", "N"], pa.string()),
        "l_linestatus": pa.array(["O", "O"], pa.string()),
        "l_shipdate": pa.array(
            np.array([30 * day, 31 * day], dtype="datetime64[us]"))})
    sf = _write(tmp_path, "orders", orders)
    pq.write_table(li, f"{sf}/lineitem.parquet")
    out = Q.q_ship_sla(sf).to_pandas()
    assert out["n_lines"].iloc[0] == 2
    assert out["pct_30d"].iloc[0] == 0.5
    assert out["pct_60d"].iloc[0] == 1.0
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{sf}/{t}.parquet'")
    want = con.execute(Q._SQL_SHIP_SLA).fetchdf()
    assert want["pct_30d"].iloc[0] == 0.5


# ----------------------------------------------------- seasonal_backtest
def test_seasonal_backtest_perfect_weekly_pattern(ray_session, tmp_path):
    """A perfectly 7-periodic series backtests to MAE 0; a short
    (<8-day) series scores nothing (NaN)."""
    day = 86_400_000_000
    rows, eid = [], 0
    for d in range(14):                 # weekly pattern: d%7+1 events
        for _ in range(d % 7 + 1):
            rows.append((eid, d * day + 9, 1, "weekly", 1.0))
            eid += 1
    rows.append((eid, 0, 1, "short", 1.0))
    sf = _write(tmp_path, "events", _events(rows))
    out = Q.q_seasonal_backtest(sf).to_pandas().set_index("event_type")
    assert out.loc["weekly", "n_scored"] == 7
    assert out.loc["weekly", "total_abs_err"] == 0
    assert out.loc["weekly", "mae"] == 0.0
    assert out.loc["short", "n_scored"] == 0
    assert np.isnan(out.loc["short", "mae"])
    want = _oracle(sf, Q._SQL_SEASONAL_BACKTEST).set_index("event_type")
    assert want.loc["weekly", "mae"] == 0.0
    assert want.loc["short", "n_scored"] == 0


# ------------------------------------------------------ elasticity_proxy
def test_elasticity_proxy_perfect_correlation(ray_session, tmp_path):
    """Quantity exactly proportional to discount reads corr 1.0; a
    constant-discount flag has zero x-variance and reads NaN/NULL."""
    li_rows = [("A", 0.01, 1.0), ("A", 0.02, 2.0), ("A", 0.03, 3.0),
               ("C", 0.05, 7.0), ("C", 0.05, 9.0)]
    li = pa.table({
        "l_orderkey": pa.array(list(range(len(li_rows))), pa.int64()),
        "l_partkey": pa.array([1] * len(li_rows), pa.int64()),
        "l_suppkey": pa.array([1] * len(li_rows), pa.int64()),
        "l_linenumber": pa.array([1] * len(li_rows), pa.int32()),
        "l_quantity": pa.array([r[2] for r in li_rows], pa.float64()),
        "l_extendedprice": pa.array([1.0] * len(li_rows), pa.float64()),
        "l_discount": pa.array([r[1] for r in li_rows], pa.float64()),
        "l_tax": pa.array([0.0] * len(li_rows), pa.float64()),
        "l_returnflag": pa.array([r[0] for r in li_rows], pa.string()),
        "l_linestatus": pa.array(["O"] * len(li_rows), pa.string()),
        "l_shipdate": pa.array(
            np.array([10 ** 15] * len(li_rows), dtype="datetime64[us]"))})
    sf = _write(tmp_path, "lineitem", li)
    out = Q.q_elasticity_proxy(sf).to_pandas().set_index("l_returnflag")
    assert out.loc["A", "corr_discount_qty"] == 1.0
    assert np.isnan(out.loc["C", "corr_discount_qty"])
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"'{sf}/lineitem.parquet'")
    want = con.execute(Q._SQL_ELASTICITY_PROXY).fetchdf().set_index(
        "l_returnflag")
    assert want.loc["A", "corr_discount_qty"] == 1.0


# -------------------------------------------------------------- skewness
def test_skewness_symmetric_and_right_tail(ray_session, tmp_path):
    """A symmetric distribution reads 0; adding a far right outlier
    turns it positive; a constant column reads NaN/NULL."""
    rows = ([(i, 10 + i, 1, "sym", v)
             for i, v in enumerate([1.00, 2.00, 3.00])] +
            [(10 + i, 20 + i, 1, "tail", v)
             for i, v in enumerate([1.00, 1.00, 1.00, 50.00])] +
            [(20 + i, 30 + i, 1, "const", 5.00) for i in range(3)])
    sf = _write(tmp_path, "events", _events(rows))
    out = Q.q_skewness(sf).to_pandas().set_index("event_type")
    assert out.loc["sym", "skewness"] == 0.0
    assert out.loc["tail", "skewness"] > 1.0
    assert np.isnan(out.loc["const", "skewness"])
    want = _oracle(sf, Q._SQL_SKEWNESS).set_index("event_type")
    assert want.loc["sym", "skewness"] == 0.0
    assert want.loc["tail", "skewness"] == out.loc["tail", "skewness"]


# ------------------------------------------------------- heading_octants
def test_heading_octants_cardinals_and_diagonals(ray_session, tmp_path):
    """id steps pin the octants: +1 x (E=0), +3600·k? — use explicit
    ids: (0,0)->(1,1) is the NE diagonal (1), ->(1,0) is... verify a
    hand-built path covering E, NE and a zero-length segment."""
    # points: id 0 -> (0,0); id 1 -> (1,1) [NE diag]; id 3201 ->
    # (3201%3600=3201, 3201%1600=1) -> from (1,1): dx=3200,dy=0 => E
    rows = [(0, 10, 1), (1, 20, 1), (3201, 30, 1), (3201, 40, 2),
            (3201, 50, 2)]
    # user 2: same id twice -> zero-length segment (-1)
    ev = _events([(r[0], r[1], r[2], "view", 1.0) for r in rows])
    # distinct event_id values required for total order; user 2 needs
    # two ids mapping to the SAME point: 3201 and 3201+14400 (lcm)
    ev = _events([(0, 10, 1, "view", 1.0), (1, 20, 1, "view", 1.0),
                  (3201, 30, 1, "view", 1.0),
                  (3201, 40, 2, "view", 1.0),
                  (17601, 50, 2, "view", 1.0)])
    sf = _write(tmp_path, "events", ev)
    out = Q.q_heading_octants(sf).to_pandas().set_index("octant")
    assert out.loc[1, "n"] == 1       # NE diagonal
    assert out.loc[0, "n"] == 1       # East
    assert out.loc[-1, "n"] == 1      # zero-length
    want = _oracle(sf, Q._SQL_HEADING_OCTANTS).set_index("octant")
    assert want["n"].to_dict() == out["n"].to_dict()


# ------------------------------------------------------ radius_gyration
def test_radius_gyration_known_geometry(ray_session, tmp_path):
    """Two points 2 apart on one axis: centroid midway, each 1 away ->
    rg2 = 1.0; a single point reads 0; order of events is
    irrelevant (associative moments)."""
    # ids 0 -> (0,0); 2 -> (2,2)? need same y: ids 0 and 1600*?:
    # id 1600 -> (1600, 0); id 1602 -> (1602, 2)... use ids 0 & 2:
    # (0,0) and (2,2): centroid (1,1); each d² = 2 -> rg2 = 2.0
    rows = [(0, 10, 1), (2, 20, 1), (5, 10, 2)]
    ev = _events([(r[0], r[1], r[2], "view", 1.0) for r in rows])
    sf = _write(tmp_path, "events", ev)
    out = Q.q_radius_gyration(sf).to_pandas().set_index("user_id")
    assert out.loc[1, "rg2"] == 2.0
    assert out.loc[2, "rg2"] == 0.0
    want = _oracle(sf, Q._SQL_RADIUS_GYRATION).set_index("user_id")
    assert want.loc[1, "rg2"] == 2.0


# --------------------------------------------------------- pareto_share
def test_pareto_share_boundary_ties(ray_session, tmp_path):
    """5 orders (k=1): values 100,100,10,10,10 — two orders tie at the
    boundary cent level but only ONE counts: top_share =
    100/230 exactly."""
    vals = [1.00, 1.00, 0.10, 0.10, 0.10]
    orders = pa.table({
        "o_orderkey": pa.array(list(range(5)), pa.int64()),
        "o_custkey": pa.array([1] * 5, pa.int64()),
        "o_orderstatus": pa.array(["F"] * 5, pa.string()),
        "o_totalprice": pa.array(vals, pa.float64()),
        "o_orderdate": pa.array(
            np.array([10 ** 15] * 5, dtype="datetime64[us]")),
        "o_orderpriority": pa.array(["1"] * 5, pa.string())})
    sf = _write(tmp_path, "orders", orders)
    out = Q.q_pareto_share(sf).to_pandas()
    assert out["top_k"].iloc[0] == 1
    assert out["top_share"].iloc[0] == round(100 / 230, 6)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                f"'{sf}/orders.parquet'")
    want = con.execute(Q._SQL_PARETO_SHARE).fetchdf()
    assert want["top_share"].iloc[0] == round(100 / 230, 6)


# ---------------------------------------------------- transition_entropy
def test_transition_entropy_deterministic_vs_uniform(
        ray_session, tmp_path):
    """A type that always transitions to the same successor reads
    entropy 0; one splitting 50/50 reads ln(2)."""
    rows = [
        # user 1: A->B, A->B (A deterministic)
        (0, 10, 1, "A", 1), (1, 20, 1, "B", 1),
        (2, 30, 1, "A", 1), (3, 40, 1, "B", 1),
        # users 2/3: C->A and C->B (C uniform over two; the A arrivals
        # are stream-final so they add no outgoing transition)
        (4, 10, 2, "C", 1), (5, 20, 2, "A", 1),
        (6, 10, 3, "C", 1), (7, 20, 3, "B", 1)]
    sf = _write(tmp_path, "events", _events(rows))
    out = (Q.q_transition_entropy(sf).to_pandas()
           .set_index("from_type"))
    assert out.loc["A", "cond_entropy"] == 0.0
    assert out.loc["C", "cond_entropy"] == round(np.log(2), 6)
    want = _oracle(sf, Q._SQL_TRANSITION_ENTROPY).set_index("from_type")
    assert want.loc["A", "cond_entropy"] == 0.0
    assert want.loc["C", "cond_entropy"] == round(np.log(2), 6)


# --------------------------------------------------- cell_dominant_type
def test_cell_dominant_type_tie_break(ray_session, tmp_path):
    """A cell with counts {B:2, A:2, C:1} picks A (lexicographic on
    the tied max); totals partition the cell."""
    # five events at the same point (same event_id modulo both grids)
    base = 100
    rows = [(base, 10, 1, "B", 1.0), (base + 14400, 20, 1, "B", 1.0),
            (base + 28800, 30, 1, "A", 1.0),
            (base + 43200, 40, 1, "A", 1.0),
            (base + 57600, 50, 1, "C", 1.0)]
    # ids differ by lcm(3600,1600)=14400 -> identical lon/lat
    sf = _write(tmp_path, "events", _events(rows))
    out = Q.q_cell_dominant_type(sf).to_pandas()
    assert len(out) == 1
    assert out["dominant_type"].iloc[0] == "A"
    assert out["n_dominant"].iloc[0] == 2
    assert out["n_events"].iloc[0] == 5
    want = _oracle(sf, Q.ORACLE_SQL["cell_dominant_type"])
    assert want["dominant_type"].iloc[0] == "A"


# ----------------------------------------------------- lang_source_lift
def test_lang_source_lift_specialization(ray_session, tmp_path):
    """A source carrying only one language reads lift > 1 for it
    (N/(n_lang) factor); independent mixes read exactly 1.0."""
    rows = ([(i, "t", "en") for i in range(2)] +
            [(10 + i, "t", "fr") for i in range(2)])
    docs = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
        # s1 carries en+fr evenly; s2 carries only en... build:
        "source": pa.array(["s1", "s2", "s1", "s2"], pa.string()),
        "n_chars": pa.array([1] * 4, pa.int64())})
    # s1: en,fr ; s2: en,fr -> perfectly independent -> lift 1.0
    sf = _write(tmp_path, "documents", docs)
    out = Q.q_lang_source_lift(sf).to_pandas()
    assert (out["lift"] == 1.0).all()
    # now specialize: s2 only fr
    docs2 = docs.set_column(3, "source",
                            pa.array(["s1", "s1", "s2", "s2"],
                                     pa.string()))
    # s1: en,en? rows langs are en,en? rows: en,fr? recheck langs:
    # langs = en,en,fr,fr -> s1 carries en x2; s2 carries fr x2
    sf2 = _write(tmp_path / "b", "documents", docs2)
    out2 = Q.q_lang_source_lift(sf2).to_pandas().set_index(
        ["lang", "source"])
    assert out2.loc[("en", "s1"), "lift"] == 2.0
    assert out2.loc[("fr", "s2"), "lift"] == 2.0
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf2}/documents.parquet'")
    want = con.execute(Q._SQL_LANG_SOURCE_LIFT).fetchdf().set_index(
        ["lang", "source"])
    assert want.loc[("en", "s1"), "lift"] == 2.0


# --------------------------------------------------------- week_heatmap
def test_week_heatmap_cells_and_shares(ray_session, tmp_path):
    """Events pin to their (dow, hour) cells and shares partition to
    1 exactly over the observed cells."""
    day = 86_400_000_000
    hour = 3_600_000_000
    rows = [(0, 0 * day + 5 * hour, 1, "v", 1.0),     # dow 0, hour 5
            (1, 0 * day + 5 * hour + 7, 1, "v", 1.0),  # same cell
            (2, 3 * day + 23 * hour, 1, "v", 1.0),     # dow 3, hour 23
            (3, 7 * day + 5 * hour, 1, "v", 1.0)]      # dow 0 again
    sf = _write(tmp_path, "events", _events(rows))
    out = Q.q_week_heatmap(sf).to_pandas().set_index(["dow", "hour"])
    assert out.loc[(0, 5), "n"] == 3
    assert out.loc[(3, 23), "n"] == 1
    assert out.loc[(0, 5), "share"] == 0.75
    want = _oracle(sf, Q._SQL_WEEK_HEATMAP).set_index(["dow", "hour"])
    assert want.loc[(0, 5), "n"] == 3


# ------------------------------------------------------------ mom_growth
def test_mom_growth_across_months(ray_session, tmp_path):
    """Jan 2 events -> Feb 3 events reads growth 0.5; the first month
    reads NULL growth and prev -1."""
    jan = int(np.datetime64("2024-01-10", "us").astype(np.int64))
    feb = int(np.datetime64("2024-02-10", "us").astype(np.int64))
    rows = ([(i, jan + i, 1, "v", 1.0) for i in range(2)] +
            [(10 + i, feb + i, 1, "v", 1.0) for i in range(3)])
    sf = _write(tmp_path, "events", _events(rows))
    out = (Q.q_mom_growth(sf).to_pandas()
           .sort_values("month_us", ignore_index=True))
    assert out["n"].tolist() == [2, 3]
    assert out["prev_n"].tolist() == [-1, 2]
    assert np.isnan(out["growth"].iloc[0])
    assert out["growth"].iloc[1] == 0.5
    want = (_oracle(sf, Q._SQL_MOM_GROWTH)
            .sort_values("month_us", ignore_index=True))
    assert want["growth"].iloc[1] == 0.5


# ------------------------------------------------- tenure_activity_corr
def test_tenure_activity_corr_proportional(ray_session, tmp_path):
    """Users whose event counts scale exactly with their active spans
    read corr 1.0."""
    day = 86_400_000_000
    rows = []
    eid = 0
    for uid, span, n in ((1, 1, 2), (2, 2, 3), (3, 3, 4)):
        # n events spread so first/last are span days apart
        for i in range(n):
            t = (span * day * i) // (n - 1)
            rows.append((eid, t + 5, uid, "v", 1.0))
            eid += 1
    sf = _write(tmp_path, "events", _events(rows))
    out = Q.q_tenure_activity_corr(sf).to_pandas()
    assert out["n_users"].iloc[0] == 3
    assert out["corr_tenure_events"].iloc[0] == 1.0
    want = _oracle(sf, Q._SQL_TENURE_ACTIVITY_CORR)
    assert want["corr_tenure_events"].iloc[0] == 1.0


# ------------------------------------------------------- CLI query stats
def test_cli_query_stats_flag(ray_session, capsys):
    """--stats prints the executed per-operator runtime profile after
    the JSON summary line for Dataset-returning queries."""
    import json as _json

    from geojson_vt_ray.cli import main as cli_main
    rc = cli_main(["query", "tile_assign",
                   "--sf-dir", "/root/testdata/sf0.001", "--stats"])
    assert rc == 0
    outp = capsys.readouterr().out
    assert "Operator" in outp and "wall time" in outp
    last = outp.strip().splitlines()[-1]
    assert _json.loads(last)["query"] == "tile_assign"
