"""Edge-case tests for the round-3 session-B operators: kmeans,
dedup_keep_best, interval_union, streaks. (Oracle parity for all four
runs in test_queries_oracle.py; these pin the corners the random
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


def _emb_table(vecs):
    return pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array([0] * len(vecs), pa.int32())})


def test_kmeans_planted_clusters(ray_session, tmp_path):
    """Three well-separated planted clusters, one init point in each:
    Lloyd must recover the planting exactly."""
    rng = np.random.default_rng(7)
    bases = {0: (0.0, 0.0), 1: (50.0, 0.0), 2: (0.0, 50.0)}
    # vec 0,1,2 are the init points, one per planted group
    vecs, want = [], []
    for g in range(3):
        vecs.append(bases[g])
        want.append(g)
    for i in range(60):
        g = i % 3
        bx, by = bases[g]
        vecs.append((bx + rng.uniform(-2, 2), by + rng.uniform(-2, 2)))
        want.append(g)
    sf = _write(tmp_path, "embeddings", _emb_table(vecs))
    got = (Q.q_kmeans(sf, k=3, iters=2).to_pandas()
           .sort_values("vec_id", ignore_index=True))
    assert got["cluster"].tolist() == want


def test_kmeans_empty_cluster_dropped(ray_session, tmp_path):
    """Two identical init points: ties argmin to the lower cid, so the
    other cluster empties after round 1 and is dropped (matching the
    SQL oracle, where its centroid vanishes from the next cross join)."""
    vecs = [(0.0, 0.0), (0.0, 0.0)] + [(1.0, 1.0)] * 4
    sf = _write(tmp_path, "embeddings", _emb_table(vecs))
    got = Q.q_kmeans(sf, k=2, iters=2).to_pandas()
    assert set(got["cluster"]) == {0}
    assert len(got) == 6


def _events_table(rows):
    """rows: (event_id, user_id, ts_us)"""
    return pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array(["e"] * len(rows), pa.string()),
        "value": pa.array([0.0] * len(rows), pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string())})


def test_interval_union_touch_overlap_and_user_isolation(
        ray_session, tmp_path):
    L = Q._IVU_LEN_US
    rows = [
        # user 1: touching intervals merge (start == previous end)
        (1, 1, 0), (2, 1, L),
        # user 1: disjoint after a gap
        (3, 1, 3 * L),
        # user 2: overlap merges; user 1's far end must NOT leak here
        (4, 2, 0), (5, 2, L // 2),
        # user 3: duplicate timestamps collapse
        (6, 3, 0), (7, 3, 0),
    ]
    sf = _write(tmp_path, "events", _events_table(rows))
    got = (Q.q_interval_union(sf).to_pandas()
           .sort_values("user_id", ignore_index=True))
    assert got["user_id"].tolist() == [1, 2, 3]
    assert got["covered_us"].tolist() == [3 * L, L + L // 2, L]


def test_streaks_islands_and_resets(ray_session, tmp_path):
    DAY = 86_400_000_000
    rows = [
        # user 1: days 0,1,2 then gap then 10,11 -> max 3
        (1, 1, 0), (2, 1, DAY), (3, 1, 2 * DAY),
        (4, 1, 10 * DAY), (5, 1, 11 * DAY),
        # user 2: three events same day -> streak 1
        (6, 2, 5 * DAY), (7, 2, 5 * DAY + 1), (8, 2, 5 * DAY + 2),
        # user 3: every other day -> streak 1
        (9, 3, 0), (10, 3, 2 * DAY), (11, 3, 4 * DAY),
    ]
    sf = _write(tmp_path, "events", _events_table(rows))
    got = (Q.q_streaks(sf).to_pandas()
           .sort_values("user_id", ignore_index=True))
    assert got["user_id"].tolist() == [1, 2, 3]
    assert got["max_streak"].tolist() == [3, 1, 1]


def test_dedup_keep_best_min_id_and_counts(ray_session, tmp_path):
    docs = pa.table({
        "doc_id": pa.array([5, 3, 9, 1, 7], pa.int64()),
        "text": pa.array(["aa", "aa", "bb", "aa", "bb"]),
        "lang": pa.array(["en"] * 5),
        "source": pa.array(["s"] * 5),
        "n_chars": pa.array([2] * 5, pa.int64())})
    sf = _write(tmp_path, "documents", docs)
    got = (Q.q_dedup_keep_best(sf).to_pandas()
           .sort_values("doc_id", ignore_index=True))
    assert got["doc_id"].tolist() == [1, 7]
    assert got["n_dups"].tolist() == [3, 2]


def _events_full(rows):
    """rows: (event_id, user_id, ts_us, event_type, value, props)"""
    return pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
        "props": pa.array([r[5] for r in rows], pa.string())})


def test_profile_table_nulls_negzero_nan(ray_session, tmp_path):
    """The distinct classes SQL can't randomly produce: -0.0 must
    collapse into 0.0, every NaN into ONE class, and null counts must
    ride per column independently."""
    ev = _events_full([
        (1, 1, 0, "a", 0.0, None),
        (2, 1, 1, "b", -0.0, None),
        (3, None, 2, "a", float("nan"), "{}"),
        (4, 2, 3, None, float("nan"), "{}"),
    ])
    sf = _write(tmp_path, "events", ev)
    got = (Q.q_profile_table(sf).to_pandas()
           .sort_values("col", ignore_index=True))
    exp = {
        "event_type": (1, 2),   # null once; {a, b}
        "props": (2, 1),        # two nulls; one distinct
        "user_id": (1, 2),      # null once; {1, 2}
        "value": (0, 2),        # {0.0 (== -0.0), NaN-class}
    }
    assert got["col"].tolist() == sorted(exp)
    for _, r in got.iterrows():
        n_nulls, n_distinct = exp[r["col"]]
        assert r["n_nulls"] == n_nulls, r["col"]
        assert r["n_distinct"] == n_distinct, r["col"]


def test_gap_fill_span_expansion_and_user_isolation(
        ray_session, tmp_path):
    DAY = 86_400_000_000
    rows = [
        # user 1: two events day 0, one event day 3 -> [2,0,0,1]
        (1, 1, 0), (2, 1, 1), (3, 1, 3 * DAY),
        # user 2: single day -> one row, no fill
        (4, 2, 5 * DAY),
    ]
    sf = _write(tmp_path, "events", _events_table(rows))
    got = (Q.q_gap_fill(sf).to_pandas()
           .sort_values(["user_id", "day"], ignore_index=True))
    assert got["user_id"].tolist() == [1, 1, 1, 1, 2]
    assert got["day"].tolist() == [0, 1, 2, 3, 5]
    assert got["n_events"].tolist() == [2, 0, 0, 1, 1]


def test_markov_transitions_ts_tie_and_user_boundary(
        ray_session, tmp_path):
    rows = [
        # user 1: ts tie broken by event_id -> B then A, then C
        (2, 1, 0, "A", 0.0, "{}"),
        (1, 1, 0, "B", 0.0, "{}"),
        (3, 1, 5, "C", 0.0, "{}"),
        # user 2: single event -> contributes no transition, and no
        # cross-user edge to user 1's last event
        (4, 2, 6, "A", 0.0, "{}"),
    ]
    sf = _write(tmp_path, "events", _events_full(rows))
    got = (Q.q_markov_transitions(sf).to_pandas()
           .sort_values(["from_type", "to_type"], ignore_index=True))
    assert list(map(tuple, got.to_numpy())) == [
        ("A", "C", 1), ("B", "A", 1)]


def test_winsorize_matches_duckdb_on_tiny_groups(ray_session, tmp_path):
    """Singleton group, all-equal group, and a group where p5 == min /
    p95 == max sit exactly on percentile_disc boundaries."""
    import duckdb
    rows = [(i, 1, i, t, v, "{}") for i, (t, v) in enumerate([
        ("solo", 7.25),
        ("flat", 2.0), ("flat", 2.0), ("flat", 2.0),
        ("spread", 0.01), ("spread", 1.0), ("spread", 1.0),
        ("spread", 1.0), ("spread", 99.99),
    ])]
    sf = _write(tmp_path, "events", _events_full(rows))
    got = (Q.q_winsorize(sf).to_pandas()
           .sort_values("event_type", ignore_index=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{sf}/events.parquet'")
    want = (con.execute(Q._SQL_WINSORIZE).fetchdf()
            .sort_values("event_type", ignore_index=True))
    assert got["event_type"].tolist() == want["event_type"].tolist()
    assert got["n"].tolist() == want["n"].tolist()
    assert got["win_sum"].tolist() == want["win_sum"].tolist()


def test_skyline_duplicates_ties_and_domination(ray_session, tmp_path):
    parts = pa.table({
        "p_partkey": pa.array([1, 2, 3, 4, 5, 6, 7], pa.int64()),
        "p_name": pa.array(["p"] * 7),
        "p_brand": pa.array(["Brand#4"] * 6 + ["Brand#5"]),
        "p_type": pa.array(["t"] * 7),
        "p_size": pa.array([10, 10, 5, 5, 10, 20, 99], pa.int32()),
        "p_retailprice": pa.array(
            [1.0, 1.0, 1.0, 0.5, 2.0, 2.0, 0.01], pa.float64())})
    sf = _write(tmp_path, "part", parts)
    got = (Q.q_skyline(sf).to_pandas()
           .sort_values("p_partkey", ignore_index=True))
    # identical points 1 and 2 both survive (neither strictly
    # dominates); 3 dominated at equal price; 5 dominated at equal
    # size; 7 is the wrong brand
    assert got["p_partkey"].tolist() == [1, 2, 4, 6]


def test_cube_sales_all_four_grouping_levels(ray_session, tmp_path):
    li = pa.table({
        "l_returnflag": pa.array(["A", "A", "B"]),
        "l_linestatus": pa.array(["O", "F", "O"]),
        "l_extendedprice": pa.array([1.0, 2.0, 3.0], pa.float64())})
    sf = _write(tmp_path, "lineitem", li)
    got = (Q.q_cube_sales(sf).to_pandas()
           .sort_values(["l_returnflag", "l_linestatus"],
                        ignore_index=True))
    exp = sorted([
        ("A", "O", 1, 100), ("A", "F", 1, 200), ("B", "O", 1, 300),
        ("A", "ALL", 2, 300), ("B", "ALL", 1, 300),
        ("ALL", "O", 2, 400), ("ALL", "F", 1, 200),
        ("ALL", "ALL", 3, 600)])
    assert list(map(tuple, got.to_numpy())) == exp


def _docs_table(ids_texts):
    return pa.table({
        "doc_id": pa.array([i for i, _ in ids_texts], pa.int64()),
        "text": pa.array([t for _, t in ids_texts], pa.string()),
        "lang": pa.array(["en"] * len(ids_texts)),
        "source": pa.array(["s"] * len(ids_texts)),
        "n_chars": pa.array([len(t) for _, t in ids_texts], pa.int64())})


def test_rolling_sum_window_reset_and_ts_tie(ray_session, tmp_path):
    rows = [
        # user 1: cents 100,200,300,400 -> rolls 100,300,600,900;
        # events 2 and 3 share ts, ordered by event_id
        (1, 1, 0, "e", 1.0, "{}"),
        (2, 1, 5, "e", 2.0, "{}"),
        (3, 1, 5, "e", 3.0, "{}"),
        (4, 1, 9, "e", 4.0, "{}"),
        # user 2: window must NOT leak across users
        (5, 2, 1, "e", 0.5, "{}"),
    ]
    sf = _write(tmp_path, "events", _events_full(rows))
    got = (Q.q_rolling_sum(sf).to_pandas()
           .sort_values("event_id", ignore_index=True))
    assert got["roll_cents"].tolist() == [100, 300, 600, 900, 50]


def test_bpe_merge_counts_ties_and_doc_boundaries(ray_session, tmp_path):
    docs = _docs_table([
        (1, "aaab"),   # pairs aa, aa, ab
        (2, "b"),      # no pair
        (3, ""),       # no pair
        (4, "cd"),     # pair cd — must NOT pair across doc boundary
    ])
    sf = _write(tmp_path, "documents", docs)
    got = Q.q_bpe_merge(sf).to_pandas()
    # ties (n=1) break by pair text ascending
    assert list(map(tuple, got.to_numpy())) == [
        ("aa", 2), ("ab", 1), ("cd", 1)]


def test_sq8_embed_flat_dim_and_exact_codes(ray_session, tmp_path):
    emb = _emb_table([(0.0, 5.5), (1.0, 5.5), (2.0, 5.5)])
    sf = _write(tmp_path, "embeddings", emb)
    got = Q.q_sq8_embed(sf).to_pandas().sort_values(
        "dim", ignore_index=True)
    assert got["n"].tolist() == [3, 3]
    assert got["minv"].tolist() == [0.0, 5.5]
    assert got["maxv"].tolist() == [2.0, 5.5]
    # dim0: floor(v*255/2) = 0,127,255 -> 382; dim1 flat -> 0
    assert got["sum_code"].tolist() == [382, 0]


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_edit_dist_pairs_blocking_verify_and_slice(ray_session, tmp_path):
    base = "abcdefghijklmnop"             # 16 chars
    docs = _docs_table([
        (0, base + "SUFFIX-A"),           # key == base
        (4, base + "suffix-b"),           # dist 0 vs 0
        (8, "X" + base[1:]),              # substitution -> dist 1
        (12, base[:-1]),                  # deletion -> dist 1
        (16, "ba" + base[2:]),            # transposition -> dist 2: a
                                          # shared-deletion candidate the
                                          # verifier must reject
        (20, base.upper()),               # lower() -> dist 0 vs 0
        (5, base),                        # not in the doc_id % 4 slice
    ])
    sf = _write(tmp_path, "documents", docs)
    got = (Q.q_edit_dist_pairs(sf).to_pandas()
           .sort_values(["id_a", "id_b"], ignore_index=True))
    keys = {i: t[:16].lower() for i, t in
            zip(docs.column("doc_id").to_pylist(),
                docs.column("text").to_pylist()) if i % 4 == 0}
    want = sorted((a, b, _lev(keys[a], keys[b]))
                  for a in keys for b in keys
                  if a < b and _lev(keys[a], keys[b]) <= 1)
    assert list(map(tuple, got.to_numpy())) == want
    assert 5 not in set(got["id_a"]) | set(got["id_b"])
    assert 16 not in set(got["id_a"]) | set(got["id_b"])


def test_twa_weights_span_and_singleton(ray_session, tmp_path):
    rows = [
        # user 1: cents 100 for 10us, 300 for 5us, last event unweighted
        (1, 1, 0, "e", 1.0, "{}"),
        (2, 1, 10, "e", 3.0, "{}"),
        (3, 1, 15, "e", 9.0, "{}"),
        # user 2: single event -> num 0, span 0
        (4, 2, 7, "e", 5.0, "{}"),
        # user 3: ts tie resolved by event_id: 200 for 0us, then 400 for 3us
        (6, 3, 0, "e", 4.0, "{}"),
        (5, 3, 0, "e", 2.0, "{}"),
        (7, 3, 3, "e", 8.0, "{}"),
    ]
    sf = _write(tmp_path, "events", _events_full(rows))
    got = (Q.q_twa(sf).to_pandas()
           .sort_values("user_id", ignore_index=True))
    assert got["user_id"].tolist() == [1, 2, 3]
    assert got["num_cents_us"].tolist() == [
        100 * 10 + 300 * 5, 0, 200 * 0 + 400 * 3]
    assert got["span_us"].tolist() == [15, 0, 3]


def test_group_moments_hand_computed(ray_session, tmp_path):
    H = 3_600_000_000
    rows = [
        # type a: (x, y) = (100, 0), (300, 2)
        (1, 1, 0, "a", 1.0, "{}"),
        (2, 1, 2 * H, "a", 3.0, "{}"),
        # type b: one row (x, y) = (250, 25h -> hour 1)
        (3, 1, 25 * H, "b", 2.5, "{}"),
    ]
    sf = _write(tmp_path, "events", _events_full(rows))
    got = (Q.q_group_moments(sf).to_pandas()
           .sort_values("event_type", ignore_index=True))
    a = got.iloc[0]
    assert (a["n"], a["sx"], a["sxx"], a["sy"], a["syy"], a["sxy"]) == \
        (2, 400, 100**2 + 300**2, 2, 4, 600)
    b = got.iloc[1]
    assert (b["n"], b["sx"], b["sxx"], b["sy"], b["syy"], b["sxy"]) == \
        (1, 250, 62500, 1, 1, 250)


def test_quadkey_rollup_parent_child_consistency(ray_session, tmp_path):
    # scatter events across the grid via the event_id -> lon/lat formula
    rows = [(i * 137, 1, 0) for i in range(50)]
    sf = _write(tmp_path, "events", _events_table(rows))
    got = Q.q_quadkey_rollup(sf).to_pandas()
    total = {lev: int(got[got["level"] == lev]["n"].sum())
             for lev in (1, 2, 3, 4)}
    assert total == {1: 50, 2: 50, 3: 50, 4: 50}
    # every level-l cell equals the sum of its level-(l+1) children
    for lev in (1, 2, 3):
        child = got[got["level"] == lev + 1]
        parent = got[got["level"] == lev]
        agg = (child.assign(px=child["cell_x"] // 2,
                            py=child["cell_y"] // 2)
               .groupby(["px", "py"])["n"].sum())
        for _, r in parent.iterrows():
            assert agg[(r["cell_x"], r["cell_y"])] == r["n"]


def test_mad_hand_computed_and_singleton(ray_session, tmp_path):
    rows = [
        # type a: cents 100, 200, 1000 -> median 200, adev 100,0,800
        # -> mad 100
        (1, 1, 0, "a", 1.0, "{}"),
        (2, 1, 1, "a", 2.0, "{}"),
        (3, 1, 2, "a", 10.0, "{}"),
        # type b: singleton -> median = value, mad 0
        (4, 1, 3, "b", 7.77, "{}"),
    ]
    sf = _write(tmp_path, "events", _events_full(rows))
    got = (Q.q_mad(sf).to_pandas()
           .sort_values("event_type", ignore_index=True))
    assert list(map(tuple, got.to_numpy())) == [
        ("a", 200, 100), ("b", 777, 0)]


def test_pagerank_int_matches_reference_recurrence(ray_session, tmp_path):
    # path graph 1-2-3 plus isolated-pair 7-8, via shared orders
    li = pa.table({
        "l_orderkey": pa.array([10, 10, 11, 11, 12, 12], pa.int64()),
        "l_partkey": pa.array([1, 2, 2, 3, 7, 8], pa.int64()),
        "l_quantity": pa.array([1.0] * 6, pa.float64()),
        "l_extendedprice": pa.array([1.0] * 6, pa.float64()),
        "l_discount": pa.array([0.0] * 6, pa.float64()),
        "l_returnflag": pa.array(["N"] * 6),
        "l_linestatus": pa.array(["O"] * 6),
        "l_shipdate": pa.array([0] * 6, pa.timestamp("us"))})
    sf = _write(tmp_path, "lineitem", li)
    got = (Q.q_pagerank_int(sf).to_pandas()
           .sort_values("node", ignore_index=True))
    # independent scalar reimplementation of the integer recurrence
    adj = {1: [2], 2: [1, 3], 3: [2], 7: [8], 8: [7]}
    r = {n: 1_000_000 for n in adj}
    for _ in range(3):
        r = {v: 150_000
             + (85 * sum(r[u] // len(adj[u])
                         for u in adj if v in adj[u])) // 100
             for v in adj}
    want = sorted(r.items())
    assert list(map(tuple, got.to_numpy())) == want


def test_hard_negatives_label_mask_and_tie(ray_session, tmp_path):
    emb = pa.table({
        "vec_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "embedding": pa.array([
            [1.0, 0.0],    # query, label 0
            [1.0, 0.0],    # identical but SAME label -> excluded
            [1.0, 1.0],    # label 1, cos = .707
            [0.0, 1.0],    # label 1, cos = 0
            [1.0, 1.0],    # label 2, cos = .707 -> ties vec 2; vec_id
                           # tie-break keeps 2
        ], pa.list_(pa.float32())),
        "label": pa.array([0, 0, 1, 1, 2], pa.int32())})
    sf = _write(tmp_path, "embeddings", emb)
    got = Q.q_hard_negatives(sf).to_pandas()
    got = got[got["query_id"] == 0]
    assert got["vec_id"].tolist() == [2]


def test_percent_rank_ties_and_group_isolation(ray_session, tmp_path):
    rows = [
        (1, 1, 0, "a", 1.0, "{}"),
        (2, 1, 1, "a", 1.0, "{}"),   # tie: both n_lt 0
        (3, 1, 2, "a", 2.0, "{}"),   # n_lt 2
        (4, 1, 3, "b", 9.0, "{}"),   # singleton group
    ]
    sf = _write(tmp_path, "events", _events_full(rows))
    got = (Q.q_percent_rank(sf).to_pandas()
           .sort_values("event_id", ignore_index=True))
    assert got["n_lt"].tolist() == [0, 0, 2, 0]
    assert got["n_group"].tolist() == [3, 3, 3, 1]
