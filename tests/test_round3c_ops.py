"""Edge-case tests for the round-3 session-C operators:
user_first_last, class_centroids, pip_anti, pca_project. (Oracle
parity for the first three runs in test_queries_oracle.py; these pin
the corners the random testdata can't reach, and pca_project's
declared gate — exact agreement with single-process numpy PCA —
lives here.)"""

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
    """rows: (event_id, user_id, ts_us, event_type, value)"""
    return pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string())})


def _emb_table(vecs, labels=None):
    if labels is None:
        labels = [0] * len(vecs)
    return pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32())})


# ------------------------------------------------------ user_first_last
def test_user_first_last_ts_tie_and_singleton(ray_session, tmp_path):
    """Timestamp ties break on event_id; a one-event user reports the
    same event as both first and last; counts are lifetime-exact."""
    rows = [
        # user 1: two events at the SAME ts — event_id 10 is first
        (11, 1, 1000, "b", 2.0),
        (10, 1, 1000, "a", 1.0),
        (12, 1, 2000, "c", 3.0),
        # user 2: singleton
        (20, 2, 500, "x", 9.5),
        # user 3: last-ts tie — event_id 32 is last
        (30, 3, 100, "p", 1.0),
        (32, 3, 900, "r", 3.25),
        (31, 3, 900, "q", 2.0),
    ]
    sf = _write(tmp_path, "events", _events_table(rows))
    got = (Q.q_user_first_last(sf).to_pandas()
           .sort_values("user_id", ignore_index=True))
    assert got["user_id"].tolist() == [1, 2, 3]
    assert got["first_type"].tolist() == ["a", "x", "p"]
    assert got["first_cents"].tolist() == [100, 950, 100]
    assert got["last_type"].tolist() == ["c", "x", "r"]
    assert got["last_cents"].tolist() == [300, 950, 325]
    assert got["n_events"].tolist() == [3, 1, 3]


# ---------------------------------------------------------------- ntile
def test_ntile_remainder_ties_and_tiny_group(ray_session, tmp_path):
    """SQL's uneven-remainder rule (n=6, k=4 -> sizes 2,2,1,1), ties
    split across tile boundaries by event_id, and n < k gives every
    row its own tile."""
    rows = [
        # group a: six rows, ALL the same cents — order is event_id
        #   tiles: (1,1),(2,2),(3),(4) -> ids 1,2 | 3,4 | 5 | 6
        (1, 0, 0, "a", 5.0), (2, 0, 1, "a", 5.0), (3, 0, 2, "a", 5.0),
        (4, 0, 3, "a", 5.0), (5, 0, 4, "a", 5.0), (6, 0, 5, "a", 5.0),
        # group b: two rows (n < k): tiles 1 and 2 by cents order
        (7, 0, 0, "b", 9.0), (8, 0, 1, "b", 3.0),
    ]
    sf = _write(tmp_path, "events", _events_table(rows))
    got = (Q.q_ntile(sf).to_pandas()
           .sort_values("event_id", ignore_index=True))
    assert got["event_id"].tolist() == [1, 2, 3, 4, 5, 6, 7, 8]
    assert got["tile"].tolist() == [1, 1, 2, 2, 3, 4, 2, 1]


def test_ntile_cross_bucket_prefix(ray_session, tmp_path):
    """Rows whose cents land in DIFFERENT range buckets (bucket_w=256)
    must still get globally consistent positions: values far apart
    force multi-bucket offsets."""
    rows = [(i, 0, i, "a", float(i * 100)) for i in range(1, 9)]
    # cents = 10000*i spread across many 256-wide buckets; order = i
    sf = _write(tmp_path, "events", _events_table(rows))
    got = (Q.q_ntile(sf).to_pandas()
           .sort_values("event_id", ignore_index=True))
    assert got["tile"].tolist() == [1, 1, 2, 2, 3, 3, 4, 4]


# ---------------------------------------------------------- late_events
def test_late_events_cross_bucket_watermark(ray_session, tmp_path):
    """The watermark must carry ACROSS arrival-range buckets
    (bucket_w=4096): a huge event time in bucket 0 condemns a
    trailing event in bucket 1; the first arrival is never late;
    the comparison is strict (ts == watermark is on time). Engine
    output is checked against an independent scalar replay."""
    H = 3_600_000_000
    base = 10_000 * H
    # (event_id, ts_us): ids 0..2 in bucket 0, 5000/5001 in bucket 1
    evs = [(0, base), (1, base + 10 * H), (2, base + 10 * H),
           (5000, base + 2 * H),        # trails wm by 8h -> late
           (5001, base + 20 * H)]
    rows = [(eid, 0, ts, "e", 0.0) for eid, ts in evs]
    sf = _write(tmp_path, "events", _events_table(rows))
    got = (Q.q_late_events(sf).to_pandas()
           .sort_values("event_id", ignore_index=True))

    # scalar replay with the same deterministic skew
    def etime(eid, ts):
        return ts - (eid * 2654435761) % 7919 * 1_000_000
    want = []
    wm_max = None
    for eid, ts in sorted(evs):
        et = etime(eid, ts)
        if wm_max is not None and et < wm_max - H:
            want.append((eid, et, wm_max - H))
        wm_max = et if wm_max is None else max(wm_max, et)
    assert [tuple(r) for r in got.to_numpy()] == want
    assert 5000 in {w[0] for w in want}          # the planted late row
    assert 0 not in {w[0] for w in want}         # first arrival safe


# ------------------------------------------------------ weighted_median
def test_weighted_median_weights_boundary_singleton(
        ray_session, tmp_path):
    """Weights shift the median away from the unweighted one; the
    2·cum == tot boundary picks the LOWER median; singleton groups
    work. w = user_id % 5 + 1."""
    rows = [
        # group a: cents/weights (100, w3), (200, w1), (300, w1)
        #   tot=5, cum(100)=3, 2*3 >= 5 -> wmedian 100
        #   (unweighted median would be 200)
        (1, 2, 0, "a", 1.0), (2, 0, 1, "a", 2.0), (3, 0, 2, "a", 3.0),
        # group b: (100, w2), (200, w2) -> tot=4, 2*cum(100)=4 == tot
        #   -> lower median 100
        (4, 1, 0, "b", 1.0), (5, 1, 1, "b", 2.0),
        # group c: singleton (725, w4)
        (6, 3, 0, "c", 7.25),
    ]
    sf = _write(tmp_path, "events", _events_table(rows))
    got = (Q.q_weighted_median(sf).to_pandas()
           .sort_values("event_type", ignore_index=True))
    assert got["event_type"].tolist() == ["a", "b", "c"]
    assert got["wmedian_cents"].tolist() == [100, 100, 725]
    assert got["total_w"].tolist() == [5, 4, 4]


# ------------------------------------------------------ class_centroids
def test_class_centroids_floor_semantics_and_labels(
        ray_session, tmp_path):
    """floor (not round): -0.5 -> -500000, tiny positives truncate to
    0, negatives truncate DOWN; per-label isolation; n counts rows."""
    vecs = [(-0.5, 1e-7), (0.25, -1e-7), (1.0, 2.0)]
    labels = [0, 0, 1]
    sf = _write(tmp_path, "embeddings", _emb_table(vecs, labels))
    got = (Q.q_class_centroids(sf).to_pandas()
           .sort_values(["label", "dim"], ignore_index=True))
    assert got["label"].tolist() == [0, 0, 1, 1]
    assert got["dim"].tolist() == [0, 1, 0, 1]
    # label 0 dim 0: floor(-500000.0) + floor(250000.0) = -250000
    # label 0 dim 1: floor(0.1...) + floor(-0.1...) = 0 + (-1) = -1
    assert got["s"].tolist() == [-250000, -1, 1000000, 2000000]
    assert got["n"].tolist() == [2, 2, 1, 1]


# ------------------------------------------------------------- pip_anti
def test_pip_anti_complement_of_pip_rect(ray_session, tmp_path):
    """pip_anti is the exact complement of pip_rect's matched id set,
    and rectangle edges are INCLUSIVE (an edge point is not anti)."""
    # nation 0 rect: lon in [-176.05, -159.95], lat in [-77.05, -66.95]
    nat = pa.table({"n_nationkey": pa.array([0], pa.int64()),
                    "n_name": pa.array(["A"], pa.string()),
                    "n_regionkey": pa.array([0], pa.int64())})
    # lon = (eid % 3600)/10 - 180, lat = (eid % 1600)/10 - 80
    #   eid 40  -> lon -176.0, lat -76.0  (inside)
    #   eid 240 -> lon -156.0, lat -56.0  (outside)
    #   eid 200 -> lon -160.0, lat -60.0  (lon inside, lat outside)
    rows = [(40, 1, 0, "e", 0.0), (240, 1, 1, "e", 0.0),
            (200, 1, 2, "e", 0.0)]
    sf = _write(tmp_path, "events", _events_table(rows))
    pq.write_table(nat, str(tmp_path / "sf" / "nation.parquet"))
    anti = set(Q.q_pip_anti(sf).to_pandas()["event_id"])
    hit = set(Q.q_pip_rect(sf).to_pandas()["event_id"])
    assert anti == {240, 200}
    assert anti | hit == {40, 240, 200} and not (anti & hit)


# ------------------------------------------------------------ cdc_upsert
def test_cdc_upsert_update_insert_untouched(ray_session, tmp_path):
    """Update wins over base for keys % 10 == 0, the %1000==7 clone
    lands under key+1e8 with status 'I', and untouched keys pass
    through byte-identical."""
    orders = pa.table({
        "o_orderkey": pa.array([3, 7, 10], pa.int64()),
        "o_custkey": pa.array([1, 1, 1], pa.int64()),
        "o_orderstatus": pa.array(["F", "O", "P"], pa.string()),
        "o_totalprice": pa.array([5.25, 1.10, 99.99], pa.float64()),
        "o_orderdate": pa.array([0, 0, 0], pa.timestamp("us")),
        "o_orderpriority": pa.array(["x"] * 3, pa.string())})
    sf = _write(tmp_path, "orders", orders)
    got = (Q.q_cdc_upsert(sf).to_pandas()
           .sort_values("o_orderkey", ignore_index=True))
    assert got["o_orderkey"].tolist() == [3, 7, 10, 100000007]
    assert got["o_orderstatus"].tolist() == ["F", "O", "U", "I"]
    # untouched keep base cents; updated key 10 is +1; insert clones
    assert got["total_cents"].tolist() == [525, 110, 10000, 110]


# --------------------------------------------------- dup_rate_by_source
def test_dup_rate_by_source_cross_source_dups(ray_session, tmp_path):
    """BOTH sides of a cross-source exact duplicate count as
    duplicated; unique docs don't; totals are per-source. (The random
    testdata has no exact dups, so the counting path is pinned here.)"""
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "text": pa.array(["same text", "same text", "unique one",
                          "same text", "other dup", "other dup"],
                         pa.string()),
        "lang": pa.array(["en"] * 6, pa.string()),
        "source": pa.array(["a", "a", "a", "b", "b", "b"], pa.string()),
        "n_chars": pa.array([9, 9, 10, 9, 9, 9], pa.int64())})
    sf = _write(tmp_path, "documents", docs)
    got = (Q.q_dup_rate_by_source(sf).to_pandas()
           .sort_values("source", ignore_index=True))
    assert got["source"].tolist() == ["a", "b"]
    assert got["n_docs"].tolist() == [3, 3]
    # a: docs 1,2 dup (with each other + doc 4); b: doc 4 + the 5/6 pair
    assert got["n_dup_docs"].tolist() == [2, 3]


# --------------------------------------------------------- knn_classify
def test_knn_classify_vote_tie_and_self_exclusion(
        ray_session, tmp_path):
    """A 2-2-1 vote among the 5 nearest ties between two labels and
    must break to the SMALLER label; the query's own row never votes."""
    import math

    def at(deg):
        r = math.radians(deg)
        return (math.cos(r), math.sin(r))

    # vec_id 0 is the only query (0 % 20 == 0); neighbors by angle
    vecs = [at(0),                       # query itself
            at(5), at(10), at(15), at(20), at(25),   # the 5 nearest
            at(80)]                      # far decoy
    labels = [7, 2, 1, 2, 1, 3, 9]
    sf = _write(tmp_path, "embeddings", _emb_table(vecs, labels))
    got = Q.q_knn_classify(sf).to_pandas()
    assert got["query_id"].tolist() == [0]
    assert got["pred_label"].tolist() == [1]   # tie 2-2 -> min label
    assert got["votes"].tolist() == [2]


# ---------------------------------------------------------- pca_project
def test_pca_project_matches_numpy(ray_session, tmp_path):
    """The declared no-oracle gate: distributed covariance + driver
    eigh reproduces single-process numpy PCA exactly (atol 1e-8),
    including the canonical component-sign rule."""
    rng = np.random.default_rng(42)
    # anisotropic cloud: dominant variance along a known direction
    base = rng.normal(size=(200, 6))
    base[:, 0] *= 10.0
    base[:, 1] *= 3.0
    sf = _write(tmp_path, "embeddings", _emb_table(base))
    got = (Q.q_pca_project(sf).to_pandas()
           .sort_values("vec_id", ignore_index=True))

    mat = np.array([list(map(np.float32, v)) for v in base],
                   np.float32).astype(np.float64)
    mu = mat.mean(axis=0)
    cov = np.cov(mat, rowvar=False)
    _, v = np.linalg.eigh(cov)
    comps = v[:, ::-1][:, :2]
    for j in range(2):
        i = int(np.abs(comps[:, j]).argmax())
        if comps[i, j] < 0:
            comps[:, j] = -comps[:, j]
    want = (mat - mu) @ comps
    assert np.allclose(got[["pc1", "pc2"]].to_numpy(), want, atol=1e-8)
    # the dominant planted axis is dim 0: pc1 must track it
    c = np.corrcoef(got["pc1"].to_numpy(), mat[:, 0])[0, 1]
    assert abs(c) > 0.99


def test_late_events_huge_event_ids_no_wrap(ray_session, tmp_path):
    """event_ids past ~3.5e9 must not wrap the int64 skew product:
    the engine's modular-reduced skew must equal the exact Python-int
    computation the SQL oracle performs."""
    H = 3_600_000_000
    base = 10_000 * H
    big = 5_000_000_000                       # eid * 2654435761 > 2^63
    evs = [(big, base), (big + 1, base + 10 * H),
           (big + 9000, base + 2 * H),        # trails wm -> late
           (big + 9001, base + 20 * H)]
    rows = [(eid, 0, ts, "e", 0.0) for eid, ts in evs]
    sf = _write(tmp_path, "events", _events_table(rows))
    got = (Q.q_late_events(sf).to_pandas()
           .sort_values("event_id", ignore_index=True))

    def etime(eid, ts):                       # exact Python ints
        return ts - (eid * 2654435761) % 7919 * 1_000_000
    want, wm_max = [], None
    for eid, ts in sorted(evs):
        et = etime(eid, ts)
        if wm_max is not None and et < wm_max - H:
            want.append((eid, et, wm_max - H))
        wm_max = et if wm_max is None else max(wm_max, et)
    assert [tuple(r) for r in got.to_numpy()] == want
    assert len(want) >= 1                     # the planted late row


def test_knn_classify_no_query_vectors(ray_session, tmp_path):
    """A corpus with no vec_id % 20 == 0 rows yields an empty result,
    not a crash inside the per-batch partial."""
    tbl = pa.table({
        "vec_id": pa.array([1, 2, 3], pa.int64()),
        "embedding": pa.array([[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]],
                              pa.list_(pa.float32())),
        "label": pa.array([0, 1, 0], pa.int32())})
    sf = _write(tmp_path, "embeddings", tbl)
    got = Q.q_knn_classify(sf).to_pandas()
    assert len(got) == 0
    assert list(got.columns) == ["query_id", "pred_label", "votes"]


def _docs_table(rows):
    """rows: (doc_id, text, lang, source)"""
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
        "source": pa.array([r[3] for r in rows], pa.string()),
        "n_chars": pa.array([len(r[1]) for r in rows], pa.int64())})


def test_vocab_growth_first_seen_and_cumsum(ray_session, tmp_path):
    """A term counts only in the bucket of its FIRST doc; empty docs
    contribute nothing; the cumulative column is a running total over
    present buckets (gaps allowed)."""
    rows = [(0, "alpha beta", "en", "s0"),
            (1, "", "en", "s0"),                    # empty doc
            (49, "alpha gamma", "en", "s0"),        # alpha NOT recounted
            (50, "alpha beta delta", "en", "s0"),   # only delta is new
            (150, "epsilon", "en", "s0")]           # bucket 3 (gap at 2)
    sf = _write(tmp_path, "documents", _docs_table(rows))
    got = Q.q_vocab_growth(sf).to_pandas()
    assert got["bucket"].tolist() == [0, 1, 3]
    assert got["new_terms"].tolist() == [3, 1, 1]   # alpha,beta,gamma | delta | epsilon
    assert got["cum_terms"].tolist() == [3, 4, 5]


def test_source_vocab_overlap_pairs_and_union(ray_session, tmp_path):
    """Overlap counts distinct terms only (repeats collapse), the union
    arithmetic is exact, zero-overlap pairs are omitted (inner-join
    semantics), and a single-source corpus yields no rows."""
    rows = [(0, "a b c", "en", "s1"),
            (1, "b b c d", "en", "s2"),             # repeats collapse
            (2, "x y", "en", "s3")]                 # disjoint from s1/s2
    sf = _write(tmp_path, "documents", _docs_table(rows))
    got = (Q.q_source_vocab_overlap(sf).to_pandas()
           .sort_values(["source_a", "source_b"], ignore_index=True))
    assert [tuple(r) for r in got.to_numpy()] == [("s1", "s2", 2, 4)]
    # single source: no pairs at all
    (tmp_path / "one").mkdir()
    sf2 = _write(tmp_path / "one", "documents",
                 _docs_table([(0, "a b", "en", "only")]))
    assert len(Q.q_source_vocab_overlap(sf2).to_pandas()) == 0


def test_order_reconcile_all_statuses(ray_session, tmp_path):
    """Plants every status: exact cent match, mismatch with known
    absolute diff, ledger-only, and detail-only orderkeys (keys
    chosen to survive the %89/%97 planted filters); multi-line orders
    sum before comparison."""
    orders = pa.table({
        "o_orderkey": pa.array([1, 2, 3, 89], pa.int64()),
        "o_custkey": pa.array([0] * 4, pa.int64()),
        "o_orderstatus": pa.array(["O"] * 4, pa.string()),
        # 1: matches 10.00+2.50; 2: lineitem sums 5.00 (diff 100);
        # 3: no lineitem rows; 89: dropped by the ledger filter
        "o_totalprice": pa.array([12.50, 6.00, 7.00, 1.00],
                                 pa.float64()),
        "o_orderdate": pa.array([0] * 4, pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * 4, pa.string())})
    li = pa.table({
        "l_orderkey": pa.array([1, 1, 2, 4, 97], pa.int64()),
        "l_partkey": pa.array([0] * 5, pa.int64()),
        "l_suppkey": pa.array([0] * 5, pa.int64()),
        "l_linenumber": pa.array([1, 2, 1, 1, 1], pa.int32()),
        "l_quantity": pa.array([1.0] * 5, pa.float64()),
        # order 4 exists only here; 97 dropped by the detail filter
        "l_extendedprice": pa.array([10.00, 2.50, 5.00, 9.99, 1.00],
                                    pa.float64()),
        "l_discount": pa.array([0.0] * 5, pa.float64()),
        "l_tax": pa.array([0.0] * 5, pa.float64()),
        "l_returnflag": pa.array(["N"] * 5, pa.string()),
        "l_linestatus": pa.array(["O"] * 5, pa.string()),
        "l_shipdate": pa.array([0] * 5, pa.timestamp("us"))})
    sf = _write(tmp_path, "orders", orders)
    _write(tmp_path, "lineitem", li)
    got = (Q.q_order_reconcile(sf).to_pandas()
           .sort_values("status", ignore_index=True))
    assert [tuple(r) for r in got.to_numpy()] == [
        ("both_match", 1, 0),
        ("both_mismatch", 1, 100),
        ("only_lineitem", 1, 0),
        ("only_orders", 1, 0)]


def test_containment_join_asymmetric_pairs(ray_session, tmp_path):
    """Plants: (1) a small doc 80%-contained in a doc <2x its size ->
    reported with exact sizes; (2) a perfect containment BEYOND the 2x
    size-ratio bound -> excluded by the declared predicate; (3) an
    in-ratio pair below the 0.8 containment threshold -> excluded.
    Cross-checked against a brute-force set computation."""
    words = [f"w{i}" for i in range(40)]
    base = " ".join(words)              # 36 distinct 5-grams
    # (1) small doc = first 24 tokens of base: its 20 grams are all in
    # base's 36; sizes 20 vs 36 <= 2x, containment 20/20 = 1.0
    small = " ".join(words[:24])
    # (2) tiny doc = first 9 tokens: 5 grams, all in base, but
    # 36 > 2*5 -> ratio bound excludes it
    tiny = " ".join(words[:9])
    # (3) half-overlap in-ratio pair: shares 10 of its 20 grams with
    # small via the first 14 tokens, rest disjoint -> 10/20 < 0.8
    half = " ".join(words[:14] + [f"z{i}" for i in range(10)])
    rows = [(0, base, "en", "s"), (1, small, "en", "s"),
            (2, tiny, "en", "s"), (3, half, "en", "s")]
    sf = _write(tmp_path, "documents", _docs_table(rows))
    got = Q.q_containment_join(sf).to_pandas()

    def grams(t):
        ts = t.split()
        return {" ".join(ts[i:i + 5]) for i in range(len(ts) - 4)}

    want = []
    gs = {i: grams(t) for i, t, _, _ in rows}
    for a in range(4):
        for b in range(a + 1, 4):
            inter = len(gs[a] & gs[b])
            lo = min(len(gs[a]), len(gs[b]))
            hi = max(len(gs[a]), len(gs[b]))
            if lo and 5 * inter >= 4 * lo and hi <= 2 * lo:
                want.append((a, b, inter, lo, hi))
    assert [tuple(r) for r in got.to_numpy()] == want
    assert (0, 1, 20, 20, 36) in want          # the planted pair
    assert all(p[:2] != (0, 2) for p in want)  # ratio-bound exclusion
    assert all(p[:2] != (1, 3) for p in want)  # threshold exclusion


def test_trending_terms_tiebreak_and_boundary_cut(ray_session, tmp_path):
    """Delta ties break on term ASC at the k boundary; a term absent
    from one period counts 0 there; result is ordered (delta DESC,
    term ASC)."""
    # period = doc_id % 2: docs 0,2 are "old", 1,3 are "new"
    rows = [(0, "aa aa bb cc", "en", "s"),      # old: aa=2 bb=1 cc=1
            (1, "aa aa aa bb dd", "en", "s"),   # new: aa=3 bb=1 dd=1
            (2, "cc", "en", "s"),               # old: cc=1
            (3, "dd", "en", "s")]               # new: dd=1
    # deltas: aa=+1, bb=0, cc=-2, dd=+2 (dd absent old, cc absent new)
    sf = _write(tmp_path, "documents", _docs_table(rows))
    got = Q.q_trending_terms(sf).to_pandas()
    assert [tuple(r) for r in got.to_numpy()] == [
        ("dd", 0, 2, 2), ("aa", 2, 3, 1), ("bb", 1, 1, 0),
        ("cc", 2, 0, -2)]
    # k=2 boundary with a delta tie: ee and dd both +2 -> term ASC wins
    rows2 = rows + [(5, "ee ee", "en", "s")]
    (tmp_path / "t2").mkdir()
    sf2 = _write(tmp_path / "t2", "documents", _docs_table(rows2))
    got2 = Q.q_trending_terms(sf2, k=2).to_pandas()
    assert [tuple(r) for r in got2.to_numpy()] == [
        ("dd", 0, 2, 2), ("ee", 0, 2, 2)]


def test_ohlc_bars_tie_and_hour_boundary(ray_session, tmp_path):
    """Open/close pick by (ts, event_id) — a ts tie breaks on event_id;
    events one microsecond across an hour boundary land in different
    bars; high/low are independent of arrival order."""
    H = 3_600_000_000
    rows = [
        # bar (x, hour 0): open is eid 2 (ts tie 1000, lower eid),
        # close is eid 5 (latest ts), high 9.00 mid-bar, low 0.50
        (3, 1, 1000, "x", 4.00),
        (2, 1, 1000, "x", 1.25),
        (4, 1, 2000, "x", 9.00),
        (6, 1, 2500, "x", 0.50),
        (5, 1, H - 1, "x", 7.75),
        # one event exactly at the boundary -> hour 1, its own bar
        (7, 1, H, "x", 3.00),
        # different type shares hour 0 but is its own bar
        (8, 2, 1500, "y", 2.00)]
    sf = _write(tmp_path, "events", _events_table(rows))
    got = Q.q_ohlc_bars(sf).to_pandas()
    assert [tuple(r) for r in got.to_numpy()] == [
        ("x", 0, 125, 900, 50, 775, 5),
        ("x", 1, 300, 300, 300, 300, 1),
        ("y", 0, 200, 200, 200, 200, 1)]


def test_ri_audit_planted_orphans(ray_session, tmp_path):
    """Orphans = child keys whose parent row is filtered by the planted
    modulus (or never existed); orphan_rows counts every child row,
    orphan_keys each key once; a fully-covered FK reports zeros."""
    orders = pa.table({
        "o_orderkey": pa.array([1, 2, 101], pa.int64()),
        "o_custkey": pa.array([1, 2, 53], pa.int64()),  # 53 filtered
        "o_orderstatus": pa.array(["O"] * 3, pa.string()),
        "o_totalprice": pa.array([1.0] * 3, pa.float64()),
        "o_orderdate": pa.array([0] * 3, pa.timestamp("us")),
        "o_orderpriority": pa.array(["1"] * 3, pa.string())})
    li = pa.table({
        # l_orderkey: 101 is parent-filtered (%101), 7 has no parent
        # at all (two rows -> 2 orphan rows, 1 orphan key); 1 is fine
        "l_orderkey": pa.array([1, 101, 7, 7], pa.int64()),
        "l_partkey": pa.array([1, 2, 1, 2], pa.int64()),
        "l_suppkey": pa.array([1, 2, 1, 2], pa.int64()),
        "l_linenumber": pa.array([1, 1, 1, 2], pa.int32()),
        "l_quantity": pa.array([1.0] * 4, pa.float64()),
        "l_extendedprice": pa.array([1.0] * 4, pa.float64()),
        "l_discount": pa.array([0.0] * 4, pa.float64()),
        "l_tax": pa.array([0.0] * 4, pa.float64()),
        "l_returnflag": pa.array(["N"] * 4, pa.string()),
        "l_linestatus": pa.array(["O"] * 4, pa.string()),
        "l_shipdate": pa.array([0] * 4, pa.timestamp("us"))})
    cust = pa.table({
        "c_custkey": pa.array([1, 2, 53], pa.int64()),
        "c_name": pa.array(["a", "b", "c"], pa.string()),
        "c_nationkey": pa.array([0] * 3, pa.int64()),
        "c_acctbal": pa.array([0.0] * 3, pa.float64()),
        "c_mktsegment": pa.array(["s"] * 3, pa.string())})
    part = pa.table({
        "p_partkey": pa.array([1, 2], pa.int64()),
        "p_name": pa.array(["x", "y"], pa.string()),
        "p_brand": pa.array(["b"] * 2, pa.string()),
        "p_type": pa.array(["t"] * 2, pa.string()),
        "p_size": pa.array([1, 2], pa.int64()),
        "p_retailprice": pa.array([1.0, 2.0], pa.float64())})
    sup = pa.table({
        "s_suppkey": pa.array([1, 2], pa.int64()),
        "s_name": pa.array(["u", "v"], pa.string()),
        "s_nationkey": pa.array([0, 0], pa.int64()),
        "s_acctbal": pa.array([0.0, 0.0], pa.float64())})
    sf = _write(tmp_path, "orders", orders)
    for name, t in [("lineitem", li), ("customer", cust),
                    ("part", part), ("supplier", sup)]:
        _write(tmp_path, name, t)
    got = Q.q_ri_audit(sf).to_pandas()
    rows = {r[0]: tuple(r[1:]) for r in got.to_numpy()}
    # l_orderkey: rows for 101 (filtered) + 7,7 (absent) = 3 rows/2 keys
    assert rows["lineitem.l_orderkey->orders"] == (4, 3, 2)
    # parts/suppliers 1,2 not multiples of 31/13 -> fully covered
    assert rows["lineitem.l_partkey->part"] == (4, 0, 0)
    assert rows["lineitem.l_suppkey->supplier"] == (4, 0, 0)
    # o_custkey 53 is parent-filtered -> 1 orphan row/key
    assert rows["orders.o_custkey->customer"] == (3, 1, 1)


def test_rolling_active_users_window_and_gaps(ray_session, tmp_path):
    """A user active on days 0 and 9 (gap > 6) covers two disjoint WAU
    intervals; overlapping users both count; a day is a row only if
    someone was active ON it; WAU at day d counts activity in
    [d-6, d]. Independent scalar check."""
    D = 86_400_000_000
    # (event_id, user, ts) — user 1 on days 0 and 9; user 2 on days
    # 1 and 9; user 3 on day 3 only
    evs = [(0, 1, 0), (1, 1, 9 * D), (2, 2, 1 * D), (3, 2, 9 * D),
           (4, 3, 3 * D), (5, 3, 3 * D + 5)]   # same-day dup event
    rows = [(eid, u, ts, "e", 0.0) for eid, u, ts in evs]
    sf = _write(tmp_path, "events", _events_table(rows))
    got = Q.q_rolling_active_users(sf).to_pandas()

    active = {}
    for _, u, ts in evs:
        active.setdefault(u, set()).add(ts // D)
    obs_days = sorted({d for s in active.values() for d in s})
    want = []
    for d in obs_days:
        dau = sum(1 for s in active.values() if d in s)
        wau = sum(1 for s in active.values()
                  if any(d - 6 <= a <= d for a in s))
        want.append((d, dau, wau))
    assert [tuple(r) for r in got.to_numpy()] == want
    # pin the interesting values: day 9's window is [3, 9] — user 3's
    # day-3 activity sits EXACTLY on the d-6 boundary and counts
    assert want[-1] == (9, 2, 3)
    assert (3, 1, 3) in want        # day 3: all three in window
    # day 0 row exists (user 1 only); day 2 is not a row (nobody
    # active ON it) even though WAU would be nonzero there
    assert want[0] == (0, 1, 1)
    assert 2 not in {w[0] for w in want}


def test_reorder_gaps_per_customer_and_ties(ray_session, tmp_path):
    """Gaps are WITHIN a customer only (no cross-customer pair); a
    same-date pair yields gap 0; the histogram sums counts across
    customers."""
    D = 86_400_000_000
    rows = [
        # cust 1: days 0, 3, 3, 10 -> gaps 3, 0, 7
        (1, 1, 0), (2, 1, 3 * D), (3, 1, 3 * D), (4, 1, 10 * D),
        # cust 2: days 5, 8 -> gap 3
        (5, 2, 5 * D), (6, 2, 8 * D),
        # cust 3: singleton -> no gap
        (7, 3, 100 * D)]
    orders = pa.table({
        "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
        "o_orderstatus": pa.array(["O"] * len(rows), pa.string()),
        "o_totalprice": pa.array([1.0] * len(rows), pa.float64()),
        "o_orderdate": pa.array([r[2] for r in rows],
                                pa.timestamp("us")),
        "o_orderpriority": pa.array(["1"] * len(rows), pa.string())})
    sf = _write(tmp_path, "orders", orders)
    got = Q.q_reorder_gaps(sf).to_pandas()
    assert [tuple(r) for r in got.to_numpy()] == [
        (0, 1), (3, 2), (7, 1)]


def test_fold_leakage_fingerprint_spans(ray_session, tmp_path):
    """Docs sharing the first-16-token fingerprint in DIFFERENT folds
    (doc_id % 5) are leaks; same-fold duplicates are not; the
    histogram buckets by how many folds a fingerprint spans."""
    prefix = " ".join(f"t{i}" for i in range(16))
    rows = [
        # fingerprint A in folds 0, 1, 2 (ids 0, 1, 2) + a same-fold
        # twin (id 5 -> fold 0): n_folds 3, n_docs 4
        (0, prefix + " tail0", "en", "s"),
        (1, prefix + " tail1", "en", "s"),
        (2, prefix + " tail2", "en", "s"),
        (5, prefix + " tail3", "en", "s"),
        # fingerprint B duplicated ONLY inside fold 0 (ids 10, 15):
        # not a leak
        (10, "b0 b1 b2", "en", "s"),
        (15, "b0 b1 b2", "en", "s"),
        # unique doc: not a leak
        (3, "solo doc", "en", "s")]
    sf = _write(tmp_path, "documents", _docs_table(rows))
    got = Q.q_fold_leakage(sf).to_pandas()
    assert [tuple(r) for r in got.to_numpy()] == [(3, 1, 4)]


def test_search_rank_idf_weighting_and_ties(ray_session, tmp_path):
    """Rarer query terms weigh more (integer idf = 1e6 // df); docs
    missing every query term are excluded; score ties break on
    doc_id ASC."""
    rows = [
        # 'vector' appears in docs 0,1,2 (df=3, idf=333333);
        # 'hash' only in doc 0 (df=1, idf=1000000)
        (0, "vector hash", "en", "s"),          # 333333 + 1000000
        (1, "vector vector", "en", "s"),        # 2 * 333333 = 666666
        (2, "vector join", "en", "s"),          # 333333 + idf(join)
        # 'join' in docs 2,3 (df=2, idf=500000)
        (3, "join", "en", "s"),                 # 500000
        (4, "nothing relevant here", "en", "s"),  # excluded
        # tie: doc 5 and 6 both score exactly idf(join) = 500000
        (5, "join xx", "en", "s"),
        (6, "join yy", "en", "s")]
    sf = _write(tmp_path, "documents", _docs_table(rows))
    got = Q.q_search_rank(sf).to_pandas()
    # dfs: vector=3, join=4 (docs 2,3,5,6) -> idf(join)=250000
    assert [tuple(r) for r in got.to_numpy()] == [
        (0, 1333333),          # 333333 + 1000000
        (1, 666666),
        (2, 583333),           # 333333 + 250000
        (3, 250000), (5, 250000), (6, 250000)]  # tie -> doc_id order


def test_degree_hist_known_graph(ray_session, tmp_path):
    """A hand-built basket set with known co-purchase graph: order 1
    buys parts {1,2,3} (triangle), order 2 buys {3,4} — degrees:
    1:2, 2:2, 3:3, 4:1 -> histogram {1:1, 2:2, 3:1}. Duplicate
    (order, part) lines must not create parallel edges."""
    rows = [(1, 1), (1, 2), (1, 3), (1, 3),    # dup line collapses
            (2, 3), (2, 4)]
    li = pa.table({
        "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
        "l_suppkey": pa.array([0] * len(rows), pa.int64()),
        "l_linenumber": pa.array(range(len(rows)), pa.int32()),
        "l_quantity": pa.array([1.0] * len(rows), pa.float64()),
        "l_extendedprice": pa.array([1.0] * len(rows), pa.float64()),
        "l_discount": pa.array([0.0] * len(rows), pa.float64()),
        "l_tax": pa.array([0.0] * len(rows), pa.float64()),
        "l_returnflag": pa.array(["N"] * len(rows), pa.string()),
        "l_linestatus": pa.array(["O"] * len(rows), pa.string()),
        "l_shipdate": pa.array([0] * len(rows), pa.timestamp("us"))})
    sf = _write(tmp_path, "lineitem", li)
    got = Q.q_degree_hist(sf).to_pandas()
    assert [tuple(r) for r in got.to_numpy()] == [
        (1, 1), (2, 2), (3, 1)]


def test_distinctive_terms_exclusive_and_shared(ray_session, tmp_path):
    """A term exclusive to one source scores exactly 1e6; an evenly
    shared term scores 5e5 for each; per-source top-k ordering is
    (score DESC, term ASC); a source with fewer than k terms returns
    them all."""
    rows = [
        (0, "only shared", "en", "a"),
        (1, "shared extra extra", "en", "b")]
    sf = _write(tmp_path, "documents", _docs_table(rows))
    got = Q.q_distinctive_terms(sf).to_pandas()
    want = [
        # source a: 'only' exclusive (1e6), 'shared' 1 of 2 (5e5)
        ("a", "only", 1, 1_000_000), ("a", "shared", 1, 500_000),
        # source b: 'extra' exclusive tf=2, then 'shared'
        ("b", "extra", 2, 1_000_000), ("b", "shared", 1, 500_000)]
    assert [tuple(r) for r in got.to_numpy()] == want


def test_volume_anomaly_median_rank_and_strictness(
        ray_session, tmp_path):
    """Median is the ceil(n/2) order statistic (even hour count picks
    the LOWER middle); exactly 2x median is NOT flagged (strict >);
    counts, not distinct users, drive the volume."""
    H = 3_600_000_000
    # hour volumes: h0=1, h1=2, h2=4, h3=9
    # sorted [1,2,4,9], n=4 -> rank ceil(2)=2 -> med=2
    # flag n > 4: only h3 (h2 == 2*med exactly -> excluded)
    vols = {0: 1, 1: 2, 2: 4, 3: 9}
    rows = []
    eid = 0
    for h, v in vols.items():
        for _ in range(v):
            rows.append((eid, 1, h * H + eid, "e", 0.0))
            eid += 1
    sf = _write(tmp_path, "events", _events_table(rows))
    got = Q.q_volume_anomaly(sf).to_pandas()
    assert [tuple(r) for r in got.to_numpy()] == [(3, 9, 2)]


def test_vector_outliers_floor_and_tiebreak(ray_session, tmp_path):
    """Fixed-point floor BEFORE squaring (so -0.5 and 0.5 differ only
    via floor: floor(-5e5)=-500000 squares equal, but floor(0.5·1e6)
    =500000 too — use an asymmetric probe instead); exact tie on
    sq_norm breaks by vec_id ASC."""
    vecs = [
        (1.0, 0.0),       # 1e12
        (0.0, -1.0),      # (-1e6)^2 = 1e12 -> ties with vec 0
        (0.6, 0.6),       # 2 * 36e10 = 7.2e11
        (0.1, 0.1)]       # 2e10
    sf = _write(tmp_path, "embeddings", _emb_table(vecs))
    got = Q.q_vector_outliers(sf).to_pandas()
    assert [tuple(r) for r in got.to_numpy()] == [
        (0, 10**12), (1, 10**12),
        (2, 2 * 600000**2), (3, 2 * 100000**2)]


def test_component_sizes_multiple_islands(ray_session, tmp_path):
    """Disjoint baskets make disjoint components: orders {1,2,3},
    {10,11}, {20,21} -> sizes 3,2,2 -> histogram {2:2, 3:1}; a
    single-part order contributes no node at all."""
    baskets = [(1, [1, 2, 3]), (2, [10, 11]), (3, [20, 21]),
               (4, [99])]                      # isolated: no edge
    rows = [(o, p) for o, ps in baskets for p in ps]
    li = pa.table({
        "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
        "l_suppkey": pa.array([0] * len(rows), pa.int64()),
        "l_linenumber": pa.array(range(len(rows)), pa.int32()),
        "l_quantity": pa.array([1.0] * len(rows), pa.float64()),
        "l_extendedprice": pa.array([1.0] * len(rows), pa.float64()),
        "l_discount": pa.array([0.0] * len(rows), pa.float64()),
        "l_tax": pa.array([0.0] * len(rows), pa.float64()),
        "l_returnflag": pa.array(["N"] * len(rows), pa.string()),
        "l_linestatus": pa.array(["O"] * len(rows), pa.string()),
        "l_shipdate": pa.array([0] * len(rows), pa.timestamp("us"))})
    sf = _write(tmp_path, "lineitem", li)
    got = Q.q_component_sizes(sf).to_pandas()
    assert [tuple(r) for r in got.to_numpy()] == [(2, 2), (3, 1)]


def test_forward_fill_boundaries_and_ties(ray_session, tmp_path):
    """Fill carries the latest purchase at-or-before each event
    ((ts, event_id) order, including the purchase row itself); user
    boundaries reset the carry (-1 before a user's first purchase);
    a ts tie orders by event_id."""
    rows = [
        # user 1: view, purchase(1.50), view, purchase(2.00) tie-after
        (1, 1, 100, "view", 9.0),
        (2, 1, 200, "purchase", 1.50),
        (3, 1, 300, "view", 9.0),
        (4, 1, 300, "purchase", 2.00),   # same ts as 3, later eid
        (5, 1, 400, "view", 9.0),
        # user 2: never purchases
        (6, 2, 100, "view", 9.0)]
    sf = _write(tmp_path, "events", _events_table(rows))
    got = (Q.q_forward_fill(sf).to_pandas()
           .sort_values("event_id", ignore_index=True))
    assert got["last_purchase_cents"].tolist() == [
        -1, 150, 150, 200, 200, -1]


def test_rolling_time_sum_range_peers_and_window(ray_session,
                                                 tmp_path):
    """RANGE frame: timestamp peers all get the SAME window value
    (including a peer later in event_id order); the window is
    [ts - 1h, ts] inclusive on both ends; user isolation holds."""
    H = 3_600_000_000
    rows = [
        (1, 1, 0, "e", 1.00),            # 100
        (2, 1, H, "e", 2.00),            # exactly 1h later: included
        (3, 1, H, "e", 4.00),            # peer of 2
        (4, 1, 2 * H + 1, "e", 8.00),    # 0 and H now out of range?
        # window [H+1, 2H+1]: rows at H excluded (H < H+1) -> 800
        (5, 2, H, "e", 16.00)]           # other user
    sf = _write(tmp_path, "events", _events_table(rows))
    got = (Q.q_rolling_time_sum(sf).to_pandas()
           .sort_values("event_id", ignore_index=True))
    # row1: [−1h, 0] -> 100
    # rows 2,3 (peers at ts=H): [0, H] -> 100+200+400 = 700 BOTH
    # row4: [H+1, 2H+1] -> 800 alone
    # row5 (user 2): 1600
    assert got["wsum_cents"].tolist() == [100, 700, 700, 800, 1600]


def test_rfm_scores_boundary_equality(ray_session, tmp_path):
    """A value EQUAL to a quartile boundary does not pass it
    (strict >): with 4 customers of monetary 100/200/300/400, the
    percentile_disc boundaries are 100/200/300 (rank = ceil(p*4)),
    so scores are 1/2/3/4; single-order customers share frequency
    boundaries -> all f_score 1."""
    D = 86_400_000_000
    rows = [(i, i, float(i)) for i in range(1, 5)]
    orders = pa.table({
        "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
        "o_orderstatus": pa.array(["O"] * 4, pa.string()),
        "o_totalprice": pa.array([r[2] for r in rows], pa.float64()),
        "o_orderdate": pa.array([r[0] * D for r in rows],
                                pa.timestamp("us")),
        "o_orderpriority": pa.array(["1"] * 4, pa.string())})
    sf = _write(tmp_path, "orders", orders)
    got = (Q.q_rfm_scores(sf).to_pandas()
           .sort_values("o_custkey", ignore_index=True))
    # monetary cents 100..400 -> boundaries 100/200/300 -> 1,2,3,4
    assert got["m_score"].tolist() == [1, 2, 3, 4]
    # recency days 1..4, same boundaries rule -> 1,2,3,4
    assert got["r_score"].tolist() == [1, 2, 3, 4]
    # all frequencies equal 1 -> every boundary is 1 -> nobody above
    assert got["f_score"].tolist() == [1, 1, 1, 1]


def test_session_len_hist_gap_rule(ray_session, tmp_path):
    """A gap of exactly 30 min does NOT split (strict >); one more
    microsecond does; sessions never span users; bounces (length-1
    sessions) count."""
    M30 = 1_800_000_000
    rows = [
        # user 1: events at 0, 30min (same session), then +30min+1us
        # (new session, singleton)
        (1, 1, 0, "e", 0.0),
        (2, 1, M30, "e", 0.0),
        (3, 1, 2 * M30 + 1, "e", 0.0),
        # user 2: one event at the same ts as user 1's -> own session
        (4, 2, 0, "e", 0.0)]
    sf = _write(tmp_path, "events", _events_table(rows))
    got = Q.q_session_len_hist(sf).to_pandas()
    # sessions: [1,2], [3], [4] -> lengths 2,1,1
    assert [tuple(r) for r in got.to_numpy()] == [(1, 2), (2, 1)]
