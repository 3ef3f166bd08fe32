"""Edge-case tests for the round-2 relational/analytics operators
(beyond the sf0.001 oracle sweep in test_queries_oracle.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from geojson_vt_ray.pipelines import queries as Q

SF_DIR = "/root/testdata/sf0.001"


def test_bloom_exact_under_forced_false_positives(ray_session):
    """A pathologically small bitmap saturates with false positives;
    the exact left-semi verify join must still make the result exact."""
    import duckdb
    got = (Q.q_bloom_semijoin(SF_DIR, n_bits=64).to_pandas()
           .sort_values("l_orderkey", ignore_index=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"'{SF_DIR}/lineitem.parquet'")
    con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                f"'{SF_DIR}/orders.parquet'")
    want = (con.execute(Q._SQL_BLOOM_SEMIJOIN).fetchdf()
            .sort_values("l_orderkey", ignore_index=True))
    assert got["l_orderkey"].tolist() == want["l_orderkey"].tolist()
    assert got["n_items"].tolist() == want["n_items"].tolist()


def test_bloom_hashes_deterministic_and_in_range():
    keys = np.array([0, 1, 2**40, 2**63 - 1], np.uint64)
    hs = Q._bloom_hashes(keys)
    assert len(hs) == 3
    for h in hs:
        assert h.dtype == np.uint64
        assert (h < Q._BLOOM_BITS).all()
    hs2 = Q._bloom_hashes(keys)
    for a, b in zip(hs, hs2):
        assert (a == b).all()


def test_repetition_degenerate_docs(ray_session, tmp_path):
    """Empty text, single word, and fully-repeated text hit the
    division guards; fractions are exactly right."""
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["", "solo", "a a a a", "x y x y"]),
    })
    import pyarrow.parquet as pq
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(docs, str(d / "documents.parquet"))
    got = (Q.q_repetition(str(d)).to_pandas()
           .sort_values("doc_id", ignore_index=True))
    # "" splits to [''] -> 1 word; "solo" -> 1 word, 0 bigrams -> 1.0
    assert got["n_words"].tolist() == [1, 1, 4, 4]
    assert got["uniq_word_frac"].tolist() == [1.0, 1.0, 0.25, 0.5]
    # "a a a a": 3 bigrams all "a a" -> 1/3; "x y x y": x y / y x / x y
    assert got["uniq_bigram_frac"].tolist() == [1.0, 1.0, 1 / 3, 2 / 3]


def test_funnel_requires_strict_order(ray_session, tmp_path):
    """purchase before click must NOT count; later purchase does."""
    import pyarrow.parquet as pq
    ts = pd.to_datetime([
        "2024-01-01 00:00", "2024-01-01 01:00", "2024-01-01 02:00",
        "2024-01-02 00:00", "2024-01-02 01:00", "2024-01-01 23:00",
    ])
    ev = pa.table({
        "event_id": pa.array(range(6), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array([1, 1, 1, 2, 2, 2], pa.int64()),
        # user 1 completes; user 2's purchase precedes its click
        "event_type": pa.array(["view", "click", "purchase",
                                "view", "click", "purchase"]),
        "value": pa.array([0.0] * 6),
        "props": pa.array(["{}"] * 6),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(ev, str(d / "events.parquet"))
    got = Q.q_funnel(str(d)).to_pandas()
    assert got["user_id"].tolist() == [1]
    assert got.loc[0, "t_purchase"] == pd.Timestamp("2024-01-01 02:00")


def test_heavy_hitters_exact_under_forced_collisions(ray_session):
    """A 16-slot count-min grid collides massively (every estimate
    inflates), which can only ADD candidates; the exact combine must
    still produce exactly the true >= threshold set."""
    import duckdb
    got = (Q.q_heavy_hitters(SF_DIR, width=16).to_pandas()
           .sort_values("user_id", ignore_index=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{SF_DIR}/events.parquet'")
    want = (con.execute(Q._SQL_HEAVY_HITTERS).fetchdf()
            .sort_values("user_id", ignore_index=True))
    assert got["user_id"].tolist() == want["user_id"].tolist()
    assert got["n_events"].tolist() == want["n_events"].tolist()
    assert len(got) > 0


def test_rollup_levels_are_consistent(ray_session):
    """flag-level and grand-total rows must equal the sum of their
    finer-level children (exact int arithmetic end to end)."""
    df = Q.q_rollup_lineitem(SF_DIR).to_pandas()
    finest = df[(df.l_returnflag != "ALL") & (df.l_linestatus != "ALL")]
    flags = df[(df.l_returnflag != "ALL") & (df.l_linestatus == "ALL")]
    total = df[(df.l_returnflag == "ALL") & (df.l_linestatus == "ALL")]
    assert len(total) == 1
    assert total.n_rows.iloc[0] == finest.n_rows.sum()
    assert total.sum_qty.iloc[0] == pytest.approx(finest.sum_qty.sum())
    for _, r in flags.iterrows():
        sub = finest[finest.l_returnflag == r.l_returnflag]
        assert r.n_rows == sub.n_rows.sum()
        assert r.sum_rev == pytest.approx(sub.sum_rev.sum())


def test_approx_percentiles_rank_error(ray_session):
    """Bottom-k sketch estimates must be within ~3% RANK error of the
    exact order statistics (measured in rank space via the exact CDF,
    not value space — robust to heavy tails)."""
    import pyarrow.parquet as pq
    exact = Q.q_group_percentiles(SF_DIR).to_pandas().set_index(
        "o_orderpriority")
    approx = Q.q_approx_percentiles(SF_DIR).to_pandas().set_index(
        "o_orderpriority")
    assert sorted(exact.index) == sorted(approx.index)
    orders = pq.read_table(f"{SF_DIR}/orders.parquet",
                           columns=["o_orderpriority",
                                    "o_totalprice"]).to_pandas()
    orders["cents"] = np.round(orders["o_totalprice"] * 100).astype(
        np.int64)
    for grp, row in approx.iterrows():
        vals = np.sort(orders.loc[orders["o_orderpriority"] == grp,
                                  "cents"].to_numpy())
        n = len(vals)
        for p, col in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
            est_rank = np.searchsorted(vals, row[col], side="right") / n
            assert abs(est_rank - p) <= 0.06, (grp, col, est_rank, p)


def test_bottomk_merge_matches_single_build():
    """With an explicit shared salt, merging per-chunk sketches must
    equal one sketch over the whole array (associativity of union +
    dedup + re-truncate; input values are all distinct so dedup is a
    no-op)."""
    from geojson_vt_ray.functions.sketch import (bottomk_merge,
                                                 bottomk_partial,
                                                 bottomk_quantiles)
    rng = np.arange(100_000, dtype=np.int64) * 7 % 100_000
    whole = bottomk_partial(rng, k=512, salt=17)
    parts = [bottomk_partial(c, k=512, salt=17)
             for c in np.array_split(rng, 7)]
    merged = bottomk_merge(parts, k=512)
    qw = bottomk_quantiles(whole, (0.5, 0.9))
    qm = bottomk_quantiles(merged, (0.5, 0.9))
    # identical row-identity hashing -> same bottom-k survivors
    assert sorted(whole[0].tolist()) == sorted(merged[0].tolist())
    assert qw == qm
    # merge is idempotent: re-merging the same partials adds nothing
    again = bottomk_merge([merged, parts[0]], k=512)
    assert sorted(again[0].tolist()) == sorted(merged[0].tolist())


def test_bottomk_duplicate_heavy_rank_error():
    """90%-duplicates corpus: the per-partial content salt decorrelates
    cross-block copies of the same value, holding rank error <=6% at
    every tested percentile (the regime where unsalted (value, ordinal)
    hashing collapses the effective sample)."""
    from geojson_vt_ray.functions.sketch import (bottomk_merge,
                                                 bottomk_partial,
                                                 bottomk_quantiles)
    # 180k rows over 10 hot values + 20k distinct tail values
    hot = np.repeat(np.arange(10, dtype=np.int64) * 1000, 18_000)
    tail = np.arange(20_000, dtype=np.int64) + 50_000
    vals = np.concatenate([hot, tail])
    # deterministic interleave (keyed on position, not value) so every
    # block mixes copies of many hot values with tail values
    pos = np.arange(len(vals), dtype=np.int64)
    vals = vals[np.argsort(pos * 2654435761 % 200_003, kind="stable")]
    parts = [bottomk_partial(c, k=4096)
             for c in np.array_split(vals, 100)]
    merged = bottomk_merge(parts, k=4096)
    exact = np.sort(vals)
    n = len(exact)
    for p, est in zip((0.5, 0.9, 0.99),
                      bottomk_quantiles(merged, (0.5, 0.9, 0.99))):
        lo = np.searchsorted(exact, est, side="left") / n
        hi = np.searchsorted(exact, est, side="right") / n
        # est's rank interval must come within 6% of p
        err = 0.0 if lo <= p <= hi else min(abs(lo - p), abs(hi - p))
        assert err <= 0.06, (p, est, lo, hi)


def test_approx_group_percentiles_explicit_salt_invariant(ray_session):
    """With an explicit salt, approx_group_percentiles must give
    IDENTICAL estimates regardless of how rows were split into blocks
    (the reproducibility opt-in the salt parameter exists for)."""
    import ray.data as rd
    from geojson_vt_ray.functions.sketch import approx_group_percentiles
    rng = np.arange(30_000, dtype=np.int64)
    tbl = pa.table({"g": pa.array((rng % 3).astype(np.int64)),
                    "v": pa.array(rng * 2654435761 % 1_000_003)})
    outs = []
    for blocks in (2, 17):
        ds = rd.from_arrow(tbl).repartition(blocks)
        outs.append(approx_group_percentiles(
            ds, "g", "v", ps=(0.5, 0.9), k=512,
            salt=7).to_pandas().sort_values("g", ignore_index=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_quantile_buckets_cover_all_rows(ray_session):
    import pyarrow.parquet as pq
    df = Q.q_quantile_buckets(SF_DIR).to_pandas()
    n_orders = pq.read_table(f"{SF_DIR}/orders.parquet",
                             columns=["o_orderkey"]).num_rows
    assert df["n"].sum() == n_orders
    assert sorted(df["bucket"].tolist()) == [0, 1, 2, 3]
    # quartiles: no bucket may hold more than ~30% of rows
    assert (df["n"] <= 0.30 * n_orders).all()


def test_window_events_hot_group_path(ray_session, tmp_path):
    """A (user, hour) group larger than 128 events exercises
    window_events' per-group pairwise-sum branch (the k-loop cap);
    counts and sums must match DuckDB on the same table."""
    import duckdb
    import pyarrow.parquet as pq
    rng = np.arange(400, dtype=np.int64)
    tbl = pa.table({
        "event_id": pa.array(rng),
        # user 7 has 300 events inside one hour; user 8 has 100
        "user_id": pa.array(np.where(rng < 300, 7, 8)),
        "ts": pa.array((rng * 1000 + 5).astype("datetime64[us]")),
        "value": pa.array(rng.astype(np.float64) * 0.31 + 0.07),
    })
    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    pq.write_table(tbl, str(d / "events.parquet"))
    got = (Q.q_window_events(str(d)).to_pandas()
           .sort_values(["user_id", "hour"], ignore_index=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{d}/events.parquet'")
    want = con.execute(
        "SELECT user_id, CAST(floor(epoch(ts)/3600) AS BIGINT) AS "
        "hour, COUNT(*) AS n, SUM(value) AS sum_value FROM events "
        "GROUP BY 1, 2 ORDER BY 1, 2").fetchdf()
    assert got["n"].tolist() == want["n"].tolist()
    np.testing.assert_allclose(got["sum_value"], want["sum_value"],
                               rtol=1e-12)


def _write_docs(tmp_path, rows):
    import pyarrow.parquet as pq
    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows]),
    }), str(d / "documents.parquet"))
    return str(d)


def test_pack_sequences_gappy_ids_and_boundaries(ray_session, tmp_path):
    """Non-contiguous doc_ids (empty buckets in the prefix scan) and
    docs straddling the budget boundary: seq_id must follow the
    exclusive cumsum in doc_id order, verified against a local scan."""
    rows = [(0, "a " * 1000), (3, "b " * 1500),
            (4097, "c " * 600), (9000, ""), (9001, "d " * 2048),
            (9002, "e")]
    sf = _write_docs(tmp_path, rows)
    got = (Q.q_pack_sequences(sf).to_pandas()
           .sort_values("doc_id", ignore_index=True))
    n = [1000, 1500, 600, 0, 2048, 1]
    cumx = np.concatenate(([0], np.cumsum(n)[:-1]))
    assert got["n_tokens"].tolist() == n
    assert got["seq_id"].tolist() == (cumx // 2048).tolist()


def test_decontam_duplicate_of_benchmark_doc_flagged(ray_session, tmp_path):
    """A training doc repeating a benchmark doc's text shares all its
    5-grams; unrelated docs and the benchmark docs themselves are not
    reported. With k_eval=1 the hash-rank eval sample is doc 1 (md5("1")
    is lexicographically smallest among ids 0-3)."""
    bench_text = "alpha beta gamma delta epsilon zeta"
    rows = [(0, bench_text),                       # contaminated copy
            (1, bench_text),                       # benchmark (lowest md5)
            (2, "one two three four five six"),    # clean
            (3, "x " * 3)]                         # too short for 5-grams
    sf = _write_docs(tmp_path, rows)
    got = (Q.q_decontam(sf, k_eval=1).to_pandas()
           .sort_values("doc_id", ignore_index=True))
    # doc 0 shares both 5-grams of the benchmark doc
    assert got["doc_id"].tolist() == [0]
    assert got["n_contam"].tolist() == [2]


def test_chunk_and_redact_edges(ray_session, tmp_path):
    """Empty docs produce no chunks; a doc shorter than the stride is
    one chunk; redaction counts respect word boundaries (no match
    inside 'customers')."""
    import hashlib
    rows = [(1, ""), (2, "a b c"),
            (3, "customer customers supplier thecustomer")]
    sf = _write_docs(tmp_path, rows)
    ch = (Q.q_chunk_docs(sf).to_pandas()
          .sort_values(["doc_id", "chunk_id"], ignore_index=True))
    assert ch["doc_id"].tolist() == [2, 3]
    assert ch["n_tokens"].tolist() == [3, 4]
    assert ch["chunk_hash"].iloc[0] == hashlib.md5(b"a b c").hexdigest()

    rd = (Q.q_redact(sf).to_pandas()
          .sort_values("doc_id", ignore_index=True))
    assert rd["n_redacted"].tolist() == [0, 0, 2]
    want = hashlib.md5(
        b"<ENT> customers <ENT> thecustomer").hexdigest()
    assert rd["redacted_hash"].iloc[2] == want


def test_curate_dedup_median_and_crosslang_edges(ray_session, tmp_path):
    """Curation edge cases: a duplicate whose keeper sits above the
    median survives once; a cross-language duplicate loses to the
    GLOBAL keeper even when above its own stratum's median; an
    empty-text stratum (median 0) keeps its keeper; a singleton
    stratum keeps itself. Cross-checked against the committed oracle
    SQL on the same table."""
    import duckdb
    import pyarrow.parquet as pq

    rows = [
        (1, "aa", "w w w"),   # 3 tokens, keeper of the "w w w" group
        (2, "aa", "w"),       # 1 token, below aa median (2) -> dropped
        (3, "aa", "w w"),     # 2 tokens, == median -> kept
        (4, "aa", "w w w"),   # duplicate of 1 -> dropped (not keeper)
        (5, "bb", "x y z"),   # singleton stratum: median = own n -> kept
        (6, "cc", ""),        # empty text; cc median 0 -> kept (keeper)
        (7, "cc", ""),        # empty duplicate -> dropped
        (8, "dd", "w w w"),   # above dd median but global keeper is 1
    ]
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "lang": pa.array([r[1] for r in rows]),
        "text": pa.array([r[2] for r in rows]),
    }), str(d / "documents.parquet"))

    got = sorted(Q.q_curate(str(d)).to_pandas()["doc_id"].tolist())
    assert got == [1, 3, 5, 6]

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{d}/documents.parquet'")
    want = sorted(con.execute(Q._SQL_CURATE).fetchdf()["doc_id"].tolist())
    assert got == want
