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
