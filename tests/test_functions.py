"""Unit tests for the training-data operator kernels (dedup, text,
similarity) — deterministic behavior and vectorized-vs-reference
equivalence."""

import numpy as np
import pyarrow as pa

from geojson_vt_ray.functions.dedup import (_shingle_hashes,
                                            minhash_signature, simhash64)
from geojson_vt_ray.functions.text import rolling_fingerprint
from geojson_vt_ray.functions.similarity import _kmeans


def test_fingerprint_matches_scalar_rolling_hash():
    """The vectorized Karp-Rabin window hash must equal the classic
    per-byte rolling recurrence (same mod-2^64 algebra)."""
    def scalar(t, window=16, keep=4):
        B = np.uint64(1000003)
        data = np.frombuffer(t.encode("utf-8", "ignore"), dtype=np.uint8)
        dd = data.astype(np.uint64)
        pw = B ** np.uint64(window - 1)
        h = np.uint64(0)
        hashes = np.empty(len(dd) - window + 1, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for i in range(window):
                h = h * B + dd[i]
            hashes[0] = h
            for i in range(1, len(hashes)):
                h = (h - dd[i - 1] * pw) * B + dd[i + window - 1]
                hashes[i] = h
        sel = np.sort(np.unique(hashes))[:keep]
        out = [int(v) for v in sel]
        return out + [0] * (keep - len(out))

    texts = ["the quick brown fox jumps over the lazy dog " * 4,
             "abcdefabcdefabcdefabcdef", "zzzz " * 30]
    got = rolling_fingerprint(pa.table({"text": texts}))
    assert got["fingerprint"].to_pylist() == [scalar(t) for t in texts]


def test_minhash_similar_docs_share_signature_slots():
    a = "the cat sat on the mat and looked at the hat " * 8
    b = a + "extra tail words here"
    c = "completely different content about tile pyramids " * 8
    sa, sb, sc = (minhash_signature(t) for t in (a, b, c))
    sim_ab = (sa == sb).mean()
    sim_ac = (sa == sc).mean()
    assert sim_ab > 0.5  # near-dups collide on most permutations
    assert sim_ac < sim_ab
    # deterministic across calls
    assert (minhash_signature(a) == sa).all()


def test_shingle_hashes_distinct_and_deterministic():
    h1 = _shingle_hashes("abcdefgh")
    h2 = _shingle_hashes("abcdefgh")
    assert (h1 == h2).all()
    assert len(h1) == len(set(h1.tolist()))  # unique
    assert len(_shingle_hashes("ab")) >= 1   # shorter than k: padded


def test_simhash_close_for_similar_text():
    a = "ray data tiles pyramid shuffle " * 6
    b = a + "one more token"
    c = "unrelated words entirely disjoint vocabulary set " * 6
    ha, hb, hc = simhash64(a), simhash64(b), simhash64(c)
    d_ab = bin(ha ^ hb).count("1")
    d_ac = bin(ha ^ hc).count("1")
    assert d_ab < d_ac
    assert d_ab <= 12


def test_salted_sum_equals_plain_groupby(ray_session):
    """Skew-safe salted aggregation must be value-identical to the
    straight partial+groupby path, including on a pathologically hot
    key."""
    import pandas as pd
    import ray.data as rd
    from geojson_vt_ray.functions.agg import partial_sum_groupby, salted_sum

    rng = np.random.default_rng(7)
    # hot key 0 owns 90% of rows
    keys = np.where(rng.random(20_000) < 0.9, 0,
                    rng.integers(1, 50, 20_000)).astype(np.int64)
    vals = rng.random(20_000)
    ds = rd.from_arrow(pa.table({"k": keys, "v": vals})).repartition(16)

    plain = partial_sum_groupby(ds, "k", "v").to_pandas().sort_values(
        "k", ignore_index=True)
    salted = salted_sum(ds, "k", "v", n_salt=8).to_pandas().sort_values(
        "k", ignore_index=True)
    assert list(plain["k"]) == list(salted["k"])
    assert list(plain["n"]) == list(salted["n"])
    assert np.allclose(plain["v"], salted["v"], rtol=1e-12)
    # ground truth
    want = pd.DataFrame({"k": keys, "v": vals}).groupby(
        "k", as_index=False)["v"].sum()
    assert np.allclose(plain["v"], want["v"], rtol=1e-9)


def test_hll_sketch_accuracy_and_mergeability():
    from geojson_vt_ray.functions.sketch import (hll_estimate, hll_merge,
                                                 hll_partial)
    rng = np.random.default_rng(3)
    for true_n in (50, 1_000, 50_000):
        keys = rng.choice(10 * true_n, true_n, replace=False)
        # split into 8 partial sketches, merge, estimate
        parts = [hll_partial(c) for c in np.array_split(keys, 8)]
        est = hll_estimate(hll_merge(parts))
        assert abs(est - true_n) / true_n < 0.06, (true_n, est)
        # merge must equal the single-pass sketch (register-wise max)
        assert (hll_merge(parts) == hll_partial(keys)).all()
        # deterministic
        assert hll_estimate(hll_partial(keys)) == est


def test_approx_distinct_matches_exact_within_error(ray_session):
    import __ray_entry__ as E
    qs = E.queries()
    exact = qs["distinct_users"]("/root/testdata/sf0.001").to_pandas()
    approx = qs["approx_distinct_users"](
        "/root/testdata/sf0.001").to_pandas()
    m = exact.merge(approx, on="day")
    assert len(m) == len(exact)
    rel = (m["approx_n"] - m["n_users"]).abs() / m["n_users"].clip(lower=1)
    assert (rel < 0.10).all(), m[rel >= 0.10]


def test_kmeans_deterministic_and_partitions():
    rng = np.random.default_rng(0)
    pts = np.concatenate([rng.normal(0, 0.05, (50, 8)) + 1.0,
                          rng.normal(0, 0.05, (50, 8)) - 1.0])
    c1 = _kmeans(pts, 2)
    c2 = _kmeans(pts, 2)
    assert np.allclose(c1, c2)
    assert c1.shape == (2, 8)
    # the two centroids separate the two blobs (cosine sign)
    sims = (pts / np.linalg.norm(pts, axis=1, keepdims=True)) @ c1.T
    assign = sims.argmax(axis=1)
    assert len(set(assign[:50].tolist())) == 1
    assert len(set(assign[50:].tolist())) == 1
    assert assign[0] != assign[-1]


def test_ann_lsh_recall_on_clustered_corpus(ray_session):
    """Multi-table LSH must reach recall >=0.9 vs brute force at <=25%
    of the corpus scanned on a corpus with neighbor structure (planted
    clusters, member cosine ~0.9). Near-random corpora are excluded by
    design: at neighbor cosine ~0.35 the LSH exponent is ~0.74 and no
    bucketing scheme is sublinear (see ann_lsh_topk docstring)."""
    import ray.data as rd
    from geojson_vt_ray.functions.similarity import (ann_cosine_topk,
                                                     ann_lsh_topk)
    rng = np.random.default_rng(7)
    centers = rng.standard_normal((50, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    m = centers.repeat(10, axis=0) + 0.05 * rng.standard_normal((500, 64))
    ids = np.arange(500, dtype=np.int64)
    tbl = pa.table({"vec_id": pa.array(ids),
                    "embedding": pa.array(
                        [row.astype(np.float32) for row in m],
                        pa.list_(pa.float32()))})
    qmask = ids < 25
    ds = rd.from_arrow(tbl)
    brute = ann_cosine_topk(ds, m[qmask], ids[qmask], k=5).to_pandas()
    approx, stats = ann_lsh_topk(rd.from_arrow(tbl), m[qmask], ids[qmask],
                                 k=5, return_stats=True)
    approx = approx.to_pandas()
    want = brute.groupby("query_id")["vec_id"].apply(set)
    got = approx.groupby("query_id")["vec_id"].apply(set)
    recall = np.mean([len(want[q] & got.get(q, set())) / len(want[q])
                      for q in want.index])
    assert recall >= 0.9, (recall, stats)
    assert stats["scan_frac"] <= 0.25, stats


def test_ann_ivf_beats_lsh_on_realistic_corpus(ray_session):
    """Flagship-path gate on the REALISTIC registry corpus (the actual
    sf0.001 embeddings table — near-random, neighbor cosine ~0.35, the
    regime where no bucketing is truly sublinear): IVF at nlist=128 /
    nprobe=32 (25% of lists) must (a) reach recall >=0.8 vs brute force
    over a 50-query panel, (b) MEASURE <=30% of corpus rows scanned, and
    (c) strictly beat the 8x8 multi-table LSH config's recall at its
    comparable ~25% scan. 0.9@25% is not robustly achievable on random
    data (curse of dimensionality) — this gate pins the honest frontier
    and why IVF, not LSH, is the default ANN scale path."""
    import pyarrow.parquet as pq
    import ray.data as rd
    from geojson_vt_ray.functions.similarity import (ann_cosine_topk,
                                                     ann_ivf_topk,
                                                     ann_lsh_topk)
    src = "/root/testdata/sf0.001/embeddings.parquet"
    emb = pq.read_table(src, columns=["vec_id", "embedding"])
    ids = emb.column("vec_id").to_numpy(zero_copy_only=False)
    m = emb.column("embedding").combine_chunks().values.to_numpy(
        zero_copy_only=False).reshape(len(ids), -1)
    qmask = ids < 50

    def _read():
        return rd.read_parquet(src, columns=["vec_id", "embedding"])

    brute = ann_cosine_topk(_read(), m[qmask], ids[qmask], k=5).to_pandas()
    want = brute.groupby("query_id")["vec_id"].apply(set)

    def _recall(df):
        got = df.groupby("query_id")["vec_id"].apply(set)
        return np.mean([len(want[q] & got.get(q, set())) / len(want[q])
                        for q in want.index])

    ivf, istats = ann_ivf_topk(_read(), m[qmask], ids[qmask], k=5,
                               nlist=128, nprobe=32, return_stats=True)
    r_ivf = _recall(ivf.to_pandas())
    assert r_ivf >= 0.8, (r_ivf, istats)
    assert istats["scan_frac"] <= 0.30, istats

    lsh, lstats = ann_lsh_topk(_read(), m[qmask], ids[qmask], k=5,
                               n_planes=8, n_tables=8, return_stats=True)
    r_lsh = _recall(lsh.to_pandas())
    assert r_ivf > r_lsh, (r_ivf, r_lsh, istats, lstats)


def test_label_propagation_matches_union_find(ray_session):
    """LP connected components over a chain + triangle + singleton-pair
    graph (chain forces >1 propagation round) must equal union-find."""
    from geojson_vt_ray.functions.dedup import label_propagation_clusters
    from geojson_vt_ray.pipelines.queries import _union_find_clusters
    pairs = pa.table({
        "id_a": pa.array([10, 11, 12, 13, 20, 21, 20, 30], pa.int64()),
        "id_b": pa.array([11, 12, 13, 14, 21, 22, 22, 31], pa.int64())})
    lp = label_propagation_clusters(pairs)
    uf = _union_find_clusters(pairs)
    assert lp.equals(uf)
    # chain 10-14 collapses to min label 10
    df = lp.to_pandas().set_index("doc_id")["cluster_id"]
    assert all(df[i] == 10 for i in (10, 11, 12, 13, 14))
    assert all(df[i] == 20 for i in (20, 21, 22))
    assert df[30] == 30 and df[31] == 30


def test_ivf_partitioned_store_prunes_reads(ray_session, tmp_path):
    """ann_ivf_build writes one hive partition per coarse list;
    ann_ivf_search must read only the union of the queries' probed
    lists and return exactly what the in-memory IVF path returns."""
    import os
    import ray.data as rd
    from geojson_vt_ray.functions.similarity import (ann_ivf_build,
                                                     ann_ivf_search,
                                                     ann_ivf_topk)
    src = "/root/testdata/sf0.001/embeddings.parquet"
    ds = rd.read_parquet(src, columns=["vec_id", "embedding"])
    store = str(tmp_path / "ivf_store")
    cent = ann_ivf_build(ds, store, nlist=16)
    assert cent.shape[0] == 16
    parts = [d for d in os.listdir(store) if d.startswith("ivf_list=")]
    assert len(parts) == 16

    import pyarrow.parquet as pq
    emb = pq.read_table(src)
    ids = emb.column("vec_id").to_numpy()
    vals = emb.column("embedding").combine_chunks().values.to_numpy(
        zero_copy_only=False).reshape(len(ids), -1)
    qmask = ids < 5
    got, stats = ann_ivf_search(store, vals[qmask], ids[qmask], k=5,
                                nprobe=6, return_stats=True)
    assert stats["lists_read"] < stats["nlist"], stats
    want = ann_ivf_topk(
        rd.read_parquet(src, columns=["vec_id", "embedding"]),
        vals[qmask], ids[qmask], k=5, nlist=16, nprobe=6)
    assert got.to_pandas().sort_values(
        ["query_id", "rnk"], ignore_index=True).equals(
        want.to_pandas().sort_values(
            ["query_id", "rnk"], ignore_index=True))


def test_ann_ivf_recall_on_clustered_corpus(ray_session):
    """IVF must reach recall >=0.9 vs brute force while probing <=25%
    of the coarse lists on a corpus with neighbor structure (same
    planted clusters as the LSH gate)."""
    import ray.data as rd
    from geojson_vt_ray.functions.similarity import (ann_cosine_topk,
                                                     ann_ivf_topk)
    rng = np.random.default_rng(7)
    centers = rng.standard_normal((50, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    m = centers.repeat(10, axis=0) + 0.05 * rng.standard_normal((500, 64))
    ids = np.arange(500, dtype=np.int64)
    tbl = pa.table({"vec_id": pa.array(ids),
                    "embedding": pa.array(
                        [row.astype(np.float32) for row in m],
                        pa.list_(pa.float32()))})
    qmask = ids < 25
    brute = ann_cosine_topk(rd.from_arrow(tbl), m[qmask], ids[qmask],
                            k=5).to_pandas()
    nlist, nprobe = 32, 8  # 25% of lists probed
    approx = ann_ivf_topk(rd.from_arrow(tbl), m[qmask], ids[qmask], k=5,
                          nlist=nlist, nprobe=nprobe).to_pandas()
    want = brute.groupby("query_id")["vec_id"].apply(set)
    got = approx.groupby("query_id")["vec_id"].apply(set)
    recall = np.mean([len(want[q] & got.get(q, set())) / len(want[q])
                      for q in want.index])
    assert recall >= 0.9, recall


def test_label_propagation_long_chain(ray_session):
    """A 120-hop duplicate chain (diameter >> the old per-round budget)
    must collapse to ONE cluster — pointer jumping converges in
    O(log diameter) rounds instead of silently truncating."""
    from geojson_vt_ray.functions.dedup import label_propagation_clusters
    n = 120
    pairs = pa.table({
        "id_a": pa.array(list(range(n - 1)), pa.int64()),
        "id_b": pa.array(list(range(1, n)), pa.int64())})
    lp = label_propagation_clusters(pairs).to_pandas()
    assert len(lp) == n
    assert (lp["cluster_id"] == 0).all(), lp["cluster_id"].nunique()


def test_jaccard_join_exact_matches_brute_force(ray_session):
    """The AllPairs prefix filter must be lossless: engine pairs ==
    brute-force all-pairs gram-set Jaccard on a corpus with planted
    near-dups, borderline pairs, and unrelated docs."""
    import itertools

    import ray.data as rd

    from geojson_vt_ray.functions.dedup import (_gram_hashes,
                                                jaccard_join_exact)

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(60)]
    docs = []
    for i in range(40):
        docs.append(" ".join(rng.choice(vocab, 30)))
    # planted near-dups: copy with small perturbations
    for i in range(8):
        base = docs[i].split()
        j = int(rng.integers(0, len(base)))
        base[j] = "zz"
        docs.append(" ".join(base))
    # an exact duplicate (jaccard 1.0) and a short doc (no grams)
    docs.append(docs[3])
    docs.append("a b c")
    ids = list(range(len(docs)))

    t_num, t_den, n_tok = 1, 2, 5
    sets = {i: _gram_hashes(t, n_tok) for i, t in zip(ids, docs)}
    expect = set()
    for a, b in itertools.combinations(ids, 2):
        sa, sb = sets[a], sets[b]
        inter = len(np.intersect1d(sa, sb, assume_unique=True))
        union = len(sa) + len(sb) - inter
        if union > 0 and t_den * inter >= t_num * union:
            expect.add((a, b, inter, union))

    ds = rd.from_items([{"doc_id": i, "text": t}
                        for i, t in zip(ids, docs)])
    out = jaccard_join_exact(ds, t_num, t_den, n_tok)
    got = set(zip(out.column("id_a").to_pylist(),
                  out.column("id_b").to_pylist(),
                  out.column("n_inter").to_pylist(),
                  out.column("n_union").to_pylist()))
    assert expect, "test corpus must produce matching pairs"
    assert got == expect


def test_group_percentiles_exact_vs_sorted(ray_session):
    """Two-pass histogram selection must equal percentile_disc semantics
    (rank = ceil(p*N), 1-indexed) on skewed data with heavy ties,
    single-element groups, and values straddling bucket boundaries."""
    import ray.data as rd

    from geojson_vt_ray.functions.percentile import group_percentiles

    rng = np.random.default_rng(5)
    rows = []
    # group a: heavy ties; b: zipf-ish skew; c: single element
    rows += [{"g": "a", "v": int(v)} for v in
             rng.choice([7, 7, 7, 100, 100, 5000], 4000)]
    rows += [{"g": "b", "v": int(v)} for v in
             (rng.zipf(1.3, 3000) % 100000)]
    rows += [{"g": "c", "v": 42}]
    ps = (0.5, 0.9, 0.99)
    out = group_percentiles(rd.from_items(rows), "g", "v",
                            ps=ps, n_buckets=64).to_pandas()

    import math
    for grp in ("a", "b", "c"):
        vals = np.sort([r["v"] for r in rows if r["g"] == grp])
        row = out[out["g"] == grp].iloc[0]
        for p in ps:
            expect = int(vals[max(1, math.ceil(p * len(vals))) - 1])
            assert row[f"p{int(p * 100)}"] == expect, (grp, p)


def test_read_docs_parquet_fallback_and_lance_gate(ray_session, tmp_path):
    """sources/lance_source.read_docs: parquet path streams the doc table
    with column projection; a .lance path without the lance package is a
    clear ImportError, not a silent fallback."""
    import pyarrow.parquet as pq
    import pytest
    from geojson_vt_ray.sources.docs import synthesize_corpus
    from geojson_vt_ray.sources.lance_source import (lance_available,
                                                     read_docs)

    corpus = synthesize_corpus(12)
    path = str(tmp_path / "docs.parquet")
    pq.write_table(corpus, path)

    ds = read_docs(path)
    got = ds.to_pandas()
    assert len(got) == 12
    assert list(got.columns) == ["doc_id", "seq", "spans"]
    # span sequences survive the read byte-for-byte
    assert list(got["spans"].iloc[0]) == corpus.column("spans")[0].as_py()

    only_ids = read_docs(path, columns=["doc_id"]).to_pandas()
    assert list(only_ids.columns) == ["doc_id"]

    if not lance_available():
        with pytest.raises(ImportError, match="[Ll]ance"):
            read_docs(str(tmp_path / "corpus.lance"))


def test_minhash_verify_join_equals_collect(ray_session):
    """The distributed verify="join" path must produce exactly the same
    verified pairs as the driver-side verify="collect" path (and the
    "auto" default must resolve to one of them) — keeps the join path
    from rotting now that small corpora default to collect."""
    import ray.data as rd
    from geojson_vt_ray.functions.dedup import minhash_dedup_pairs

    base = ("the quick brown fox jumps over the lazy dog and then "
            "naps in the warm afternoon sun near the old barn ")
    texts, ids = [], []
    for i in range(40):
        if i % 4 == 0:
            texts.append(base + f"variant tail {i % 2}")  # planted dups
        else:
            texts.append(f"unique document {i} " + "filler words " * i)
        ids.append(i)
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array(texts)})
    ds = rd.from_arrow(tbl).repartition(4)
    got_c = minhash_dedup_pairs(ds, threshold=0.5, verify="collect")
    got_j = minhash_dedup_pairs(rd.from_arrow(tbl).repartition(4),
                                threshold=0.5, verify="join")
    got_a = minhash_dedup_pairs(rd.from_arrow(tbl).repartition(4),
                                threshold=0.5, verify="auto")
    assert got_c.num_rows > 0  # planted dups must surface
    for col in ("id_a", "id_b", "jaccard"):
        assert got_c[col].to_pylist() == got_j[col].to_pylist(), col
        assert got_c[col].to_pylist() == got_a[col].to_pylist(), col


def test_decontam_explicit_eval_ids(ray_session):
    """q_decontam(eval_ids=...) must match the default hash-rank
    selection when the explicit set equals that sample (the production
    small-side path is the same operator, differently selected)."""
    import hashlib

    import numpy as np
    import pyarrow.parquet as pq
    from geojson_vt_ray.pipelines.queries import q_decontam

    sf = "/root/testdata/sf0.001"
    dids = pq.read_table(f"{sf}/documents.parquet",
                         columns=["doc_id"]).column("doc_id").to_numpy()
    h = np.asarray([hashlib.md5(str(int(d)).encode()).hexdigest()
                    for d in dids], dtype=object)
    ev = dids[np.lexsort((dids, h))[:256]]
    got_def = q_decontam(sf).to_pandas().sort_values(
        "doc_id", ignore_index=True)
    got_ids = q_decontam(sf, eval_ids=ev).to_pandas().sort_values(
        "doc_id", ignore_index=True)
    assert got_def.equals(got_ids)
    assert len(got_def) > 0


def test_pipjoin_empty_batch_schema_stable():
    """A batch with zero polygon matches must emit the same poly_key
    type as a matching batch — pa.array([]) would infer null and break
    block-schema unification (bench-tail RefBundle warning)."""
    from geojson_vt_ray.functions.spatial import PIPJoin

    polys = [{"key": 7, "rings": [np.array(
        [[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0], [0.0, 0.0]])],
        "minx": 0.0, "miny": 0.0, "maxx": 1.0, "maxy": 1.0}]
    j = PIPJoin(polys, keep_cols=("event_id",))
    hit = j(pa.table({"event_id": pa.array([1], pa.int64()),
                      "lon": pa.array([0.5]), "lat": pa.array([0.5])}))
    miss = j(pa.table({"event_id": pa.array([2], pa.int64()),
                       "lon": pa.array([9.0]), "lat": pa.array([9.0])}))
    assert hit.num_rows == 1 and miss.num_rows == 0
    assert hit.schema.equals(miss.schema), (hit.schema, miss.schema)
    assert miss.schema.field("poly_key").type == pa.int64()


def test_semdedup_matches_brute_force_on_planted_dups(ray_session, tmp_path):
    """q_semdedup's cluster-confined keep rule must agree EXACTLY with
    the global brute-force rule when every near-dup pair is an exact
    copy: identical vectors always share an argmax cluster (regardless
    of k-means quality), and all non-copy cosines sit below threshold
    by construction, so the cluster confinement loses nothing."""
    import pyarrow.parquet as pq
    from geojson_vt_ray.pipelines.queries import q_semdedup

    rng = np.random.default_rng(7)
    dim, t = 64, 0.9
    vecs, group_of = [], []
    gid = 0
    for c in range(8):                      # 8 well-separated clusters
        base = np.zeros(dim)
        base[c] = 1.0
        for _ in range(5):                  # 5 groups per cluster
            u = rng.standard_normal(dim)
            u /= np.linalg.norm(u)
            g = base + 0.5 * u
            g /= np.linalg.norm(g)
            copies = int(rng.integers(1, 4))
            for _ in range(copies):         # 1-3 exact copies
                vecs.append(g)
                group_of.append(gid)
            gid += 1
    vecs = np.asarray(vecs, dtype=np.float32)
    n = len(vecs)
    perm = rng.permutation(n)               # ids not grouped by cluster
    vecs, group_of = vecs[perm], np.asarray(group_of)[perm]

    # global sanity: non-copy cosines all below threshold
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sim = vn.astype(np.float64) @ vn.astype(np.float64).T
    same = group_of[:, None] == group_of[None, :]
    assert sim[~same].max() < t

    ids = np.arange(n, dtype=np.int64)
    tbl = pa.table({"vec_id": pa.array(ids),
                    "embedding": pa.array(list(vecs),
                                          pa.list_(pa.float32()))})
    pq.write_table(tbl, tmp_path / "embeddings.parquet")

    kept = q_semdedup(str(tmp_path), threshold=t, nlist=8).to_pandas()
    got = sorted(kept["vec_id"].tolist())

    # brute force: drop j iff some i<j has cosine >= t
    drop = np.triu(sim >= t, 1).any(axis=0)
    want = sorted(ids[~drop].tolist())
    assert got == want


def test_knn_join_partial_matches_brute_force_at_all_slice_sizes():
    """KNNJoinPartial's chunked distance-matrix path must be exact —
    including (dist2, id) tie-breaks at the k boundary — for any
    internal slice size (the memory cap makes slicing data-dependent,
    so both the one-shot and many-slice paths need pinning). Planted
    duplicate coordinates force boundary ties."""
    import numpy as np
    import pyarrow as pa
    from geojson_vt_ray.functions.spatial import KNNJoinPartial

    rng = np.random.default_rng(7)
    n, nq, k = 2000, 23, 3
    px, py = rng.uniform(-10, 10, n), rng.uniform(-10, 10, n)
    px[::7] = px[0]
    py[::7] = py[0]
    pid = rng.permutation(n).astype(np.int64)
    queries = [(int(i), float(rng.uniform(-10, 10)),
                float(rng.uniform(-10, 10))) for i in range(nq)]
    batch = pa.table({"lon": px, "lat": py, "event_id": pid})

    want = []
    for qid, qx, qy in queries:
        d2 = (px - qx) ** 2 + (py - qy) ** 2
        for p in np.lexsort((pid, d2))[:k]:
            want.append((qid, int(pid[p]), float(d2[p])))
    want.sort()

    for max_elems in (8_000_000, 1000, 100):
        st = KNNJoinPartial(queries, k=k)
        st._MAX_MATRIX_ELEMS = max_elems
        t = st(batch)
        got = sorted(zip(t.column("query_id").to_pylist(),
                         t.column("point_id").to_pylist(),
                         t.column("dist2").to_pylist()))
        assert got == want, f"slice cap {max_elems}"


def test_pairs_from_prefix_group_matches_bruteforce():
    """Property test: the two-level repeat/arange triangular expansion
    must emit EXACTLY the per-gram (i < j) pairs a brute-force nested
    loop produces, for random group-size mixes (sizes 1/2/3+, empty
    frame, all-one-gram)."""
    import numpy as np
    import pandas as pd

    from geojson_vt_ray.functions.dedup import _pairs_from_prefix_group

    rng = np.random.default_rng(7)
    for trial in range(25):
        n_grams = int(rng.integers(0, 12))
        rows = []
        for gi in range(n_grams):
            size = int(rng.integers(1, 6))
            docs = rng.choice(1000, size=size, replace=False)
            for d in docs:
                rows.append((np.uint64(gi * 7 + 1), int(d),
                             int(rng.integers(1, 50))))
        g = pd.DataFrame(rows, columns=["gh", "doc_id", "set_size"]) \
            if rows else pd.DataFrame(
            {"gh": pd.Series([], dtype="uint64"),
             "doc_id": pd.Series([], dtype="int64"),
             "set_size": pd.Series([], dtype="int64")})
        ia, ib, sa, sb = _pairs_from_prefix_group(g, "doc_id")
        got = sorted(zip(ia.tolist(), ib.tolist(),
                         sa.tolist(), sb.tolist()))

        want = []
        if rows:
            size_of = {}
            by_gram = {}
            for gh, d, s in rows:
                by_gram.setdefault(gh, []).append(d)
                size_of[(gh, d)] = s
            for gh, docs in by_gram.items():
                for a in docs:
                    for b in docs:
                        if a < b:
                            want.append((a, b, size_of[(gh, a)],
                                         size_of[(gh, b)]))
        assert got == sorted(want), f"trial {trial}"


def test_filtered_components_matches_union_find(ray_session):
    """Filtering-contraction CC must equal union-find on a chain +
    triangle + pair graph, and with a tiny driver budget that FORCES
    contraction passes the per-bucket star edges must still preserve
    every component exactly."""
    from geojson_vt_ray.functions.dedup import filtered_components
    from geojson_vt_ray.pipelines.queries import _union_find_clusters
    pairs = pa.table({
        "id_a": pa.array([10, 11, 12, 13, 20, 21, 20, 30], pa.int64()),
        "id_b": pa.array([11, 12, 13, 14, 21, 22, 22, 31], pa.int64())})
    uf = _union_find_clusters(pairs)
    assert filtered_components(pairs).equals(uf)
    # budget below the edge count: at least one contraction pass runs
    assert filtered_components(pairs, driver_edge_budget=4).equals(uf)


def test_filtered_components_random_graph_forced_passes(ray_session):
    """Random multi-component graph with a budget below the input edge
    count but above the star-contracted size: at least one contraction
    pass runs, then the driver finish labels every node — must equal
    union-find node for node (union-find, not LP, as the reference:
    it is instant on the driver, and LP equality is already pinned by
    test_label_propagation_matches_union_find)."""
    from geojson_vt_ray.functions.dedup import filtered_components
    from geojson_vt_ray.pipelines.queries import _union_find_clusters
    rng = np.random.default_rng(17)
    # 3 planted components over 0..599 (disjoint id ranges) + chain
    edges = []
    for base in (0, 200, 400):
        ids = rng.integers(base, base + 200, size=300)
        jds = rng.integers(base, base + 200, size=300)
        edges += [(min(a, b), max(a, b)) for a, b in zip(ids, jds)
                  if a != b]
    edges += [(i + 1000, i + 1001) for i in range(150)]   # long chain
    edges = sorted(set(edges))
    pairs = pa.table({
        "id_a": pa.array([e[0] for e in edges], pa.int64()),
        "id_b": pa.array([e[1] for e in edges], pa.int64())})
    assert len(edges) > 800          # budget forces >=1 contraction
    fc = filtered_components(pairs, driver_edge_budget=800, max_passes=8)
    assert fc.equals(_union_find_clusters(pairs))


def test_filtered_components_empty(ray_session):
    from geojson_vt_ray.functions.dedup import filtered_components
    empty = pa.table({"id_a": pa.array([], pa.int64()),
                      "id_b": pa.array([], pa.int64())})
    out = filtered_components(empty)
    assert out.num_rows == 0
    assert out.column_names == ["doc_id", "cluster_id"]


def test_filtered_components_self_loops_both_paths(ray_session):
    """A self-loop-only node must survive BOTH finish paths (direct
    driver collect and forced contraction) exactly as
    label_propagation_clusters keeps it."""
    from geojson_vt_ray.functions.dedup import (filtered_components,
                                                label_propagation_clusters)
    pairs = pa.table({
        "id_a": pa.array([5, 10, 11], pa.int64()),
        "id_b": pa.array([5, 11, 12], pa.int64())})
    lp = label_propagation_clusters(pairs)
    assert filtered_components(pairs).equals(lp)
    assert filtered_components(pairs, driver_edge_budget=1).equals(lp)
    df = lp.to_pandas().set_index("doc_id")["cluster_id"]
    assert df[5] == 5 and df[10] == 10 and df[12] == 10
