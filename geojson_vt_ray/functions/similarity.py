"""Similarity search over an embedding column (build brief): brute-force
cosine top-k as the exact baseline, LSH-bucketed variant as the scale
path. Query matrix is broadcast once (ray.put); per-batch work is one
matmul; partial top-k rows are merged in a tiny final step — shuffle
volume O(batches * queries * k)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..arrowio import table_from_pandas


def _empty_topk() -> pa.Table:
    return pa.table({"query_id": pa.array([], pa.int64()),
                     "vec_id": pa.array([], pa.int64()),
                     "rnk": pa.array([], pa.int64())})


def _norm_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


class CosineTopKPartial:
    """map_batches stage: per-batch top-k cosine matches per query."""

    def __init__(self, queries_ref, query_ids, k: int,
                 vec_col: str = "embedding", id_col: str = "vec_id"):
        import ray
        q = (ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef)
             else queries_ref)
        self.q = _norm_rows(np.asarray(q, dtype=np.float64))
        self.query_ids = np.asarray(query_ids, dtype=np.int64)
        self.k = k
        self.vec_col = vec_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.vec_col)
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        vals = col.values.to_numpy(zero_copy_only=False)
        dim = self.q.shape[1]
        m = _norm_rows(vals.reshape(-1, dim).astype(np.float64))
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        sims = m @ self.q.T  # (n, nq)
        o_q, o_id, o_s = [], [], []
        for qi in range(sims.shape[1]):
            s = sims[:, qi]
            k = min(self.k, len(s))
            part = np.lexsort((ids, -s))[:k]
            o_q.extend([self.query_ids[qi]] * k)
            o_id.extend(ids[part])
            o_s.extend(s[part])
        return pa.table({"query_id": pa.array(o_q, pa.int64()),
                         "vec_id": pa.array(o_id, pa.int64()),
                         "cosine": pa.array(o_s, pa.float64())})


def topk_merge(partials: pa.Table, k: int) -> pa.Table:
    df = partials.to_pandas()
    if not len(df):
        return _empty_topk()
    df = df.sort_values(["query_id", "cosine", "vec_id"],
                        ascending=[True, False, True], kind="mergesort")
    df["rnk"] = df.groupby("query_id").cumcount() + 1
    df = df[df["rnk"] <= k]
    return table_from_pandas(df[["query_id", "vec_id", "rnk"]],
                                preserve_index=False)


def ann_cosine_topk(ds, queries: np.ndarray, query_ids, k: int,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    exclude_self: bool = True) -> pa.Table:
    """End-to-end brute-force ANN baseline over a Dataset."""
    import ray
    qref = ray.put(np.asarray(queries, dtype=np.float64))
    partials = ds.map_batches(
        CosineTopKPartial(qref, query_ids, k + (1 if exclude_self else 0),
                          vec_col, id_col),
        batch_format="pyarrow")
    tables = [ray.get(r) for r in partials.to_arrow_refs()]
    tables = [t for t in tables if t.num_rows]
    if not tables:
        return _empty_topk()
    merged = topk_merge(pa.concat_tables(tables),
                        k + (1 if exclude_self else 0))
    df = merged.to_pandas()
    if exclude_self:
        df = df[df["query_id"] != df["vec_id"]]
        df["rnk"] = df.groupby("query_id").cumcount() + 1
        df = df[df["rnk"] <= k]
    return table_from_pandas(df, preserve_index=False)


def _kmeans(sample: np.ndarray, nlist: int, iters: int = 8,
            seed: int = 42) -> np.ndarray:
    """Tiny deterministic k-means (cosine space: rows normalized) for the
    IVF coarse quantizer. Driver-side on a bounded sample only."""
    rng = np.random.default_rng(seed)
    sample = _norm_rows(np.asarray(sample, dtype=np.float64))
    nlist = min(nlist, len(sample))
    cent = sample[rng.choice(len(sample), nlist, replace=False)]
    for _ in range(iters):
        assign = np.argmax(sample @ cent.T, axis=1)
        for c in range(nlist):
            members = sample[assign == c]
            if len(members):
                v = members.sum(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    return cent


class IVFAssign:
    """map_batches stage: adds ivf_list (nearest coarse centroid) to each
    vector row. Centroids broadcast once via ray.put."""

    def __init__(self, centroids_ref, vec_col: str = "embedding"):
        import ray
        c = (ray.get(centroids_ref) if isinstance(centroids_ref, ray.ObjectRef)
             else centroids_ref)
        self.cent = np.asarray(c, dtype=np.float64)
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.vec_col)
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        vals = col.values.to_numpy(zero_copy_only=False)
        m = _norm_rows(vals.reshape(-1, self.cent.shape[1]).astype(np.float64))
        lst = np.argmax(m @ self.cent.T, axis=1).astype(np.int32)
        return batch.append_column("ivf_list", pa.array(lst))


class IVFTopKPartial:
    """Per-batch IVF search: each query only scores vectors whose
    ivf_list is in the query's nprobe nearest lists — the scale path
    (prunes ~(1 - nprobe/nlist) of the matmul and, at cluster scale,
    of the reads when the corpus is written partitioned by ivf_list)."""

    def __init__(self, queries_ref, query_ids, centroids_ref, k: int,
                 nprobe: int, vec_col: str = "embedding",
                 id_col: str = "vec_id"):
        import ray
        q = (ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef)
             else queries_ref)
        c = (ray.get(centroids_ref) if isinstance(centroids_ref, ray.ObjectRef)
             else centroids_ref)
        self.q = _norm_rows(np.asarray(q, dtype=np.float64))
        self.query_ids = np.asarray(query_ids, dtype=np.int64)
        cent = np.asarray(c, dtype=np.float64)
        nprobe = min(nprobe, len(cent))
        qsim = self.q @ cent.T
        self.probe = np.argsort(-qsim, axis=1, kind="stable")[:, :nprobe]
        self.k = k
        self.vec_col = vec_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.vec_col)
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        vals = col.values.to_numpy(zero_copy_only=False)
        m = _norm_rows(vals.reshape(-1, self.q.shape[1]).astype(np.float64))
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        lists = batch.column("ivf_list").to_numpy(zero_copy_only=False)
        o_q, o_id, o_s = [], [], []
        for qi in range(len(self.q)):
            cand = np.flatnonzero(np.isin(lists, self.probe[qi]))
            if len(cand) == 0:
                continue
            s = m[cand] @ self.q[qi]
            k = min(self.k, len(s))
            part = np.lexsort((ids[cand], -s))[:k]
            o_q.extend([self.query_ids[qi]] * k)
            o_id.extend(ids[cand][part])
            o_s.extend(s[part])
        return pa.table({"query_id": pa.array(o_q, pa.int64()),
                         "vec_id": pa.array(o_id, pa.int64()),
                         "cosine": pa.array(o_s, pa.float64())})


def ann_ivf_topk(ds, queries: np.ndarray, query_ids, k: int,
                 nlist: int = 16, nprobe: int = 4, train_sample: int = 1024,
                 vec_col: str = "embedding", id_col: str = "vec_id",
                 exclude_self: bool = True, return_stats: bool = False):
    """IVF (coarse-quantized) ANN — the engine's DEFAULT ANN scale path:
    deterministic k-means centroids from a bounded driver-side sample,
    broadcast assign stage, per-batch probed partial top-k, tiny merge.
    Same output schema as ann_cosine_topk. With return_stats=True also
    returns {"scan_frac", "nlist", "nprobe"}, where scan_frac is the
    MEASURED mean fraction of corpus rows a query's probed lists cover
    (one extra counting pass over the assigned corpus — a diagnostic,
    skip it in production runs)."""
    import ray
    sample = ds.limit(train_sample).to_pandas()[vec_col]
    cent = _kmeans(np.stack(sample.to_numpy()), nlist)
    cref = ray.put(cent)
    qref = ray.put(np.asarray(queries, dtype=np.float64))
    kk = k + (1 if exclude_self else 0)
    assigned = ds.map_batches(IVFAssign(cref, vec_col),
                              batch_format="pyarrow")
    partials = assigned.map_batches(
        IVFTopKPartial(qref, query_ids, cref, kk, nprobe, vec_col, id_col),
        batch_format="pyarrow")
    tables = [ray.get(r) for r in partials.to_arrow_refs()]
    tables = [t for t in tables if t.num_rows]
    stats = None
    if return_stats:
        nlist_eff = len(cent)

        def _hist(b: pa.Table) -> pa.Table:
            lst = b.column("ivf_list").to_numpy(zero_copy_only=False)
            c = np.bincount(lst, minlength=nlist_eff).astype(np.int64)
            return pa.table({"n": pa.array(c)})

        hp = assigned.map_batches(_hist, batch_format="pyarrow").to_pandas()
        hist = hp["n"].to_numpy().reshape(-1, nlist_eff).sum(axis=0)
        total = max(int(hist.sum()), 1)
        qn = _norm_rows(np.asarray(queries, dtype=np.float64))
        probe = np.argsort(-(qn @ cent.T), axis=1,
                           kind="stable")[:, :min(nprobe, nlist_eff)]
        stats = {"scan_frac": float(np.mean(hist[probe].sum(axis=1)) / total),
                 "nlist": nlist_eff, "nprobe": nprobe}
    if not tables:
        empty = _empty_topk()
        return (empty, stats) if return_stats else empty
    merged = topk_merge(pa.concat_tables(tables), kk)
    df = merged.to_pandas()
    if exclude_self:
        df = df[df["query_id"] != df["vec_id"]]
        df["rnk"] = df.groupby("query_id").cumcount() + 1
        df = df[df["rnk"] <= k]
    out = table_from_pandas(df, preserve_index=False)
    return (out, stats) if return_stats else out


def ann_ivf_build(ds, out_dir: str, nlist: int = 16,
                  train_sample: int = 1024, vec_col: str = "embedding",
                  id_col: str = "vec_id", seed: int = 42) -> np.ndarray:
    """Build a persistent IVF store: k-means centroids from a bounded
    driver-side sample, then the corpus written hive-partitioned by
    ivf_list (one directory per coarse list). At cluster scale this is
    what makes nprobe search SUBLINEAR IN READS, not just in matmul: a
    query touches only its nprobe partitions' files. Centroids are
    persisted next to the data. Returns the centroid matrix."""
    import os
    import ray
    import pyarrow.parquet as pq
    sample = ds.limit(train_sample).to_pandas()[vec_col]
    cent = _kmeans(np.stack(sample.to_numpy()), nlist, seed=seed)
    cref = ray.put(cent)
    assigned = ds.map_batches(IVFAssign(cref, vec_col),
                              batch_format="pyarrow")
    assigned.write_parquet(out_dir, partition_cols=["ivf_list"])
    pq.write_table(
        pa.table({"list_id": pa.array(np.arange(len(cent)), pa.int32()),
                  "centroid": pa.array([c.tolist() for c in cent],
                                       pa.list_(pa.float64()))}),
        os.path.join(out_dir, "_centroids.parquet"))
    return cent


def ann_ivf_search(store_dir: str, queries: np.ndarray, query_ids,
                   k: int, nprobe: int = 4, vec_col: str = "embedding",
                   id_col: str = "vec_id", exclude_self: bool = True,
                   return_stats: bool = False):
    """Search an ann_ivf_build store reading ONLY the probed partitions:
    the union of every query's nprobe nearest lists is resolved against
    the hive layout and the other directories are never opened. Same
    output schema as ann_cosine_topk; with return_stats=True also
    returns {"lists_read", "nlist"}."""
    import os
    import ray
    import ray.data
    import pyarrow.parquet as pq
    ct = pq.read_table(os.path.join(store_dir, "_centroids.parquet"))
    cent = np.stack([np.asarray(c)
                     for c in ct.column("centroid").to_pylist()])
    q = _norm_rows(np.asarray(queries, dtype=np.float64))
    nprobe = min(nprobe, len(cent))
    probe = np.argsort(-(q @ cent.T), axis=1, kind="stable")[:, :nprobe]
    need = sorted(set(int(l) for row in probe for l in row))
    dirs = [os.path.join(store_dir, f"ivf_list={l}") for l in need]
    dirs = [p for p in dirs if os.path.isdir(p)]
    # read_parquet accepts one directory or a list of FILES — expand the
    # probed partitions to their files (everything else is never opened)
    import glob
    files = [f for d in dirs
             for f in sorted(glob.glob(os.path.join(d, "*.parquet")))]
    empty = _empty_topk()
    if not files:  # every probed list was empty (no directory written)
        stats = {"lists_read": 0, "nlist": len(cent)}
        return (empty, stats) if return_stats else empty
    ds = ray.data.read_parquet(files)
    cref = ray.put(cent)
    qref = ray.put(q)
    kk = k + (1 if exclude_self else 0)

    def drop_hive_col(b: pa.Table) -> pa.Table:
        # the hive partition column comes back as string/dictionary —
        # drop it and re-derive the list id from the vectors (same
        # centroids, so the assignment is identical)
        if "ivf_list" in b.column_names:
            b = b.drop_columns(["ivf_list"])
        return b

    assigned = ds.map_batches(drop_hive_col, batch_format="pyarrow") \
        .map_batches(IVFAssign(cref, vec_col), batch_format="pyarrow")
    partials = assigned.map_batches(
        IVFTopKPartial(qref, query_ids, cref, kk, nprobe, vec_col, id_col),
        batch_format="pyarrow")
    tables = [ray.get(r) for r in partials.to_arrow_refs()]
    tables = [t for t in tables if t.num_rows]
    empty = _empty_topk()
    stats = {"lists_read": len(dirs), "nlist": len(cent)}
    if not tables:
        return (empty, stats) if return_stats else empty
    merged = topk_merge(pa.concat_tables(tables), kk)
    df = merged.to_pandas()
    if exclude_self:
        df = df[df["query_id"] != df["vec_id"]]
        df["rnk"] = df.groupby("query_id").cumcount() + 1
        df = df[df["rnk"] <= k]
    out = table_from_pandas(df, preserve_index=False)
    return (out, stats) if return_stats else out


def lsh_planes(dim: int, n_planes: int = 12, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_bucket_of(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (np.asarray(m, dtype=np.float64) @ planes.T) > 0
    bucket = np.zeros(len(m), dtype=np.int64)
    for b in range(planes.shape[0]):
        bucket |= bits[:, b].astype(np.int64) << b
    return bucket


class LSHBuckets:
    """Scale path: MULTI-TABLE random-hyperplane LSH bucket assignment —
    ``n_tables`` independent plane sets, one bucket column per table
    (lsh_b0..lsh_b{L-1}). Candidates are restricted to vectors matching
    in ANY table before exact re-rank; at cluster scale each table's
    bucket is a hive partition key so probed reads prune storage."""

    def __init__(self, dim: int, n_planes: int = 12, n_tables: int = 6,
                 seed: int = 42, vec_col: str = "embedding"):
        self.planes = [lsh_planes(dim, n_planes, seed + 1000 * t)
                       for t in range(n_tables)]
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.vec_col)
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        vals = col.values.to_numpy(zero_copy_only=False)
        m = vals.reshape(-1, self.planes[0].shape[1])
        for t, planes in enumerate(self.planes):
            batch = batch.append_column(
                f"lsh_b{t}", pa.array(lsh_bucket_of(m, planes)))
        return batch


class LSHTopKPartial:
    """Per-batch LSH-probed top-k: a query scores a vector iff in at
    least one of the L tables the vector's bucket is the query's bucket
    or 1 bit away — union recall over tables is 1-(1-r)^L for per-table
    probe recall r, at ~L*(n+1)/2^n of the corpus scanned."""

    def __init__(self, queries_ref, query_ids, n_planes: int, k: int,
                 n_tables: int = 6, vec_col: str = "embedding",
                 id_col: str = "vec_id", seed: int = 42):
        import ray
        q = (ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef)
             else queries_ref)
        self.q = _norm_rows(np.asarray(q, dtype=np.float64))
        self.query_ids = np.asarray(query_ids, dtype=np.int64)
        self.n_tables = n_tables
        flips1 = 1 << np.arange(n_planes)
        # probes[t][qi] = query qi's bucket in table t + all 1-bit flips
        self.probes = []
        for t in range(n_tables):
            planes = lsh_planes(self.q.shape[1], n_planes, seed + 1000 * t)
            qb = lsh_bucket_of(self.q, planes)
            self.probes.append([np.concatenate(([b], b ^ flips1))
                                for b in qb])
        self.k = k
        self.vec_col = vec_col
        self.id_col = id_col

    def candidate_mask(self, batch: pa.Table, qi: int) -> np.ndarray:
        buckets0 = batch.column("lsh_b0")
        n = len(buckets0)
        cand = np.zeros(n, dtype=bool)
        for t in range(self.n_tables):
            bt = batch.column(f"lsh_b{t}").to_numpy(zero_copy_only=False)
            cand |= np.isin(bt, self.probes[t][qi])
        return cand

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.vec_col)
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        vals = col.values.to_numpy(zero_copy_only=False)
        m = _norm_rows(vals.reshape(-1, self.q.shape[1]).astype(np.float64))
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        o_q, o_id, o_s = [], [], []
        for qi in range(len(self.q)):
            cand = np.flatnonzero(self.candidate_mask(batch, qi))
            if len(cand) == 0:
                continue
            s = m[cand] @ self.q[qi]
            k = min(self.k, len(s))
            part = np.lexsort((ids[cand], -s))[:k]
            o_q.extend([self.query_ids[qi]] * k)
            o_id.extend(ids[cand][part])
            o_s.extend(s[part])
        return pa.table({"query_id": pa.array(o_q, pa.int64()),
                         "vec_id": pa.array(o_id, pa.int64()),
                         "cosine": pa.array(o_s, pa.float64())})


def ann_lsh_topk(ds, queries: np.ndarray, query_ids, k: int,
                 n_planes: int = 12, n_tables: int = 6,
                 vec_col: str = "embedding", id_col: str = "vec_id",
                 exclude_self: bool = True, seed: int = 42,
                 return_stats: bool = False):
    """Multi-table LSH ANN: assign stage (L bucket columns) + 1-bit
    multi-probe partial top-k + tiny merge. Same output schema as
    ann_cosine_topk/ann_ivf_topk.

    Recall depends on the corpus's neighbor geometry: per-bit agreement
    for a neighbor at angle theta is p = 1 - theta/pi, so clustered
    corpora (neighbor cosine ~0.9, p~0.9) reach recall >=0.9 at a few
    percent of the corpus scanned with the defaults (asserted in
    tests/test_functions.py on a planted-cluster corpus), while
    near-random corpora (neighbor cosine ~0.35, p~0.6, LSH exponent
    rho = ln(1/p1)/ln(1/p2) ~ 0.74) are information-theoretically poor
    LSH targets — no bucketing scheme is sublinear there.

    ``return_stats=True`` additionally computes the exact scanned
    fraction with a second cheap pass over the assigned buckets (no
    matmul) and returns (table, {"scan_frac", "n_rows"}).
    """
    import ray
    dim = np.asarray(queries).shape[1]
    qref = ray.put(np.asarray(queries, dtype=np.float64))
    kk = k + (1 if exclude_self else 0)
    assigned = ds.map_batches(
        LSHBuckets(dim, n_planes, n_tables, seed, vec_col),
        batch_format="pyarrow")
    if return_stats:
        assigned = assigned.materialize()
    partial = LSHTopKPartial(qref, query_ids, n_planes, kk, n_tables,
                             vec_col, id_col, seed)
    partials = assigned.map_batches(partial, batch_format="pyarrow")
    tables = [ray.get(r) for r in partials.to_arrow_refs()]
    tables = [t for t in tables if t.num_rows]
    empty = _empty_topk()
    if not tables:
        return (empty, {"scan_frac": 0.0, "n_rows": 0}) \
            if return_stats else empty
    merged = topk_merge(pa.concat_tables(tables), kk)
    df = merged.to_pandas()
    if exclude_self:
        df = df[df["query_id"] != df["vec_id"]]
        df["rnk"] = df.groupby("query_id").cumcount() + 1
        df = df[df["rnk"] <= k]
    out = table_from_pandas(df, preserve_index=False)
    if not return_stats:
        return out

    def count_cands(b: pa.Table) -> pa.Table:
        scanned = sum(int(partial.candidate_mask(b, qi).sum())
                      for qi in range(len(partial.q)))
        return pa.table({"scanned": pa.array([scanned], pa.int64()),
                         "rows": pa.array([b.num_rows], pa.int64())})

    stats_df = assigned.map_batches(
        count_cands, batch_format="pyarrow").to_pandas()
    n_rows = int(stats_df["rows"].sum())
    denom = max(1, n_rows * len(partial.q))
    return out, {"scan_frac": float(stats_df["scanned"].sum()) / denom,
                 "n_rows": n_rows}
