"""Similarity search over an embedding column (build brief): brute-force
cosine top-k as the exact baseline, LSH-bucketed variant as the scale
path. Query matrix is broadcast once (ray.put); per-batch work is one
matmul; partial top-k rows are merged in a tiny final step — shuffle
volume O(batches * queries * k)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


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
        return pa.table({"query_id": pa.array([], pa.int64()),
                         "vec_id": pa.array([], pa.int64()),
                         "rnk": pa.array([], pa.int64())})
    df = df.sort_values(["query_id", "cosine", "vec_id"],
                        ascending=[True, False, True], kind="mergesort")
    df["rnk"] = df.groupby("query_id").cumcount() + 1
    df = df[df["rnk"] <= k]
    return pa.Table.from_pandas(df[["query_id", "vec_id", "rnk"]],
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
        return pa.table({"query_id": pa.array([], pa.int64()),
                         "vec_id": pa.array([], pa.int64()),
                         "rnk": pa.array([], pa.int64())})
    merged = topk_merge(pa.concat_tables(tables),
                        k + (1 if exclude_self else 0))
    df = merged.to_pandas()
    if exclude_self:
        df = df[df["query_id"] != df["vec_id"]]
        df["rnk"] = df.groupby("query_id").cumcount() + 1
        df = df[df["rnk"] <= k]
    return pa.Table.from_pandas(df, preserve_index=False)


class LSHBuckets:
    """Scale path: random-hyperplane LSH bucket assignment; candidates
    restricted to matching buckets before exact re-rank."""

    def __init__(self, dim: int, n_planes: int = 12, seed: int = 42,
                 vec_col: str = "embedding"):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((n_planes, dim))
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.vec_col)
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        vals = col.values.to_numpy(zero_copy_only=False)
        m = vals.reshape(-1, self.planes.shape[1]).astype(np.float64)
        bits = (m @ self.planes.T) > 0
        bucket = np.zeros(len(m), dtype=np.int64)
        for b in range(self.planes.shape[0]):
            bucket |= bits[:, b].astype(np.int64) << b
        return batch.append_column("lsh_bucket", pa.array(bucket))
