"""Deduplication operators (build brief): exact, MinHash+LSH, SimHash,
n-gram Jaccard, embedding-cosine near-dup.

Scale shapes:
- exact: content hash per batch (vectorized) -> groupby(hash) -> min
  keeper. The only shuffle moves (hash, doc_id) pairs, not text.
- MinHash-LSH: shingle -> 64-perm minhash per batch -> explode to
  (band_id, band_hash, doc_id) rows -> groupby bands -> candidate pairs
  -> exact Jaccard verification. Signatures are mergeable partials; the
  shuffle moves fixed-width band rows only.
- SimHash: 64-bit fingerprint per doc; Hamming-adjacent candidates via
  4x16-bit band blocking.
All hashing is seed-fixed (blake2b keyed) — deterministic across runs
and workers.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa


def _md5_hex(texts: list[str]) -> list[str]:
    return [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]


def add_content_hash(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Exact-dup key: md5 hex (matches DuckDB md5() for the oracle)."""
    return batch.append_column(
        "content_hash", pa.array(_md5_hex(batch.column(text_col).to_pylist())))


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Dataset -> (content_hash, keeper_id): min id per hash group.
    Pattern: vectorized hash in map_batches, then a grouped Min over
    (hash, id) pairs only — the wide shuffle never carries text."""
    from ray.data.aggregate import Min

    hashed = ds.map_batches(
        lambda b: add_content_hash(b, text_col).select(
            ["content_hash", id_col]),
        batch_format="pyarrow")
    agg = hashed.groupby("content_hash").aggregate(
        Min(id_col, alias_name="keeper_id"))
    return agg


# ------------------------------------------------------------- minhash
_N_PERM = 64
_N_BANDS = 16  # 16 bands x 4 rows


def _shingles(text: str, k: int = 5) -> np.ndarray:
    data = text.encode("utf-8", "ignore")
    if len(data) < k:
        data = data + b"\x00" * (k - len(data))
    out = {data[i:i + k] for i in range(len(data) - k + 1)}
    return out


def _hash64(items, seed: int) -> np.ndarray:
    key = seed.to_bytes(8, "big")
    return np.fromiter(
        (int.from_bytes(hashlib.blake2b(s, digest_size=8, key=key).digest(),
                        "big") for s in items),
        dtype=np.uint64, count=len(items))


_PARAM_RNG = np.random.default_rng(42)
_A = _PARAM_RNG.integers(1, 2**61 - 1, _N_PERM, dtype=np.uint64) | np.uint64(1)
_B = _PARAM_RNG.integers(0, 2**61 - 1, _N_PERM, dtype=np.uint64)


def minhash_signature(text: str) -> np.ndarray:
    sh = _shingles(text)
    base = _hash64(list(sh), seed=7)
    # 64 cheap permutations of one strong hash (standard MinHash trick)
    sig = np.empty(_N_PERM, dtype=np.uint64)
    for p in range(_N_PERM):
        sig[p] = (base * _A[p] + _B[p]).min()
    return sig


class MinHashBands:
    """map_batches stage: text -> exploded (band_id, band_hash, doc_id)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        ids = batch.column(self.id_col).to_pylist()
        rows_per = _N_PERM // _N_BANDS
        o_band, o_hash, o_id = [], [], []
        for doc_id, t in zip(ids, texts):
            sig = minhash_signature(t)
            for b in range(_N_BANDS):
                chunk = sig[b * rows_per:(b + 1) * rows_per]
                h = hashlib.blake2b(chunk.tobytes(), digest_size=8).digest()
                o_band.append(b)
                o_hash.append(int.from_bytes(h, "big") >> 1)
                o_id.append(doc_id)
        return pa.table({"band_id": pa.array(o_band, pa.int32()),
                         "band_hash": pa.array(o_hash, pa.int64()),
                         self.id_col: pa.array(o_id)})


def _ngram_jaccard(a: str, b: str, k: int = 5) -> float:
    sa, sb = _shingles(a, k), _shingles(b, k)
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)


def minhash_dedup_pairs(ds, threshold: float = 0.8, text_col: str = "text",
                        id_col: str = "doc_id"):
    """Dataset -> verified near-dup pairs (id_a < id_b, jaccard >= thr).

    LSH bucket join: groupby (band_id, band_hash); only bucket members
    pair up. Verification re-reads the pair texts via a broadcast of the
    candidate id set (candidates are rare; at larger scales swap for a
    hash-join of candidates against the corpus)."""
    import ray

    bands = ds.map_batches(MinHashBands(text_col, id_col),
                           batch_format="pyarrow")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(g[id_col].tolist())
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": []})
        pairs = [(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]]
        return pd.DataFrame(pairs, columns=["id_a", "id_b"])

    cand = bands.groupby(["band_id", "band_hash"]).map_groups(
        bucket_pairs, batch_format="pandas")
    cand_pd = cand.to_pandas().drop_duplicates()
    if not len(cand_pd):
        return pa.table({"id_a": pa.array([], pa.int64()),
                         "id_b": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})

    need = set(cand_pd["id_a"]) | set(cand_pd["id_b"])
    texts = {}
    for b in ds.iter_batches(batch_format="pyarrow"):
        for i, t in zip(b.column(id_col).to_pylist(),
                        b.column(text_col).to_pylist()):
            if i in need:
                texts[i] = t
    rows = []
    for a, b_ in cand_pd.itertuples(index=False):
        j = _ngram_jaccard(texts[a], texts[b_])
        if j >= threshold:
            rows.append((a, b_, j))
    rows.sort()
    return pa.table({
        "id_a": pa.array([r[0] for r in rows]),
        "id_b": pa.array([r[1] for r in rows]),
        "jaccard": pa.array([r[2] for r in rows], pa.float64())})


# -------------------------------------------------------------- simhash
def simhash64(text: str) -> int:
    toks = text.split()
    if not toks:
        return 0
    hs = _hash64([t.encode() for t in toks], seed=11)
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int64)
    v = (2 * bits - 1).sum(axis=0)
    return int("".join("1" if x > 0 else "0" for x in v[::-1]), 2)


class SimHashStage:
    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        hs = [simhash64(t) for t in batch.column(self.text_col).to_pylist()]
        arr = np.asarray(hs, dtype=np.uint64)
        batch = batch.append_column("simhash", pa.array(arr))
        for b in range(4):  # 16-bit band blocking for hamming<=3 recall
            band = ((arr >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int32)
            batch = batch.append_column(f"sim_band{b}", pa.array(band))
        return batch


# ------------------------------------------------- embedding near-dup
class CosineNearDup:
    """Per-batch embedding near-dup candidates against a broadcast
    (ray.put) reference matrix; exact cosine, vectorized matmul."""

    def __init__(self, ref_matrix_ref, ref_ids, threshold: float = 0.95,
                 vec_col: str = "embedding", id_col: str = "vec_id"):
        import ray
        m = (ray.get(ref_matrix_ref)
             if isinstance(ref_matrix_ref, ray.ObjectRef) else ref_matrix_ref)
        self.ref = m / np.linalg.norm(m, axis=1, keepdims=True)
        self.ref_ids = np.asarray(ref_ids)
        self.threshold = threshold
        self.vec_col = vec_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.vec_col)
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        vals = col.values.to_numpy(zero_copy_only=False)
        dim = self.ref.shape[1]
        m = vals.reshape(-1, dim).astype(np.float64)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = m @ self.ref.T
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        ii, jj = np.nonzero(sims >= self.threshold)
        keep = ids[ii] < self.ref_ids[jj]  # no self/duplicate pairs
        return pa.table({
            "id_a": pa.array(ids[ii][keep]),
            "id_b": pa.array(self.ref_ids[jj][keep]),
            "cosine": pa.array(sims[ii, jj][keep], pa.float64())})
