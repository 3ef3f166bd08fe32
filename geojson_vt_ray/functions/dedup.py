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
All hashing is seed-fixed and deterministic across runs and workers:
shingles use an FNV-style polynomial rolling hash (fast, NOT
cryptographic — dedup here assumes non-adversarial input), simhash
tokens use keyed blake2b, band keys use unkeyed blake2b.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ..arrowio import strip_schema_metadata


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


def _hash64(items, seed: int) -> np.ndarray:
    key = seed.to_bytes(8, "big")
    return np.fromiter(
        (int.from_bytes(hashlib.blake2b(s, digest_size=8, key=key).digest(),
                        "big") for s in items),
        dtype=np.uint64, count=len(items))


_PARAM_RNG = np.random.default_rng(42)
_A = _PARAM_RNG.integers(1, 2**61 - 1, _N_PERM, dtype=np.uint64) | np.uint64(1)
_B = _PARAM_RNG.integers(0, 2**61 - 1, _N_PERM, dtype=np.uint64)


_FNV = np.uint64(1099511628211)


def _shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Distinct k-byte-shingle hashes, fully vectorized: polynomial
    rolling hash over the raw byte array (k fused multiply-adds for the
    whole document) instead of a per-shingle cryptographic hash —
    deterministic across workers, ~100x faster on long documents."""
    data = text.encode("utf-8", "ignore")
    if len(data) < k:
        data = data + b"\x00" * (k - len(data))
    b = np.frombuffer(data, np.uint8).astype(np.uint64)
    n = len(b) - k + 1
    h = np.zeros(n, np.uint64)
    for j in range(k):
        h = h * _FNV + b[j:j + n]
    return np.unique(h)


def minhash_signature(text: str) -> np.ndarray:
    base = _shingle_hashes(text)
    # 64 cheap permutations of one base hash (standard MinHash trick).
    # The broadcast product is 512 B/shingle transient, so accumulate
    # the column minima over bounded blocks: a 10 MB document (~10M
    # shingles) peaks at ~32 MB instead of ~5 GB.
    out = np.full(_N_PERM, np.iinfo(np.uint64).max, dtype=np.uint64)
    BLOCK = 65536
    for i in range(0, len(base), BLOCK):
        chunk = base[i:i + BLOCK]
        np.minimum(out, (chunk[:, None] * _A[None, :]
                         + _B[None, :]).min(axis=0), out=out)
    return out


def _mix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (deterministic numpy mixing hash;
    uint64 wraparound is the intended modular arithmetic)."""
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _band_hashes(sigs: np.ndarray) -> np.ndarray:
    """(n_docs, 64) signature matrix -> (n_docs, 16) band hashes in ONE
    vectorized pass (absorb each band row through splitmix64), replacing
    16 per-doc blake2b calls. Only identical band tuples collide by
    construction-order absorption; spurious 64-bit collisions merely add
    candidates that exact verification removes."""
    b = sigs.reshape(len(sigs), _N_BANDS, _N_PERM // _N_BANDS)
    h = np.full((len(sigs), _N_BANDS), np.uint64(0x9E3779B97F4A7C15))
    # salt with the band index so band b's hash space is independent
    h ^= np.arange(_N_BANDS, dtype=np.uint64)[None, :]
    for r in range(b.shape[2]):
        h = _mix64(h ^ b[:, :, r])
    return h >> np.uint64(1)  # int64-positive


class MinHashBands:
    """map_batches stage: text -> exploded (band_id, band_hash, doc_id).

    Signatures are per-doc (variable-length shingle sets) with the inner
    math vectorized; band hashing is one numpy pass over the whole
    batch's stacked signature matrix (no per-doc hashlib calls)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        ids = batch.column(self.id_col)
        n = batch.num_rows
        if not n:
            return pa.table({"band_id": pa.array([], pa.int32()),
                             "band_hash": pa.array([], pa.int64()),
                             self.id_col: pa.array([], ids.type)})
        sigs = np.stack([minhash_signature(t) for t in texts])
        bh = _band_hashes(sigs)  # (n, 16)
        band_ids = np.tile(np.arange(_N_BANDS, dtype=np.int32), n)
        idx = np.repeat(np.arange(n, dtype=np.int64), _N_BANDS)
        return pa.table({"band_id": pa.array(band_ids),
                         "band_hash": pa.array(
                             bh.reshape(-1).astype(np.int64)),
                         self.id_col: ids.take(pa.array(idx))})


from .shuffle import _cpus
from .shuffle import coarse_mask as _coarse_mask_fn
from .shuffle import num_join_partitions as _num_join_partitions


def _bundle_batch_size(ds) -> int:
    """Map batch size ~= rows/(2*cpus), capped: keeps compute parallel
    while collapsing the block count the downstream shuffle sees (Ray's
    sort-shuffle pays per-block overhead that dwarfs tiny blocks), and
    the 64k cap bounds per-task memory for text-materializing stages.
    (ds.count() on a parquet-backed dataset is a metadata read.)"""
    return min(65536, max(256, -(-ds.count() // (2 * _cpus()))))


def _dedup_candidate_pairs(cand, nparts: int, cmask: int):
    """Globally dedup an (id_a, id_b) candidate Dataset.

    A pair surfaced by several buckets/bands lands in different coarse
    groups upstream, so per-group drop_duplicates can't see the copies;
    one more coarse shuffle keyed on a mix of BOTH ids makes every copy
    co-resident. The pre-shuffle repartition to the join fan-out is
    scale-safe (16 B/row payload) and collapses per-block overhead."""

    def add_pair_key(b: pa.Table) -> pa.Table:
        # upstream pandas map_groups blocks carry pandas schema
        # metadata, which is unhashable here and would force the vkey
        # aggregate's concat onto the slow unify_schemas path
        b = strip_schema_metadata(b)
        ia = b.column("id_a").to_numpy(zero_copy_only=False).astype(np.uint64)
        ib = b.column("id_b").to_numpy(zero_copy_only=False).astype(np.uint64)
        mix = (ia * np.uint64(0x9E3779B97F4A7C15)) ^ ib
        return b.append_column(
            "vkey", pa.array((mix & np.uint64(cmask)).astype(np.int32)))

    def dedup_pairs_group(g: pd.DataFrame) -> pa.Table:
        out = g.drop_duplicates(subset=["id_a", "id_b"])
        # typed Arrow out: these blocks feed _join_pair_payload's hash
        # joins; a pandas block converts there WITH (unhashable) pandas
        # schema metadata, forcing unify_schemas off its fast path
        return pa.table({"id_a": pa.array(out["id_a"], pa.int64()),
                         "id_b": pa.array(out["id_b"], pa.int64())})

    return (cand.repartition(nparts)
            .map_batches(add_pair_key, batch_format="pyarrow")
            .groupby("vkey").map_groups(dedup_pairs_group,
                                        batch_format="pandas"))


def _join_pair_payload(uniq, payload_ds, nparts: int, id_col: str,
                       payload_col: str):
    """Double hash-join of a deduped (id_a, id_b) pair Dataset against a
    per-doc payload table (id_col, payload_col) — the de-drivered verify
    shape: each join is one keyed shuffle, the payload is bytes-per-doc,
    and nothing corpus-sized ever touches the driver. Output rows carry
    the a-side payload as f"{payload_col}_a" and the b-side under the
    original name."""

    def rename_a(b: pa.Table) -> pa.Table:
        return b.rename_columns(
            [f"{payload_col}_a" if c == payload_col else c
             for c in b.column_names])

    from .shuffle import join_aggregator_args
    agg = join_aggregator_args(nparts)
    return (uniq.join(payload_ds, "inner", nparts, on=("id_a",),
                      right_on=(id_col,), aggregator_ray_remote_args=agg)
            .map_batches(rename_a, batch_format="pyarrow")
            .join(payload_ds, "inner", nparts, on=("id_b",),
                  right_on=(id_col,), aggregator_ray_remote_args=agg))


def _collect_verify_payload(uniq, ds, payload_stage, id_col: str,
                            payload_col: str, batch_size: int):
    """Driver-side verification feeder for a deduped candidate-pair
    Dataset: collect the pair table (result-sized — the same contract
    as the caller's return value, which is also driver-collected),
    broadcast its sorted unique doc ids, stream the corpus ONCE
    filtering to candidate docs BEFORE the expensive payload compute,
    and collect the O(candidate-docs) payload rows. Replaces two
    corpus-wide hash joins with one streamed filter pass; the join path
    (_join_pair_payload) remains for candidate sets too large to
    collect (pass verify="join")."""
    import ray

    pairs = uniq.to_pandas()
    if not len(pairs):
        return pairs, {}
    ids = np.unique(np.concatenate([pairs["id_a"].to_numpy(),
                                    pairs["id_b"].to_numpy()]))
    idref = ray.put(ids)

    def filter_ids(b: pa.Table) -> pa.Table:
        want = ray.get(idref) if isinstance(idref, ray.ObjectRef) else idref
        k = b.column(id_col).to_numpy(zero_copy_only=False)
        pos = np.searchsorted(want, k)
        ok = (pos < len(want)) & (want[np.clip(pos, 0, len(want) - 1)] == k)
        return b.filter(pa.array(ok))

    fds = (ds.map_batches(filter_ids, batch_format="pyarrow",
                          batch_size=batch_size)
           .map_batches(payload_stage, batch_format="pyarrow",
                        batch_size=batch_size))
    payload: dict = {}
    for t in ray.get(fds.to_arrow_refs()):
        # zero-row input blocks can pass through with the input schema
        if not t.num_rows or payload_col not in t.column_names:
            continue
        for did, val in zip(t.column(id_col).to_pylist(),
                            t.column(payload_col).to_pylist()):
            payload[did] = val
    return pairs, payload


def _pairs_result(out, schema: list[tuple[str, pa.DataType]]) -> pa.Table:
    """Driver tail for a verified-pair Dataset (tiny by construction):
    collect, drop cross-batch duplicate pairs, sort by (id_a, id_b)."""
    df = out.to_pandas()
    if not len(df):
        return pa.table({c: pa.array([], t) for c, t in schema})
    df = (df.drop_duplicates(["id_a", "id_b"])
          .sort_values(["id_a", "id_b"], ignore_index=True))
    return pa.table({c: pa.array(df[c], t) for c, t in schema})


class ShingleBytes:
    """map_batches stage: text -> (id, sh) where sh is the document's
    sorted distinct shingle-hash set as raw uint64 bytes (large_binary —
    fixed 8 B/shingle, join-shippable; Arrow joins reject list columns
    as payload)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, b: pa.Table) -> pa.Table:
        texts = b.column(self.text_col).to_pylist()
        sh = [_shingle_hashes(t).tobytes() for t in texts]
        return pa.table({self.id_col: b.column(self.id_col),
                         "sh": pa.array(sh, pa.large_binary())})


_VERIFY_COLLECT_MAX_PAIRS = 2_000_000  # ~32 MB of (id_a, id_b) rows
# collect also pulls every DISTINCT candidate doc's shingle bytes onto
# the driver (~KBs per doc) — a corpus of 1M small pairwise-dup docs
# passes the pair bound while needing GBs of shingles (measured: 5.5 GB
# driver RSS on the 1M-doc soak), so auto bounds docs independently
_VERIFY_COLLECT_MAX_DOCS = 150_000


def minhash_dedup_pairs(ds, threshold: float = 0.8, text_col: str = "text",
                        id_col: str = "doc_id", verify: str = "auto"):
    """Dataset -> verified near-dup pairs (id_a < id_b, jaccard >= thr).

    LSH bucket join: groupby (band_id, band_hash); only bucket members
    pair up. Verification (verify=):
    - "auto" (default): count the deduped candidate pairs AND their
      distinct docs (both cheap — the pair table is needed either way)
      and pick "collect" only below _VERIFY_COLLECT_MAX_PAIRS pairs
      and _VERIFY_COLLECT_MAX_DOCS docs, "join" otherwise — the driver
      never holds an unbounded candidate set (or its per-doc shingle
      payload) just because a caller trusted a default.
    - "collect": collect the DEDUPED candidate-pair table onto the
      driver, stream the corpus once filtering to candidate docs before
      shingling, and verify vectorized on the driver. One shuffle + one
      streamed pass. NOTE: the collected table is CANDIDATE-sized, not
      result-sized — it still contains LSH false positives that fail
      verification (post-band-dedup this is usually within a small
      factor of the result, but adversarial corpora can inflate it).
    - "join": distributed double hash-join of the candidate-pair table
      against the corpus shingle table — nothing pair-proportional on
      the driver until the final result; for corpora whose candidate
      set exceeds driver memory."""
    bands_bs = _bundle_batch_size(ds)
    bands = ds.map_batches(MinHashBands(text_col, id_col),
                           batch_format="pyarrow", batch_size=bands_bs)

    # Shuffle by a COARSE key (cluster-scaled bucket count), not per LSH
    # bucket: Ray's per-group overhead is ruinous at ~1e5 tiny groups,
    # so each coarse group handles ~hundreds of LSH buckets with a
    # vectorized pandas groupby + triu pair expansion inside one task.
    cmask = _coarse_mask_fn()

    def add_coarse(b: pa.Table) -> pa.Table:
        bh = b.column("band_hash").to_numpy(zero_copy_only=False)
        return b.append_column(
            "pkey", pa.array((bh & cmask).astype(np.int32)))

    def pairs_in_group(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, sub in g.groupby(["band_id", "band_hash"], sort=False):
            ids = sub[id_col].to_numpy()
            if len(ids) < 2:
                continue
            ids = np.sort(ids)
            ii, jj = np.triu_indices(len(ids), k=1)
            out_a.append(ids[ii])
            out_b.append(ids[jj])
        if not out_a:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64")})
        return pd.DataFrame({
            "id_a": np.concatenate(out_a),
            "id_b": np.concatenate(out_b)}).drop_duplicates()

    cand = (bands.map_batches(add_coarse, batch_format="pyarrow")
            .groupby("pkey").map_groups(pairs_in_group,
                                        batch_format="pandas"))

    # Dedup candidate pairs BEFORE the shingle joins: an exact-duplicate
    # cluster collides in ALL bands, a ~bands-fold join/verify payload
    # multiplier without this stage.
    nparts = _num_join_partitions()
    uniq = _dedup_candidate_pairs(cand, nparts, cmask)
    schema = [("id_a", pa.int64()), ("id_b", pa.int64()),
              ("jaccard", pa.float64())]

    if verify == "auto":
        # materialize once (16 B/row pairs — object-store resident, not
        # driver memory) so the counts don't re-run the LSH shuffle
        uniq = uniq.materialize()
        if uniq.count() > _VERIFY_COLLECT_MAX_PAIRS:
            verify = "join"
        else:
            # distinct candidate docs bound the collect path's driver
            # shingle payload; the pair table is <=2M rows here, so
            # this distinct count is a trivial aggregate
            def _pair_ids(b: pa.Table) -> pa.Table:
                import pyarrow.compute as _pc
                ids = _pc.unique(pa.concat_arrays(
                    [b.column("id_a").combine_chunks(),
                     b.column("id_b").combine_chunks()]))
                return pa.table({"cid": ids})

            n_docs = (uniq.map_batches(_pair_ids, batch_format="pyarrow")
                      .groupby("cid").count().count())
            verify = ("collect" if n_docs <= _VERIFY_COLLECT_MAX_DOCS
                      else "join")

    def _jaccard(ra: bytes, rb: bytes) -> float:
        sa = np.frombuffer(ra, np.uint64)
        sb = np.frombuffer(rb, np.uint64)
        inter = len(np.intersect1d(sa, sb, assume_unique=True))
        return inter / (len(sa) + len(sb) - inter) if inter else 0.0

    if verify == "collect":
        pairs, sh_map = _collect_verify_payload(
            uniq, ds, ShingleBytes(text_col, id_col), id_col, "sh",
            bands_bs)
        if not len(pairs):
            return pa.table({c: pa.array([], t) for c, t in schema})
        # candidate sets are CANDIDATE-sized (LSH false positives):
        # verify them in a parallel map_batches over the pair table
        # with the doc→shingles map broadcast once — per-pair work is
        # a handful of numpy calls, so 32 cores beat one driver loop
        # ~8x wall at 280k candidates (same lost-broadcast-ref caveat
        # as decontam's Probe; Ray Data retries tasks itself)
        import ray
        import ray.data as rd
        sh_ref = ray.put(sh_map)
        ptbl = pa.table({
            "id_a": pa.array(pairs["id_a"].to_numpy().astype(np.int64)),
            "id_b": pa.array(pairs["id_b"].to_numpy().astype(np.int64))})
        ncpu = max(1, int(ray.cluster_resources().get("CPU", 8)))
        pds = rd.from_arrow(ptbl).repartition(2 * ncpu)

        def vbatch(b: pa.Table) -> pa.Table:
            m = ray.get(sh_ref) if isinstance(sh_ref, ray.ObjectRef) \
                else sh_ref
            ia = b.column("id_a").to_numpy(zero_copy_only=False)
            ib = b.column("id_b").to_numpy(zero_copy_only=False)
            o_a, o_b, o_j = [], [], []
            for a, b_ in zip(ia, ib):
                jac = _jaccard(m[int(a)], m[int(b_)])
                if jac >= threshold:
                    o_a.append(int(a))
                    o_b.append(int(b_))
                    o_j.append(jac)
            return pa.table({"id_a": pa.array(o_a, pa.int64()),
                             "id_b": pa.array(o_b, pa.int64()),
                             "jaccard": pa.array(o_j, pa.float64())})

        return _pairs_result(
            pds.map_batches(vbatch, batch_format="pyarrow"), schema)

    # verify == "join": distributed double-join verification.
    # materialize: the shingle table is the build side of BOTH joins —
    # without this the corpus is re-read and re-shingled per join
    sh_ds = ds.map_batches(ShingleBytes(text_col, id_col),
                           batch_format="pyarrow",
                           batch_size=bands_bs).materialize()
    j = _join_pair_payload(uniq, sh_ds, nparts, id_col, "sh")

    def verify_batch(b: pa.Table) -> pa.Table:
        ia = b.column("id_a").to_pylist()
        ib = b.column("id_b").to_pylist()
        sha = b.column("sh_a").to_pylist()
        shb = b.column("sh").to_pylist()
        o_a, o_b, o_j = [], [], []
        for a, b_, ra, rb in zip(ia, ib, sha, shb):
            jac = _jaccard(ra, rb)
            if jac >= threshold:
                o_a.append(a)
                o_b.append(b_)
                o_j.append(jac)
        return pa.table({"id_a": pa.array(o_a, pa.int64()),
                         "id_b": pa.array(o_b, pa.int64()),
                         "jaccard": pa.array(o_j, pa.float64())})

    out = j.map_batches(verify_batch, batch_format="pyarrow")
    return _pairs_result(out, schema)


# ------------------------------------- exact similarity join (AllPairs)
def _gram_hashes(text: str, n_tokens: int) -> np.ndarray:
    """Sorted distinct 64-bit hashes of the document's word n-grams.

    Tokenizer is the pinned RE2-parity one (functions.text) so the gram
    universe matches the DuckDB oracle's regexp_extract_all(text,'\\S+');
    each token gets a blake2b64, grams combine them with the same
    vectorized polynomial rolling hash as _shingle_hashes (one crypto
    hash per token, not per gram)."""
    from .text import _RE2_TOKEN_RE

    toks = _RE2_TOKEN_RE.findall(text)
    if len(toks) < n_tokens:
        return np.empty(0, np.uint64)
    th = _hash64([t.encode("utf-8") for t in toks], seed=29)
    m = len(th) - n_tokens + 1
    g = np.zeros(m, np.uint64)
    for j in range(n_tokens):
        g = g * _FNV + th[j:j + m]
    return np.unique(g)


class GramPrefix:
    """map_batches stage: text -> (gh, doc_id, set_size) rows for the
    PREFIX of each document's sorted gram-hash set only.

    AllPairs prefix filter: under any fixed global token order, two sets
    with Jaccard >= t must share a token inside both prefixes of length
    |S| - ceil(t*|S|) + 1. Hash-ascending is that order here (frequency-
    ascending would prune harder but needs a df pre-pass; at 100 TB add
    it as a first aggregate and an order-index join)."""

    def __init__(self, n_tokens: int, t_num: int, t_den: int,
                 text_col: str = "text", id_col: str = "doc_id",
                 size_ratio: int = 0):
        self.n_tokens = n_tokens
        self.t_num = t_num
        self.t_den = t_den
        self.text_col = text_col
        self.id_col = id_col
        # size_ratio > 0 switches to CONTAINMENT prefixes: the partner
        # may be up to R x smaller, so the guaranteed overlap drops to
        # ceil(t*size/R) and the prefix must grow accordingly
        self.size_ratio = size_ratio

    def __call__(self, b: pa.Table) -> pa.Table:
        ids = b.column(self.id_col).to_pylist()
        texts = b.column(self.text_col).to_pylist()
        o_gh, o_id, o_sz = [], [], []
        for doc_id, t in zip(ids, texts):
            s = _gram_hashes(t, self.n_tokens)
            size = len(s)
            if size == 0:
                continue
            if self.size_ratio:
                # containment: overlap >= ceil(t*min) >= ceil(t*size/R)
                # for BOTH sides when max <= R*min, so prefix len
                # size - ceil(t*size/R) + 1 keeps the filter lossless
                den = self.t_den * self.size_ratio
                plen = size - (self.t_num * size + den - 1) // den + 1
            else:
                # prefix len = size - ceil(t*size) + 1, t = t_num/t_den
                plen = size - (self.t_num * size + self.t_den - 1) \
                    // self.t_den + 1
            o_gh.append(s[:plen])
            o_id.append(np.full(plen, doc_id, np.int64))
            o_sz.append(np.full(plen, size, np.int64))
        if not o_gh:
            return pa.table({"gh": pa.array([], pa.uint64()),
                             self.id_col: pa.array([], pa.int64()),
                             "set_size": pa.array([], pa.int64())})
        return pa.table({"gh": pa.array(np.concatenate(o_gh)),
                         self.id_col: pa.array(np.concatenate(o_id)),
                         "set_size": pa.array(np.concatenate(o_sz))})


def _pairs_from_prefix_group(g: pd.DataFrame, id_col: str):
    """All intra-gram candidate pairs of one coarse prefix bucket,
    fully vectorized: sort by (gh, id), find gram-group boundaries,
    then a two-level repeat/arange triangular expansion emits every
    (i < j) pair — no Python iteration over the millions of size-1/
    size-2 gram groups a near-dup corpus produces (the per-gram
    pandas groupby loop this replaces was 6x the whole MinHash
    pipeline on a 200k-doc twin corpus). Returns flat
    (ids_a, ids_b, size_a, size_b); ids ascend within each pair
    because ids sort within a gram group and a doc emits a gram at
    most once."""
    gh = g["gh"].to_numpy()
    ids = g[id_col].to_numpy()
    szs = g["set_size"].to_numpy()
    order = np.lexsort((ids, gh))
    gh, ids, szs = gh[order], ids[order], szs[order]
    new = np.r_[True, gh[1:] != gh[:-1]] if len(gh) else \
        np.empty(0, bool)
    starts = np.flatnonzero(new)
    c = np.diff(np.r_[starts, len(gh)])
    keep = c >= 2
    starts, c = starts[keep], c[keep]
    empty = np.empty(0, np.int64)
    if not len(c):
        return empty, empty, empty, empty
    c1 = c - 1
    gi = np.repeat(np.arange(len(c)), c1)
    i_val = np.arange(int(c1.sum())) - np.repeat(
        np.cumsum(c1) - c1, c1)
    k = c[gi] - 1 - i_val
    p = np.repeat(np.arange(len(k)), k)
    j_off = np.arange(int(k.sum())) - np.repeat(np.cumsum(k) - k, k)
    a_idx = starts[gi[p]] + i_val[p]
    b_idx = a_idx + 1 + j_off
    return ids[a_idx], ids[b_idx], szs[a_idx], szs[b_idx]


class GramSetBytes:
    """map_batches stage: text -> (id, gs) with the FULL sorted gram-hash
    set as raw uint64 bytes (join payload, same trick as ShingleBytes)."""

    def __init__(self, n_tokens: int, text_col: str = "text",
                 id_col: str = "doc_id"):
        self.n_tokens = n_tokens
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, b: pa.Table) -> pa.Table:
        texts = b.column(self.text_col).to_pylist()
        gs = [_gram_hashes(t, self.n_tokens).tobytes() for t in texts]
        return pa.table({self.id_col: b.column(self.id_col),
                         "gs": pa.array(gs, pa.large_binary())})


def jaccard_join_exact(ds, t_num: int = 1, t_den: int = 2,
                       n_tokens: int = 5, text_col: str = "text",
                       id_col: str = "doc_id"):
    """EXACT all-pairs similarity join: pairs (id_a < id_b) whose word
    n-gram sets have Jaccard >= t_num/t_den, plus the exact intersection
    and union sizes (ints — the threshold test is integer-exact:
    t_den * |inter| >= t_num * |union|).

    The exact complement of minhash_dedup_pairs: same three-stage shape
    (candidate generation -> pair dedup -> join-verify), but candidates
    come from the lossless AllPairs prefix filter instead of LSH, so
    recall is 1 by construction. Shuffles move (gh, id, size) prefix
    rows and 8 B/gram set payloads; nothing corpus-sized on the driver.
    """
    assert 0 < t_num <= t_den

    def pair_filter(lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
        # length filter: J <= min/max, so need
        # t_den * min_size >= t_num * max_size
        return t_den * lo >= t_num * hi

    def verify_pair(sa: np.ndarray, sb: np.ndarray):
        inter = len(np.intersect1d(sa, sb, assume_unique=True))
        union = len(sa) + len(sb) - inter
        if t_den * inter >= t_num * union and union > 0:
            return (inter, union)
        return None

    return _allpairs_verified(
        ds, GramPrefix(n_tokens, t_num, t_den, text_col, id_col),
        pair_filter, verify_pair,
        [("n_inter", pa.int64()), ("n_union", pa.int64())],
        n_tokens, text_col, id_col)


def containment_join_exact(ds, t_num: int = 4, t_den: int = 5,
                           size_ratio: int = 2, n_tokens: int = 5,
                           text_col: str = "text",
                           id_col: str = "doc_id"):
    """EXACT all-pairs CONTAINMENT join: pairs (id_a < id_b) whose word
    n-gram sets satisfy |inter| >= ceil(t * min(|A|,|B|)) AND
    max(|A|,|B|) <= size_ratio * min(|A|,|B|) — the asymmetric near-dup
    predicate behind quote/boilerplate/prefix-copy detection, where a
    small doc is mostly CONTAINED in a bigger one but their Jaccard is
    diluted by the size gap. Returns exact integer (n_inter, min_size,
    max_size) so the threshold test is integer-exact.

    Same three-stage shape as jaccard_join_exact (prefix candidates ->
    distributed pair dedup -> join-verify). Losslessness: when
    max <= R*min, the guaranteed overlap ceil(t*min) >= ceil(t*|X|/R)
    for BOTH sides, so prefixes of length |X| - ceil(t*|X|/R) + 1
    (GramPrefix size_ratio mode) must intersect for every qualifying
    pair. The bounded size ratio is part of the declared predicate —
    without it no prefix bound exists (a 3-gram doc contained in a
    1e6-gram doc would force full-set indexing); R=2 covers the
    near-dup regime this operator exists for. Shuffles move prefix
    rows and 8 B/gram payloads; nothing corpus-sized on the driver."""
    assert 0 < t_num <= t_den and size_ratio >= 1

    def pair_filter(lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
        return hi <= size_ratio * lo

    def verify_pair(sa: np.ndarray, sb: np.ndarray):
        lo = min(len(sa), len(sb))
        hi = max(len(sa), len(sb))
        if lo == 0 or hi > size_ratio * lo:
            return None
        inter = len(np.intersect1d(sa, sb, assume_unique=True))
        # |inter| >= ceil(t*lo)  <=>  t_den*inter >= t_num*lo
        # (inter is an int: den*inter >= num*lo iff
        #  inter >= num*lo/den iff inter >= ceil(num*lo/den))
        if t_den * inter >= t_num * lo:
            return (inter, lo, hi)
        return None

    return _allpairs_verified(
        ds, GramPrefix(n_tokens, t_num, t_den, text_col, id_col,
                       size_ratio=size_ratio),
        pair_filter, verify_pair,
        [("n_inter", pa.int64()), ("min_size", pa.int64()),
         ("max_size", pa.int64())],
        n_tokens, text_col, id_col)


def _allpairs_verified(ds, prefix_stage, pair_filter, verify_pair,
                       out_cols, n_tokens, text_col, id_col):
    """Shared three-stage AllPairs shape for the exact gram-set joins
    (jaccard_join_exact / containment_join_exact): prefix candidates
    (coarse gram-key buckets, vectorized triangular expansion, the
    caller's (min_size, max_size) pair_filter) -> distributed pair
    dedup -> double hash-join verify on gram-set payloads, where
    verify_pair(sa, sb) returns the extra output tuple or None.
    Shuffles move prefix rows and 8 B/gram payloads; nothing
    corpus-sized on the driver."""
    bs = _bundle_batch_size(ds)
    prefix = ds.map_batches(prefix_stage, batch_format="pyarrow",
                            batch_size=bs)

    cmask = _coarse_mask_fn()

    def add_coarse(b: pa.Table) -> pa.Table:
        gh = b.column("gh").to_numpy(zero_copy_only=False)
        return b.append_column(
            "pkey", pa.array((gh & np.uint64(cmask)).astype(np.int32)))

    def pairs_in_group(g: pd.DataFrame) -> pd.DataFrame:
        ia, ib, sa, sb = _pairs_from_prefix_group(g, id_col)
        keep = pair_filter(np.minimum(sa, sb), np.maximum(sa, sb))
        return pd.DataFrame({
            "id_a": ia[keep].astype(np.int64),
            "id_b": ib[keep].astype(np.int64)}).drop_duplicates()

    cand = (prefix.map_batches(add_coarse, batch_format="pyarrow")
            .groupby("pkey").map_groups(pairs_in_group,
                                        batch_format="pandas"))

    # global pair dedup before the verify joins (a pair can share many
    # prefix grams landing in different coarse buckets)
    nparts = _num_join_partitions()
    uniq = _dedup_candidate_pairs(cand, nparts, cmask)

    gs_ds = ds.map_batches(GramSetBytes(n_tokens, text_col, id_col),
                           batch_format="pyarrow",
                           batch_size=bs).materialize()
    j = _join_pair_payload(uniq, gs_ds, nparts, id_col, "gs")

    names = [c for c, _ in out_cols]
    types = [t for _, t in out_cols]

    def verify(b: pa.Table) -> pa.Table:
        ia = b.column("id_a").to_pylist()
        ib = b.column("id_b").to_pylist()
        ga = b.column("gs_a").to_pylist()
        gb = b.column("gs").to_pylist()
        o_a, o_b = [], []
        extra = [[] for _ in names]
        for a, b_, ra, rb in zip(ia, ib, ga, gb):
            row = verify_pair(np.frombuffer(ra, np.uint64),
                              np.frombuffer(rb, np.uint64))
            if row is None:
                continue
            o_a.append(a)
            o_b.append(b_)
            for lst, v in zip(extra, row):
                lst.append(v)
        cols = {"id_a": pa.array(o_a, pa.int64()),
                "id_b": pa.array(o_b, pa.int64())}
        for name, typ, lst in zip(names, types, extra):
            cols[name] = pa.array(lst, typ)
        return pa.table(cols)

    out = j.map_batches(verify, batch_format="pyarrow")
    return _pairs_result(out, [("id_a", pa.int64()),
                               ("id_b", pa.int64())] + out_cols)


# ----------------------------------------------- connected components
def label_propagation_clusters(pairs, max_iters: int = 64):
    """Distributed connected components over near-dup pairs via min-label
    propagation WITH pointer jumping: each round every node takes the
    min of its own label, its neighbors' labels, and its label's label
    (the classic doubling shortcut), until the label sum stops
    decreasing. Pointer jumping makes convergence O(log diameter)
    rounds, so a 1e6-hop duplicate chain needs ~20 rounds, not 1e6;
    exhausting ``max_iters`` RAISES rather than silently returning a
    partially-merged clustering. Every step is a keyed Ray Data shuffle
    — no driver-side union-find.

    Each round is TWO coarse-bucket sort-shuffles (the repo's bucketed
    hash-join pattern): one tagged union routes edge probes, label
    builds and jump probes to the bucket owning the looked-up key, a
    vectorized in-bucket merge resolves them, and a second bucket pass
    takes the per-node min. No per-round hash-join aggregator actor
    pools — those cost seconds per round in long-lived sessions.

    ``pairs``: Dataset or pa.Table with int64 id_a < id_b columns.
    Returns pa.Table (doc_id, cluster_id = min doc id in its component),
    one row per doc appearing in any pair, sorted by doc_id — the same
    contract as a driver union-find.
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    if isinstance(pairs, pa.Table):
        pairs_ds = rd.from_arrow(pairs.select(["id_a", "id_b"]))
        n_pairs = pairs.num_rows
    else:
        pairs_ds = pairs.select_columns(["id_a", "id_b"])
        n_pairs = None
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "cluster_id": pa.array([], pa.int64())})
    if n_pairs == 0:
        return empty

    def to_edges(b: pa.Table) -> pa.Table:
        a = b.column("id_a").to_numpy(zero_copy_only=False)
        c = b.column("id_b").to_numpy(zero_copy_only=False)
        return pa.table({"node": pa.array(np.concatenate([a, c])),
                         "nbr": pa.array(np.concatenate([c, a]))})

    edges = pairs_ds.map_batches(to_edges,
                                 batch_format="pyarrow").materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return empty
    # bucket count scales with the (LSH-pruned) graph, capped by the
    # cluster-scaled coarse mask: tiny graphs get few buckets (per-group
    # overhead), huge ones get the full fan-out
    bmask = min(_coarse_mask_fn(),
                max(1, (1 << max(0, (n_edges // 4096)).bit_length()) - 1))

    def self_label(b: pa.Table) -> pa.Table:
        return pa.table({"node": b.column("node"),
                         "label": b.column("node")})

    def min_per_node(g: pd.DataFrame) -> pa.Table:
        # arrow return (not DataFrame): pandas-converted blocks carry
        # schema metadata that is unhashable in this pyarrow build and
        # would push every later round's concat onto the slow
        # unify_schemas path (see arrowio.table_from_pandas)
        m = g.groupby("node", as_index=False)["label"].min()
        return pa.table({"node": pa.array(m["node"].to_numpy()),
                         "label": pa.array(m["label"].to_numpy())})

    def add_nkey(b: pa.Table) -> pa.Table:
        n_ = b.column("node").to_numpy(zero_copy_only=False)
        return b.append_column(
            "nkey", pa.array((n_ & bmask).astype(np.int32)))

    labels = (edges.map_batches(self_label, batch_format="pyarrow")
              .map_batches(add_nkey, batch_format="pyarrow")
              .groupby("nkey").map_groups(min_per_node,
                                          batch_format="pandas")
              .materialize())
    prev_sum = labels.aggregate(Sum("label"))["sum(label)"]

    # tagged rows for the lookup shuffle: key = the node whose label is
    # needed, kind 1 = label build (val = label), kind 0/2 = probes
    # (val = the node that receives the looked-up label)
    def edge_probe(b: pa.Table) -> pa.Table:
        k = b.column("nbr").to_numpy(zero_copy_only=False)
        return pa.table({
            "key": pa.array(k), "kind": pa.array(
                np.zeros(len(k), np.int8)),
            "val": b.column("node"),
            "pkey": pa.array((k & bmask).astype(np.int32))})

    def label_build(b: pa.Table) -> pa.Table:
        k = b.column("node").to_numpy(zero_copy_only=False)
        return pa.table({
            "key": pa.array(k), "kind": pa.array(np.ones(len(k), np.int8)),
            "val": b.column("label"),
            "pkey": pa.array((k & bmask).astype(np.int32))})

    def jump_probe(b: pa.Table) -> pa.Table:
        k = b.column("label").to_numpy(zero_copy_only=False)
        return pa.table({
            "key": pa.array(k), "kind": pa.array(
                np.full(len(k), 2, np.int8)),
            "val": b.column("node"),
            "pkey": pa.array((k & bmask).astype(np.int32))})

    def bucket_merge(g: pd.DataFrame) -> pd.DataFrame:
        build = g[g["kind"] == 1]
        lut = pd.Series(build["val"].to_numpy(),
                        index=build["key"].to_numpy())
        probes = g[g["kind"] != 1]
        lab = lut.reindex(probes["key"].to_numpy()).to_numpy()
        # every probed key is a node (edge endpoint or current label),
        # and every node has a build row in its own bucket. Arrow
        # return keeps the block schema metadata-free (hashable) for
        # the next round's unions/concats.
        return pa.table({
            "node": pa.array(np.concatenate([probes["val"].to_numpy(),
                                             build["key"].to_numpy()])),
            "label": pa.array(np.concatenate([lab.astype(np.int64),
                                              build["val"].to_numpy()]))})

    # the edge-probe table depends only on the static edge set — build
    # it once, not once per round
    eprobes = edges.map_batches(edge_probe,
                                batch_format="pyarrow").materialize()

    converged = False
    for _ in range(max_iters):
        cand = (eprobes
                .union(labels.map_batches(label_build,
                                          batch_format="pyarrow"))
                .union(labels.map_batches(jump_probe,
                                          batch_format="pyarrow"))
                .groupby("pkey").map_groups(bucket_merge,
                                            batch_format="pandas"))
        labels = (cand.map_batches(add_nkey, batch_format="pyarrow")
                  .groupby("nkey").map_groups(min_per_node,
                                              batch_format="pandas")
                  .materialize())
        cur_sum = labels.aggregate(Sum("label"))["sum(label)"]
        # min-propagation labels only decrease; an unchanged sum is an
        # unchanged labelling (cheap scalar fixpoint test, no diff join)
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        raise RuntimeError(
            f"label propagation did not converge in {max_iters} rounds "
            "— with pointer jumping this needs a component of diameter "
            f"> 2^{max_iters}; raise max_iters")

    df = labels.to_pandas().sort_values("node", ignore_index=True)
    return pa.table({"doc_id": pa.array(df["node"], pa.int64()),
                     "cluster_id": pa.array(df["label"], pa.int64())})


def _min_label_cc(u: np.ndarray, v: np.ndarray):
    """In-memory exact connected components over edge arrays (int64):
    vectorized min-label iteration with pointer jumping. Returns
    (nodes, labels) — sorted distinct node ids and, per node, the min
    node id of its component. O((E+V) log V) worst case, all numpy."""
    nodes, inv = np.unique(np.concatenate([u, v]), return_inverse=True)
    iu, iv = inv[:len(u)], inv[len(u):]
    lab = np.arange(len(nodes), dtype=np.int64)
    while True:
        nxt = lab.copy()
        # nodes are sorted ascending, so min INDEX == min node id
        np.minimum.at(nxt, iu, lab[iv])
        np.minimum.at(nxt, iv, lab[iu])
        nxt = np.minimum(nxt, nxt[nxt])     # pointer jump (doubling)
        nxt = np.minimum(nxt, nxt[nxt])
        if np.array_equal(nxt, lab):
            break
        lab = nxt
    return nodes, nodes[lab]


def filtered_components(pairs, driver_edge_budget: int = 4_000_000,
                        max_passes: int = 8):
    """Connected components via filtering-contraction (the MapReduce
    "filtering" method of Lattanzi et al., SPAA'11), tuned for graphs
    whose NODE set is bounded (catalog dimensions, cluster reps) while
    the EDGE set is corpus-derived.

    Each pass is ONE coarse shuffle — vs TWO per round (of O(log
    diameter) rounds) for label_propagation_clusters: edges land in a
    bucket by a mixed hash of the pair, each bucket computes its local
    components fully vectorized in memory (_min_label_cc), and emits
    only the component STAR edges (local-min root -> node). The union
    of per-bucket stars preserves global connectivity (an edge dropped
    in a bucket has both endpoints connected through that bucket's
    star), and every node survives a pass (a node arrives via an edge,
    so its bucket-local component has >= 2 nodes and the star covers
    it). A pass emits <= sum over buckets of each bucket's distinct
    vertex count — strictly fewer edges than it read whenever any
    bucket holds a cycle — so the edge set shrinks geometrically
    toward the node set. Once it fits ``driver_edge_budget`` (16-byte
    rows; the default caps driver memory at ~64 MB), one driver-side
    vectorized min-label finish labels every node. Graphs still above
    budget after ``max_passes`` fall back to
    label_propagation_clusters — correctness never depends on shrink.

    Same contract as label_propagation_clusters: pa.Table
    (doc_id, cluster_id = min node id in its component), one row per
    node appearing in any pair, sorted by doc_id.
    """
    import ray.data as rd

    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "cluster_id": pa.array([], pa.int64())})
    if isinstance(pairs, pa.Table):
        if pairs.num_rows == 0:
            return empty
        ds = rd.from_arrow(pairs.select(["id_a", "id_b"]))
    else:
        ds = pairs.select_columns(["id_a", "id_b"])
    ds = ds.materialize()
    n = ds.count()
    if n == 0:
        return empty

    def _contract(ds_in, n_edges):
        # ~256k edges per bucket: big enough to find cycles, small
        # enough that a bucket's numpy CC stays in a worker's heap
        bmask = min(_coarse_mask_fn(),
                    max(1, (1 << max(0, n_edges // 262144)
                            .bit_length()) - 1))

        def add_ckey(b: pa.Table) -> pa.Table:
            a = b.column("id_a").to_numpy(
                zero_copy_only=False).astype(np.uint64)
            c = b.column("id_b").to_numpy(
                zero_copy_only=False).astype(np.uint64)
            mix = (a * np.uint64(0x9E3779B97F4A7C15)) ^ \
                  (c * np.uint64(0xC2B2AE3D27D4EB4F))
            return pa.table({
                "id_a": b.column("id_a"), "id_b": b.column("id_b"),
                "ckey": pa.array((mix & np.uint64(bmask)
                                  ).astype(np.int32))})

        def star(g: pd.DataFrame) -> pa.Table:
            u = g["id_a"].to_numpy(np.int64)
            v = g["id_b"].to_numpy(np.int64)
            nodes, labs = _min_label_cc(u, v)
            keep = nodes != labs
            # singleton local components (self-loop-only nodes) have no
            # star edge — re-emit their self-loop so the node survives
            # the pass (label_propagation_clusters keeps such nodes,
            # and the two finish paths must agree)
            roots, counts = np.unique(labs, return_counts=True)
            singles = roots[counts == 1]
            # root = local component min, so id_a <= id_b is preserved
            return pa.table({
                "id_a": pa.array(np.concatenate([labs[keep], singles])),
                "id_b": pa.array(np.concatenate([nodes[keep],
                                                 singles]))})

        return (ds_in.map_batches(add_ckey, batch_format="pyarrow")
                .groupby("ckey").map_groups(star, batch_format="pandas")
                .materialize())

    for _ in range(max_passes):
        if n <= driver_edge_budget:
            break
        contracted = _contract(ds, n)
        prev = n
        ds, n = contracted, contracted.count()
        if n >= prev:    # already a forest per bucket; no further shrink
            break
    if n > driver_edge_budget:
        return label_propagation_clusters(ds)

    edf = ds.to_pandas()
    nodes, labs = _min_label_cc(edf["id_a"].to_numpy(np.int64),
                                edf["id_b"].to_numpy(np.int64))
    return pa.table({"doc_id": pa.array(nodes),
                     "cluster_id": pa.array(labs)})


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


_POP8 = np.array([bin(i).count("1") for i in range(256)], np.uint8)


def _popcount64(a: np.ndarray) -> np.ndarray:
    """Per-element popcount of a uint64 array (numpy<2 has no
    bitwise_count): byte-view + 256-entry LUT, summed per 8 bytes."""
    return _POP8[a.view(np.uint8).reshape(len(a), 8)].sum(
        axis=1).astype(np.int64)


def simhash_pairs(ds, max_hamming: int = 3, text_col: str = "text",
                  id_col: str = "doc_id"):
    """Dataset -> SimHash near-dup pairs (id_a < id_b,
    hamming(simhash) <= max_hamming), complete by pigeonhole: <=3
    differing bits across the 4x16-bit bands leave at least one band
    intact, so banded blocking has recall 1 for the default radius.
    Same coarse-key bucket shuffle as the MinHash path; fingerprints
    ride along with the band rows so verification needs no second join.
    """
    st = ds.map_batches(SimHashStage(text_col), batch_format="pyarrow")

    def explode(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy(zero_copy_only=False)
        sh = b.column("simhash").to_numpy(zero_copy_only=False)
        n = len(ids)
        o_band = np.repeat(np.arange(4, dtype=np.int8), n)
        o_val = np.concatenate([
            b.column(f"sim_band{t}").to_numpy(zero_copy_only=False)
            for t in range(4)])
        return pa.table({
            "band": pa.array(o_band),
            "bval": pa.array(o_val.astype(np.int32)),
            id_col: pa.array(np.tile(ids, 4)),
            "simhash": pa.array(np.tile(sh, 4))})

    cmask = _coarse_mask_fn()

    def add_coarse(b: pa.Table) -> pa.Table:
        bv = b.column("bval").to_numpy(zero_copy_only=False).astype(np.int64)
        bd = b.column("band").to_numpy(zero_copy_only=False).astype(np.int64)
        return b.append_column(
            "pkey", pa.array(((bv * 4 + bd) & cmask).astype(np.int32)))

    def pairs_in_group(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_ha, out_hb = [], [], [], []
        for _, sub in g.groupby(["band", "bval"], sort=False):
            if len(sub) < 2:
                continue
            order = np.argsort(sub[id_col].to_numpy())
            ids = sub[id_col].to_numpy()[order]
            hs = sub["simhash"].to_numpy()[order]
            ii, jj = np.triu_indices(len(ids), k=1)
            out_a.append(ids[ii])
            out_b.append(ids[jj])
            out_ha.append(hs[ii])
            out_hb.append(hs[jj])
        if not out_a:
            return pd.DataFrame({
                "id_a": pd.Series([], dtype="int64"),
                "id_b": pd.Series([], dtype="int64"),
                "hamming": pd.Series([], dtype="int64")})
        a = np.concatenate(out_a)
        b_ = np.concatenate(out_b)
        ham = _popcount64(np.concatenate(out_ha).astype(np.uint64)
                          ^ np.concatenate(out_hb).astype(np.uint64))
        keep = ham <= max_hamming
        return pd.DataFrame({"id_a": a[keep], "id_b": b_[keep],
                             "hamming": ham[keep]}).drop_duplicates(
            ["id_a", "id_b"])

    out = (st.map_batches(explode, batch_format="pyarrow")
           .map_batches(add_coarse, batch_format="pyarrow")
           .groupby("pkey").map_groups(pairs_in_group,
                                       batch_format="pandas"))
    return _pairs_result(out, [("id_a", pa.int64()), ("id_b", pa.int64()),
                               ("hamming", pa.int64())])


def banded_hamming_pairs(ds, hash_col: str, id_col: str,
                         max_hamming: int = 6, n_bands: int = 8):
    """Near-dup pairs over ANY precomputed 64-bit hash column (SimHash,
    perceptual image hash, audio fingerprint): id_a < id_b with
    hamming(hash) <= max_hamming. Complete by pigeonhole for
    max_hamming <= n_bands - 1 (<= that many differing bits leave at
    least one of the n_bands equal-width bands intact). Same banded
    coarse-bucket shuffle as simhash_pairs, generalized: bands are
    sliced from the hash inside the explode stage, so callers ship only
    (id, hash)."""
    assert 64 % n_bands == 0, "band width must divide 64"
    width = 64 // n_bands
    bmask = np.uint64((1 << width) - 1)
    cmask = _coarse_mask_fn()

    def explode(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy(zero_copy_only=False)
        h = b.column(hash_col).to_numpy(zero_copy_only=False
                                        ).astype(np.uint64)
        n = len(ids)
        o_band = np.repeat(np.arange(n_bands, dtype=np.int8), n)
        o_val = np.concatenate([
            ((h >> np.uint64(t * width)) & bmask).astype(np.int64)
            for t in range(n_bands)])
        return pa.table({
            "band": pa.array(o_band),
            "bval": pa.array(o_val),
            "hid": pa.array(np.tile(ids, n_bands).astype(np.int64)),
            "hsh": pa.array(np.tile(h, n_bands).astype(np.int64))})

    def add_coarse(b: pa.Table) -> pa.Table:
        bv = b.column("bval").to_numpy(zero_copy_only=False)
        bd = b.column("band").to_numpy(zero_copy_only=False
                                       ).astype(np.int64)
        return b.append_column(
            "pkey", pa.array(
                ((bv * n_bands + bd) & cmask).astype(np.int32)))

    def pairs_in_group(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_ha, out_hb = [], [], [], []
        for _, sub in g.groupby(["band", "bval"], sort=False):
            if len(sub) < 2:
                continue
            order = np.argsort(sub["hid"].to_numpy())
            ids = sub["hid"].to_numpy()[order]
            hs = sub["hsh"].to_numpy()[order]
            ii, jj = np.triu_indices(len(ids), k=1)
            out_a.append(ids[ii])
            out_b.append(ids[jj])
            out_ha.append(hs[ii])
            out_hb.append(hs[jj])
        if not out_a:
            return pd.DataFrame({
                "id_a": pd.Series([], dtype="int64"),
                "id_b": pd.Series([], dtype="int64"),
                "hamming": pd.Series([], dtype="int64")})
        a = np.concatenate(out_a)
        b_ = np.concatenate(out_b)
        ham = _popcount64(np.concatenate(out_ha).astype(np.uint64)
                          ^ np.concatenate(out_hb).astype(np.uint64))
        keep = ham <= max_hamming
        return pd.DataFrame({"id_a": a[keep], "id_b": b_[keep],
                             "hamming": ham[keep]}).drop_duplicates(
            ["id_a", "id_b"])

    out = (ds.map_batches(explode, batch_format="pyarrow")
           .map_batches(add_coarse, batch_format="pyarrow")
           .groupby("pkey").map_groups(pairs_in_group,
                                       batch_format="pandas"))
    return _pairs_result(out, [("id_a", pa.int64()),
                               ("id_b", pa.int64()),
                               ("hamming", pa.int64())])


# ------------------------------------------------- embedding near-dup
class CosineNearDup:
    """Per-batch embedding near-dup candidates against a broadcast
    (ray.put) reference matrix; exact cosine, vectorized matmul."""

    def __init__(self, ref_matrix_ref, ref_ids, threshold: float = 0.95,
                 vec_col: str = "embedding", id_col: str = "vec_id"):
        import ray
        from .similarity import _norm_rows
        m = (ray.get(ref_matrix_ref)
             if isinstance(ref_matrix_ref, ray.ObjectRef) else ref_matrix_ref)
        self.ref = _norm_rows(np.asarray(m, dtype=np.float64))
        self.ref_ids = np.asarray(ref_ids)
        self.threshold = threshold
        self.vec_col = vec_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.vec_col)
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        vals = col.values.to_numpy(zero_copy_only=False)
        from .similarity import _norm_rows
        dim = self.ref.shape[1]
        # zero vectors normalize to zero (cosine 0 to everything)
        # instead of NaN-ing and silently dropping their pairs
        m = _norm_rows(vals.reshape(-1, dim).astype(np.float64))
        sims = m @ self.ref.T
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        ii, jj = np.nonzero(sims >= self.threshold)
        keep = ids[ii] < self.ref_ids[jj]  # no self/duplicate pairs
        return pa.table({
            "id_a": pa.array(ids[ii][keep]),
            "id_b": pa.array(self.ref_ids[jj][keep]),
            "cosine": pa.array(sims[ii, jj][keep], pa.float64())})
