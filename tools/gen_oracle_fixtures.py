#!/usr/bin/env python
"""Generate committed expected-output fixtures for the non-SQL queries.

For each pinned query, runs the engine at sf0.001 and sf0.01 and writes
tests/fixtures/oracle/<name>.parquet with an ``n_events`` discriminator
column (= COUNT(*) of the sf's events table — 1000 vs 10000 — the only
table whose row count differs between the two sf levels the driver
runs). The oracle SQL then reads the fixture filtered to the current
sf's event count, so one committed file serves both the local sf0.001
test harness and the driver's sf0.01 gate.

Independence: where a slow obviously-correct reimplementation exists it
is computed here and REQUIRED to equal the engine output before the
fixture is written:

- simhash:        per-token blake2b + sign-sum reimplemented scalar
- fingerprint:    Karp-Rabin rolling hash reimplemented with plain
                  python ints mod 2^64
- minhash_pairs:  brute-force exact jaccard over ALL doc pairs (no LSH)
                  at threshold 0.5 — also certifies LSH recall = 1.0 on
                  this corpus
- dedup_clusters: union-find over the brute-force pair set

langid / media_features / frame_sample / audio_features /
pyramid_tiles / pyramid_stats are deterministic single-implementation
functions; their fixtures are regression pins of the engine output.

Run: python tools/gen_oracle_fixtures.py   (owns its Ray session)
"""

from __future__ import annotations

import hashlib
import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FIX_DIR = os.path.join(REPO, "tests", "fixtures", "oracle")

PINNED = ["simhash", "fingerprint", "langid", "minhash_pairs",
          "dedup_clusters", "media_features", "frame_sample",
          "audio_features", "pyramid_tiles", "pyramid_stats"]

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def _to_table(res) -> pa.Table:
    import ray.data
    if isinstance(res, ray.data.Dataset):
        return pa.Table.from_pandas(res.to_pandas(), preserve_index=False)
    if isinstance(res, pd.DataFrame):
        return pa.Table.from_pandas(res, preserve_index=False)
    return res


# --------------------------- independent slow reimplementations
def simhash_slow(text: str) -> int:
    key = (11).to_bytes(8, "big")
    toks = text.split()
    if not toks:
        return 0
    v = [0] * 64
    for t in toks:
        h = int.from_bytes(hashlib.blake2b(
            t.encode(), digest_size=8, key=key).digest(), "big")
        for b in range(64):
            v[b] += 1 if (h >> b) & 1 else -1
    return sum(1 << b for b in range(64) if v[b] > 0)


def fingerprint_slow(text: str, window: int = 16, keep: int = 4):
    B = 1000003
    M = 1 << 64
    data = text.encode("utf-8", "ignore")
    if len(data) < window:
        h = 0
        for byte in data:
            h = (h * B + byte) % M
        return [h] * keep
    hashes = set()
    for i in range(len(data) - window + 1):
        h = 0
        for j in range(window):
            h = (h * B + data[i + j]) % M
        hashes.add(h)
    sel = sorted(hashes)[:keep]
    return sel + [0] * (keep - len(sel))


def brute_pairs(texts: dict[int, str], threshold: float) -> pd.DataFrame:
    from geojson_vt_ray.functions.dedup import _shingle_hashes
    ids = sorted(texts)
    sh = {i: _shingle_hashes(texts[i]) for i in ids}
    rows = []
    for ii, a in enumerate(ids):
        sa = sh[a]
        for b in ids[ii + 1:]:
            sb = sh[b]
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            if not inter:
                continue
            j = inter / (len(sa) + len(sb) - inter)
            if j >= threshold:
                rows.append((a, b, j))
    return pd.DataFrame(rows, columns=["id_a", "id_b", "jaccard"])


def union_find(pairs: pd.DataFrame) -> pd.DataFrame:
    parent: dict[int, int] = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(pairs["id_a"], pairs["id_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    members = sorted(set(pairs["id_a"]) | set(pairs["id_b"]))
    return pd.DataFrame({"doc_id": members,
                         "cluster_id": [find(m) for m in members]})


def main():
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from geojson_vt_ray.pipelines.queries import QUERIES

    os.makedirs(FIX_DIR, exist_ok=True)
    per_name: dict[str, list[pa.Table]] = {n: [] for n in PINNED}

    for sf_dir in SF_DIRS:
        n_events = pq.read_metadata(f"{sf_dir}/events.parquet").num_rows
        print(f"== {sf_dir} (n_events={n_events})")

        docs = pq.read_table(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"])
        texts = dict(zip(docs.column("doc_id").to_pylist(),
                         docs.column("text").to_pylist()))

        results = {}
        for name in PINNED:
            results[name] = _to_table(QUERIES[name](sf_dir))
            print(f"   {name}: {results[name].num_rows} rows")

        # --- independent checks (abort rather than pin a wrong fixture)
        sh_df = results["simhash"].to_pandas().set_index("doc_id")
        for i in sorted(texts)[::7]:  # every 7th doc: slow check
            want = simhash_slow(texts[i])
            got = int(sh_df.loc[i, "simhash"])
            assert got == want, f"simhash mismatch doc {i}"
        fp_df = results["fingerprint"].to_pandas().set_index("doc_id")
        for i in sorted(texts)[::17]:
            want = fingerprint_slow(texts[i])
            got = [int(fp_df.loc[i, f"fp{k}"]) for k in range(4)]
            assert got == want, f"fingerprint mismatch doc {i}: {got} != {want}"
        bp = brute_pairs(texts, 0.5)
        mp = results["minhash_pairs"].to_pandas()
        b_set = set(zip(bp["id_a"], bp["id_b"]))
        m_set = set(zip(mp["id_a"], mp["id_b"]))
        assert m_set <= b_set, f"false positives: {m_set - b_set}"
        missed = b_set - m_set
        assert not missed, (
            f"LSH recall < 1 on this corpus ({len(missed)} missed): "
            f"{sorted(missed)[:5]} — pin engine output knowingly or fix")
        uf = union_find(bp)
        cl = results["dedup_clusters"].to_pandas()
        assert uf.reset_index(drop=True).equals(
            cl.astype({"doc_id": int, "cluster_id": int})
            .reset_index(drop=True)), "cluster mismatch vs union-find"
        print("   independent checks: simhash, fingerprint, "
              f"minhash({len(m_set)} pairs = brute force), clusters OK")

        for name in PINNED:
            t = results[name]
            t = t.append_column(
                "n_events",
                pa.array(np.full(t.num_rows, n_events, np.int64)))
            per_name[name].append(t)

    for name, tables in per_name.items():
        out = pa.concat_tables(tables)
        path = os.path.join(FIX_DIR, f"{name}.parquet")
        pq.write_table(out, path)
        print(f"wrote {path}: {out.num_rows} rows")

    ray.shutdown()


if __name__ == "__main__":
    main()
