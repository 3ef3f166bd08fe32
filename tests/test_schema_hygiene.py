"""Block-schema hygiene: no pipeline may ship blocks whose schemas are
unhashable (pandas metadata attached). In this pyarrow build
``hash(schema)`` raises ``unhashable type: 'dict'`` whenever the schema
carries metadata, which knocks Ray Data's ``unify_schemas`` dedup off
its set() fast path at EVERY downstream sort/aggregate/join concat and
logs "Failed to hash the schemas" into benchmark artifacts. Reads are
covered by ``queries._read_pq`` (fused strip after read_parquet) and
pandas-returning group UDFs by arrow returns / ``table_from_pandas``
(``arrowio.py``); this test pins the representative paths that
regressed before: plain groupby over a read (lang_counts), the
distributed sort (global_sort), pandas map_groups (funnel, sessionize,
window_events), the candidate-pair dedup shuffle (minhash_pairs,
jaccard_join, dedup_exact via curate) and label propagation
(dedup_clusters)."""

import collections

import pytest

SF_DIR = "/root/testdata/sf0.001"

# the 10 queries that emitted the warning before the fix
_QUERIES = ["lang_counts", "global_sort", "funnel", "sessionize",
            "window_events", "dedup_exact", "curate", "jaccard_join",
            "minhash_pairs", "dedup_clusters"]


def test_no_unhashable_block_schemas(ray_session):
    import ray.data as rd
    import ray.data._internal.arrow_ops.transform_pyarrow as tp
    import __ray_entry__ as e

    qs = e.queries()
    hits = collections.Counter()
    current = ["?"]
    orig = tp.unify_schemas

    def patched(schemas, **kw):
        try:
            set(schemas)
        except Exception:
            hits[current[0]] += 1
        return orig(schemas, **kw)

    tp.unify_schemas = patched
    try:
        for name in _QUERIES:
            current[0] = name
            res = qs[name](SF_DIR)
            if isinstance(res, rd.Dataset):
                res.count()
    finally:
        tp.unify_schemas = orig
    assert not hits, f"unhashable block schemas reached a concat: {dict(hits)}"
