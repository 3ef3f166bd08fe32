#!/usr/bin/env python
"""Soak run (VERDICT r2 item 7): the composite curation pipeline
(q_curate) end-to-end over a synthesized multi-GB documents corpus —
~1000x the sf0.1 bench table — with a deliberately SMALL object store,
so the run demonstrates the 100 TB design claims at the largest local
scale: the corpus streams (blocks are produced, consumed and freed),
nothing corpus-sized is retained, the driver does not grow.

    python tools/soak_curate.py [--replicas 1000] [--text-mult 8] \
        [--store-gb 8] [--keep-corpus]

Prints ONE JSON line: corpus size, wall time per phase, result rows,
driver RSS before/after, object-store spill stats from Ray's memory
summary. Record the result in BASELINE.md.

This script OWNS its Ray session (tools are CLI entry points; the
library and __ray_entry__ never call ray.init).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import resource
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE = "/root/testdata/sf0.1/documents.parquet"


def synthesize(out_dir: str, replicas: int, text_mult: int,
               dup_mode: str = "groups") -> dict:
    """Write replicas shards; shard r = the base 5k-doc table with
    doc_id offset r*5k and text repeated text_mult times.

    dup_mode="groups" (curate soak): EVEN replicas keep the base text
    verbatim (exact-duplicate groups of ~replicas/2 members —
    exercises the dedup leg's grouped-min at real group sizes); ODD
    replicas get a per-replica tag token appended (unique keepers).

    dup_mode="pairs" (minhash soak): each doc's text is a seeded
    random hex-token sequence keyed by (pair id r//2, base doc id), so
    replicas 2r and 2r+1 are byte-identical (jaccard 1.0) while every
    other doc pair shares essentially no shingles (the token space is
    16^6 — the base corpus's ~30-word vocabulary CANNOT be reused
    here: word-level salting leaves same-salt docs sharing nearly all
    5-byte shingles and the pair count explodes quadratically).
    Expected verified pairs = n_base * (replicas // 2), with no
    exact-dup GROUPS bigger than 2 (pair counts stay linear).

    Generation itself is a Ray pipeline: range(replicas) ->
    map_batches(build shard) -> write_parquet."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    base = pq.read_table(BASE, columns=["doc_id", "lang", "text"])
    n_base = base.num_rows
    big_text = pa.array(
        [t * text_mult for t in base.column("text").to_pylist()])
    base = pa.table({"doc_id": base.column("doc_id"),
                     "lang": base.column("lang"),
                     "text": big_text})
    bref = ray.put(base)

    def shard(batch):
        b = ray.get(bref)
        out = []
        for r in batch["id"].tolist():
            ids = pa.array(
                (b.column("doc_id").to_numpy() + r * n_base), pa.int64())
            if dup_mode == "pairs":
                n_words = 24 * max(1, text_mult)
                rng = np.random.default_rng([r // 2, n_base])
                toks = rng.integers(0, 16**6,
                                    size=(n_base, n_words))
                txt = pa.array(
                    [" ".join(format(x, "06x") for x in row)
                     for row in toks])
            elif r % 2 == 0:
                txt = b.column("text")
            else:
                txt = pa.array([f"{t} rep{r}"
                                for t in b.column("text").to_pylist()])
            out.append(pa.table({"doc_id": ids,
                                 "lang": b.column("lang"),
                                 "text": txt}))
        return pa.concat_tables(out)

    (rd.range(replicas, override_num_blocks=replicas)
       .map_batches(shard, batch_format="numpy", batch_size=1)
       .write_parquet(out_dir))
    sz = sum(os.path.getsize(os.path.join(r, f))
             for r, _, fs in os.walk(out_dir) for f in fs)
    return {"rows": replicas * n_base, "parquet_bytes": sz}


def spill_stats() -> dict:
    """Spilled/restored cumulative counts parsed from this session's
    raylet log (the grpc-backed memory_summary API is unavailable in
    this container). Raylet logs 'Spilled N MiB, M objects' lines with
    CUMULATIVE totals — the last one wins — plus the peak plasma usage
    from its periodic state dumps."""
    try:
        import ray
        logs = os.path.join(
            ray._private.worker._global_node.get_session_dir_path(), "logs")
        s = open(os.path.join(logs, "raylet.out"),
                 errors="replace").read()
    except Exception as e:  # best-effort diagnostic
        return {"error": str(e)}
    out = {"spilled_mib": 0, "restored_mib": 0}
    sp = re.findall(r"Spilled (\d+) MiB, (\d+) objects", s)
    if sp:
        out["spilled_mib"] = int(sp[-1][0])
        out["spilled_objects"] = int(sp[-1][1])
    rs = re.findall(r"Restored (\d+) MiB, (\d+) objects", s)
    if rs:
        out["restored_mib"] = int(rs[-1][0])
    used = re.findall(r"Plasma memory usage (\d+) MiB", s)
    if used:
        out["plasma_peak_mib"] = max(int(u) for u in used)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=1000)
    ap.add_argument("--text-mult", type=int, default=8)
    ap.add_argument("--store-gb", type=float, default=8.0)
    ap.add_argument("--num-cpus", type=int, default=32)
    ap.add_argument("--keep-corpus", action="store_true")
    ap.add_argument("--query",
                    choices=("curate", "minhash", "containment"),
                    default="curate")
    args = ap.parse_args()

    import ray
    ray.init(address="local", num_cpus=args.num_cpus,
             include_dashboard=False, logging_level="ERROR",
             # (ray.data logger quieted below — groupby internals emit
             # cosmetic empty-schema RefBundle warnings on empty sort
             # partitions)
             object_store_memory=int(args.store_gb * 2**30))
    import logging
    import ray.data  # noqa: F401  (its import resets the logger config)
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    corpus = tempfile.mkdtemp(prefix="gvt_soak_")
    sf_dir = os.path.join(corpus, "sf")
    os.makedirs(sf_dir)
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
    try:
        t0 = time.perf_counter()
        gen = synthesize(os.path.join(sf_dir, "documents.parquet"),
                         args.replicas, args.text_mult,
                         dup_mode=("pairs" if args.query in
                                   ("minhash", "containment")
                                   else "groups"))
        t_gen = time.perf_counter() - t0

        t1 = time.perf_counter()
        if args.query == "minhash":
            from geojson_vt_ray import functions as _  # noqa: F401
            from geojson_vt_ray.functions.dedup import minhash_dedup_pairs
            from geojson_vt_ray.pipelines.queries import _read_pq
            ds = _read_pq(os.path.join(sf_dir, "documents.parquet"),
                          columns=["doc_id", "text"])
            pairs = minhash_dedup_pairs(ds, threshold=0.5)
            n_out = pairs.num_rows
        elif args.query == "containment":
            # byte-identical pair corpus: every (2r, 2r+1) twin has
            # containment 1.0 at ratio 1, every other pair shares
            # essentially no 5-grams -> expected = n_base*(replicas//2)
            from geojson_vt_ray import functions as _  # noqa: F401
            from geojson_vt_ray.functions.dedup import (
                containment_join_exact)
            from geojson_vt_ray.pipelines.queries import _read_pq
            ds = _read_pq(os.path.join(sf_dir, "documents.parquet"),
                          columns=["doc_id", "text"])
            pairs = containment_join_exact(ds)
            n_out = pairs.num_rows
        else:
            from geojson_vt_ray.pipelines.queries import q_curate
            out = q_curate(sf_dir)
            n_out = out.count()
        t_run = time.perf_counter() - t1

        rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
        result = {
            "soak": args.query,
            "corpus_rows": gen["rows"],
            "corpus_parquet_gb": round(gen["parquet_bytes"] / 2**30, 2),
            "object_store_gb": args.store_gb,
            "num_cpus": args.num_cpus,
            "t_synth_sec": round(t_gen, 1),
            "t_curate_sec": round(t_run, 1),
            "mb_per_sec": round(gen["parquet_bytes"] / 2**20 / t_run, 1),
            "out_rows": n_out,
            "driver_rss_mb_before": rss0,
            "driver_rss_mb_after": rss1,
            "spill": spill_stats(),
        }
        print(json.dumps(result))
        return 0
    finally:
        if not args.keep_corpus:
            shutil.rmtree(corpus, ignore_errors=True)
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
