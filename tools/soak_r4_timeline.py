#!/usr/bin/env python
"""Round-4 user-timeline family soak: synthesize an events table
2000x the sf0.001 bench table (default 20M rows, 100k users), run the
round-4 per-user-timeline operators end-to-end, and verify against
DuckDB's window engine — FULL-output frame equality for the
enumeration-bounded ones (burstiness, run_lengths, state_dwell,
activity_coverage, session_type_pairs) and an exact checksum for the
per-user one (record_highs). Exact correctness at the largest local
scale, not a sampled spot-check.

    python tools/soak_r4_timeline.py [--rows 20000000] \
        [--users 100000] [--num-cpus 32] [--store-gb 8]

Prints ONE JSON line. Record the result in BASELINE.md.

This script OWNS its Ray session (tools are CLI entry points; the
library and __ray_entry__ never call ray.init)."""

from __future__ import annotations

import argparse
import json
import os
import resource
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from soak_windows import synthesize, spill_stats  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=20_000_000)
    ap.add_argument("--users", type=int, default=100_000)
    ap.add_argument("--num-cpus", type=int, default=32)
    ap.add_argument("--store-gb", type=float, default=8.0)
    args = ap.parse_args()

    import ray
    ray.init(address="local", num_cpus=args.num_cpus,
             include_dashboard=False, logging_level="ERROR",
             object_store_memory=int(args.store_gb * 2**30))
    import logging
    import ray.data  # noqa: F401
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    tmp = tempfile.mkdtemp(prefix="gvt_soakr4_")
    sf = os.path.join(tmp, "sf")
    os.makedirs(sf)
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
    try:
        t0 = time.perf_counter()
        synthesize(os.path.join(sf, "events.parquet"),
                   args.rows, args.users)
        t_gen = time.perf_counter() - t0

        from geojson_vt_ray.pipelines.queries import ORACLE_SQL, QUERIES

        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"'{os.path.join(sf, 'events.parquet')}/*.parquet'")

        out = {"soak": "r4_timeline", "rows": args.rows,
               "users": args.users, "num_cpus": args.num_cpus,
               "t_synth_sec": round(t_gen, 1)}

        def run(name):
            t1 = time.perf_counter()
            r = QUERIES[name](sf)
            df = r.to_pandas() if hasattr(r, "to_pandas") else r
            if isinstance(df, pa.Table):
                df = df.to_pandas()
            out[f"t_{name}_sec"] = round(time.perf_counter() - t1, 1)
            return df

        # bounded-output operators: FULL frame equality vs DuckDB
        for name, keys in (("burstiness", ["event_type"]),
                           ("run_lengths", ["event_type"]),
                           ("state_dwell", ["event_type"]),
                           ("activity_coverage", ["bucket"]),
                           ("session_type_pairs",
                            ["type_a", "type_b"])):
            got = run(name)
            want = con.execute(ORACLE_SQL[name]).fetchdf()
            if len(got) == 0 or len(want) == 0:
                # an empty Dataset result can surface with a
                # pass-through schema; both-empty is a match
                out[f"{name}_match"] = (len(got) == 0 and
                                        len(want) == 0)
                out[f"{name}_rows"] = int(len(want))
                continue
            got = got.sort_values(keys, ignore_index=True)
            want = want.sort_values(keys, ignore_index=True)
            got = got[sorted(got.columns)]
            want = want[sorted(want.columns)]
            match = True
            for c in got.columns:
                a = got[c].to_numpy()
                b = want[c].to_numpy()
                if len(a) != len(b):
                    match = False
                    break
                if a.dtype.kind == "f":
                    eq = np.isclose(a, b, rtol=0, atol=0,
                                    equal_nan=True)
                else:
                    eq = a == b
                if not bool(np.all(eq)):
                    match = False
                    break
            out[f"{name}_match"] = match

        # record_highs: per-user output (users-sized) -> exact checksum
        t1 = time.perf_counter()
        df = QUERIES["record_highs"](sf).to_pandas()
        out["t_record_highs_sec"] = round(time.perf_counter() - t1, 1)
        P = 1_000_003
        s = int(((df["user_id"].to_numpy(np.int64) % P) *
                 df["n_records"].to_numpy(np.int64)).astype(object)
                .sum()) % (1 << 61)
        want = con.execute(
            "WITH g AS (" + ORACLE_SQL["record_highs"] + ") "
            "SELECT SUM((user_id % 1000003) * n_records), "
            "SUM(n_records), SUM(n_events), COUNT(*) FROM g"
        ).fetchone()
        out["record_highs_match"] = (
            s == int(want[0]) % (1 << 61)
            and int(df["n_records"].sum()) == int(want[1])
            and int(df["n_events"].sum()) == int(want[2])
            and len(df) == int(want[3]))

        # dense-timeline pass: with the default 100k users the synth
        # stride keeps consecutive per-user events hours apart, so no
        # 30-min session ever holds two events (both sides agree on
        # EMPTY — checked above, but weak). Re-synthesize with few
        # users so sessions actually form and re-verify the pair op.
        dense_users = max(10, args.users // 2000)
        sf2 = os.path.join(tmp, "sf_dense")
        os.makedirs(sf2)
        synthesize(os.path.join(sf2, "events.parquet"),
                   args.rows // 10, dense_users)
        con2 = duckdb.connect()
        con2.execute(
            f"CREATE VIEW events AS SELECT * FROM "
            f"'{os.path.join(sf2, 'events.parquet')}/*.parquet'")
        t1 = time.perf_counter()
        got = QUERIES["session_type_pairs"](sf2).to_pandas()
        out["t_session_pairs_dense_sec"] = round(
            time.perf_counter() - t1, 1)
        want = con2.execute(ORACLE_SQL["session_type_pairs"]).fetchdf()
        got = (got.sort_values(["type_a", "type_b"], ignore_index=True)
               [sorted(got.columns)])
        want = (want.sort_values(["type_a", "type_b"],
                                 ignore_index=True)
                [sorted(want.columns)])
        out["session_pairs_dense_rows"] = int(len(want))
        out["session_pairs_dense_match"] = bool(
            len(got) == len(want) and len(got) > 0 and
            all((got[c].to_numpy() == want[c].to_numpy()).all()
                for c in got.columns))

        rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
        out["driver_rss_mb_before"] = rss0
        out["driver_rss_mb_after"] = rss1
        out["spill"] = spill_stats()
        print(json.dumps(out))
        return 0 if all(v for k, v in out.items()
                        if k.endswith("_match")) else 1
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
