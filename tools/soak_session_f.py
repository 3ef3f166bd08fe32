#!/usr/bin/env python
"""Session-F operator soak: synthesize a 20M-row events table (the
soak_windows generator — per-user streams with mixed strides), run the
stateful per-user and audit operators added this session end-to-end —
scd2_history, max_drawdown, concurrent_sessions, table_checksum — and
verify their FULL output against DuckDB via exact aggregate checksums
(not sampled spot-checks).

    python tools/soak_session_f.py [--rows 20000000] [--users 100000] \
        [--num-cpus 32] [--store-gb 8]

Prints ONE JSON line: rows, per-operator wall + exact-match booleans,
driver RSS, spill stats. Record the result in BASELINE.md.

This script OWNS its Ray session (tools are CLI entry points; the
library and __ray_entry__ never call ray.init).
"""

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
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from soak_windows import checksum_duckdb, spill_stats, synthesize  # noqa: E402


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

    import numpy as np
    import pyarrow as pa

    tmp = tempfile.mkdtemp(prefix="gvt_soakf_")
    sf = os.path.join(tmp, "sf")
    os.makedirs(sf)
    events_dir = os.path.join(sf, "events.parquet")
    try:
        t0 = time.perf_counter()
        synthesize(events_dir, args.rows, args.users)
        from geojson_vt_ray.pipelines.queries import (
            _SQL_CONCURRENT_SESSIONS, _SQL_MAX_DRAWDOWN,
            _SQL_SCD2_HISTORY, _SQL_TABLE_CHECKSUM,
            q_concurrent_sessions, q_max_drawdown, q_scd2_history,
            q_table_checksum)

        out = {"soak": "session_f", "rows": args.rows,
               "users": args.users, "num_cpus": args.num_cpus,
               "t_synth_sec": round(time.perf_counter() - t0, 1)}
        ok_all = True

        def events_view_sql(inner_sql: str, agg_sql: str) -> str:
            return f"WITH out AS ({inner_sql}) {agg_sql}"

        # ---- scd2_history: run-sized output; checksum the FULL table
        # distributedly (driver merges O(batches) 3-int rows)
        P = 1_000_003

        def scd2_part(b: pa.Table) -> pa.Table:
            vf = b.column("valid_from").to_numpy(zero_copy_only=False)
            ne = b.column("n_events").to_numpy(zero_copy_only=False)
            ri = b.column("run_idx").to_numpy(zero_copy_only=False)
            return pa.table({
                "s": pa.array([int(((vf % P) * (ri % P)).sum())]),
                "ne": pa.array([int(ne.sum())]),
                "n": pa.array([len(vf)])})

        t1 = time.perf_counter()
        p = (q_scd2_history(sf).map_batches(
            scd2_part, batch_format="pyarrow").to_pandas())
        got = (int(p["s"].astype(object).sum()) % (1 << 61),
               int(p["ne"].sum()), int(p["n"].sum()))
        out["t_scd2_sec"] = round(time.perf_counter() - t1, 1)
        want = checksum_duckdb(events_dir, events_view_sql(
            _SQL_SCD2_HISTORY,
            f"SELECT SUM((valid_from % {P}) * (run_idx % {P})) "
            f"% {1 << 61}, SUM(n_events), COUNT(*) FROM out"))
        ok = got == (int(want[0]), int(want[1]), int(want[2]))
        out["scd2_exact"] = ok
        ok_all &= ok
        # total n_events across runs must equal the input row count
        ok2 = got[1] == args.rows
        out["scd2_rowcount_conserved"] = ok2
        ok_all &= ok2

        # ---- max_drawdown: user-sized output; full-table compare via
        # three exact aggregates
        t1 = time.perf_counter()
        mdd = q_max_drawdown(sf).to_pandas()
        got = (len(mdd), int(mdd["max_drawdown"].astype(object).sum()),
               int(mdd["net_cents"].astype(object).sum()),
               int(mdd["n_events"].sum()))
        out["t_drawdown_sec"] = round(time.perf_counter() - t1, 1)
        want = checksum_duckdb(events_dir, events_view_sql(
            _SQL_MAX_DRAWDOWN,
            "SELECT COUNT(*), SUM(max_drawdown), SUM(net_cents), "
            "SUM(n_events) FROM out"))
        ok = got == tuple(int(x) for x in want)
        out["drawdown_exact"] = ok
        ok_all &= ok

        # ---- concurrent_sessions: types-row output; direct compare
        t1 = time.perf_counter()
        cs = (q_concurrent_sessions(sf).to_pandas()
              .sort_values("event_type", ignore_index=True))
        out["t_concurrent_sec"] = round(time.perf_counter() - t1, 1)
        import duckdb
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"'{events_dir}/*.parquet'")
        wcs = (con.execute(_SQL_CONCURRENT_SESSIONS).fetchdf()
               .sort_values("event_type", ignore_index=True))
        ok = cs.values.tolist() == wcs.values.tolist()
        out["concurrent_exact"] = ok
        ok_all &= ok

        # ---- table_checksum: the digest digesting 20M rows
        t1 = time.perf_counter()
        tc = (q_table_checksum(sf).to_pandas()
              .sort_values("event_type", ignore_index=True))
        out["t_checksum_sec"] = round(time.perf_counter() - t1, 1)
        wtc = (con.execute(_SQL_TABLE_CHECKSUM).fetchdf()
               .sort_values("event_type", ignore_index=True))
        ok = ([(r, int(n), int(c)) for r, n, c in tc.values.tolist()]
              == [(r, int(n), int(c)) for r, n, c in wtc.values.tolist()])
        out["checksum_exact"] = ok
        ok_all &= ok

        out.update(spill_stats())
        out["driver_rss_gb"] = round(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
            / (1024 ** 2), 2)
        out["ok"] = bool(ok_all)
        print(json.dumps(out))
        return 0 if ok_all else 1
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
