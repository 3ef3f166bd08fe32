#!/usr/bin/env python
"""Window-family soak: synthesize an events table 2000x the sf0.001
bench table (default 20M rows), run the per-user window operators
(forward_fill, rolling_time_sum) end-to-end, and verify their FULL
output against DuckDB's window engine via column checksums — exact
correctness at the largest local scale, not a sampled spot-check.

    python tools/soak_windows.py [--rows 20000000] [--users 100000] \
        [--num-cpus 32] [--store-gb 8]

Prints ONE JSON line: rows, wall per operator, checksum-match booleans,
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


def synthesize(path: str, rows: int, users: int) -> None:
    """Deterministic events: ts walks forward with a per-event mixed
    stride (so hour windows hold ~100 events), user/type/value derive
    from event_id by integer mixing. One Ray pipeline, partitioned
    parquet out."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    base = 1_600_000_000_000_000  # epoch micros

    def build(batch) -> "pa.Table":
        eid = batch["id"].astype(np.int64)
        mix = (eid * 2654435761) & 0x7FFFFFFF
        ts = base + eid * 40_000_000 + (mix % 35_000_000)
        uid = mix % users
        types = np.array(["view", "click", "purchase", "error"])
        et = types[mix % 4]
        val = ((mix % 100_000) / 100.0)
        return pa.table({
            "event_id": pa.array(eid),
            "ts": pa.array(ts).cast(pa.timestamp("us")),
            "user_id": pa.array(uid.astype(np.int64)),
            "event_type": pa.array(et, pa.string()),
            "value": pa.array(val, pa.float64()),
            "props": pa.array(np.full(len(eid), "{}"), pa.string())})

    (rd.range(rows).map_batches(build, batch_format="numpy",
                                batch_size=262_144)
     .write_parquet(path))


def checksum_duckdb(events_dir: str, sql: str) -> tuple:
    import duckdb
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * "
                f"FROM '{events_dir}/*.parquet'")
    return con.execute(sql).fetchone()


def spill_stats() -> dict:
    import re
    try:
        from ray._private.internal_api import memory_summary
        s = memory_summary(stats_only=True)
        sp = re.search(r"Spilled (\d+) MiB", s)
        rs = re.search(r"Restored (\d+) MiB", s)
        return {"spilled_mib": int(sp.group(1)) if sp else 0,
                "restored_mib": int(rs.group(1)) if rs else 0}
    except Exception:
        return {}


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

    tmp = tempfile.mkdtemp(prefix="gvt_soakw_")
    sf = os.path.join(tmp, "sf")
    os.makedirs(sf)
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
    try:
        t0 = time.perf_counter()
        synthesize(os.path.join(sf, "events.parquet"),
                   args.rows, args.users)
        t_gen = time.perf_counter() - t0

        from geojson_vt_ray.pipelines.queries import (
            q_forward_fill, q_rolling_time_sum)

        out = {"soak": "windows", "rows": args.rows,
               "users": args.users, "num_cpus": args.num_cpus,
               "t_synth_sec": round(t_gen, 1)}

        # forward_fill: checksum (Σ event_id·fill mod large prime,
        # count of -1 rows) over the FULL output vs DuckDB. The
        # checksum itself is a distributed map_batches partial — the
        # driver merges O(batches) three-int rows, the output never
        # lands on the driver.
        import numpy as np
        import pyarrow as pa

        def ff_part(b: pa.Table) -> pa.Table:
            v = b.column("last_purchase_cents").to_numpy(
                zero_copy_only=False)
            e = b.column("event_id").to_numpy(zero_copy_only=False)
            # exclude the -1 sentinel from the product sum: numpy %
            # is always-positive, SQL % keeps sign (counted via neg)
            vv = np.where(v == -1, 0, v)
            return pa.table({
                "s": pa.array([int(((e % 1_000_003) *
                                    (vv % 1_000_003)).sum())]),
                "neg": pa.array([int((v == -1).sum())]),
                "n": pa.array([len(v)])})

        t1 = time.perf_counter()
        p = (q_forward_fill(sf)
             .map_batches(ff_part, batch_format="pyarrow")
             .to_pandas())
        # object-dtype sum: batch partials are ~2.6e17 each, an
        # int64 pandas sum would wrap beyond ~35 batches
        agg = {"s": int(p["s"].astype(object).sum()) % (1 << 61),
               "neg": int(p["neg"].sum()), "n": int(p["n"].sum())}
        out["t_forward_fill_sec"] = round(time.perf_counter() - t1, 1)
        want = checksum_duckdb(
            os.path.join(sf, "events.parquet"),
            "WITH c AS (SELECT event_id, user_id, ts, event_type, "
            "CAST(ROUND(value*100) AS BIGINT) AS cents FROM events), "
            "f AS (SELECT event_id, COALESCE(last_value(CASE WHEN "
            "event_type = 'purchase' THEN cents END IGNORE NULLS) "
            "OVER (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), -1) "
            "AS v FROM c) "
            "SELECT SUM((event_id % 1000003) * "
            "(CASE WHEN v = -1 THEN 0 ELSE v END % 1000003)), "
            "SUM(CASE WHEN v = -1 THEN 1 ELSE 0 END), COUNT(*) FROM f")
        out["forward_fill_match"] = (
            agg["s"] == int(want[0]) % (1 << 61)
            and agg["neg"] == int(want[1]) and agg["n"] == int(want[2]))

        # rolling_time_sum: same treatment
        def rt_part(b: pa.Table) -> pa.Table:
            v = b.column("wsum_cents").to_numpy(zero_copy_only=False)
            e = b.column("event_id").to_numpy(zero_copy_only=False)
            return pa.table({
                "s": pa.array([int(((e % 1_000_003) *
                                    (v % 1_000_003)).sum())]),
                "n": pa.array([len(v)])})

        t2 = time.perf_counter()
        p2 = (q_rolling_time_sum(sf)
              .map_batches(rt_part, batch_format="pyarrow")
              .to_pandas())
        agg2 = {"s": int(p2["s"].astype(object).sum()) % (1 << 61),
                "n": int(p2["n"].sum())}
        out["t_rolling_time_sum_sec"] = round(
            time.perf_counter() - t2, 1)
        want2 = checksum_duckdb(
            os.path.join(sf, "events.parquet"),
            "WITH c AS (SELECT event_id, user_id, ts, "
            "CAST(ROUND(value*100) AS BIGINT) AS cents FROM events), "
            "w AS (SELECT event_id, CAST(SUM(cents) OVER ("
            "PARTITION BY user_id ORDER BY ts RANGE BETWEEN "
            "INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS BIGINT) "
            "AS v FROM c) "
            "SELECT SUM((event_id % 1000003) * (v % 1000003)), "
            "COUNT(*) FROM w")
        out["rolling_time_sum_match"] = (
            agg2["s"] == int(want2[0]) % (1 << 61)
            and agg2["n"] == int(want2[1]))

        rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
        out["driver_rss_mb_before"] = rss0
        # NOTE: peak RSS is dominated by the in-process DuckDB
        # oracle running the same 20M-row window query, not the
        # Ray pipeline (whose results never land on the driver)
        out["driver_rss_mb_after"] = rss1
        out["spill"] = spill_stats()
        print(json.dumps(out))
        return 0 if (out["forward_fill_match"]
                     and out["rolling_time_sum_match"]) else 1
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
