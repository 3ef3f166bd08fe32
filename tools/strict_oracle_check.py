#!/usr/bin/env python
"""Driver-mimic strict correctness check: run every queries() entry at a
given sf and compare against its DuckDB oracle with EXACT value equality
(the driver hashes values bit-for-bit, no float tolerance).

Usage: python tools/strict_oracle_check.py [sf_dir] [names...]

Runs every queries() entry (or just the named ones) against its DuckDB
oracle with EXACT bit-for-bit value equality — no float tolerance —
mirroring the driver's hash compare. 'close-but-not-bit-exact' findings
are exactly the ones the driver's gate would flag that the 1e-9
pytest mirror would miss.

This script OWNS its Ray session (tools are CLI entry points; the
library and __ray_entry__ never call ray.init).
"""
import os
import sys, time, math, traceback
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd
import ray

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def _to_pandas(res):
    import pyarrow as pa
    import ray.data
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _oracle(sql):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con.execute(sql).fetchdf()


def _canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns), kind="mergesort",
                        ignore_index=True)
    return df


def _compare(got, want, name):
    errs = []
    if sorted(got.columns) != sorted(want.columns):
        return [f"{name}: SCHEMA {sorted(got.columns)} != {sorted(want.columns)}"]
    if len(got) != len(want):
        return [f"{name}: ROWS {len(got)} != {len(want)}"]
    if len(got) == 0:
        return []
    g, w = _canon(got), _canon(want)
    for c in g.columns:
        gv, wv = g[c], w[c]
        if gv.dtype.kind == "f" or wv.dtype.kind == "f":
            ga = gv.astype(float).to_numpy()
            wa = wv.astype(float).to_numpy()
            import numpy as np
            exact = np.array_equal(ga, wa, equal_nan=True)
            if not exact:
                close = all(
                    (math.isnan(a) and math.isnan(b)) or a == b or
                    abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
                    for a, b in zip(ga, wa))
                errs.append(f"{name}: FLOAT column {c} "
                            f"{'close-but-not-bit-exact' if close else 'DIFFERS'}")
        else:
            if gv.astype(str).tolist() != wv.astype(str).tolist():
                errs.append(f"{name}: column {c} DIFFERS")
    return errs


def main():
    ray.init(address="local", num_cpus=16, include_dashboard=False,
             ignore_reinit_error=True)
    import __ray_entry__ as e
    qs, oracles = e.queries(), e.oracle_sql()
    failures, no_oracle, slow = [], [], []
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            got = _to_pandas(fn(SF_DIR))
        except Exception:
            failures.append(f"{name}: RAISED\n{traceback.format_exc()}")
            continue
        dt = time.time() - t0
        if dt > 20:
            slow.append((name, round(dt, 1)))
        if name in oracles:
            try:
                want = _oracle(oracles[name])
            except Exception:
                failures.append(f"{name}: ORACLE RAISED\n{traceback.format_exc()}")
                continue
            failures.extend(_compare(got, want, name))
        else:
            no_oracle.append(name)
        print(f"  {name}: {len(got)} rows {dt:.1f}s", flush=True)
    print("=" * 60)
    print("no_oracle:", no_oracle)
    print("slow(>20s):", slow)
    if failures:
        print("FAILURES:")
        for f in failures:
            print(" ", f)
    else:
        print("ALL STRICT-EXACT GREEN")
    ray.shutdown()


if __name__ == "__main__":
    main()
