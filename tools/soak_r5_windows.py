#!/usr/bin/env python
"""Round-5 soak for the rewritten window/profile family over the same
isomorphic-replica events table as soak_r5_spatial2 (200 x 100k = 20M
rows, disjoint users, identical per-replica timestamps/values): exact
invariants for window_events, window_sliding, interval_union, streaks,
ks_drift and profile_table — the queries whose natural-key aggregates
were replaced by coarse-bucket merges this round.

Invariants (replica r offsets user_id by r*1500; ts and value are
bit-identical per replica):

- window_events / window_sliding / interval_union / streaks: the row
  for user u + r*1500 EQUALS the base row for u (ts-derived hour /
  window keys and float sums are unchanged by replication) — checked
  by merging on user_id % 1500, all value columns exact including the
  float sum_value (same addition order per group: each replica user's
  event stream is byte-identical to the base user's);
- ks_drift: per-type value histograms scale R x, so n_a/n_b scale
  R x, d_num scales R^2 x, and ks_d is UNCHANGED;
- profile_table: n_nulls scales R x; n_distinct is R x base for
  user_id (disjoint replicas) and UNCHANGED for event_type / value /
  props (identical value sets per replica).

    python tools/soak_r5_windows.py [--replicas 200] [--store-gb 4]

Prints ONE JSON line; record the result in BASELINE.md.

This script OWNS its Ray session (tools are CLI entry points; the
library and __ray_entry__ never call ray.init)."""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import resource
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE_DIR = "/root/testdata/sf0.1"
UID_OFF = 1_500

_spec = importlib.util.spec_from_file_location(
    "soak_r5_spatial2", os.path.join(REPO, "tools", "soak_r5_spatial2.py"))
_sp2 = importlib.util.module_from_spec(_spec)
_argv, sys.argv = sys.argv, [sys.argv[0]]
_spec.loader.exec_module(_sp2)
sys.argv = _argv


def rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def _per_user_equal(base_df, big_df, keys, vals, replicas) -> bool:
    """Every replica-user row equals the base row for user_id % 1500
    at the same non-user key columns; row count is exactly R x."""
    if len(big_df) != replicas * len(base_df):
        return False
    big = big_df.copy()
    big["_bu"] = big["user_id"] % UID_OFF
    m = big.merge(base_df.assign(_bu=base_df["user_id"]),
                  on=["_bu"] + keys, how="left",
                  suffixes=("", "_b"))
    if m[[f"{v}_b" for v in vals]].isna().any().any():
        return False
    return all((m[v] == m[f"{v}_b"]).all() for v in vals)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=200)
    ap.add_argument("--store-gb", type=float, default=4.0)
    args = ap.parse_args()
    R = args.replicas

    import ray
    import logging
    import ray.data  # noqa: F401
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR",
             object_store_memory=int(args.store_gb * (1 << 30)))

    out: dict = {"replicas": R, "store_gb": args.store_gb,
                 "rss_mb_start": round(rss_mb(), 1)}
    tmp = tempfile.mkdtemp(prefix="soak_r5win_", dir="/tmp")
    ok = True
    try:
        out["synth"] = _sp2.synthesize(tmp, R, heavy=False)
        shutil.copy(f"{BASE_DIR}/supplier.parquet",
                    os.path.join(tmp, "supplier.parquet"))

        from geojson_vt_ray.pipelines import queries as Q

        base = {n: getattr(Q, "q_" + n)(BASE_DIR).to_pandas()
                for n in ("window_events", "window_sliding",
                          "interval_union", "streaks", "ks_drift",
                          "profile_table")}

        per_user = [
            ("window_events", ["hour"], ["n", "sum_value"]),
            ("window_sliding", ["w_start"], ["n"]),
            ("interval_union", [], ["covered_us"]),
            ("streaks", [], ["max_streak"]),
        ]
        for name, keys, vals in per_user:
            t0 = time.time()
            got = getattr(Q, "q_" + name)(tmp).to_pandas()
            exact = _per_user_equal(base[name], got, keys, vals, R)
            if name == "window_sliding" and exact:
                # first_event offsets by r*EID_OFF: check modulo
                big = got.copy()
                big["_bu"] = big["user_id"] % UID_OFF
                big["_fe"] = big["first_event"] % _sp2.EID_OFF
                bb = base[name].assign(
                    _bu=base[name]["user_id"],
                    _fe=base[name]["first_event"] % _sp2.EID_OFF)
                m = big.merge(bb[["_bu", "w_start", "_fe"]],
                              on=["_bu", "w_start"], how="left",
                              suffixes=("", "_b"))
                exact = (m["_fe"] == m["_fe_b"]).all()
            out[name] = {"t_sec": round(time.time() - t0, 2),
                         "rows": len(got), "exact": bool(exact)}
            ok = ok and exact

        # ks_drift: counts R x, d_num R^2 x, ks_d unchanged
        t0 = time.time()
        got = Q.q_ks_drift(tmp).to_pandas()
        b = base["ks_drift"]
        exact = (len(got) == 1 and
                 int(got.n_a[0]) == R * int(b.n_a[0]) and
                 int(got.n_b[0]) == R * int(b.n_b[0]) and
                 int(got.d_num[0]) == R * R * int(b.d_num[0]) and
                 float(got.ks_d[0]) == float(b.ks_d[0]))
        out["ks_drift"] = {"t_sec": round(time.time() - t0, 2),
                           "rows": len(got), "exact": bool(exact)}
        ok = ok and exact

        # profile_table: nulls R x; distinct R x for user_id else same
        t0 = time.time()
        got = Q.q_profile_table(tmp).to_pandas().set_index("col")
        bp = base["profile_table"].set_index("col")
        exact = True
        for col in bp.index:
            f = R if col == "user_id" else 1
            exact &= (int(got.loc[col, "n_distinct"]) ==
                      f * int(bp.loc[col, "n_distinct"]))
            exact &= (int(got.loc[col, "n_nulls"]) ==
                      R * int(bp.loc[col, "n_nulls"]))
        out["profile_table"] = {"t_sec": round(time.time() - t0, 2),
                                "rows": len(got), "exact": bool(exact)}
        ok = ok and exact

        out["rss_mb_end"] = round(rss_mb(), 1)
        out["ok"] = bool(ok)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        ray.shutdown()
    print(json.dumps(out))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
