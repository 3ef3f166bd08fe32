#!/usr/bin/env python
"""Round-5 soak for the trajectory/mobility family over a replicated
events table (default 200 x 100k = 20M rows) under a small object
store: radius_gyration, trajectory_len, traj_bbox, heading_octants,
hexbin_count and state_dwell — the operators whose folds were
converted to object-int / seconds-floor in round 4.

Replica r offsets event_id by r*100800 (a multiple of lcm(3600,1600),
so derived lon/lat are IDENTICAL per replica) and user_id by r*1500
(disjoint users; base users are exactly 0..1499). The big table is R
isomorphic copies of the base point set, giving hard exact invariants:

- per-user operators (radius_gyration, trajectory_len, traj_bbox):
  the row for user u + r*1500 must EQUAL the base row for u, for
  every replica — checked by merging on u = user_id % 1500;
- global histograms (heading_octants, hexbin_count): every count is
  exactly R x the base count (distinct users per hex cell also scale
  R x because replica user sets are disjoint);
- state_dwell: dwell_s and n_gaps scale R x; mean_dwell_s is
  UNCHANGED (same ratio).

A second heavy-user phase replays the corpus with user_id collapsed
to user_id % 4 (every replica feeds the SAME 4 users), pushing each
user past ~2.5M points so that sx^2 and n*(sxx+syy) exceed int64 —
the exact regime radius_gyration's object-int fold exists for. The
expected rg2 is recomputed driver-side from base-table moments in
exact Python ints (big = R x base per user), applying the same
float64 conversion + ROUND-6 as the engine's finish stage.

    python tools/soak_r5_spatial2.py [--replicas 200] [--store-gb 4]

Prints ONE JSON line; record the result in BASELINE.md.

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

BASE_DIR = "/root/testdata/sf0.1"
EID_OFF = 100_800          # multiple of lcm(3600, 1600): same lon/lat
UID_OFF = 1_500
HEAVY_USERS = 4


def synthesize(out_dir: str, replicas: int, heavy: bool) -> dict:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    ev = pq.read_table(f"{BASE_DIR}/events.parquet")
    eid = ev.column("event_id").to_numpy(zero_copy_only=False)
    uid = ev.column("user_id").to_numpy(zero_copy_only=False)
    if heavy:
        uid = uid % HEAVY_USERS
    ts = ev.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
    val = ev.column("value").to_numpy(zero_copy_only=False)
    ety = ev.column("event_type")
    props = ev.column("props")

    def shard(batch):
        t_e, t_u, t_t, t_v = [], [], [], []
        cols_ety, cols_props = [], []
        for r in batch["id"]:
            t_e.append(eid + r * EID_OFF)
            t_u.append(uid if heavy else uid + r * UID_OFF)
            t_t.append(ts)
            t_v.append(val)
            cols_ety.append(ety)
            cols_props.append(props)
        return pa.table({
            "event_id": pa.array(np.concatenate(t_e)),
            "ts": pa.array(np.concatenate(t_t)).cast(pa.timestamp("us")),
            "user_id": pa.array(np.concatenate(t_u)),
            "event_type": pa.concat_arrays(
                [c.combine_chunks() for c in cols_ety]),
            "value": pa.array(np.concatenate(t_v)),
            "props": pa.concat_arrays(
                [c.combine_chunks() for c in cols_props])})

    t0 = time.time()
    ev_dir = os.path.join(out_dir, "events.parquet")
    os.makedirs(ev_dir, exist_ok=True)
    (rd.range(replicas)
     .repartition(replicas)
     .map_batches(shard, batch_format="numpy")
     .write_parquet(ev_dir))
    return {"t_synth_sec": round(time.time() - t0, 2),
            "rows": int(len(eid)) * replicas}


def rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def _per_user_equal(base_df, big_df, vals, replicas) -> bool:
    """Every replica-user row equals the base row of user_id % 1500."""
    if len(big_df) != replicas * len(base_df):
        return False
    big = big_df.copy()
    big["_bu"] = big["user_id"] % UID_OFF
    m = big.merge(base_df.rename(columns={"user_id": "_bu"}),
                  on="_bu", suffixes=("", "_b"), how="left")
    if m.isna().any().any():
        return False
    return all((m[v] == m[f"{v}_b"]).all() for v in vals)


def _scaled_equal(base_df, big_df, keys, vals, factor) -> bool:
    m = base_df.merge(big_df, on=keys, suffixes=("_b", "_g"),
                      how="outer", indicator=True)
    if (m["_merge"] != "both").any():
        return False
    for v in vals:
        if not (m[f"{v}_b"] * factor == m[f"{v}_g"]).all():
            return False
    return True


def _expected_heavy_rg(replicas: int):
    """Exact Python-int moments of the base table per user_id % 4,
    scaled R x, pushed through the engine finish stage's float path."""
    import numpy as np
    import pyarrow.parquet as pq

    t = pq.read_table(f"{BASE_DIR}/events.parquet",
                      columns=["event_id", "user_id"])
    ev = t.column("event_id").to_numpy(zero_copy_only=False)
    uid = t.column("user_id").to_numpy(zero_copy_only=False) % HEAVY_USERS
    x = (ev % 3600).astype(np.int64)
    y = (ev % 1600).astype(np.int64)
    rows = {}
    for u in range(HEAVY_USERS):
        s = uid == u
        n = int(s.sum()) * replicas
        sx = int(x[s].sum()) * replicas
        sy = int(y[s].sum()) * replicas
        sxx = int((x[s].astype(object) * x[s]).sum()) * replicas
        syy = int((y[s].astype(object) * y[s]).sum()) * replicas
        num = n * (sxx + syy) - sx * sx - sy * sy
        assert sx * sx > (1 << 63) and num > (1 << 63), (
            "soak must exercise the >int64 regime")
        rg2 = float(np.round(np.float64(num) /
                             (np.float64(n) * np.float64(n)), 6))
        rows[u] = (n, rg2)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=200)
    ap.add_argument("--heavy-replicas", type=int, default=200)
    ap.add_argument("--store-gb", type=float, default=4.0)
    args = ap.parse_args()
    R = args.replicas

    import ray
    import logging
    import ray.data  # noqa: F401 (import resets logging; silence after)
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR",
             object_store_memory=int(args.store_gb * (1 << 30)))

    out: dict = {"replicas": R, "store_gb": args.store_gb,
                 "rss_mb_start": round(rss_mb(), 1)}
    tmp = tempfile.mkdtemp(prefix="soak_r5sp_", dir="/tmp")
    ok = True
    try:
        out["synth"] = synthesize(tmp, R, heavy=False)

        from geojson_vt_ray.pipelines import queries as Q

        base = {n: getattr(Q, "q_" + n)(BASE_DIR).to_pandas()
                for n in ("radius_gyration", "trajectory_len",
                          "traj_bbox", "heading_octants",
                          "hexbin_count", "state_dwell")}

        per_user = [
            ("radius_gyration", ["n_points", "rg2"]),
            ("trajectory_len", ["n_steps", "path_len"]),
            ("traj_bbox", ["n_seg_inside", "n_seg_crossing",
                           "sum_d2_inside"]),
        ]
        for name, vals in per_user:
            t0 = time.time()
            got = getattr(Q, "q_" + name)(tmp).to_pandas()
            exact = _per_user_equal(base[name], got, vals, R)
            out[name] = {"t_sec": round(time.time() - t0, 2),
                         "rows": len(got), "exact": bool(exact)}
            ok = ok and exact

        scaled = [
            ("heading_octants", ["event_type", "octant"], ["n"]),
            ("hexbin_count", ["cx", "cy"], ["n_events", "n_users"]),
            ("state_dwell", ["event_type"], ["dwell_s", "n_gaps"]),
        ]
        for name, keys, vals in scaled:
            t0 = time.time()
            got = getattr(Q, "q_" + name)(tmp).to_pandas()
            exact = _scaled_equal(base[name], got, keys, vals, R)
            if name == "state_dwell" and exact:
                m = base[name].merge(got, on=keys, suffixes=("_b", "_g"))
                exact = (m["mean_dwell_s_b"] ==
                         m["mean_dwell_s_g"]).all()
            out[name] = {"t_sec": round(time.time() - t0, 2),
                         "rows": len(got), "exact": bool(exact)}
            ok = ok and exact

        # --- heavy-user phase: radius_gyration past int64 ---
        shutil.rmtree(tmp)
        tmp = tempfile.mkdtemp(prefix="soak_r5sp_heavy_", dir="/tmp")
        HR = args.heavy_replicas
        out["heavy_synth"] = synthesize(tmp, HR, heavy=True)
        exp = _expected_heavy_rg(HR)
        t0 = time.time()
        got = Q.q_radius_gyration(tmp).to_pandas()
        exact = len(got) == HEAVY_USERS and all(
            (int(r.n_points), float(r.rg2)) == exp[int(r.user_id)]
            for r in got.itertuples())
        out["radius_gyration_heavy"] = {
            "t_sec": round(time.time() - t0, 2),
            "rows": len(got), "replicas": HR, "exact": bool(exact),
            "points_per_user": out["heavy_synth"]["rows"] // HEAVY_USERS}
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
