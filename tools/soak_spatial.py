#!/usr/bin/env python
"""Soak run for the spatial operator family: cell_count, od_matrix,
radius_count, dwell_time and moran_i end-to-end over a replicated
events table ~R x the sf0.1 bench table (default 200 x 100k = 20M
rows), with a deliberately small object store — demonstrating the
family's scale claims (corpus streams through cell/user-bucket
partials; finals are cell-/query-/day-bounded; nothing corpus-sized
on the driver).

Replica r offsets event_id by r*100800 (a multiple of lcm(3600,1600)
= 14400, so the derived lon/lat are IDENTICAL per replica) and
user_id by r*1500 (disjoint users). The replicated table is therefore
R exact isomorphic copies of the base point set, giving hard exact
invariants, not just throughput numbers:

- cell_count / radius_count / od_matrix / dwell_time: every output
  count/sum is exactly R x the base value;
- moran_i: n_cells and w_pairs are UNCHANGED, num/den are exactly
  R^2 x the base integers (deviations scale linearly), and moran_i
  equals the same ratio expression evaluated on the scaled integers.

    python tools/soak_spatial.py [--replicas 200] [--store-gb 4]

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


def synthesize(out_dir: str, replicas: int) -> dict:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    ev = pq.read_table(f"{BASE_DIR}/events.parquet")
    eid = ev.column("event_id").to_numpy(zero_copy_only=False)
    uid = ev.column("user_id").to_numpy(zero_copy_only=False)
    ts = ev.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
    val = ev.column("value").to_numpy(zero_copy_only=False)
    ety = ev.column("event_type")
    props = ev.column("props")

    def shard(batch):
        t_e, t_u, t_t, t_v = [], [], [], []
        cols_ety, cols_props = [], []
        for r in batch["id"]:
            t_e.append(eid + r * EID_OFF)
            t_u.append(uid + r * UID_OFF)
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
    # radius_count reads supplier for its query points: reuse the base
    shutil.copy(f"{BASE_DIR}/supplier.parquet",
                os.path.join(out_dir, "supplier.parquet"))
    return {"t_synth_sec": round(time.time() - t0, 2),
            "rows": int(len(eid)) * replicas}


def rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def _scaled_equal(base_df, big_df, keys, vals, factor) -> bool:
    m = base_df.merge(big_df, on=keys, suffixes=("_b", "_g"),
                      how="outer", indicator=True)
    if (m["_merge"] != "both").any():
        return False
    for v in vals:
        if not (m[f"{v}_b"] * factor == m[f"{v}_g"]).all():
            return False
    return True


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=200)
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
    tmp = tempfile.mkdtemp(prefix="soak_spatial_", dir="/tmp")
    ok = True
    try:
        out["synth"] = synthesize(tmp, R)

        from geojson_vt_ray.pipelines import queries as Q

        # base outputs (100k rows — cheap) for the exact invariants
        base = {
            "cell_count": Q.q_cell_count(BASE_DIR).to_pandas(),
            "od_matrix": Q.q_od_matrix(BASE_DIR).to_pandas(),
            "radius_count": Q.q_radius_count(BASE_DIR).to_pandas(),
            "dwell_time": Q.q_dwell_time(BASE_DIR).to_pandas(),
            "moran": Q.q_moran_i(BASE_DIR).to_pandas(),
        }

        specs = [
            ("cell_count", Q.q_cell_count, ["cell_id"], ["n"], R),
            # od_matrix: each replica's users traverse the same
            # (origin, dest) cells -> n_users scales exactly R x
            ("od_matrix", Q.q_od_matrix, ["o_cell", "d_cell"],
             ["n_users"], R),
            ("radius_count", Q.q_radius_count, ["query_id"], ["n"], R),
            ("dwell_time", Q.q_dwell_time, ["cell_id"], ["dwell_us"],
             R),
        ]
        for name, fn, keys, vals, factor in specs:
            t0 = time.time()
            got = fn(tmp).to_pandas()
            exact = _scaled_equal(base[name], got, keys, vals, factor)
            out[name] = {"t_sec": round(time.time() - t0, 2),
                         "rows": len(got), "exact": bool(exact)}
            ok = ok and exact

        # moran_i: topology-invariant statistic on R-scaled counts.
        # The base num/den come from an INDEPENDENT Python-int
        # recompute over the decoded cell_count output (the engine's
        # float columns round above 2^53, so scaling them would be
        # lossy) — which also cross-checks q_moran_i itself.
        t0 = time.time()
        mg = Q.q_moran_i(tmp).to_pandas().iloc[0]
        mb = base["moran"].iloc[0]
        cc = base["cell_count"]
        raw = ((cc["cell_id"].to_numpy() - 6) // 32).astype(int)
        n_grid = 1 << 6
        occ = {(int(r % n_grid), int(r // n_grid)): int(x)
               for r, x in zip(raw, cc["n"].to_numpy())}
        nc, s = len(occ), sum(occ.values())
        dd = {k: nc * x - s for k, x in occ.items()}
        num0 = den0 = w = 0
        for (ix, iy), dv in dd.items():
            den0 += dv * dv
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    if (dx or dy) and (ix + dx, iy + dy) in dd:
                        num0 += dv * dd[(ix + dx, iy + dy)]
                        w += 1
        assert int(mb["n_cells"]) == nc and int(mb["w_pairs"]) == w
        assert mb["num"] == float(num0) and mb["den"] == float(den0)
        want_num = float(num0 * R * R)
        want_den = float(den0 * R * R)
        want_i = round((float(nc) * want_num) / (float(w) * want_den),
                       6)
        m_ok = (int(mg["n_cells"]) == nc and int(mg["w_pairs"]) == w
                and mg["num"] == want_num and mg["den"] == want_den
                and mg["moran_i"] == want_i)
        out["moran_i"] = {"t_sec": round(time.time() - t0, 2),
                          "moran_i": float(mg["moran_i"]),
                          "exact": bool(m_ok)}
        ok = ok and m_ok

        out["rss_mb_end"] = round(rss_mb(), 1)
        out["ok"] = bool(ok)
    finally:
        ray.shutdown()
        shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(out))
    sys.exit(0 if out.get("ok") else 1)


if __name__ == "__main__":
    main()
