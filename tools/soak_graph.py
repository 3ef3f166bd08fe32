#!/usr/bin/env python
"""Soak run for the graph/basket operator family: triangle_count,
basket_pairs and graph_bfs end-to-end over a replicated co-purchase
graph ~N x the sf0.1 bench table, with a deliberately small object
store — demonstrating the family's scale claims (edge streams shuffle,
part-dimension sides broadcast, nothing corpus-sized on the driver).

    python tools/soak_graph.py [--replicas 10] [--store-gb 4]

Each replica offsets BOTH l_orderkey and l_partkey, so the graph is
``replicas`` disjoint isomorphic copies of the base graph: triangle
node-count totals and qualifying basket-pair row counts must equal
exactly ``replicas x`` the base values — a hard correctness invariant
at soak scale, not just a throughput number.

Prints ONE JSON line; record the result in BASELINE.md.

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

BASE_DIR = "/root/testdata/sf0.1"
# sf0.1 base-graph facts (asserted against the replicated run):
BASE_TRI_NODE_SUM = 3 * 1_884_488  # sum of per-part triangle counts
BASE_BASKET_ROWS = 3_573           # pairs with support >= 2


def synthesize(out_dir: str, replicas: int) -> dict:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    li = pq.read_table(f"{BASE_DIR}/lineitem.parquet",
                       columns=["l_orderkey", "l_partkey"])
    ok = li.column("l_orderkey").to_numpy(zero_copy_only=False)
    pk = li.column("l_partkey").to_numpy(zero_copy_only=False)
    o_off = int(ok.max()) + 1
    p_off = int(pk.max()) + 1
    pt = pq.read_table(f"{BASE_DIR}/part.parquet", columns=["p_partkey"])
    pkeys = pt.column("p_partkey").to_numpy(zero_copy_only=False)

    def shard(batch):
        rs = batch["id"]
        t_ok, t_pk = [], []
        for r in rs:
            t_ok.append(ok + r * o_off)
            t_pk.append(pk + r * p_off)
        return pa.table({
            "l_orderkey": pa.array(np.concatenate(t_ok)),
            "l_partkey": pa.array(np.concatenate(t_pk))})

    t0 = time.time()
    (rd.range(replicas)
     .repartition(replicas)
     .map_batches(shard, batch_format="numpy")
     .write_parquet(os.path.join(out_dir)))
    # queries read {dir}/lineitem.parquet and {dir}/part.parquet: give
    # them directory paths with the expected names
    li_dir = os.path.join(out_dir, "lineitem.parquet")
    os.makedirs(li_dir, exist_ok=True)
    for f in os.listdir(out_dir):
        p = os.path.join(out_dir, f)
        if f.endswith(".parquet") and os.path.isfile(p):
            shutil.move(p, os.path.join(li_dir, f))
    parts_all = np.concatenate([pkeys + r * p_off
                                for r in range(replicas)])
    pq.write_table(pa.table({"p_partkey": pa.array(parts_all)}),
                   os.path.join(out_dir, "part.parquet"))
    return {"t_synth_sec": round(time.time() - t0, 2),
            "rows": int(len(ok)) * replicas}


def rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def spill_mb() -> float:
    try:
        from ray._private.internal_api import memory_summary
        s = memory_summary(stats_only=True)
        m = re.search(r"Spilled (\d+) MiB", s)
        return float(m.group(1)) if m else 0.0
    except Exception:
        return -1.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--store-gb", type=float, default=4.0)
    args = ap.parse_args()

    import ray
    import logging
    import ray.data  # noqa: F401 (import resets logging; silence after)
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR",
             object_store_memory=int(args.store_gb * (1 << 30)))

    out: dict = {"replicas": args.replicas,
                 "store_gb": args.store_gb,
                 "rss_mb_start": round(rss_mb(), 1)}
    tmp = tempfile.mkdtemp(prefix="soak_graph_", dir="/tmp")
    try:
        out["synth"] = synthesize(tmp, args.replicas)

        from geojson_vt_ray.pipelines import queries as Q

        t0 = time.time()
        tri = Q.q_triangle_count(tmp)
        tri_df = tri.to_pandas()
        out["triangle"] = {
            "t_sec": round(time.time() - t0, 2),
            "rows": len(tri_df),
            "node_sum": int(tri_df["n_tri"].sum()),
            "expect_node_sum": BASE_TRI_NODE_SUM * args.replicas,
            "exact": bool(int(tri_df["n_tri"].sum())
                          == BASE_TRI_NODE_SUM * args.replicas)}

        t0 = time.time()
        bp = Q.q_basket_pairs(tmp)
        bp_df = bp.to_pandas()
        out["basket"] = {
            "t_sec": round(time.time() - t0, 2),
            "rows": len(bp_df),
            "expect_rows": BASE_BASKET_ROWS * args.replicas,
            "exact": bool(len(bp_df)
                          == BASE_BASKET_ROWS * args.replicas)}

        t0 = time.time()
        bfs = Q.q_graph_bfs(tmp)
        out["bfs"] = {"t_sec": round(time.time() - t0, 2),
                      "rows": bfs.num_rows}

        # component_sizes: R disjoint isomorphic copies -> the base
        # graph's single 20000-part component appears exactly R times,
        # i.e. histogram == {20000: R}. Above 10 replicas the edge set
        # (~598k x R undirected) exceeds filtered_components' 4M driver
        # budget, so this also exercises a REAL contraction pass (star
        # edges, one coarse shuffle) before the driver finish — the
        # scale path, not just the collect fast path.
        t0 = time.time()
        cs_df = Q.q_component_sizes(tmp).to_pandas()
        got_hist = dict(zip(cs_df["size"].astype(int),
                            cs_df["n_components"].astype(int)))
        out["components"] = {
            "t_sec": round(time.time() - t0, 2),
            "hist": got_hist,
            "expect_hist": {20000: args.replicas},
            "exact": bool(got_hist == {20000: args.replicas})}

        out["rss_mb_end"] = round(rss_mb(), 1)
        out["spilled_mb"] = spill_mb()
        out["ok"] = bool(out["triangle"]["exact"]
                         and out["basket"]["exact"]
                         and out["components"]["exact"])
    finally:
        ray.shutdown()
        shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(out))
    sys.exit(0 if out.get("ok") else 1)


if __name__ == "__main__":
    main()
