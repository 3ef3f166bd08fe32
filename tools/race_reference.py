#!/usr/bin/env python
"""Single-node race vs the reference JS engine on an identical corpus.

Builds an n-feature jittered us-states corpus (the bench corpus
generator), feeds the SAME features to:

1. the reference geojson-vt under node (in-memory, single thread,
   writes nothing) via a tiny generated driver script, and
2. this engine's full-split pyramid (32 CPUs by default, persists every
   tile + leaf source + manifest to partitioned parquet),

with identical options (maxZoom 14, indexMaxZoom 7, indexMaxPoints 0),
asserts equal tile counts, and prints one JSON line. Timings on this
shared VM drift +-2x between runs — compare medians of several runs.

Run: python tools/race_reference.py [--n 50000] [--num-cpus 32]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

NODE_DRIVER = r"""
import geojsonvt from '/root/reference/src/index.js';
import fs from 'fs';
const data = JSON.parse(fs.readFileSync(process.argv[2], 'utf8'));
const t0 = process.hrtime.bigint();
const idx = geojsonvt(data, {maxZoom: 14, indexMaxZoom: 7,
                             indexMaxPoints: 0});
const t1 = process.hrtime.bigint();
const n = Object.keys(idx.tiles).length;
console.log(JSON.stringify({slice_sec: Number(t1 - t0) / 1e9, tiles: n}));
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=50_000)
    ap.add_argument("--num-cpus", type=int, default=32)
    args = ap.parse_args()

    from geojson_vt_ray.sources.docs import (load_seed_geometries,
                                             _jitter_feature)
    seeds = load_seed_geometries()
    feats = [_jitter_feature(seeds[i % len(seeds)], i // len(seeds))
             for i in range(args.n)]
    fc = {"type": "FeatureCollection", "features": feats}

    with tempfile.TemporaryDirectory() as td:
        gj = os.path.join(td, "corpus.json")
        with open(gj, "w") as f:
            json.dump(fc, f)
        drv = os.path.join(td, "drv.mjs")
        with open(drv, "w") as f:
            f.write(NODE_DRIVER)
        t0 = time.perf_counter()
        proc = subprocess.run(["node", drv, gj], capture_output=True,
                              text=True, timeout=1800)
        node_wall = time.perf_counter() - t0
        lines = proc.stdout.strip().splitlines()
        if proc.returncode != 0 or not lines:
            # the reference died (typically V8 heap exhaustion on large
            # corpora at indexMaxPoints=0) — still run our side and
            # report the capacity failure instead of crashing the race
            node = {"slice_sec": None, "tiles": None,
                    "error": (proc.stderr or "no output").strip()[-400:],
                    "returncode": proc.returncode}
        else:
            node = json.loads(lines[-1])

        import ray
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
        import ray.data as rd
        from geojson_vt_ray.config import TileOptions
        from geojson_vt_ray.pipelines.pyramid import slice_pyramid
        from geojson_vt_ray.sources.docs import doc_table_from_geojson
        opts = TileOptions(max_zoom=14, index_max_zoom=7,
                           index_max_points=0)
        # warmup (worker pool spin-up excluded, same as bench.py)
        wtab = doc_table_from_geojson(
            {"type": "FeatureCollection", "features": feats[:200]})
        with tempfile.TemporaryDirectory() as wd:
            slice_pyramid(rd.from_arrow(wtab).repartition(32), opts, wd,
                          batch_size=64)
        tab = doc_table_from_geojson(fc)
        n_blocks = max(16, 2 * args.num_cpus)
        bs = min(512, max(64, -(-args.n // n_blocks)))
        docs = rd.from_arrow(tab).repartition(n_blocks)
        t0 = time.perf_counter()
        with tempfile.TemporaryDirectory() as od:
            ts = slice_pyramid(docs, opts, od, batch_size=bs,
                               carry_spans=False)
            ours_tiles = len(ts.tiles)
        ours_sec = time.perf_counter() - t0
        ray.shutdown()

    ref = {"incl_parse_wall_sec": round(node_wall, 2), "tiles": node["tiles"]}
    if node["slice_sec"] is None:
        ref["error"] = node["error"]
        ref["slice_sec"] = None
    else:
        ref["slice_sec"] = round(node["slice_sec"], 2)
    print(json.dumps({
        "n_features": args.n,
        "reference_node": ref,
        "ray_tileslice": {"wall_sec": round(ours_sec, 2),
                          "tiles": ours_tiles,
                          "num_cpus": args.num_cpus,
                          "persists_output": True},
        "tiles_equal": (ours_tiles == node["tiles"]
                        if node["tiles"] is not None else None),
        "ratio_vs_reference_slice": (
            round(ours_sec / node["slice_sec"], 2)
            if node["slice_sec"] else None),
    }))


if __name__ == "__main__":
    main()
