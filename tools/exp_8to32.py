#!/usr/bin/env python
"""8→32 CPU scaling experiment (VERDICT r3 item 7): does tuning the
read fanout (blocks per core) or DataContext.target_max_block_size
move the documented ~0.46-0.55 single-socket 8→32 ceiling on the
headline pyramid job?

Runs the headline slice (no PIP leg — isolates the pyramid engine) in
a FRESH process per (config, num_cpus) over a shared pre-synthesized
corpus, and prints one JSON line per run plus a final summary line.

    python tools/exp_8to32.py [--n-docs 96000]

This script OWNS its Ray sessions (one per child process)."""

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

CONFIGS = {
    # blocks-per-core multiplier, target_max_block_size (None=default)
    "base_2x": (2, None),
    "fanout_4x": (4, None),
    "fanout_8x": (8, None),
    "blk32mb": (2, 32 * 1024 * 1024),
    "fanout4x_blk32mb": (4, 32 * 1024 * 1024),
}


def child(n_cpus: int, mult: int, blk: int | None,
          corpus_file: str) -> None:
    import ray
    ray.init(address="local", num_cpus=n_cpus, include_dashboard=False,
             logging_level="ERROR")
    import ray.data as rd
    if blk is not None:
        rd.DataContext.get_current().target_max_block_size = blk
    from geojson_vt_ray.config import TileOptions
    from geojson_vt_ray.pipelines.pyramid import slice_pyramid
    from geojson_vt_ray.sources.docs import synthesize_corpus

    opts = TileOptions(max_zoom=14, index_max_zoom=6,
                      index_max_points=0)
    with tempfile.TemporaryDirectory() as td:   # warmup
        slice_pyramid(rd.from_arrow(synthesize_corpus(200))
                      .repartition(32), opts, td, batch_size=64)
    docs = rd.read_parquet(corpus_file).materialize()
    n_docs = docs.count()
    n_blocks = max(16, mult * n_cpus)
    batch_size = min(512, max(64, -(-n_docs // n_blocks)))
    docs = docs.repartition(n_blocks)
    t0 = time.perf_counter()
    with tempfile.TemporaryDirectory() as td:
        ts = slice_pyramid(docs, opts, td, batch_size=batch_size,
                           carry_spans=False)
        n_tiles = len(ts.tiles)
    wall = time.perf_counter() - t0
    print(json.dumps({"n_cpus": n_cpus, "mult": mult, "blk": blk,
                      "wall": round(wall, 3), "n_tiles": n_tiles,
                      "tiles_per_sec": round(n_tiles / wall, 2)}))
    ray.shutdown()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=96000)
    ap.add_argument("--child", nargs=4, default=None)
    args = ap.parse_args()
    if args.child:
        n, m, b, f = args.child
        child(int(n), int(m), None if b == "none" else int(b), f)
        return 0

    from geojson_vt_ray.sources.docs import synthesize_corpus, \
        write_corpus
    corpus_dir = tempfile.mkdtemp(prefix="gvt_exp_corpus_")
    corpus_file = write_corpus(synthesize_corpus(args.n_docs),
                               os.path.join(corpus_dir, "corpus"))
    out = {}
    try:
        for name, (mult, blk) in CONFIGS.items():
            out[name] = {}
            for n in (8, 32):
                proc = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--child", str(n), str(mult),
                     "none" if blk is None else str(blk), corpus_file],
                    capture_output=True, text=True, timeout=1800)
                line = [ln for ln in proc.stdout.splitlines()
                        if ln.startswith("{")][-1]
                r = json.loads(line)
                out[name][n] = r
                print(name, json.dumps(r), flush=True)
    finally:
        import shutil
        shutil.rmtree(corpus_dir, ignore_errors=True)

    summary = {name: {
        "tps8": v[8]["tiles_per_sec"], "tps32": v[32]["tiles_per_sec"],
        "eff_8_32": round((v[32]["tiles_per_sec"] /
                           v[8]["tiles_per_sec"]) / 4.0, 3)}
        for name, v in out.items()}
    print("SUMMARY " + json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
