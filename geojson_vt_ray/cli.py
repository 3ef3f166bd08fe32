"""CLI / `ray job submit` entry point (north rule: the pipeline is
launched via ray job submit on a fixed-size cluster).

    # local
    python -m geojson_vt_ray slice --input docs/ --out /tmp/pyr \
        --index-max-zoom 7 --index-max-points 200
    python -m geojson_vt_ray get-tile --pyramid /tmp/pyr 7 37 48

    # on a cluster (driver container already has RAY_ADDRESS)
    ray job submit --working-dir . -- python -m geojson_vt_ray slice ...

Ray session ownership: this CLI guards its init (`ray.is_initialized()`)
so it composes with `ray job submit`'s pre-connected driver; library
code never calls ray.init (driver contract, __ray_entry__.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _ensure_ray():
    import ray
    if not ray.is_initialized():
        ray.init(include_dashboard=False, logging_level="ERROR")
    return ray


def _load_docs(path: str):
    """Doc-table Dataset from a Lance dataset (``*.lance``, gated on the
    lance package — sources/lance_source.py), a parquet dir/file, or a
    GeoJSON .json file (converted to a one-doc-per-feature table)."""
    import ray.data as rd
    if path.endswith((".geojsonl", ".ndjson", ".geojsons", ".jsonl")):
        from .sources.geojsonseq import read_docs_geojsonseq
        return read_docs_geojsonseq(path)
    if path.endswith(".json") or path.endswith(".geojson"):
        from .sources.docs import doc_table_from_geojson
        with open(path) as f:
            data = json.load(f)
        return rd.from_arrow(doc_table_from_geojson(data))
    from .sources.lance_source import read_docs
    return read_docs(path)


def _print_debug_summary(ts, opts, wall_sec: float) -> None:
    """Reference-shaped debug console summary (debug/debug.js:6-41 +
    src/index.js:27-56 console.time/log lines), sourced from the
    manifest the engine already writes. Goes to STDERR so the CLI's
    one-JSON-line stdout contract stays parseable.

    Timing split caveat: Ray Datasets execute lazily, so parse/wrap
    ("preprocess data" in the reference) runs inside the first level's
    pipeline; we report the per-level loop sum as "generate tiles" and
    the remaining wall time (planning + read + manifest) as
    "preprocess data"."""
    lv = ts.manifest["levels"]
    gen = sum(l.get("t_sec", 0.0) for l in lv)
    pre = max(wall_sec - gen, 0.0)
    # reference `stats` counts CREATED tiles (empty ones are never
    # created): per-zoom histogram of non-empty tiles
    hist = {f"z{l['z']}": l["tiles"] - l.get("empty", 0) for l in lv}
    total = sum(hist.values())
    feats = lv[0].get("rows", 0) if lv else 0
    pts = lv[0].get("points", 0) if lv else 0
    err = sys.stderr
    print(f"preprocess data: {pre * 1000:.0f}ms", file=err)
    print(f"index: maxZoom: {opts.index_max_zoom}, "
          f"maxPoints: {opts.index_max_points}", file=err)
    print(f"features: {feats}, points: {pts}", file=err)
    print(f"generate tiles: {gen * 1000:.0f}ms", file=err)
    print(f"tiles generated: {total} "
          f"{json.dumps(hist, separators=(',', ':'))}", file=err)


def cmd_slice(args) -> int:
    import time
    from .config import TileOptions
    from .pipelines.pyramid import slice_pyramid
    _ensure_ray()
    t0 = time.perf_counter()
    opts = TileOptions(
        max_zoom=args.max_zoom, index_max_zoom=args.index_max_zoom,
        index_max_points=args.index_max_points, tolerance=args.tolerance,
        extent=args.extent, buffer=args.buffer,
        line_metrics=args.line_metrics, promote_id=args.promote_id,
        generate_id=args.generate_id, debug=args.debug)
    docs = _load_docs(args.input)
    if args.repartition:
        docs = docs.repartition(args.repartition)
    if args.append:
        from .pipelines.pyramid import append_to_pyramid
        ts = append_to_pyramid(docs, args.out, batch_size=args.batch_size)
    elif args.shards:
        from .pipelines.pyramid import slice_pyramid_sharded
        ts = slice_pyramid_sharded(docs, opts, args.out,
                                   n_shards=args.shards,
                                   batch_size=args.batch_size,
                                   resume=args.resume)
    else:
        ts = slice_pyramid(docs, opts, args.out, batch_size=args.batch_size,
                           resume=args.resume)
    out = {"out": args.out,
           "tiles": len(ts.tiles),
           "levels": ts.manifest["levels"]}
    if args.debug:  # reference debug console output (src/index.js:39-44)
        out["metrics"] = ts.manifest.get("metrics", {})
        _print_debug_summary(ts, opts, time.perf_counter() - t0)
    print(json.dumps(out))
    return 0


def cmd_get_tile(args) -> int:
    from .pipelines.pyramid import TileSet
    ts = TileSet(args.pyramid)
    if args.mvt:
        data = ts.get_tile_mvt(args.z, args.x, args.y)
        if data is None:
            print("null")
            return 1
        with open(args.mvt, "wb") as f:
            f.write(data)
        print(json.dumps({"mvt": args.mvt, "n_bytes": len(data)}))
        return 0
    tile = ts.get_tile(args.z, args.x, args.y)
    if tile is None:
        print("null")
        return 1
    print(json.dumps(tile))
    return 0


def cmd_tiles_in_bbox(args) -> int:
    from .pipelines.pyramid import TileSet
    ts = TileSet(args.pyramid)
    tiles = ts.tiles_in_bbox(args.west, args.south, args.east,
                             args.north, args.z)
    print(json.dumps({"z": args.z, "n_tiles": len(tiles),
                      "tiles": [[z, x, y] for z, x, y in tiles],
                      "tilejson_bounds": ts.tilejson()["bounds"]}))
    return 0


def cmd_export_mvt(args) -> int:
    _ensure_ray()
    from .pipelines.pyramid import TileSet
    ts = TileSet(args.pyramid)
    manifest = ts.export_mvt(args.out, layer_name=args.layer)
    df = manifest.to_pandas()
    tj = ts.tilejson(name=args.layer)
    with open(os.path.join(args.out, "tilejson.json"), "w") as f:
        json.dump(tj, f)
    print(json.dumps({"out": args.out, "tiles": len(df),
                      "bytes": int(df["n_bytes"].sum()),
                      "tilejson": os.path.join(args.out,
                                               "tilejson.json")}))
    return 0


def cmd_compact(args) -> int:
    """Compact a partitioned parquet store's small files (see
    functions/maintenance.py): one Ray task per hive leaf, rolling
    writer at --target-rows, resume skips finished leaves."""
    _ensure_ray()
    from .functions.maintenance import compact_parquet
    manifest = compact_parquet(args.src, args.out,
                               target_rows=args.target_rows)
    print(json.dumps({
        "src": args.src, "out": args.out,
        "leaves_compacted": len(manifest),
        "files_in": sum(m["files_in"] for m in manifest),
        "files_out": sum(m["files_out"] for m in manifest),
        "rows": sum(m["rows"] for m in manifest)}))
    return 0


def cmd_gen_tiles(args) -> int:
    from .pipelines.pyramid import TileSet
    ts = TileSet(args.pyramid)
    print(json.dumps(ts.gen_tiles()))
    return 0


def cmd_query(args) -> int:
    """Run one registry pipeline over a table dir; print a JSON summary
    or write PARTITIONED parquet with --out (resumable-output contract:
    one file per block, never one giant file). ``--list`` enumerates
    the registry."""
    _ensure_ray()
    from .pipelines.queries import QUERIES
    if args.list:
        print(json.dumps(sorted(QUERIES)))
        return 0
    if args.name not in QUERIES:
        print(json.dumps({"error": f"unknown query {args.name!r}",
                          "available": sorted(QUERIES)}))
        return 2
    import pandas as pd
    import pyarrow as pa
    import ray.data
    if getattr(args, "explain", False):
        res = QUERIES[args.name](args.sf_dir)
        if isinstance(res, ray.data.Dataset):
            # lazy logical plan — nothing has executed yet
            print(res._plan.get_plan_as_string(type(res)))
        else:
            print(f"{args.name}: driver-collected result "
                  f"({type(res).__name__}) — the pipeline executes "
                  "eagerly inside the query function; run without "
                  "--explain and read the per-stage breakdown in "
                  "Ray's dataset logs")
        return 0
    res = QUERIES[args.name](args.sf_dir)
    if args.out:
        if isinstance(res, pa.Table):
            res = ray.data.from_arrow(res)
        elif isinstance(res, pd.DataFrame):
            res = ray.data.from_pandas(res)
        res.write_parquet(args.out)
        n = ray.data.read_parquet(args.out).count()
        print(json.dumps({"query": args.name, "out": args.out,
                          "rows": n}))
        return 0
    if isinstance(res, ray.data.Dataset):
        df = res.to_pandas()
        if getattr(args, "stats", False):
            # executed runtime profile (per-operator wall/CPU/rows):
            # the feedback loop for sizing batch_size/concurrency
            print(res.stats())
    elif isinstance(res, pa.Table):
        df = res.to_pandas()
        if getattr(args, "stats", False):
            print(f"{args.name}: driver-collected result — per-stage "
                  "stats live in Ray's dataset logs for the inner "
                  "pipelines")
    else:
        df = res
    print(json.dumps({"query": args.name, "rows": len(df),
                      "columns": sorted(map(str, df.columns))}))
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="geojson-vt-ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("slice", help="slice a doc corpus into a pyramid")
    sp.add_argument("--input", required=True,
                    help="parquet doc-table path, or a .json GeoJSON file")
    sp.add_argument("--out", required=True)
    sp.add_argument("--max-zoom", type=int, default=14)
    sp.add_argument("--index-max-zoom", type=int, default=5)
    sp.add_argument("--index-max-points", type=int, default=100000)
    sp.add_argument("--tolerance", type=float, default=3.0)
    sp.add_argument("--extent", type=int, default=4096)
    sp.add_argument("--buffer", type=int, default=64)
    sp.add_argument("--line-metrics", action="store_true")
    sp.add_argument("--promote-id", default=None)
    sp.add_argument("--generate-id", action="store_true")
    sp.add_argument("--debug", type=int, default=0, choices=(0, 1, 2),
                    help="timing/stats verbosity: 1 records Ray's "
                         "per-operator stats in the manifest metrics, "
                         "2 adds per-level operator detail")
    sp.add_argument("--batch-size", type=int, default=64)
    sp.add_argument("--repartition", type=int, default=0)
    sp.add_argument("--resume", action="store_true",
                    help="resume from out dir's last level checkpoint")
    sp.add_argument("--shards", type=int, default=0,
                    help="per-shard checkpointed full-split slicing "
                         "(requires --index-max-points <= 0); with "
                         "--resume, completed shards are skipped")
    sp.add_argument("--append", action="store_true",
                    help="incremental: slice --input as a delta into the "
                         "existing full-split pyramid at --out")
    sp.set_defaults(fn=cmd_slice)

    gt = sub.add_parser("get-tile", help="serve one tile (drill-down on miss)")
    gt.add_argument("--pyramid", required=True)
    gt.add_argument("z", type=int)
    gt.add_argument("x", type=int)
    gt.add_argument("y", type=int)
    gt.add_argument("--mvt", default=None,
                    help="write the tile as MVT protobuf to this path")
    gt.set_defaults(fn=cmd_get_tile)

    tb = sub.add_parser(
        "tiles-in-bbox", help="list the non-empty tiles a lon/lat "
        "viewport needs at a zoom (west > east wraps the antimeridian)")
    tb.add_argument("--pyramid", required=True)
    tb.add_argument("west", type=float)
    tb.add_argument("south", type=float)
    tb.add_argument("east", type=float)
    tb.add_argument("north", type=float)
    tb.add_argument("z", type=int)
    tb.set_defaults(fn=cmd_tiles_in_bbox)

    em = sub.add_parser(
        "export-mvt", help="distributed {z}/{x}/{y}.mvt export of a "
        "full-split pyramid")
    em.add_argument("--pyramid", required=True)
    em.add_argument("--out", required=True)
    em.add_argument("--layer", default="geojsonvt")
    em.set_defaults(fn=cmd_export_mvt)

    cp = sub.add_parser(
        "compact", help="compact a partitioned parquet store's "
        "small files (resumable, per-leaf Ray tasks)")
    cp.add_argument("--src", required=True)
    cp.add_argument("--out", required=True)
    cp.add_argument("--target-rows", type=int, default=1_000_000)
    cp.set_defaults(fn=cmd_compact)

    ge = sub.add_parser("gen-tiles", help="enumerate every first-pass tile")
    ge.add_argument("--pyramid", required=True)
    ge.set_defaults(fn=cmd_gen_tiles)

    qp = sub.add_parser(
        "query", help="run a registry pipeline (queries()) over a "
        "table dir; --out writes partitioned parquet")
    qp.add_argument("name", nargs="?", default="")
    qp.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    qp.add_argument("--out", default=None)
    qp.add_argument("--list", action="store_true")
    qp.add_argument("--explain", action="store_true",
                    help="print the Ray Data logical plan of a "
                    "Dataset-returning query without executing it; "
                    "driver-collected queries (pa.Table results) "
                    "execute eagerly inside their function and "
                    "report that instead")
    qp.add_argument("--stats", action="store_true",
                    help="after executing, print ds.stats() — the "
                    "per-operator wall/CPU/rows runtime profile used "
                    "to size batch_size and concurrency")
    qp.set_defaults(fn=cmd_query)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
