"""Distributed pyramid slicing: the Ray Data equivalent of the reference's
splitTile driver (src/index.js:66-156), BFS by zoom level.

Per level z (SURVEY.md §3.1):

  1. level rows (feature rows keyed (z,x,y)) are persisted to
     ``levels/z={z}/`` parquet — this is simultaneously the reference's
     ``tile.source`` retention (index.js:101-102: leaves keep source for
     drill-down) and the per-level resumable checkpoint (north rule).
  2. the stopping aggregate (A4, index.js:107): per-batch partial tile
     sums -> tiny (tile_id, n_points) table -> split/leaf decision.
     With index_max_points <= 0 every tile with rows splits and the
     decision set is skipped entirely (the benchmark full-pyramid mode).
  3. tile build + quantize -> ``tiles/z={z}/`` parquet.
  4. split stage emits level z+1 rows (broadcast decision via ray.put —
     one object, read per actor, never re-shipped per batch).

The manifest records every *created* tile (the reference creates all 4
children of any split tile, even empty ones — index.js:151-154 pushes
unconditionally — and empty tiles appear in genTiles output with []),
with status split/leaf/empty, giving getTile its ancestor walk.

Scale note: the split decision currently combines per-batch partials on
the driver (#distinct tiles per level rows); at z>=12 full-pyramid scale
this should switch to a Ray groupby + join-back — the stage already
accepts the decision as an int64 id array, so only the combine changes.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..config import TileOptions
from ..kernels.tileid import tile_id, tile_id_vec, wrap_x
from ..local_index import LocalIndex
from ..stages.build import BuildTiles
from ..stages.fullsplit import FullSplitBuild, tile_coords_partial
from ..stages.parse import ParseDocs
from ..stages.split import SplitLevel, level_counts
from ..stages.wrap import WrapStage

STATUS_SPLIT = "split"
STATUS_LEAF = "leaf"
STATUS_EMPTY = "empty"

# above this many candidate tiles per level, the stopping aggregate is
# pre-combined distributedly before reaching the driver
DEEP_LEVEL_COMBINE_THRESHOLD = 20_000


_OPT_FIELDS = ("max_zoom", "index_max_zoom", "index_max_points", "tolerance",
               "extent", "buffer", "line_metrics", "promote_id",
               "generate_id")


def _options_dict(options: TileOptions) -> dict:
    return {f: getattr(options, f) for f in _OPT_FIELDS}


def _clear_run_state(out_dir: str, data: bool = False) -> None:
    """Fresh (resume=False) run: drop every completion/lineage artifact
    from a prior run BEFORE touching data, so a crash mid-rewrite can
    never leave a stale _COMPLETE/manifest/checkpoint next to partial
    data that a later resume would trust.

    ``data=True`` additionally removes ALL prior data subtrees (every
    layout's: levels/tiles/combined/shards) — write_parquet appends new
    UUID-named files beside old ones, so a rerun into a used out_dir
    would otherwise read doubled rows (or, on a layout switch, leave the
    other layout's tree on disk indefinitely)."""
    for name in ("_COMPLETE", "manifest.json", "checkpoint.json"):
        p = os.path.join(out_dir, name)
        if os.path.exists(p):
            os.remove(p)
    if data:
        import shutil
        for sub in ("levels", "tiles", "combined", "shards"):
            p = os.path.join(out_dir, sub)
            if os.path.isdir(p):
                shutil.rmtree(p)


def _check_resume_options(recorded, options: TileOptions, what: str) -> None:
    want = _options_dict(options)
    if recorded is not None and dict(recorded) != want:
        raise ValueError(
            f"resume=True but {what} was written with different "
            f"TileOptions: {recorded} != {want}; rerun with resume=False")


def _strip_spans(batch: pa.Table) -> pa.Table:
    """Null the spans payload column (carry_spans=False): tile rows keep
    doc_id, so spans re-attach from the corpus table by key. Duplicating
    the heaviest payload column onto every tile row is ~25x write
    amplification at pyramid fan-out — pointing at the corpus is the
    at-scale layout; per-row carriage (the default) preserves reference
    fidelity and is what the span-sequence conformance tests pin."""
    from ..arrowio import SPAN_TYPE
    i = batch.schema.get_field_index("spans")
    return batch.set_column(i, "spans",
                            pa.nulls(batch.num_rows, SPAN_TYPE))


def slice_pyramid(docs: "ray.data.Dataset", options: TileOptions,
                  out_dir: str, *, batch_size: int = 1024,
                  concurrency=None, resume: bool = False,
                  carry_spans: bool = True) -> "TileSet":
    """Run the full first-pass tiling over a doc-table Dataset.

    Returns a TileSet over ``out_dir``. ``docs`` must have columns
    (doc_id, seq, spans) per BASELINE.json input_hint.

    With ``index_max_points <= 0`` (the full-split recipe) the stopping
    aggregate is vacuous, so the whole pyramid runs as ONE barrier-free
    map_batches pass (stages/fullsplit.py) instead of the per-level loop.

    ``resume=True`` (adaptive path): restart from the last fully
    checkpointed zoom level in ``out_dir`` (north rule: per-partition
    lineage + metrics in checkpoint.json after every level; partially
    written deeper levels are discarded and recomputed from the last
    complete level's persisted rows + split decision).
    """
    import ray

    if options.index_max_points <= 0:
        return _slice_fullsplit(docs, options, out_dir,
                                batch_size=batch_size,
                                concurrency=concurrency,
                                carry_spans=carry_spans,
                                resume=resume)

    os.makedirs(out_dir, exist_ok=True)
    kw = {"batch_format": "pyarrow", "batch_size": batch_size}
    if concurrency:
        kw["concurrency"] = concurrency

    manifest_tiles: dict[int, tuple[int, int, int, str]] = {}
    level_tiles: list[tuple[int, int, int]] = [(0, 0, 0)]
    levels_meta = []
    last_lvl_stats = None
    data_bbox = None
    z = 0

    ckpt_path = os.path.join(out_dir, "checkpoint.json")
    if not resume:
        _clear_run_state(out_dir, data=True)
    elif not (os.path.exists(ckpt_path) or os.path.exists(
            os.path.join(out_dir, "manifest.json"))):
        # resume=True but nothing completed: a crash DURING level 0's
        # write (the first checkpoint only lands after level 0) left
        # partial parquet with no lineage — restart clean, else the new
        # write appends beside the stale files and doubles every row
        _clear_run_state(out_dir, data=True)
    if resume and os.path.exists(os.path.join(out_dir, "manifest.json")):
        with open(os.path.join(out_dir, "manifest.json")) as f:
            _check_resume_options(json.load(f).get("options"), options,
                                  "manifest.json")
        return TileSet(out_dir, options)
    if resume and os.path.exists(ckpt_path):
        with open(ckpt_path) as f:
            ck = json.load(f)
        _check_resume_options(ck.get("options"), options, "checkpoint.json")
        z0 = ck["last_complete_z"]
        # discard anything written past the checkpoint (mid-write crash)
        import shutil
        for sub in ("levels", "tiles"):
            base = os.path.join(out_dir, sub)
            if os.path.isdir(base):
                for d in os.listdir(base):
                    if d.startswith("z=") and int(d[2:]) > z0:
                        shutil.rmtree(os.path.join(base, d))
        manifest_tiles = {tile_id(tz, tx, ty): (tz, tx, ty, st)
                          for tz, tx, ty, st in ck["manifest_tiles"]}
        levels_meta = ck["levels_meta"]
        level_tiles = [tuple(t) for t in ck["next_level_tiles"]]
        split_ids_list = ck["split_ids"]
        data_bbox = ck.get("data_bbox")
        if not split_ids_list:
            # run had finished all levels; only the manifest write was
            # lost — rewrite it from the checkpoint and serve
            _write_manifest(out_dir, options, levels_meta, manifest_tiles,
                            data_bbox=data_bbox)
            return TileSet(out_dir, options)
        ds = ray.data.read_parquet(os.path.join(out_dir, "levels",
                                                f"z={z0}"))
        ids_ref = ray.put(np.asarray(split_ids_list, dtype=np.int64))
        ds = ds.map_batches(SplitLevel(options, ids_ref), **kw)
        z = z0 + 1
    else:
        ds = docs.map_batches(ParseDocs(options), **kw)
        ds = ds.map_batches(WrapStage(options), **kw)
        if not carry_spans:
            ds = ds.map_batches(_strip_spans, batch_format="pyarrow")

    import time as _time
    while True:
        _t_level0 = _time.perf_counter()
        lvl_dir = os.path.join(out_dir, "levels", f"z={z}")
        ds.write_parquet(lvl_dir)
        lvl_stats = None
        if options.debug >= 1:  # per-level operator detail (index.js:90-98)
            try:
                lvl_stats = ds.stats()
                last_lvl_stats = lvl_stats
            except Exception:
                pass
            if options.debug < 2:
                lvl_stats = None  # summary only: manifest metrics get
                #                   the final level's stats, not each one
        if not os.path.isdir(lvl_dir) or not os.listdir(lvl_dir):
            # zero-row level: no tiles created at all (index.js:51)
            if z == 0:
                level_tiles = []
            pdf = pd.DataFrame({"tile_id": [], "n_points": [], "n_rows": []})
        else:
            ds = ray.data.read_parquet(lvl_dir)
            if z == 0 and data_bbox is None:
                # data extent for tilejson bounds: pruned 4-column read
                # of the root level, block-bounded driver fold
                data_bbox = _collect_data_bbox(ray.data.read_parquet(
                    lvl_dir, columns=["minx", "miny", "maxx", "maxy"]))
            # stopping aggregate: tiny per-batch partials, combined
            parts = ds.map_batches(level_counts, batch_format="pyarrow",
                                   batch_size=batch_size)
            if len(level_tiles) > DEEP_LEVEL_COMBINE_THRESHOLD:
                # deep levels: pre-combine distributedly (coarse-key
                # shuffle + vectorized per-tile sums — NOT a per-tile
                # groupby, whose per-group overhead is ruinous at 1e5+
                # groups) so the driver only receives one row per tile
                from ..functions.shuffle import coarse_mask
                cmask = coarse_mask()

                def _coarse(b: pa.Table) -> pa.Table:
                    tid = b.column("tile_id").to_numpy(zero_copy_only=False)
                    return b.append_column(
                        "pkey", pa.array((tid & cmask).astype(np.int32)))

                def _comb(g: pd.DataFrame) -> pd.DataFrame:
                    return g.groupby("tile_id", as_index=False).agg(
                        n_points=("n_points", "sum"),
                        n_rows=("n_rows", "sum"))

                parts = (parts.map_batches(_coarse, batch_format="pyarrow")
                         .groupby("pkey").map_groups(
                             _comb, batch_format="pandas"))
            pdf = parts.to_pandas()
        if len(pdf):
            counts = pdf.groupby("tile_id", as_index=False).agg(
                n_points=("n_points", "sum"), n_rows=("n_rows", "sum"))
        else:
            counts = pd.DataFrame({"tile_id": [], "n_points": [],
                                   "n_rows": []})
        with_rows = set(int(t) for t in counts["tile_id"])

        # split decision (index.js:105-107)
        if z >= options.index_max_zoom:
            split_set: set[int] = set()
        elif options.index_max_points <= 0:
            split_set = set(with_rows)
        else:
            split_set = set(
                int(t) for t, n in zip(counts["tile_id"], counts["n_points"])
                if int(n) > options.index_max_points)

        next_tiles: list[tuple[int, int, int]] = []
        n_leaf = n_split = n_empty = 0
        for (tz, tx, ty) in level_tiles:
            tid = tile_id(tz, tx, ty)
            if tid in split_set:
                status = STATUS_SPLIT
                n_split += 1
                next_tiles.extend([(tz + 1, tx * 2, ty * 2),
                                   (tz + 1, tx * 2, ty * 2 + 1),
                                   (tz + 1, tx * 2 + 1, ty * 2),
                                   (tz + 1, tx * 2 + 1, ty * 2 + 1)])
            elif tid in with_rows:
                status = STATUS_LEAF
                n_leaf += 1
            else:
                status = STATUS_EMPTY
                n_empty += 1
            manifest_tiles[tid] = (tz, tx, ty, status)

        # build + write this level's tiles
        tiles_dir = os.path.join(out_dir, "tiles", f"z={z}")
        if with_rows:
            ds.map_batches(BuildTiles(options), **kw).write_parquet(tiles_dir)

        levels_meta.append({"z": z, "tiles": len(level_tiles),
                            "leaf": n_leaf, "split": n_split,
                            "empty": n_empty,
                            "rows": int(counts["n_rows"].sum()) if len(counts) else 0,
                            "points": int(counts["n_points"].sum()) if len(counts) else 0,
                            # per-level wall time: the debug timing
                            # side-channel (reference src/index.js debug
                            # console.time per splitTile pass)
                            "t_sec": round(_time.perf_counter()
                                           - _t_level0, 3),
                            **({"ray_stats": lvl_stats}
                               if lvl_stats else {})})

        # per-level checkpoint (north rule): level z's rows + tiles are
        # durable and the split decision is recorded, so a failed run
        # resumes at z+1 without recomputing parse/wrap/earlier levels
        with open(ckpt_path, "w") as f:
            json.dump({"options": _options_dict(options),
                       "last_complete_z": z,
                       "split_ids": sorted(int(t) for t in split_set),
                       "next_level_tiles": next_tiles,
                       "manifest_tiles": [[tz, tx, ty, st]
                                          for tz, tx, ty, st
                                          in manifest_tiles.values()],
                       "data_bbox": data_bbox,
                       "levels_meta": levels_meta}, f)

        if not split_set:
            break

        ids_ref = None
        if options.index_max_points > 0:
            ids_ref = ray.put(np.fromiter(split_set, dtype=np.int64,
                                          count=len(split_set)))
        ds = ds.map_batches(SplitLevel(options, ids_ref), **kw)
        level_tiles = next_tiles
        z += 1

    metrics = None
    if options.debug >= 1 and last_lvl_stats is not None:
        metrics = {"ray_stats": last_lvl_stats}
    _write_manifest(out_dir, options, levels_meta, manifest_tiles,
                    metrics=metrics, data_bbox=data_bbox)
    return TileSet(out_dir, options)


def _write_manifest(out_dir: str, options: TileOptions, levels_meta,
                    manifest_tiles: dict, metrics: dict | None = None,
                    data_bbox: list | None = None) -> None:
    manifest = {
        "options": _options_dict(options),
        "levels": levels_meta,
        "tiles": [[tz, tx, ty, st]
                  for tz, tx, ty, st in manifest_tiles.values()],
    }
    if data_bbox:
        manifest["bbox"] = data_bbox
    if metrics:
        manifest["metrics"] = metrics
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f)


def _collect_data_bbox(ds) -> list | None:
    """Projected-space [minx, miny, maxx, maxy] over a feature-row
    Dataset: per-batch 1-row partials folded on the driver (bounded by
    block count, never rows). ``ds`` must already be column-pruned to
    the four bbox columns."""
    import ray

    def part(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({c: pa.array([], pa.float64())
                             for c in ("minx", "miny", "maxx", "maxy")})
        out = {}
        for c in ("minx", "miny", "maxx", "maxy"):
            v = b.column(c).to_numpy(zero_copy_only=False)
            out[c] = pa.array(
                [float(v.min() if c.startswith("min") else v.max())])
        return pa.table(out)

    bb = None
    for t in ray.get(ds.map_batches(part, batch_format="pyarrow")
                     .to_arrow_refs()):
        if t.num_rows == 0 or "minx" not in t.column_names:
            continue
        row = [t.column(c)[0].as_py()
               for c in ("minx", "miny", "maxx", "maxy")]
        if bb is None:
            bb = row
        else:
            bb = [min(bb[0], row[0]), min(bb[1], row[1]),
                  max(bb[2], row[2]), max(bb[3], row[3])]
    return bb


def _slice_fullsplit(docs: "ray.data.Dataset", options: TileOptions,
                     out_dir: str, *, batch_size: int = 1024,
                     concurrency=None, carry_spans: bool = True,
                     resume: bool = False) -> "TileSet":
    """Barrier-free full pyramid: parse -> wrap -> FullSplitBuild -> one
    hive-partitioned write, then a tiny pruned-column aggregate for the
    manifest. Resume granularity: within a run Ray retries failed write
    tasks; across runs a _COMPLETE marker after the write lets a crashed
    manifest step rebuild without recomputing the pyramid."""
    import ray

    os.makedirs(out_dir, exist_ok=True)
    comb = os.path.join(out_dir, "combined")
    marker = os.path.join(out_dir, "_COMPLETE")
    if not resume:
        _clear_run_state(out_dir, data=True)
    if resume and os.path.exists(os.path.join(out_dir, "manifest.json")):
        with open(os.path.join(out_dir, "manifest.json")) as f:
            _check_resume_options(json.load(f).get("options"), options,
                                  "manifest.json")
        return TileSet(out_dir, options)
    metrics = None
    if not (resume and os.path.exists(marker)):
        import time
        if os.path.isdir(comb):  # partial write from a crashed run
            import shutil
            shutil.rmtree(comb)
        kw = {"batch_format": "pyarrow", "batch_size": batch_size}
        if concurrency:
            kw["concurrency"] = concurrency
        t0 = time.perf_counter()
        ds = docs.map_batches(ParseDocs(options), **kw)
        ds = ds.map_batches(WrapStage(options), **kw)
        if not carry_spans:
            ds = ds.map_batches(_strip_spans, batch_format="pyarrow")
        ds = ds.map_batches(FullSplitBuild(options), **kw)
        ds.write_parquet(comb, partition_cols=["okind", "z"])
        t1 = time.perf_counter()
        # reference debug side-channel (src/index.js:27,39-44: the
        # 'preprocess data'/'generate tiles' console.time pair) — here
        # the streaming executor fuses the stages, so the split is
        # slice+write wall vs manifest wall, plus Ray's own per-operator
        # stats string for per-stage depth
        metrics = {"t_slice_write_sec": round(t1 - t0, 3)}
        if options.debug >= 1:
            try:
                metrics["ray_stats"] = ds.stats()
            except Exception:
                pass  # stats are best-effort debug output
        with open(marker, "w") as f:
            f.write("ok")

    _rebuild_fullsplit_manifest(out_dir, options, batch_size,
                                metrics=metrics)
    return TileSet(out_dir, options)


def _rebuild_fullsplit_manifest(out_dir: str, options: TileOptions,
                                batch_size: int = 1024,
                                metrics: dict | None = None) -> None:
    """Distributed pruned-column aggregate over the combined data ->
    manifest.json (statuses + per-zoom stats). Idempotent; also used by
    resume and append. ``metrics`` (slicing wall times from the caller)
    is recorded under manifest["metrics"] together with this step's own
    wall time — the reference's debug timing side-channel
    (src/index.js:27,39-44)."""
    import time
    import ray

    t_manifest0 = time.perf_counter()

    comb = os.path.join(out_dir, "combined")
    nonempty: dict[int, dict[tuple[int, int], int]] = {}
    stats_dir = os.path.join(comb, "okind=2")
    # the okind=2 fast path is only sound if EVERY slice that wrote into
    # this dir emitted the side-channel: a pyramid written before the
    # side-channel existed and appended to afterwards has stats for the
    # delta only — detected via the manifest flag, forcing a full scan
    prior_manifest = os.path.join(out_dir, "manifest.json")
    stats_complete = True
    if os.path.exists(prior_manifest):
        with open(prior_manifest) as f:
            stats_complete = bool(json.load(f).get("stats_side_channel"))
    import glob as _glob
    stats_dirs = ([stats_dir] if os.path.isdir(stats_dir) else []) + \
        sorted(_glob.glob(os.path.join(comb, "shard=*", "okind=2")))
    if stats_dirs and stats_complete:
        # fast path: the slicing pass emitted per-batch per-tile row
        # counts as okind=2 rows (counts in `seq`) — a few KB read
        # instead of a second full scan of every tile row
        import pyarrow.dataset as pads
        st = pa.concat_tables([
            pads.dataset(d, partitioning="hive").to_table(
                columns=["z", "x", "y", "seq"]) for d in stats_dirs])
        pdf = st.to_pandas()
        pdf["z"] = pdf["z"].astype("int64")
        agg = pdf.groupby(["z", "x", "y"], as_index=False)["seq"].sum()
        for tz, tx, ty, nr in agg.itertuples(index=False):
            nonempty.setdefault(int(tz), {})[(int(tx), int(ty))] = int(nr)
    elif os.path.isdir(comb) and os.listdir(comb):
        # legacy layout without the side-channel: distributed aggregate
        cds = ray.data.read_parquet(comb, columns=["okind", "z", "x", "y"])
        pdf = cds.map_batches(tile_coords_partial, batch_format="pyarrow",
                              batch_size=max(batch_size, 65536)).to_pandas()
        if len(pdf):
            agg = pdf.groupby(["z", "x", "y"], as_index=False)["n_rows"].sum()
            for tz, tx, ty, nr in agg.itertuples(index=False):
                nonempty.setdefault(int(tz), {})[(int(tx), int(ty))] = int(nr)

    imz = options.index_max_zoom
    manifest_tiles: list[list] = []
    levels_meta = []
    created = [(0, 0, 0)] if nonempty else []
    z = 0
    while created:
        n_leaf = n_split = n_empty = n_rows = 0
        nxt: list[tuple[int, int, int]] = []
        lvl = nonempty.get(z, {})
        for (tz, tx, ty) in created:
            nr = lvl.get((tx, ty))
            if nr is None:
                status = STATUS_EMPTY
                n_empty += 1
            elif tz < imz:
                status = STATUS_SPLIT
                n_split += 1
                n_rows += nr
                nxt.extend([(tz + 1, tx * 2, ty * 2),
                            (tz + 1, tx * 2, ty * 2 + 1),
                            (tz + 1, tx * 2 + 1, ty * 2),
                            (tz + 1, tx * 2 + 1, ty * 2 + 1)])
            else:
                status = STATUS_LEAF
                n_leaf += 1
                n_rows += nr
            manifest_tiles.append([tz, tx, ty, status])
        levels_meta.append({"z": z, "tiles": len(created), "leaf": n_leaf,
                            "split": n_split, "empty": n_empty,
                            "rows": n_rows})
        created = nxt
        z += 1

    # data extent for tilejson bounds: tile rows (okind=0) carry no
    # bbox, but the leaf SOURCE rows (okind=1, kept for drill-down)
    # cover every feature in world space — pruned 4-column read,
    # block-bounded fold
    data_bbox = None
    src_dirs = ([os.path.join(comb, "okind=1")]
                if os.path.isdir(os.path.join(comb, "okind=1"))
                else sorted(_glob.glob(os.path.join(
                    comb, "shard=*", "okind=1"))))
    src_files = [os.path.join(root, fn)
                 for d in src_dirs for root, _, fns in os.walk(d)
                 for fn in fns if fn.endswith(".parquet")]
    if src_files:
        data_bbox = _collect_data_bbox(ray.data.read_parquet(
            src_files, columns=["minx", "miny", "maxx", "maxy"]))

    manifest = {
        "layout": "combined",
        "options": _options_dict(options),
        "levels": levels_meta,
        "tiles": manifest_tiles,
        # every row in combined/ has a matching okind=2 stats partial
        # (true whenever this engine version wrote all of the data)
        "stats_side_channel": bool(stats_dirs) and stats_complete,
    }
    if data_bbox:
        manifest["bbox"] = data_bbox
    m = dict(metrics or {})
    m["t_manifest_sec"] = round(time.perf_counter() - t_manifest0, 3)
    manifest["metrics"] = m
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f)


def slice_pyramid_sharded(docs: "ray.data.Dataset", options: TileOptions,
                          out_dir: str, *, n_shards: int = 8,
                          batch_size: int = 1024, concurrency=None,
                          carry_spans: bool = True,
                          resume: bool = False) -> "TileSet":
    """Per-SHARD checkpointed full-split slicing (north rule:
    per-partition lineage + metrics for resumable runs).

    The doc table is split into ``n_shards`` deterministic shards
    (seq % n_shards); each shard runs the single-pass fullsplit pipeline
    into its own hive subtree ``combined/shard=K/`` and records a
    lineage marker ``shards/K.json`` (doc count, wall time, engine
    options) AFTER its write completes. ``resume=True`` skips completed
    shards and deletes+recomputes any partially-written one — correct
    because the full-split split rule is union-monotone (append tests),
    so slicing shard-by-shard equals slicing the union. Requires
    ``index_max_points <= 0``; readers are unchanged (the hive
    partitioning exposes shard as one more pruned column)."""
    import shutil
    import time
    import ray  # noqa: F401

    if options.index_max_points > 0:
        raise ValueError("sharded slicing requires index_max_points <= 0 "
                         "(the adaptive stopping rule is not "
                         "union-monotone)")
    os.makedirs(out_dir, exist_ok=True)
    if not resume:
        _clear_run_state(out_dir, data=True)
    shards_dir = os.path.join(out_dir, "shards")
    os.makedirs(shards_dir, exist_ok=True)

    kw = {"batch_format": "pyarrow", "batch_size": batch_size}
    if concurrency:
        kw["concurrency"] = concurrency

    # one cheap pass for every PENDING shard's doc count (lineage),
    # instead of a full count() re-execution of the pipeline per shard;
    # skipped entirely when resume finds every shard complete
    def _count_per_shard() -> dict:
        def shard_counts(b: pa.Table) -> pa.Table:
            seq = b.column("seq").to_numpy(zero_copy_only=False)
            cnt = np.bincount(seq % n_shards, minlength=n_shards)
            return pa.table({
                "shard": pa.array(np.arange(n_shards, dtype=np.int64)),
                "n": pa.array(cnt.astype(np.int64))})

        cdf = docs.map_batches(shard_counts,
                               batch_format="pyarrow").to_pandas()
        if not len(cdf):  # zero-block input dataset
            return {}
        return cdf.groupby("shard")["n"].sum().to_dict()

    pending = [k for k in range(n_shards) if not (
        resume and os.path.exists(os.path.join(shards_dir, f"{k}.json")))]
    per_shard_docs = _count_per_shard() if pending else {}

    for k in range(n_shards):
        marker = os.path.join(shards_dir, f"{k}.json")
        shard_dir = os.path.join(out_dir, "combined", f"shard={k}")
        if resume and os.path.exists(marker):
            with open(marker) as f:
                _check_resume_options(json.load(f).get("options"),
                                      options, f"shard {k} lineage")
            continue
        if os.path.isdir(shard_dir):  # partial write from a crashed run
            shutil.rmtree(shard_dir)
        t0 = time.perf_counter()

        def pick_shard(b: pa.Table, *, _k=k) -> pa.Table:
            seq = b.column("seq").to_numpy(zero_copy_only=False)
            return b.filter(pa.array(seq % n_shards == _k))

        ds = docs.map_batches(pick_shard, batch_format="pyarrow")
        n_docs = int(per_shard_docs.get(k, 0))
        ds = ds.map_batches(ParseDocs(options), **kw)
        ds = ds.map_batches(WrapStage(options), **kw)
        if not carry_spans:
            ds = ds.map_batches(_strip_spans, batch_format="pyarrow")
        ds = ds.map_batches(FullSplitBuild(options), **kw)
        ds.write_parquet(shard_dir, partition_cols=["okind", "z"])
        lineage = {"shard": k, "n_shards": n_shards,
                   "n_docs": int(n_docs),
                   "t_sec": round(time.perf_counter() - t0, 3),
                   "options": _options_dict(options)}
        if options.debug >= 1:  # per-shard operator stats (debug contract)
            try:
                lineage["ray_stats"] = ds.stats()
            except Exception:
                pass
        with open(marker, "w") as f:
            json.dump(lineage, f)

    _rebuild_fullsplit_manifest(out_dir, options, batch_size,
                                metrics={"n_shards": n_shards})
    return TileSet(out_dir, options)


def append_to_pyramid(docs: "ray.data.Dataset", out_dir: str, *,
                      batch_size: int = 1024, concurrency=None,
                      carry_spans: bool = True) -> "TileSet":
    """Incremental update (not in the reference): slice a DELTA doc table
    through the same single-pass pipeline into an EXISTING full-split
    pyramid and rebuild the manifest over the union.

    Correctness: tile content is a row-set union keyed by ``okey``
    (ordering restores global input order at read), and the split
    decision in full-split mode is per-tile "has rows", which is
    union-monotone — so append(A) then append(B) equals slicing A∪B in
    one shot (asserted by tests). The adaptive mode's stopping rule is
    NOT union-monotone (new points can push a leaf over
    indexMaxPoints), so append requires the full-split layout."""
    ts = TileSet(out_dir)
    options = ts.options
    if ts.manifest.get("layout") != "combined":
        raise NotImplementedError(
            "append requires the full-split layout (indexMaxPoints <= 0); "
            "the adaptive stopping rule is not union-monotone — re-slice")
    # delta seqs must not collide with existing ones for stable ordering
    kw = {"batch_format": "pyarrow", "batch_size": batch_size}
    if concurrency:
        kw["concurrency"] = concurrency
    ds = docs.map_batches(ParseDocs(options), **kw)
    ds = ds.map_batches(WrapStage(options), **kw)
    if not carry_spans:
        ds = ds.map_batches(_strip_spans, batch_format="pyarrow")
    ds = ds.map_batches(FullSplitBuild(options), **kw)
    comb = os.path.join(out_dir, "combined")
    ds.write_parquet(comb, partition_cols=["okind", "z"])  # new files only
    _rebuild_fullsplit_manifest(out_dir, options, batch_size)
    return TileSet(out_dir, options)


class TileSet:
    """Query surface over a sliced pyramid directory: point tile lookups
    with the reference's drill-down miss path (src/index.js:158-199), and
    the genTiles conformance enumeration."""

    def __init__(self, out_dir: str, options: TileOptions | None = None):
        self.out_dir = out_dir
        with open(os.path.join(out_dir, "manifest.json")) as f:
            self.manifest = json.load(f)
        if options is None:
            o = self.manifest["options"]
            options = TileOptions(**o)
        self.options = options
        self.tiles = {tile_id(tz, tx, ty): (tz, tx, ty, st)
                      for tz, tx, ty, st in self.manifest["tiles"]}
        self._cache: dict[int, list] = {}

    # ---- reads -------------------------------------------------------
    @property
    def _combined(self) -> bool:
        return self.manifest.get("layout") == "combined"

    def _read_combined(self, okind: int, z: int, x: int, y: int):
        import pyarrow.dataset as pads
        path = os.path.join(self.out_dir, "combined")
        if not os.path.isdir(path):
            return None
        dset = pads.dataset(path, partitioning="hive")
        flt = ((pads.field("okind") == okind) & (pads.field("z") == z)
               & (pads.field("x") == x) & (pads.field("y") == y))
        return dset.to_table(filter=flt)

    def _read_tile_rows(self, z: int, x: int, y: int) -> pa.Table:
        if self._combined:
            return self._read_combined(0, z, x, y)
        import pyarrow.dataset as pads
        path = os.path.join(self.out_dir, "tiles", f"z={z}")
        if not os.path.isdir(path):
            return None
        dset = pads.dataset(path)
        flt = (pads.field("x") == x) & (pads.field("y") == y)
        return dset.to_table(filter=flt)

    def _read_level_rows(self, z: int, x: int, y: int) -> pa.Table:
        if self._combined:
            return self._read_combined(1, z, x, y)
        import pyarrow.dataset as pads
        path = os.path.join(self.out_dir, "levels", f"z={z}")
        if not os.path.isdir(path):
            return None
        dset = pads.dataset(path)
        flt = (pads.field("x") == x) & (pads.field("y") == y)
        return dset.to_table(filter=flt)

    # ---- serve -------------------------------------------------------
    def get_tile(self, z, x, y) -> dict | None:
        z, x, y = int(z), int(x), int(y)
        if z < 0 or z > 24:
            return None
        x = wrap_x(z, x)
        tid = tile_id(z, x, y)
        if tid in self._cache:
            return {"features": self._cache[tid]}

        if tid in self.tiles:
            _, _, _, status = self.tiles[tid]
            if status == STATUS_EMPTY:
                feats = []
            else:
                feats = _format_tile_rows(self._read_tile_rows(z, x, y))
            self._cache[tid] = feats
            return {"features": feats}

        # miss: nearest created ancestor, then targeted local drill-down
        z0, x0, y0 = z, x, y
        anc = None
        while anc is None and z0 > 0:
            z0 -= 1
            x0 >>= 1
            y0 >>= 1
            anc = self.tiles.get(tile_id(z0, x0, y0))
        if anc is None:
            return None
        _, _, _, status = anc
        if status == STATUS_SPLIT:
            return None  # children exist; unreachable in practice
        if status == STATUS_EMPTY:
            return None  # empty source splits to nothing (index.js:121)

        rows = self._read_level_rows(z0, x0, y0)
        if rows is None or rows.num_rows == 0:
            return None
        feats = _decode_sorted(rows)

        local = LocalIndex.__new__(LocalIndex)
        local.options = self.options
        local.tiles = {}
        local.tile_coords = []
        local._served = {}
        local.split_tile(feats, z0, x0, y0, z, x, y)
        t = local.tiles.get(tid)
        if t is None:
            return None
        from ..local_index import tile_to_json
        feats_json = tile_to_json(t, self.options.extent)
        self._cache[tid] = feats_json
        return {"features": feats_json}

    def gen_tiles(self) -> dict:
        out = {}
        for tid, (tz, tx, ty, status) in self.tiles.items():
            out[f"z{tz}-{tx}-{ty}"] = self.get_tile(tz, tx, ty)["features"]
        return out

    def tilejson(self, tiles_url: str = "{z}/{x}/{y}.mvt",
                 name: str = "geojsonvt") -> dict:
        """TileJSON 3.0 descriptor for the stored pyramid (the
        metadata document MVT servers publish next to the tiles):
        zoom range, tile counts and bounds come from the manifest, no
        tile reads. Bounds = union of the LEAF tiles' lon/lat boxes
        (leaves are where the data lives: split tiles are covered by
        their children, empty tiles hold nothing), so a regional
        tileset advertises its actual extent, not the world."""
        zs = [lv["z"] for lv in self.manifest.get("levels", [])] or \
            [tz for tz, _x, _y, _s in self.tiles.values()]
        return {
            "tilejson": "3.0.0",
            "name": name,
            "scheme": "xyz",
            "tiles": [tiles_url],
            "minzoom": int(min(zs)) if zs else 0,
            "maxzoom": int(max(zs)) if zs else 0,
            "bounds": self._data_bounds(),
            "vector_layers": [{"id": name,
                               "minzoom": int(min(zs)) if zs else 0,
                               "maxzoom": int(max(zs)) if zs else 0,
                               "fields": {}}],
        }

    def _data_bounds(self) -> list:
        """[w, s, e, n] from the manifest's projected data bbox (exact
        feature extent, recorded at slice time); fallback for pyramids
        sliced before the bbox existed: union of the leaf tiles'
        geographic boxes. World bounds when neither is available."""
        import math
        world = [-180.0, -85.0511287798066, 180.0, 85.0511287798066]
        bb = self.manifest.get("bbox")
        if bb:
            minx, miny, maxx, maxy = bb

            def inv_lat(yv: float) -> float:
                return math.degrees(math.atan(
                    math.sinh(math.pi * (1.0 - 2.0 * yv))))

            # wrap can shift antimeridian copies outside [0,1]; clamp
            return [max(minx * 360.0 - 180.0, world[0]),
                    max(inv_lat(maxy), world[1]),
                    min(maxx * 360.0 - 180.0, world[2]),
                    min(inv_lat(miny), world[3])]
        leaves = [(tz, tx, ty) for tz, tx, ty, st in self.tiles.values()
                  if st == STATUS_LEAF]
        if not leaves:
            return world

        def merc_lat(yy: float, n: int) -> float:
            t = math.pi - 2.0 * math.pi * yy / n
            return math.degrees(math.atan(math.sinh(t)))

        w = s = float("inf")
        e = n_ = float("-inf")
        for tz, tx, ty in leaves:
            n = 1 << tz
            w = min(w, tx / n * 360.0 - 180.0)
            e = max(e, (tx + 1) / n * 360.0 - 180.0)
            s = min(s, merc_lat(ty + 1, n))
            n_ = max(n_, merc_lat(ty, n))
        return [max(w, world[0]), max(s, world[1]),
                min(e, world[2]), min(n_, world[3])]

    def tiles_in_bbox(self, w: float, s: float, e: float, n: float,
                      z: int) -> list[tuple[int, int, int]]:
        """The (z, x, y) triples a map viewport needs: every NON-EMPTY
        manifest tile at zoom ``z`` whose geographic box intersects the
        lon/lat bbox [w, s, e, n] — the server-side companion of a
        tiled map's visible-area fetch. West > east wraps across the
        antimeridian (two x-ranges). Pure manifest arithmetic, no tile
        reads; tiles deeper requests drill into are still served by
        get_tile — this lists what is MATERIALIZED at z."""
        import math
        nn = 1 << z

        def merc_y(lat: float) -> float:
            lat = min(85.0511287798066, max(-85.0511287798066, lat))
            sin = math.sin(math.radians(lat))
            return 0.5 - math.log((1 + sin) / (1 - sin)) / (4 * math.pi)

        x0 = int(np.clip(math.floor((w / 360.0 + 0.5) * nn), 0, nn - 1))
        x1 = int(np.clip(math.floor((e / 360.0 + 0.5) * nn), 0, nn - 1))
        y0 = int(np.clip(math.floor(merc_y(n) * nn), 0, nn - 1))
        y1 = int(np.clip(math.floor(merc_y(s) * nn), 0, nn - 1))
        if w <= e:
            x_ok = lambda x: x0 <= x <= x1          # noqa: E731
        else:                                        # antimeridian wrap
            x_ok = lambda x: x >= x0 or x <= x1      # noqa: E731
        return sorted(
            (tz, tx, ty) for tz, tx, ty, st in self.tiles.values()
            if tz == z and st != STATUS_EMPTY and x_ok(tx)
            and y0 <= ty <= y1)

    def get_tile_mvt(self, z, x, y, layer_name: str = "geojsonvt",
                     gzipped: bool = False) -> bytes | None:
        """One tile as Mapbox Vector Tile protobuf bytes (the vt-pbf
        serving path; mvt.py). None on a true miss, like get_tile.
        ``gzipped=True`` returns gzip-compressed bytes (mtime pinned
        to 0 so identical tiles byte-compare equal) — the encoding
        real serving stacks store and send with
        Content-Encoding: gzip."""
        from ..mvt import encode_tile
        tile = self.get_tile(z, x, y)
        if tile is None:
            return None
        data = encode_tile(tile["features"], layer_name=layer_name,
                           extent=self.options.extent)
        if gzipped:
            import gzip
            data = gzip.compress(data, mtime=0)
        return data

    def export_mvt(self, mvt_dir: str,
                   layer_name: str = "geojsonvt",
                   gzipped: bool = False) -> "ray.data.Dataset":
        """Distributed MVT export of every stored first-pass tile:
        stream the combined tile partition, co-locate each tile's rows
        with one coarse (z,x,y)-bucket shuffle, encode per tile inside
        the group UDF and write {z}/{x}/{y}.mvt files from the workers
        — the driver never sees tile bytes. Returns the (z, x, y,
        n_bytes) manifest Dataset. Requires the full-split ("combined")
        layout, like append_to_pyramid. ``gzipped=True`` writes
        {y}.mvt.gz files (deterministic, mtime=0) — n_bytes then
        reports the compressed size."""
        import ray.data as rd
        from ..functions.shuffle import coarse_mask
        from ..mvt import encode_tile
        if not self._combined:
            raise NotImplementedError(
                "export_mvt streams the combined layout; re-slice with "
                "indexMaxPoints <= 0 or export via get_tile_mvt")
        os.makedirs(mvt_dir, exist_ok=True)
        cmask = coarse_mask()
        extent = self.options.extent
        comb = os.path.join(self.out_dir, "combined")
        # prune at the read: the encoder needs geometry + tags only —
        # the spans payload column (the corpus text/media, the heaviest
        # column by far) must never enter the tile-bucket shuffle
        ds = rd.read_parquet(
            comb, columns=["okind", "z", "x", "y", "okey", "type",
                           "ring_lens", "xy", "tags_json", "fid_json"])
        # hive partition columns (okind, z) read back as STRINGS
        ds = ds.filter(expr="okind == '0'")

        def add_bucket(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            z = pc.cast(b.column("z"), pa.int64()).to_numpy(
                zero_copy_only=False)
            x = b.column("x").to_numpy(zero_copy_only=False)
            y = b.column("y").to_numpy(zero_copy_only=False)
            tid = tile_id_vec(z, x.astype(np.int64),
                              y.astype(np.int64))
            b = b.set_column(b.schema.get_field_index("z"), "z",
                             pa.array(z))
            return b.append_column(
                "tbkt", pa.array((np.asarray(tid) & cmask
                                  ).astype(np.int32)))

        def write_group(t: pa.Table) -> pa.Table:
            # arrow-native per-tile split: pandas would mangle the
            # list-typed xy/ring_lens columns
            z = t.column("z").to_numpy(zero_copy_only=False)
            x = t.column("x").to_numpy(zero_copy_only=False)
            y = t.column("y").to_numpy(zero_copy_only=False)
            key = np.asarray(tile_id_vec(z.astype(np.int64),
                                         x.astype(np.int64),
                                         y.astype(np.int64)))
            order = np.argsort(key, kind="stable")
            ks = key[order]
            starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
            ends = np.r_[starts[1:], len(ks)]
            o_z, o_x, o_y, o_n = [], [], [], []
            for s, e in zip(starts, ends):
                idx = order[s:e]
                rows = t.take(pa.array(idx))
                feats = _format_tile_rows(rows)
                tz, tx, ty = int(z[idx[0]]), int(x[idx[0]]), \
                    int(y[idx[0]])
                data = encode_tile(feats, layer_name=layer_name,
                                   extent=extent)
                if gzipped:
                    import gzip
                    data = gzip.compress(data, mtime=0)
                d = os.path.join(mvt_dir, str(tz), str(tx))
                os.makedirs(d, exist_ok=True)
                name = f"{ty}.mvt.gz" if gzipped else f"{ty}.mvt"
                with open(os.path.join(d, name), "wb") as f:
                    f.write(data)
                o_z.append(tz)
                o_x.append(tx)
                o_y.append(ty)
                o_n.append(len(data))
            return pa.table({
                "z": pa.array(o_z, pa.int64()),
                "x": pa.array(o_x, pa.int64()),
                "y": pa.array(o_y, pa.int64()),
                "n_bytes": pa.array(o_n, pa.int64())})

        return (ds.map_batches(add_bucket, batch_format="pyarrow")
                .groupby("tbkt").map_groups(write_group,
                                            batch_format="pyarrow"))


def _decode_sorted(rows: pa.Table):
    from ..arrowio import decode_features
    import pyarrow.compute as pc
    order = pc.sort_indices(rows, sort_keys=[("okey", "ascending")])
    rows = rows.take(order)
    return decode_features(rows, with_tags=True)


def _format_tile_rows(rows: pa.Table | None) -> list:
    """Tile rows -> reference JSON feature shape, in okey order."""
    if rows is None or rows.num_rows == 0:
        return []
    import pyarrow.compute as pc
    order = pc.sort_indices(rows, sort_keys=[("okey", "ascending")])
    rows = rows.take(order)

    ring_lens_col = rows.column("ring_lens")
    xy_col = rows.column("xy")
    types = rows.column("type").to_pylist()
    tags = rows.column("tags_json").to_pylist()
    fids = rows.column("fid_json").to_pylist()

    out = []
    for i in range(rows.num_rows):
        lens = ring_lens_col[i].as_py()
        xy = np.asarray(xy_col[i].values, dtype=np.int64).reshape(-1, 2)
        t = types[i]
        if t == 1:
            geometry = xy.tolist()
        else:
            geometry = []
            off = 0
            for ln in lens:
                geometry.append(xy[off:off + ln].tolist())
                off += ln
        d = {"geometry": geometry,
             "type": t,
             "tags": json.loads(tags[i]) if tags[i] is not None else None}
        if fids[i] is not None:
            d["id"] = json.loads(fids[i])
        out.append(d)
    return out
