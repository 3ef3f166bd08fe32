"""Distributed-pipeline conformance: the Ray Data pyramid must emit
byte-identical tiles to the reference goldens, with span-sequence
equality on every output row (BASELINE.json input_hint invariant)."""

import json

import pyarrow as pa
import pytest

from geojson_vt_ray.config import options_from_dict
from geojson_vt_ray.pipelines.pyramid import slice_pyramid, TileSet
from geojson_vt_ray.sources.docs import doc_table_from_geojson

CASES = [
    ("us-states.json", "us-states-tiles.json",
     {"indexMaxZoom": 7, "indexMaxPoints": 200}),
    ("dateline.json", "dateline-tiles.json",
     {"indexMaxZoom": 0, "indexMaxPoints": 10000}),
    ("dateline.json", "dateline-metrics-tiles.json",
     {"indexMaxZoom": 0, "indexMaxPoints": 10000, "lineMetrics": True}),
    ("feature.json", "feature-tiles.json",
     {"indexMaxZoom": 0, "indexMaxPoints": 10000}),
    ("collection.json", "collection-tiles.json",
     {"indexMaxZoom": 0, "indexMaxPoints": 10000}),
    ("single-geom.json", "single-geom-tiles.json",
     {"indexMaxZoom": 0, "indexMaxPoints": 10000}),
    ("ids.json", "ids-promote-id-tiles.json",
     {"indexMaxZoom": 0, "promoteId": "prop0"}),
    ("ids.json", "ids-generate-id-tiles.json",
     {"indexMaxZoom": 0, "generateId": True}),
]


def _slice(ray_session, tmp_path, data, opts):
    import ray.data as rd
    docs = rd.from_arrow(doc_table_from_geojson(data))
    options = options_from_dict(dict({"indexMaxZoom": 0,
                                      "indexMaxPoints": 10000}, **opts))
    return slice_pyramid(docs, options, str(tmp_path / "pyr"))


@pytest.mark.parametrize("inp,golden,opts", CASES,
                         ids=[c[1].replace("-tiles.json", "") for c in CASES])
def test_ray_full_tiling(ray_session, tmp_path, fixtures, inp, golden, opts):
    ts = _slice(ray_session, tmp_path, fixtures(inp), opts)
    got = ts.gen_tiles()
    expected = fixtures(golden)
    assert set(got) == set(expected)
    for key in expected:
        assert got[key] == expected[key], f"tile {key} differs"


def test_ray_empty_inputs(ray_session, tmp_path, fixtures):
    for i, name in enumerate(["empty.json", "feature-null-geometry.json",
                              "empty-coords.json"]):
        ts = _slice(ray_session, tmp_path / str(i), fixtures(name), {})
        assert ts.gen_tiles() == {}


def test_ray_drill_down_us_states(ray_session, tmp_path, fixtures):
    ts = _slice(ray_session, tmp_path, fixtures("us-states.json"),
                {"indexMaxZoom": 5, "indexMaxPoints": 100000})
    assert ts.get_tile(7, 37, 48)["features"] == \
        fixtures("us-states-z7-37-48.json")
    square = [{
        "geometry": [[[-64, 4160], [-64, -64], [4160, -64], [4160, 4160],
                      [-64, 4160]]],
        "type": 3,
        "tags": {"name": "Pennsylvania", "density": 284.3},
        "id": "42"}]
    assert ts.get_tile(9, 148, 192)["features"] == square
    assert ts.get_tile(11, 800, 400) is None
    assert ts.get_tile(-5, 123, 400) is None
    assert ts.get_tile(25, 200, 200) is None


def test_ray_fullsplit_matches_local(ray_session, tmp_path, fixtures):
    """index_max_points=0 triggers the barrier-free single-pass path
    (stages/fullsplit.py); its tiles must be identical to the per-level
    engine's semantics (LocalIndex, itself golden-pinned)."""
    from geojson_vt_ray.local_index import LocalIndex
    data = fixtures("us-states.json")
    opts = {"indexMaxZoom": 4, "indexMaxPoints": 0}
    ts = _slice(ray_session, tmp_path, data, opts)
    assert ts.manifest.get("layout") == "combined"
    got = ts.gen_tiles()
    expected = LocalIndex(data, opts).gen_tiles()
    assert set(got) == set(expected)
    for key in expected:
        assert got[key] == expected[key], f"tile {key} differs"
    # drill-down below index_max_zoom reads retained leaf sources
    local = LocalIndex(data, opts)
    for (z, x, y) in [(7, 37, 48), (6, 18, 23)]:
        want = local.get_tile(z, x, y)
        have = ts.get_tile(z, x, y)
        assert (have is None) == (want is None)
        if want is not None:
            assert have["features"] == want["features"]


def test_fullsplit_span_sequence_equality(ray_session, tmp_path, fixtures):
    import pyarrow.dataset as pads
    data = fixtures("us-states.json")
    docs = doc_table_from_geojson(data)
    ts = _slice(ray_session, tmp_path, data,
                {"indexMaxZoom": 3, "indexMaxPoints": 0})
    want = {d: s for d, s in zip(docs.column("doc_id").to_pylist(),
                                 docs.column("spans").to_pylist())}
    comb = pads.dataset(str(tmp_path / "pyr" / "combined"),
                        partitioning="hive").to_table(
        columns=["doc_id", "spans"],
        filter=pads.field("okind") < 2)  # okind=2 = manifest stats rows
    assert comb.num_rows > 0
    for d, s in zip(comb.column("doc_id").to_pylist(),
                    comb.column("spans").to_pylist()):
        assert s == want[d], f"span sequence mutated for {d}"


def test_ray_deep_level_combine_path(ray_session, tmp_path, fixtures,
                                     monkeypatch):
    """Force the distributed pre-combine of the stopping aggregate (the
    deep-zoom path) and require identical tiles to the default path."""
    import geojson_vt_ray.pipelines.pyramid as pyr
    data = fixtures("us-states.json")
    opts = {"indexMaxZoom": 6, "indexMaxPoints": 200}
    want = _slice(ray_session, tmp_path / "a", data, opts).gen_tiles()
    monkeypatch.setattr(pyr, "DEEP_LEVEL_COMBINE_THRESHOLD", 0)
    got = _slice(ray_session, tmp_path / "b", data, opts).gen_tiles()
    assert got == want


def test_carry_spans_off_same_tiles(ray_session, tmp_path, fixtures):
    """carry_spans=False (the at-scale layout) must change ONLY the spans
    payload column: tiles, drill-down and ordering identical."""
    import ray.data as rd
    import pyarrow.dataset as pads
    from geojson_vt_ray.config import options_from_dict
    data = fixtures("us-states.json")
    opts = options_from_dict({"indexMaxZoom": 4, "indexMaxPoints": 0})

    def run(sub, **kw):
        docs = rd.from_arrow(doc_table_from_geojson(data))
        return slice_pyramid(docs, opts, str(tmp_path / sub), **kw)

    ts_on = run("on")
    ts_off = run("off", carry_spans=False)
    assert ts_off.gen_tiles() == ts_on.gen_tiles()
    assert ts_off.get_tile(7, 37, 48) == ts_on.get_tile(7, 37, 48)
    comb = pads.dataset(str(tmp_path / "off" / "combined"),
                        partitioning="hive").to_table(
        columns=["spans", "doc_id"],
        filter=pads.field("okind") < 2)  # okind=2 = manifest stats rows
    assert comb.column("spans").null_count == comb.num_rows
    assert comb.column("doc_id").null_count == 0  # re-attach key intact


def test_ray_resume_from_checkpoint(ray_session, tmp_path, fixtures,
                                    monkeypatch):
    """Kill the run mid-pyramid (split stage raises at z>=4), then
    resume=True must finish from the last complete level checkpoint and
    produce tiles identical to an uninterrupted run."""
    import ray.data as rd
    import geojson_vt_ray.pipelines.pyramid as pyr
    from geojson_vt_ray.stages.split import SplitLevel

    data = fixtures("us-states.json")
    opts = options_from_dict({"indexMaxZoom": 7, "indexMaxPoints": 200})
    want = slice_pyramid(rd.from_arrow(doc_table_from_geojson(data)),
                         opts, str(tmp_path / "full")).gen_tiles()

    class Boom(SplitLevel):
        def __call__(self, batch):
            if batch.num_rows and batch.column("z")[0].as_py() >= 4:
                raise RuntimeError("simulated mid-run crash")
            return super().__call__(batch)

    out = str(tmp_path / "crash")
    monkeypatch.setattr(pyr, "SplitLevel", Boom)
    with pytest.raises(Exception):
        slice_pyramid(rd.from_arrow(doc_table_from_geojson(data)),
                      opts, out)
    monkeypatch.setattr(pyr, "SplitLevel", SplitLevel)

    import os
    assert os.path.exists(os.path.join(out, "checkpoint.json"))
    assert not os.path.exists(os.path.join(out, "manifest.json"))
    ts = slice_pyramid(rd.from_arrow(doc_table_from_geojson(data)),
                       opts, out, resume=True)
    got = ts.gen_tiles()
    assert set(got) == set(want)
    for key in want:
        assert got[key] == want[key], f"tile {key} differs after resume"


def test_append_to_pyramid_equals_one_shot(ray_session, tmp_path, fixtures):
    """Incremental append: slice(A) + append(B) must serve exactly the
    tiles of slice(A∪B) — content, ordering and drill-down."""
    import ray.data as rd
    from geojson_vt_ray.pipelines.pyramid import append_to_pyramid
    data = fixtures("us-states.json")
    opts = options_from_dict({"indexMaxZoom": 4, "indexMaxPoints": 0})
    all_docs = doc_table_from_geojson(data)
    a, b = all_docs.slice(0, 30), all_docs.slice(30)

    want = slice_pyramid(rd.from_arrow(all_docs), opts,
                         str(tmp_path / "oneshot")).gen_tiles()

    out = str(tmp_path / "incr")
    slice_pyramid(rd.from_arrow(a), opts, out)
    ts = append_to_pyramid(rd.from_arrow(b), out)
    got = ts.gen_tiles()
    assert set(got) == set(want)
    for key in want:
        assert got[key] == want[key], f"tile {key} differs after append"
    # drill-down over the unioned leaf sources
    one = TileSet(str(tmp_path / "oneshot"))
    for (z, x, y) in [(7, 37, 48), (6, 18, 23)]:
        g = ts.get_tile(z, x, y)
        w = one.get_tile(z, x, y)
        assert (g is None) == (w is None)
        if w is not None:
            assert g["features"] == w["features"]


def test_fullsplit_resume_manifest_only(ray_session, tmp_path, fixtures):
    """fullsplit resume: manifest.json lost after a complete write ->
    resume rebuilds the manifest from the combined data without
    recomputing; identical tiles."""
    import os
    import ray.data as rd
    data = fixtures("us-states.json")
    opts = options_from_dict({"indexMaxZoom": 3, "indexMaxPoints": 0})
    out = str(tmp_path / "pyr")
    docs = rd.from_arrow(doc_table_from_geojson(data))
    want = slice_pyramid(docs, opts, out).gen_tiles()
    os.remove(os.path.join(out, "manifest.json"))
    # key by FULL path: the same base filename appears in every hive
    # partition dir (one file per task per partition)
    mtimes = {os.path.join(r, f): os.path.getmtime(os.path.join(r, f))
              for r, _, fs in os.walk(os.path.join(out, "combined"))
              for f in fs}
    ts = slice_pyramid(rd.from_arrow(doc_table_from_geojson(data)),
                       opts, out, resume=True)
    assert ts.gen_tiles() == want
    # the combined data was NOT rewritten
    now = {os.path.join(r, f): os.path.getmtime(os.path.join(r, f))
           for r, _, fs in os.walk(os.path.join(out, "combined"))
           for f in fs}
    assert now == mtimes


def test_cli_slice_and_get_tile(ray_session, tmp_path, fixtures_dir):
    """End-to-end CLI surface (the ray job submit entry): slice a GeoJSON
    input, then serve a drill-down tile."""
    import json as _json
    from geojson_vt_ray.cli import main
    import io, contextlib

    out = str(tmp_path / "pyr")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["slice", "--input",
                   str(fixtures_dir / "us-states.json"), "--out", out,
                   "--index-max-zoom", "5",
                   "--index-max-points", "100000"])
    assert rc == 0
    summary = _json.loads(buf.getvalue())
    assert summary["tiles"] > 0

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["get-tile", "--pyramid", out, "7", "37", "48"])
    assert rc == 0
    tile = _json.loads(buf.getvalue())
    assert tile["features"] == _json.loads(
        (fixtures_dir / "us-states-z7-37-48.json").read_text())


def test_cli_debug_summary_matches_reference_shape(ray_session, tmp_path,
                                                   fixtures_dir):
    """--debug 1 must print the reference-shaped console summary
    (debug/debug.js + src/index.js debug lines) on STDERR while stdout
    stays one parseable JSON line, and the tiles-generated line must
    agree with the manifest's non-empty tile count."""
    import json as _json
    import re
    from geojson_vt_ray.cli import main
    import io, contextlib

    out = str(tmp_path / "pyr_dbg")
    so, se = io.StringIO(), io.StringIO()
    with contextlib.redirect_stdout(so), contextlib.redirect_stderr(se):
        rc = main(["slice", "--input",
                   str(fixtures_dir / "us-states.json"), "--out", out,
                   "--index-max-zoom", "5",
                   "--index-max-points", "100000", "--debug", "1"])
    assert rc == 0
    summary = _json.loads(so.getvalue())  # stdout contract intact
    err = se.getvalue()
    assert re.search(r"^preprocess data: \d+ms$", err, re.M), err
    assert "index: maxZoom: 5, maxPoints: 100000" in err
    assert re.search(r"^features: \d+, points: \d+$", err, re.M), err
    assert re.search(r"^generate tiles: \d+ms$", err, re.M), err
    m = re.search(r"^tiles generated: (\d+) (\{.*\})$", err, re.M)
    assert m, err
    total, hist = int(m.group(1)), _json.loads(m.group(2))
    want = {f"z{l['z']}": l["tiles"] - l.get("empty", 0)
            for l in summary["levels"]}
    assert hist == want
    assert total == sum(want.values())


def test_span_sequence_equality(ray_session, tmp_path, fixtures):
    """Every tile row must carry its document's span sequence verbatim."""
    import pyarrow.dataset as pads
    data = fixtures("us-states.json")
    docs = doc_table_from_geojson(data)
    ts = _slice(ray_session, tmp_path, data,
                {"indexMaxZoom": 7, "indexMaxPoints": 200})

    want = {d: s for d, s in zip(docs.column("doc_id").to_pylist(),
                                 docs.column("spans").to_pylist())}
    tiles = pads.dataset(str(tmp_path / "pyr" / "tiles")).to_table(
        columns=["doc_id", "spans"])
    got_docs = tiles.column("doc_id").to_pylist()
    got_spans = tiles.column("spans").to_pylist()
    assert len(got_docs) > 0
    for d, s in zip(got_docs, got_spans):
        assert s == want[d], f"span sequence mutated for {d}"


def test_sharded_slice_equals_oneshot_and_resumes(ray_session, tmp_path,
                                                  fixtures):
    """Per-shard checkpointed slicing (north rule: per-partition lineage
    + metrics): shard-by-shard full-split equals the one-shot slice
    (union-monotone split rule); resume skips completed shards and
    recomputes a partially-written one."""
    import json
    import os
    import shutil
    import ray.data as rd
    from geojson_vt_ray.config import options_from_dict
    from geojson_vt_ray.pipelines.pyramid import (slice_pyramid,
                                                  slice_pyramid_sharded)
    data = fixtures("us-states.json")
    opts = options_from_dict({"indexMaxZoom": 3, "indexMaxPoints": 0})
    docs = rd.from_arrow(doc_table_from_geojson(data))
    want = slice_pyramid(rd.from_arrow(doc_table_from_geojson(data)),
                         opts, str(tmp_path / "oneshot")).gen_tiles()

    out = str(tmp_path / "sharded")
    ts = slice_pyramid_sharded(docs, opts, out, n_shards=4)
    assert ts.gen_tiles() == want
    lineage = [json.load(open(os.path.join(out, "shards", f"{k}.json")))
               for k in range(4)]
    assert sum(sh["n_docs"] for sh in lineage) == docs.count()
    assert all("t_sec" in sh and sh["options"] for sh in lineage)

    # simulate a crash: shard 2 half-written (marker gone, files there),
    # shard 3 fully lost; resume must redo exactly those two
    os.remove(os.path.join(out, "shards", "2.json"))
    os.remove(os.path.join(out, "shards", "3.json"))
    shutil.rmtree(os.path.join(out, "combined", "shard=3"))
    os.remove(os.path.join(out, "manifest.json"))
    kept = {k: os.path.getmtime(os.path.join(out, "shards", f"{k}.json"))
            for k in (0, 1)}
    ts2 = slice_pyramid_sharded(
        rd.from_arrow(doc_table_from_geojson(data)), opts, out,
        n_shards=4, resume=True)
    assert ts2.gen_tiles() == want
    for k, mt in kept.items():  # completed shards untouched
        assert os.path.getmtime(
            os.path.join(out, "shards", f"{k}.json")) == mt


def test_fresh_adaptive_rerun_no_stale_data(ray_session, tmp_path,
                                            fixtures):
    """A resume=False adaptive rerun into a used out_dir must not read
    the previous run's parquet (write_parquet appends UUID files, so
    stale files would double every row and corrupt split decisions)."""
    import ray.data as rd
    data = fixtures("us-states.json")
    opts = options_from_dict({"indexMaxZoom": 3, "indexMaxPoints": 200})
    out = str(tmp_path / "pyr")
    first = slice_pyramid(rd.from_arrow(doc_table_from_geojson(data)),
                          opts, out).gen_tiles()
    second = slice_pyramid(rd.from_arrow(doc_table_from_geojson(data)),
                           opts, out).gen_tiles()
    assert second == first


def test_resume_with_no_checkpoint_restarts_clean(ray_session, tmp_path,
                                                  fixtures):
    """resume=True after a crash DURING level 0's write (partial parquet,
    no checkpoint/manifest yet) must restart clean rather than append
    beside the stale files and double every row."""
    import os
    import ray.data as rd
    data = fixtures("us-states.json")
    opts = options_from_dict({"indexMaxZoom": 3, "indexMaxPoints": 200})
    out = str(tmp_path / "pyr")
    want = slice_pyramid(rd.from_arrow(doc_table_from_geojson(data)),
                         opts, str(tmp_path / "clean")).gen_tiles()
    # simulate the crashed state: some level-0 parquet, no lineage files
    lvl0 = os.path.join(out, "levels", "z=0")
    os.makedirs(lvl0)
    import pyarrow.parquet as pq
    import pyarrow as pa
    pq.write_table(pa.table({"junk": [1, 2, 3]}),
                   os.path.join(lvl0, "partial-crashed.parquet"))
    ts = slice_pyramid(rd.from_arrow(doc_table_from_geojson(data)),
                       opts, out, resume=True)
    assert ts.gen_tiles() == want


def test_debug_option_records_ray_stats(ray_session, tmp_path, fixtures):
    """debug>=1 (src/index.js:18,39-44 parity): metrics gain Ray's
    per-operator stats; debug>=2 on the adaptive path adds per-level
    operator detail. Results are unaffected."""
    import ray.data as rd
    data = fixtures("us-states.json")
    docs = rd.from_arrow(doc_table_from_geojson(data))

    # fullsplit path, debug=1
    opts = options_from_dict({"indexMaxZoom": 3, "indexMaxPoints": 0,
                              "debug": 1})
    ts = slice_pyramid(docs, opts, str(tmp_path / "dbg1"))
    m = ts.manifest["metrics"]
    assert "t_slice_write_sec" in m
    assert isinstance(m.get("ray_stats"), str) and "Operator" in m["ray_stats"]

    # adaptive path, debug=2: per-level ray_stats detail + final-level
    # stats in the manifest metrics
    opts2 = options_from_dict({"indexMaxZoom": 2, "indexMaxPoints": 200,
                               "debug": 2})
    ts2 = slice_pyramid(docs, opts2, str(tmp_path / "dbg2"))
    levels = ts2.manifest["levels"]
    assert levels and all("t_sec" in lv for lv in levels)
    assert any(isinstance(lv.get("ray_stats"), str) for lv in levels)
    assert isinstance(ts2.manifest["metrics"].get("ray_stats"), str)

    # sharded path, debug=1: per-shard lineage markers carry stats
    import json as _json
    import os as _os
    from geojson_vt_ray.pipelines.pyramid import slice_pyramid_sharded
    ts3 = slice_pyramid_sharded(docs, opts, str(tmp_path / "dbg3"),
                                n_shards=2)
    for k in range(2):
        with open(_os.path.join(str(tmp_path / "dbg3"),
                                "shards", f"{k}.json")) as f:
            assert isinstance(_json.load(f).get("ray_stats"), str)

    # debug changes no results: same tiles as a debug=0 run
    ts0 = slice_pyramid(docs, opts.with_(debug=0), str(tmp_path / "dbg0"))
    assert ts.gen_tiles() == ts0.gen_tiles()


def test_tilejson_bounds_from_manifest(ray_session, tmp_path, fixtures):
    """tilejson() bounds must derive from the pyramid's actual data
    extent (manifest bbox recorded at slice time), not hardcode the
    world: us-states spans lat 17.9296..71.3516 and lon up to
    -65.6268 east; the west edge clamps to -180 (the Aleutians cross
    the antimeridian). Both the adaptive (levels/) and the fullsplit
    (combined/) layouts must record it."""
    ts = _slice(ray_session, tmp_path, fixtures("us-states.json"),
                {"indexMaxZoom": 5, "indexMaxPoints": 100000})
    w, s, e, n = ts.tilejson()["bounds"]
    # Aleutian antimeridian crossing: wrap shifts the far-west limb
    # into the +1 world copy, so the main-world west edge is -178.12
    # and east clamps at 180; latitude is exact
    assert -178.2 < w < -178.0       # westmost main-world vertex
    assert 17.5 < s < 17.95          # true south 17.9296
    assert e == 180.0
    assert 71.3 < n < 71.5           # true north 71.3516

    # fullsplit records bounds too (leaf-source union: same latitudes,
    # longitude reaches the wrapped Aleutian copy near +173)
    full = _slice(ray_session, tmp_path / "f", fixtures("us-states.json"),
                  {"indexMaxZoom": 5, "indexMaxPoints": 0})
    wf, sf, ef, nf = full.tilejson()["bounds"]
    assert abs(sf - s) < 0.2 and abs(nf - n) < 0.2
    assert -178.2 < wf < -178.0 and 170.0 < ef <= 180.0

    # an empty pyramid falls back to world bounds
    empty = _slice(ray_session, tmp_path / "e", fixtures("empty.json"),
                   {})
    assert empty.tilejson()["bounds"] == [-180.0, -85.0511287798066,
                                          180.0, 85.0511287798066]


def test_tiles_in_bbox_viewport(ray_session, tmp_path, fixtures):
    """tiles_in_bbox lists exactly the non-empty z-level tiles whose
    boxes intersect the viewport: a continental-US box at z4 matches a
    brute-force filter of the manifest, world bounds return every
    non-empty z4 tile, and a west>east box wraps the antimeridian."""
    ts = _slice(ray_session, tmp_path, fixtures("us-states.json"),
                {"indexMaxZoom": 5, "indexMaxPoints": 0})
    got = ts.tiles_in_bbox(-125.0, 24.0, -66.0, 50.0, 4)
    assert got, "continental-US viewport must hit tiles"
    all_z4 = [(tz, tx, ty) for tz, tx, ty, st in ts.tiles.values()
              if tz == 4 and st != "empty"]
    assert set(got) <= set(all_z4)
    world = ts.tiles_in_bbox(-180.0, -85.0, 180.0, 85.0, 4)
    assert sorted(world) == sorted(all_z4)
    # Aleutians viewport crossing the antimeridian (west > east)
    wrap = ts.tiles_in_bbox(170.0, 48.0, -160.0, 62.0, 4)
    assert all(tx in (0, 15) for _, tx, _y in wrap) and wrap
