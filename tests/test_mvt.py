"""MVT sink gates: spec-pinned byte checks + lossless round-trip of
the reference's golden fixture tiles through encode/decode."""

import json

import numpy as np
import pytest

from geojson_vt_ray.mvt import (_encode_geometry, _unzigzag, _varint,
                                _zigzag, decode_tile, encode_tile)


def test_zigzag_roundtrip():
    rng = np.random.default_rng(3)
    for v in [0, -1, 1, 63, -64, 2**31, -(2**31)] + \
            rng.integers(-2**40, 2**40, 50).tolist():
        assert _unzigzag(_zigzag(int(v))) == int(v)


def test_point_geometry_spec_example_bytes():
    """The MVT 2.1 spec's worked example: a point at (25, 17) encodes
    to the command stream [9, 50, 34]."""
    assert _encode_geometry([[25, 17]], 1) == bytes([9, 50, 34])


def test_polygon_geometry_drops_closing_vertex_and_closes():
    ring = [[0, 0], [10, 0], [10, 10], [0, 0]]  # closed input ring
    data = _encode_geometry([ring], 3)
    nums = []
    i = 0
    while i < len(data):
        n, sh = 0, 0
        while True:
            b = data[i]
            i += 1
            n |= (b & 0x7F) << sh
            if not b & 0x80:
                break
            sh += 7
        nums.append(n)
    # MoveTo(1), 2 params, LineTo(2), 4 params, ClosePath(1)
    assert nums[0] == (1 | (1 << 3))
    assert nums[3] == (2 | (2 << 3))
    assert nums[-1] == (7 | (1 << 3))


@pytest.mark.parametrize("feats", [
    [{"geometry": [[5, 5], [100, 2000], [3, 4]], "type": 1,
      "tags": {"kind": "multi-point", "n": 3}}],
    [{"geometry": [[[0, 0], [9, 8]], [[50, 50], [40, 60], [7, 0]]],
      "type": 2, "tags": {"neg": -12, "f": 2.5, "b": True}}],
    [{"geometry": [[[0, 0], [8, 0], [8, 8], [0, 0]],
                   [[2, 2], [2, 4], [4, 4], [2, 2]]],
      "type": 3, "tags": {}, "id": 42}],
])
def test_synthetic_roundtrip(feats):
    dec = decode_tile(encode_tile(feats))["geojsonvt"]
    assert dec["extent"] == 4096 and dec["version"] == 2
    assert len(dec["features"]) == len(feats)
    for got, want in zip(dec["features"], feats):
        assert got["type"] == want["type"]
        assert got["geometry"] == want["geometry"]
        assert got["tags"] == (want.get("tags") or {})
        if isinstance(want.get("id"), int):
            assert got["id"] == want["id"]


def test_export_mvt_matches_get_tile(ray_session, tmp_path):
    """Distributed MVT export writes {z}/{x}/{y}.mvt whose decoded
    features equal get_tile's JSON for every non-empty tile, and
    get_tile_mvt serves the same bytes."""
    import os
    import ray.data as rd
    from geojson_vt_ray.config import TileOptions
    from geojson_vt_ray.mvt import decode_tile
    from geojson_vt_ray.pipelines.pyramid import slice_pyramid
    from geojson_vt_ray.sources.docs import synthesize_corpus

    docs = rd.from_arrow(synthesize_corpus(30))
    opts = TileOptions(index_max_zoom=2, index_max_points=0)
    ts = slice_pyramid(docs, opts, str(tmp_path / "pyr"))
    mvt_dir = str(tmp_path / "mvt")
    manifest = ts.export_mvt(mvt_dir).to_pandas()
    assert len(manifest) > 0
    checked = 0
    for _, row in manifest.iterrows():
        z, x, y = int(row["z"]), int(row["x"]), int(row["y"])
        path = os.path.join(mvt_dir, str(z), str(x), f"{y}.mvt")
        data = open(path, "rb").read()
        assert len(data) == int(row["n_bytes"])
        dec = decode_tile(data)["geojsonvt"]["features"]
        want = ts.get_tile(z, x, y)["features"]
        assert len(dec) == len(want)
        for got, w in zip(dec, want):
            assert got["type"] == w["type"]
            assert got["geometry"] == w["geometry"]
            assert got["tags"] == (w.get("tags") or {})
        assert ts.get_tile_mvt(z, x, y) == data
        checked += 1
        if checked >= 8:
            break


def test_golden_tiles_roundtrip():
    """Every feature of the z0 + two deeper golden us-states tiles
    survives encode->decode exactly (geometry ints, tag values incl.
    float doubles); string ids are dropped per spec (no string ids in
    MVT), integer ids survive."""
    with open("/root/reference/test/fixtures/us-states-tiles.json") as f:
        tiles = json.load(f)
    for key in list(tiles)[:6]:
        feats = tiles[key]
        dec = decode_tile(encode_tile(feats))["geojsonvt"]["features"]
        assert len(dec) == len(feats)
        for got, want in zip(dec, feats):
            assert got["type"] == want["type"]
            assert got["geometry"] == want["geometry"], key
            assert got["tags"] == (want.get("tags") or {})
            if isinstance(want.get("id"), int) and want["id"] >= 0:
                assert got["id"] == want["id"]


def test_read_mvt_roundtrips_export(ray_session, tmp_path):
    """The MVT source re-ingests the sink's {z}/{x}/{y}.mvt tree: one
    row per feature, per-tile feature multisets equal to get_tile's
    JSON (geometry flattened to the internal ring_lens/xy layout),
    tile set identical to the export manifest."""
    import os
    import ray.data as rd
    from geojson_vt_ray.config import TileOptions
    from geojson_vt_ray.pipelines.pyramid import slice_pyramid
    from geojson_vt_ray.sources.docs import synthesize_corpus
    from geojson_vt_ray.sources.mvt_source import read_mvt

    docs = rd.from_arrow(synthesize_corpus(30))
    opts = TileOptions(index_max_zoom=2, index_max_points=0)
    ts = slice_pyramid(docs, opts, str(tmp_path / "pyr"))
    mvt_dir = str(tmp_path / "mvt")
    manifest = ts.export_mvt(mvt_dir).to_pandas()

    df = read_mvt(mvt_dir).to_pandas()
    # tile set matches the manifest exactly
    got_tiles = set(map(tuple, df[["z", "x", "y"]].drop_duplicates()
                        .to_numpy()))
    want_tiles = set(map(tuple,
                         manifest[["z", "x", "y"]].to_numpy()))
    assert got_tiles == want_tiles
    assert (df["layer"] == "geojsonvt").all()

    checked = 0
    for (z, x, y), sub in df.groupby(["z", "x", "y"]):
        want = ts.get_tile(int(z), int(x), int(y))["features"]
        assert len(sub) == len(want)
        sub = sub.sort_values("fidx")
        for (_, row), w in zip(sub.iterrows(), want):
            assert int(row["type"]) == w["type"]
            geom = w["geometry"] if w["type"] != 1 else [w["geometry"]]
            flat = [c for r in geom for pt in r for c in pt]
            assert list(row["xy"]) == flat
            assert list(row["ring_lens"]) == [len(r) for r in geom]
        checked += 1
        if checked >= 6:
            break

    # layer filter and loud failure on a missing tree
    assert read_mvt(mvt_dir, layer="nope").count() == 0
    import pytest as _pytest
    with _pytest.raises(FileNotFoundError):
        read_mvt(str(tmp_path / "missing"))


def test_gzipped_export_and_serving(ray_session, tmp_path):
    """gzipped=True writes {y}.mvt.gz whose decompressed bytes equal
    the plain export, the manifest reports compressed sizes,
    get_tile_mvt(gzipped=True) serves the same gzip bytes, and the
    MVT source reads the .gz tree back transparently."""
    import gzip
    import os
    import ray.data as rd
    from geojson_vt_ray.config import TileOptions
    from geojson_vt_ray.pipelines.pyramid import slice_pyramid
    from geojson_vt_ray.sources.docs import synthesize_corpus
    from geojson_vt_ray.sources.mvt_source import read_mvt

    docs = rd.from_arrow(synthesize_corpus(30))
    opts = TileOptions(index_max_zoom=2, index_max_points=0)
    ts = slice_pyramid(docs, opts, str(tmp_path / "pyr"))
    gz_dir = str(tmp_path / "gz")
    man = ts.export_mvt(gz_dir, gzipped=True).to_pandas()
    assert len(man) > 0
    checked = 0
    for _, row in man.iterrows():
        z, x, y = int(row["z"]), int(row["x"]), int(row["y"])
        path = os.path.join(gz_dir, str(z), str(x), f"{y}.mvt.gz")
        blob = open(path, "rb").read()
        assert len(blob) == int(row["n_bytes"])
        plain = ts.get_tile_mvt(z, x, y)
        assert gzip.decompress(blob) == plain
        assert ts.get_tile_mvt(z, x, y, gzipped=True) == blob
        checked += 1
        if checked >= 4:
            break
    # source reads the .gz tree: same tile set as the manifest
    df = read_mvt(gz_dir).to_pandas()
    got_tiles = set(map(tuple, df[["z", "x", "y"]].drop_duplicates()
                        .to_numpy()))
    assert got_tiles == set(map(tuple, man[["z", "x", "y"]].to_numpy()))
