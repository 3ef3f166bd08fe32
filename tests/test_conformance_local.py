"""Golden end-to-end fixture tests against the reference's committed
expected-tiles JSON (test/test-full.js + test-get-tile.js +
test-multi-world.js conformance surface)."""

import math

import pytest

from geojson_vt_ray import LocalIndex, gen_tiles


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


@pytest.mark.parametrize("inp,golden,opts", CASES,
                         ids=[c[1].replace("-tiles.json", "") for c in CASES])
def test_full_tiling(fixtures, inp, golden, opts):
    got = gen_tiles(fixtures(inp), opts)
    expected = fixtures(golden)
    assert set(got) == set(expected)
    for key in expected:
        assert got[key] == expected[key], f"tile {key} differs"


def test_empty_inputs(fixtures):
    assert gen_tiles(fixtures("empty.json")) == {}
    assert gen_tiles(fixtures("feature-null-geometry.json")) == {}
    assert gen_tiles(fixtures("empty-coords.json")) == {}


def test_invalid_geojson_raises():
    with pytest.raises(ValueError):
        gen_tiles({"type": "Pologon"})


def test_get_tile_us_states(fixtures):
    index = LocalIndex(fixtures("us-states.json"))

    assert index.get_tile(7, 37, 48)["features"] == \
        fixtures("us-states-z7-37-48.json")
    assert index.get_tile("7", "37", "48")["features"] == \
        fixtures("us-states-z7-37-48.json")

    square = [{
        "geometry": [[[-64, 4160], [-64, -64], [4160, -64], [4160, 4160],
                      [-64, 4160]]],
        "type": 3,
        "tags": {"name": "Pennsylvania", "density": 284.3},
        "id": "42"}]
    assert index.get_tile(9, 148, 192)["features"] == square

    assert index.get_tile(11, 800, 400) is None
    assert index.get_tile(-5, 123.25, 400.25) is None
    assert index.get_tile(25, 200, 200) is None
    assert len(index.tile_coords) == 37


def test_get_tile_unbuffered_edges():
    index = LocalIndex({"type": "LineString",
                        "coordinates": [[0, 90], [0, -90]]}, {"buffer": 0})
    assert index.get_tile(2, 1, 1) is None
    assert index.get_tile(2, 2, 1)["features"] == \
        [{"geometry": [[[0, 0], [0, 4096]]], "type": 2, "tags": None}]

    index = LocalIndex({"type": "LineString",
                        "coordinates": [[-90, 66.51326044311188],
                                        [90, 66.51326044311188]]},
                       {"buffer": 0})
    assert index.get_tile(2, 1, 0)["features"] == \
        [{"geometry": [[[0, 4096], [4096, 4096]]], "type": 2, "tags": None}]
    assert index.get_tile(2, 1, 1)["features"] == []


def test_get_tile_polygon_boundary_buffer1024():
    index = LocalIndex({"type": "Polygon", "coordinates": [[
        [42.1875, 57.32652122521708],
        [47.8125, 57.32652122521708],
        [47.8125, 54.16243396806781],
        [42.1875, 54.16243396806781],
        [42.1875, 57.32652122521708]]]}, {"buffer": 1024})
    assert index.get_tile(5, 19, 9)["features"] == [{
        "geometry": [[[3072, 3072], [5120, 3072], [5120, 5120],
                      [3072, 5120], [3072, 3072]]],
        "type": 3, "tags": None}]


def test_multi_world_points():
    left = {"type": "Feature", "properties": {},
            "geometry": {"coordinates": [-540, 0], "type": "Point"}}
    right = {"type": "Feature", "properties": {},
             "geometry": {"coordinates": [540, 0], "type": "Point"}}

    vt = LocalIndex(right)
    g = vt.tiles[0].features[0].geometry
    assert (g[0, 0], g[0, 1]) == (1, 0.5)

    vt = LocalIndex(left)
    g = vt.tiles[0].features[0].geometry
    assert (g[0, 0], g[0, 1]) == (0, 0.5)

    vt = LocalIndex({"type": "FeatureCollection", "features": [left, right]})
    f = vt.tiles[0].features
    assert (f[0].geometry[0, 0], f[0].geometry[0, 1]) == (0, 0.5)
    assert (f[1].geometry[0, 0], f[1].geometry[0, 1]) == (1, 0.5)
