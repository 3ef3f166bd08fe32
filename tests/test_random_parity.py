"""Randomized (seed-fixed) distributed-vs-local parity: the Ray pipeline
must emit exactly the tiles the single-process engine (golden-pinned by
the fixture suite) emits, on geometry the fixtures never cover —
random polygons/lines/points with holes, antimeridian crossers, and
degenerate slivers."""

import numpy as np
import pytest

from geojson_vt_ray.config import options_from_dict
from geojson_vt_ray.local_index import LocalIndex
from geojson_vt_ray.pipelines.pyramid import slice_pyramid
from geojson_vt_ray.sources.docs import doc_table_from_geojson


def _random_collection(seed: int, n: int = 24) -> dict:
    rng = np.random.default_rng(seed)
    feats = []
    for i in range(n):
        kind = i % 4
        cx = float(rng.uniform(-190, 190))  # some cross the antimeridian
        cy = float(rng.uniform(-70, 70))
        if kind == 0:  # point
            geom = {"type": "Point", "coordinates": [cx, cy]}
        elif kind == 1:  # jagged line
            pts = np.column_stack([
                cx + np.cumsum(rng.uniform(-2, 2, 12)),
                np.clip(cy + np.cumsum(rng.uniform(-1, 1, 12)), -80, 80)])
            geom = {"type": "LineString", "coordinates": pts.tolist()}
        elif kind == 2:  # polygon with a hole
            ang = np.linspace(0, 2 * np.pi, 9)
            r = rng.uniform(2, 12)
            outer = np.column_stack([cx + r * np.cos(ang),
                                     np.clip(cy + r * np.sin(ang), -80, 80)])
            inner = np.column_stack([cx + 0.3 * r * np.cos(ang[::-1]),
                                     np.clip(cy + 0.3 * r * np.sin(ang[::-1]),
                                             -80, 80)])
            geom = {"type": "Polygon",
                    "coordinates": [outer.tolist(), inner.tolist()]}
        else:  # degenerate sliver multi-line
            geom = {"type": "MultiLineString", "coordinates": [
                [[cx, cy], [cx + 1e-7, cy + 1e-7], [cx + 4, cy + 0.001]],
                [[cx - 3, cy], [cx - 3, cy]],
            ]}
        feats.append({"type": "Feature", "id": i,
                      "properties": {"k": i, "nested": {"deep": [i, None]}},
                      "geometry": geom})
    return {"type": "FeatureCollection", "features": feats}


@pytest.mark.parametrize("seed,opts", [
    (1, {"indexMaxZoom": 3, "indexMaxPoints": 0}),          # fullsplit path
    (2, {"indexMaxZoom": 5, "indexMaxPoints": 50}),         # adaptive path
    (3, {"indexMaxZoom": 4, "indexMaxPoints": 0,
         "lineMetrics": True}),                             # metrics path
    (4, {"indexMaxZoom": 4, "indexMaxPoints": 100,
         "buffer": 1024, "tolerance": 0.5}),                # odd options
    (5, {"indexMaxZoom": 3, "indexMaxPoints": 0,
         "tolerance": 0}),                                  # no simplification
    (6, {"indexMaxZoom": 3, "indexMaxPoints": 0,
         "extent": 512, "buffer": 0, "maxZoom": 10}),       # small extent, no buffer
])
def test_random_geometry_parity(ray_session, tmp_path, seed, opts):
    import ray.data as rd
    data = _random_collection(seed)
    options = options_from_dict(opts)
    ts = slice_pyramid(rd.from_arrow(doc_table_from_geojson(data)),
                       options, str(tmp_path / f"pyr{seed}"))
    got = ts.gen_tiles()
    want = LocalIndex(data, options).gen_tiles()
    assert set(got) == set(want)
    for key in want:
        assert got[key] == want[key], f"tile {key} differs (seed {seed})"
    # spot drill-downs below the indexed depth
    for (z, x, y) in [(7, 30, 50), (9, 256, 200), (6, 10, 25)]:
        g = ts.get_tile(z, x, y)
        w = LocalIndex(data, options).get_tile(z, x, y)
        assert (g is None) == (w is None)
        if w is not None:
            assert g["features"] == w["features"]
