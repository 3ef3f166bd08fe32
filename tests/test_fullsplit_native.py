"""C split_batch vs Python BFS: bit-exact TABLE equality (every column,
every row, same order) of stages/fullsplit.FullSplitBuild on mixed
geometry, including the types the random-parity corpus lacks
(MultiPoint, MultiPolygon) and the tolerance==0 / no-sources edges."""


import numpy as np
import pytest

from geojson_vt_ray.config import options_from_dict
from geojson_vt_ray.kernels import native as _native
from geojson_vt_ray.sources.docs import doc_table_from_geojson
from geojson_vt_ray.stages.fullsplit import FullSplitBuild
from geojson_vt_ray.stages.parse import ParseDocs
from geojson_vt_ray.stages.wrap import WrapStage

pytestmark = pytest.mark.skipif(
    _native.EXT is None or not hasattr(_native.EXT, "split_batch"),
    reason="native split extension unavailable")


def _mixed_collection(seed: int, n: int = 30) -> dict:
    rng = np.random.default_rng(seed)
    feats = []
    for i in range(n):
        kind = i % 6
        cx = float(rng.uniform(-185, 185))
        cy = float(rng.uniform(-70, 70))
        if kind == 0:
            geom = {"type": "Point", "coordinates": [cx, cy]}
        elif kind == 1:
            pts = rng.uniform(-3, 3, (6, 2)) + [cx, cy]
            pts[:, 1] = np.clip(pts[:, 1], -80, 80)
            geom = {"type": "MultiPoint", "coordinates": pts.tolist()}
        elif kind == 2:
            pts = np.column_stack([
                cx + np.cumsum(rng.uniform(-2, 2, 15)),
                np.clip(cy + np.cumsum(rng.uniform(-1, 1, 15)), -80, 80)])
            geom = {"type": "LineString", "coordinates": pts.tolist()}
        elif kind == 3:
            geom = {"type": "MultiLineString", "coordinates": [
                [[cx, cy], [cx + 2, cy + 1], [cx + 4, cy]],
                [[cx - 5, cy], [cx - 5, cy + 3]],
                [[cx, cy - 2], [cx, cy - 2]],       # degenerate
            ]}
        elif kind == 4:
            ang = np.linspace(0, 2 * np.pi, 11)
            r = rng.uniform(2, 15)
            outer = np.column_stack([cx + r * np.cos(ang),
                                     np.clip(cy + r * np.sin(ang), -80, 80)])
            inner = np.column_stack([
                cx + 0.3 * r * np.cos(ang[::-1]),
                np.clip(cy + 0.3 * r * np.sin(ang[::-1]), -80, 80)])
            geom = {"type": "Polygon",
                    "coordinates": [outer.tolist(), inner.tolist()]}
        else:
            ang = np.linspace(0, 2 * np.pi, 8)
            polys = []
            for k in range(3):
                ox = cx + 8 * k
                r = rng.uniform(1, 6)
                ring = np.column_stack([
                    ox + r * np.cos(ang),
                    np.clip(cy + r * np.sin(ang), -80, 80)])
                polys.append([ring.tolist()])
            geom = {"type": "MultiPolygon", "coordinates": polys}
        feats.append({"type": "Feature", "id": i,
                      "properties": {"k": i},
                      "geometry": geom})
    return {"type": "FeatureCollection", "features": feats}


@pytest.mark.parametrize("seed,opts,keep_sources", [
    (11, {"indexMaxZoom": 4, "indexMaxPoints": 0}, True),
    (12, {"indexMaxZoom": 3, "indexMaxPoints": 0,
          "buffer": 1024, "tolerance": 0.5}, True),
    (13, {"indexMaxZoom": 3, "indexMaxPoints": 0, "tolerance": 0}, True),
    # indexMaxZoom == maxZoom: the tolerance==0 keep-all tile rows
    (14, {"indexMaxZoom": 4, "indexMaxPoints": 0, "maxZoom": 4}, True),
    (15, {"indexMaxZoom": 5, "indexMaxPoints": 0,
          "extent": 512, "buffer": 0}, False),
])
def test_split_batch_matches_python(seed, opts, keep_sources, monkeypatch):
    data = _mixed_collection(seed)
    options = options_from_dict(dict({"indexMaxPoints": 0}, **opts))
    batch = WrapStage(options)(ParseDocs(options)(
        doc_table_from_geojson(data)))
    stage = FullSplitBuild(options, keep_sources=keep_sources)

    monkeypatch.setenv("GVT_NO_SPLITC", "1")
    py = stage(batch)
    monkeypatch.delenv("GVT_NO_SPLITC")
    cc = stage(batch)

    assert py.schema.equals(cc.schema)
    assert py.num_rows == cc.num_rows
    for col in py.column_names:
        assert py.column(col).equals(cc.column(col)), f"column {col} differs"
