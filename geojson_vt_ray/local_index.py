"""Single-process tiling index sharing every kernel with the distributed
pipeline.

Semantics mirror /root/reference/src/index.js (GeoJSONVT class): an
iterative quadtree split with the indexMaxZoom / indexMaxPoints stopping
rules, leaf ``source`` retention for later drill-down, and lazy
quantization at serve time. This is (a) the conformance oracle the golden
fixture tests run against, and (b) the targeted drill-down kernel the
distributed TileSet uses for getTile misses (single-tile work is
driver-local by design — reference index.js:174-199).
"""

from __future__ import annotations

from .config import TileOptions, options_from_dict
from .kernels.clip import clip_features
from .kernels.convert import convert_geojson
from .kernels.tile import Tile, create_tile
from .kernels.tileid import tile_id, wrap_x
from .kernels.wrap import wrap_features


def tile_to_json(tile: Tile, extent: int) -> list[dict]:
    """Serve-format one tile: quantized features in reference JSON shape
    ({geometry, type, tags, id?}, src/tile.js:72-81 + transform.js).

    Quantizes the WHOLE tile in one vectorized pass (same float64 op
    order as kernels.transform.quantize, so bit-exact vs the per-ring
    paths) and converts to Python lists with a single tolist() + list
    slicing — per-ring numpy dispatch was ~1 ms/tile at serve time.
    """
    import numpy as np

    feats = tile.features
    if not feats:
        return []
    arrs = []
    for f in feats:
        if f.type == 1:
            arrs.append(f.geometry)
        else:
            arrs.extend(f.geometry)
    big: list = []
    if arrs:
        cat = np.concatenate(arrs, axis=0) if len(arrs) > 1 else arrs[0]
        z2 = 1 << tile.z
        q = np.empty((len(cat), 2), dtype=np.float64)
        q[:, 0] = extent * (cat[:, 0] * z2 - tile.x)
        q[:, 1] = extent * (cat[:, 1] * z2 - tile.y)
        big = np.floor(q + 0.5).astype(np.int32).tolist()
    out = []
    pos = 0
    for f in feats:
        if f.type == 1:
            n = len(f.geometry)
            geometry = big[pos:pos + n]
            pos += n
        else:
            geometry = []
            for r in f.geometry:
                n = len(r)
                geometry.append(big[pos:pos + n])
                pos += n
        d = {"geometry": geometry, "type": f.type, "tags": f.tags}
        if f.fid is not None:
            d["id"] = f.fid
        out.append(d)
    return out


class LocalIndex:
    def __init__(self, data: dict, options: TileOptions | dict | None = None):
        if not isinstance(options, TileOptions):
            options = options_from_dict(options)
        self.options = options

        features = convert_geojson(data, options)
        self.tiles: dict[int, Tile] = {}
        self.tile_coords: list[tuple[int, int, int]] = []
        self._served: dict[int, list] = {}

        features = wrap_features(features, options)
        if features:
            self.split_tile(features, 0, 0, 0)

    # reference: index.js:66-156
    def split_tile(self, features, z, x, y, cz=None, cx=None, cy=None):
        opts = self.options
        stack = [(features, z, x, y)]
        while stack:
            features, z, x, y = stack.pop()

            z2 = 1 << z
            tid = tile_id(z, x, y)
            tile = self.tiles.get(tid)

            if tile is None:
                tile = create_tile(features, z, x, y, opts)
                self.tiles[tid] = tile
                self.tile_coords.append((z, x, y))

            tile.source = features

            if cz is None:
                # first pass: stop at index_max_zoom or small tiles
                if z == opts.index_max_zoom or \
                        tile.num_points <= opts.index_max_points:
                    continue
            elif z == opts.max_zoom or z == cz:
                continue
            else:
                # drill-down: skip non-ancestors of the target
                steps = cz - z
                if x != cx >> steps or y != cy >> steps:
                    continue

            tile.source = None
            if not features:
                continue

            k1 = 0.5 * opts.buffer / opts.extent
            k2 = 0.5 - k1
            k3 = 0.5 + k1
            k4 = 1 + k1
            lm = opts.line_metrics

            tl = bl = tr = br = None
            left = clip_features(features, z2, x - k1, x + k3, 0,
                                 tile.minx, tile.maxx, lm)
            right = clip_features(features, z2, x + k2, x + k4, 0,
                                  tile.minx, tile.maxx, lm)

            if left is not None:
                tl = clip_features(left, z2, y - k1, y + k3, 1,
                                   tile.miny, tile.maxy, lm)
                bl = clip_features(left, z2, y + k2, y + k4, 1,
                                   tile.miny, tile.maxy, lm)
            if right is not None:
                tr = clip_features(right, z2, y - k1, y + k3, 1,
                                   tile.miny, tile.maxy, lm)
                br = clip_features(right, z2, y + k2, y + k4, 1,
                                   tile.miny, tile.maxy, lm)

            stack.append((tl or [], z + 1, x * 2, y * 2))
            stack.append((bl or [], z + 1, x * 2, y * 2 + 1))
            stack.append((tr or [], z + 1, x * 2 + 1, y * 2))
            stack.append((br or [], z + 1, x * 2 + 1, y * 2 + 1))

    # reference: index.js:158-199
    def get_tile(self, z, x, y) -> dict | None:
        z = int(z)
        x = int(x)
        y = int(y)
        if z < 0 or z > 24:
            return None

        x = wrap_x(z, x)
        tid = tile_id(z, x, y)
        if tid in self.tiles:
            return {"features": self._serve(tid)}

        z0, x0, y0 = z, x, y
        parent = None
        while parent is None and z0 > 0:
            z0 -= 1
            x0 >>= 1
            y0 >>= 1
            parent = self.tiles.get(tile_id(z0, x0, y0))

        if parent is None or parent.source is None:
            return None

        self.split_tile(parent.source, z0, x0, y0, z, x, y)
        if tid in self.tiles:
            return {"features": self._serve(tid)}
        return None

    def _serve(self, tid: int) -> list:
        if tid not in self._served:
            self._served[tid] = tile_to_json(self.tiles[tid],
                                             self.options.extent)
        return self._served[tid]

    def gen_tiles(self) -> dict:
        """test-full.js:49-64 conformance surface: every first-pass tile,
        keyed z{z}-{x}-{y} (insertion-order equivalence is irrelevant —
        goldens compare as maps)."""
        out = {}
        for (z, x, y) in list(self.tile_coords):
            out[f"z{z}-{x}-{y}"] = self.get_tile(z, x, y)["features"]
        return out


def gen_tiles(data: dict, options: dict | None = None) -> dict:
    base = {"indexMaxZoom": 0, "indexMaxPoints": 10000}
    base.update(options or {})
    return LocalIndex(data, base).gen_tiles()
