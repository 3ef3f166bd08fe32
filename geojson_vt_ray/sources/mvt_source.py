"""Mapbox Vector Tile source — re-ingest a served {z}/{x}/{y}.mvt
tree (the layout TileSet.export_mvt writes, and the layout any
standard tile server publishes) as a Ray Dataset of decoded features.

Distributed shape: the driver holds only the FILE LIST (tile trees
are millions of small files at planet scale — the list is z/x/y
triples, a few hundred MB at most, and can itself be sharded by z
prefix); `ray.data.read_binary_files` streams the bytes, and the
protobuf decode (`mvt.decode_tile` — pure Python over each tile's
few-KB payload) runs inside `map_batches` on the workers, one row
out per feature. The heavy work (bytes → geometry) never touches
the driver. Geometry lands in the engine's internal columnar tile
layout (type / ring_lens / flat xy) so a read-back tile table joins
and compares directly against the pyramid's own stored tiles.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa


def _tile_files(mvt_dir: str) -> list[str]:
    out = []
    for root, _dirs, files in os.walk(mvt_dir):
        for f in files:
            if f.endswith((".mvt", ".pbf", ".mvt.gz", ".pbf.gz")):
                out.append(os.path.join(root, f))
    return sorted(out)


def _zxy_from_path(path: str) -> tuple[int, int, int]:
    base = os.path.basename(path)
    if base.endswith(".gz"):
        base = base[:-3]
    y = int(os.path.splitext(base)[0])
    x_dir = os.path.dirname(path)
    z_dir = os.path.dirname(x_dir)
    return int(os.path.basename(z_dir)), int(os.path.basename(x_dir)), y


def decode_batch(b: pa.Table, layer: str | None = None) -> pa.Table:
    """One input row per tile file (bytes, path) -> one output row per
    feature: z, x, y, layer, fidx, type, ring_lens, xy, tags_json,
    fid (-1 when the feature carries no id)."""
    from ..mvt import decode_tile

    o_z, o_x, o_y, o_layer, o_fidx = [], [], [], [], []
    o_type, o_rl, o_xy, o_tags, o_fid = [], [], [], [], []
    paths = b.column("path").to_pylist()
    blobs = b.column("bytes").to_pylist()
    for path, blob in zip(paths, blobs):
        z, x, y = _zxy_from_path(path)
        blob = bytes(blob)
        # magic-sniff, not extension: read_binary_files already
        # auto-decompresses *.gz via the arrow codec, so bytes may
        # arrive either way
        if blob[:2] == b"\x1f\x8b":
            import gzip
            blob = gzip.decompress(blob)
        for lname, ldata in decode_tile(bytes(blob)).items():
            if layer is not None and lname != layer:
                continue
            for fidx, feat in enumerate(ldata["features"]):
                geom = feat["geometry"]
                if feat["type"] == 1:          # points: flat pair list
                    rings = [geom]
                else:
                    rings = geom
                o_z.append(z)
                o_x.append(x)
                o_y.append(y)
                o_layer.append(lname)
                o_fidx.append(fidx)
                o_type.append(feat["type"])
                o_rl.append([len(r) for r in rings])
                o_xy.append(np.asarray(
                    [c for r in rings for pt in r for c in pt],
                    np.int32))
                o_tags.append(json.dumps(feat["tags"], sort_keys=True,
                                         separators=(",", ":")))
                o_fid.append(feat.get("id", -1))
    return pa.table({
        "z": pa.array(o_z, pa.int64()),
        "x": pa.array(o_x, pa.int64()),
        "y": pa.array(o_y, pa.int64()),
        "layer": pa.array(o_layer, pa.string()),
        "fidx": pa.array(o_fidx, pa.int64()),
        "type": pa.array(o_type, pa.int64()),
        "ring_lens": pa.array(o_rl, pa.list_(pa.int32())),
        "xy": pa.array([v.tolist() for v in o_xy],
                       pa.list_(pa.int32())),
        "tags_json": pa.array(o_tags, pa.string()),
        "fid": pa.array(o_fid, pa.int64())})


def read_mvt(mvt_dir: str, layer: str | None = None):
    """Tile tree -> Dataset of decoded features (see decode_batch for
    the schema). Raises FileNotFoundError on an empty/missing tree so
    a typo'd path fails loudly rather than yielding an empty corpus."""
    import ray.data as rd

    files = _tile_files(mvt_dir)
    if not files:
        raise FileNotFoundError(f"no .mvt/.pbf files under {mvt_dir}")
    ds = rd.read_binary_files(files, include_paths=True)
    return ds.map_batches(
        lambda b: decode_batch(b, layer=layer), batch_format="pyarrow")
