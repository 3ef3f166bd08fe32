"""Tile build + quantization stage (K3 + M9): feature rows -> tile rows.

Row-local by design (SURVEY.md §2.3): the reference's createTile
(src/tile.js) appends per-feature output independently, so the build is a
pure map_batches — only the per-tile stats (A1) are a separate grouped
aggregate. Quantization (src/transform.js) is folded in here: it is
deterministic per (row, z, x, y), so there is nothing to memoize.

Output geometry is ring-flattened int32 pairs; ``ring_lens`` of 0
preserve the reference's empty-ring artifacts (tile.js:105 pushes rings
unconditionally after the tiny-ring check).
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from ..arrowio import SPAN_TYPE, decode_features
from ..config import TileOptions
from ..kernels.geom import GT_LINESTRING
from ..kernels.tile import Tile, add_feature_to_tile
from ..kernels.tileid import tile_id
from ..kernels.transform import quantize

TILE_SCHEMA = pa.schema([
    ("z", pa.int16()),
    ("x", pa.int32()),
    ("y", pa.int32()),
    ("tile_id", pa.int64()),
    ("okey", pa.binary()),
    ("seq", pa.int64()),
    ("fid_json", pa.string()),
    ("type", pa.uint8()),
    ("ring_lens", pa.list_(pa.int32())),
    ("xy", pa.list_(pa.int32())),
    ("tags_json", pa.string()),
    ("doc_id", pa.string()),
    ("spans", SPAN_TYPE),
])


class BuildTiles:
    def __init__(self, options: TileOptions):
        self.options = options

    def __call__(self, batch: pa.Table) -> pa.Table:
        opts = self.options
        z = batch.column("z").to_numpy(zero_copy_only=False)
        x = batch.column("x").to_numpy(zero_copy_only=False)
        y = batch.column("y").to_numpy(zero_copy_only=False)
        tags_json = batch.column("tags_json").to_pylist()
        feats = decode_features(batch)

        o_z, o_x, o_y, o_tid = [], [], [], []
        o_okey, o_seq, o_fid, o_type = [], [], [], []
        o_ring_lens, o_tags = [], []
        xy_chunks = []
        src_idx = []

        scratch = Tile(0, 0, 0)
        for i, f in enumerate(feats):
            zi, xi, yi = int(z[i]), int(x[i]), int(y[i])
            tolerance = 0.0 if zi == opts.max_zoom else (
                opts.tolerance / ((1 << zi) * opts.extent))
            tf = add_feature_to_tile(scratch, f, tolerance, opts)
            if tf is None:
                continue
            z2 = 1 << zi
            if tf.type == 1:
                rings = [quantize(tf.geometry, opts.extent, z2, xi, yi)]
            else:
                rings = [quantize(r, opts.extent, z2, xi, yi)
                         for r in tf.geometry]

            tj = tags_json[i]
            if opts.line_metrics and f.gtype == GT_LINESTRING:
                tags = json.loads(tj) if tj else {}
                g = f.geometry
                tags["mapbox_clip_start"] = g.start / g.size
                tags["mapbox_clip_end"] = g.end / g.size
                tj = json.dumps(tags)

            o_z.append(zi)
            o_x.append(xi)
            o_y.append(yi)
            o_tid.append(tile_id(zi, xi, yi))
            o_okey.append(f.okey)
            o_seq.append(f.seq)
            o_fid.append(None)  # carried from input by take below
            o_type.append(tf.type)
            o_ring_lens.append([len(r) for r in rings])
            for r in rings:
                xy_chunks.append(r.reshape(-1))
            o_tags.append(tj)
            src_idx.append(i)

        n = len(o_z)
        xy_flat = (np.concatenate(xy_chunks) if xy_chunks
                   else np.empty(0, dtype=np.int32))
        xy_lens = [sum(rl) * 2 for rl in o_ring_lens]
        offsets = np.zeros(n + 1, dtype=np.int64)
        if n:
            np.cumsum(np.asarray(xy_lens, dtype=np.int64), out=offsets[1:])
        idx = pa.array(np.asarray(src_idx, dtype=np.int64))
        cols = {
            "z": pa.array(o_z, pa.int16()),
            "x": pa.array(o_x, pa.int32()),
            "y": pa.array(o_y, pa.int32()),
            "tile_id": pa.array(o_tid, pa.int64()),
            "okey": pa.array(o_okey, pa.binary()),
            "seq": pa.array(o_seq, pa.int64()),
            "fid_json": batch.column("fid_json").take(idx),
            "type": pa.array(o_type, pa.uint8()),
            "ring_lens": pa.array(o_ring_lens, pa.list_(pa.int32())),
            "xy": pa.ListArray.from_arrays(
                pa.array(offsets.astype(np.int32), pa.int32()),
                pa.array(xy_flat.astype(np.int32), pa.int32())),
            "tags_json": pa.array(o_tags, pa.string()),
            "doc_id": batch.column("doc_id").take(idx),
            "spans": batch.column("spans").take(idx),
        }
        return pa.table({k: cols[k] for k in TILE_SCHEMA.names})
