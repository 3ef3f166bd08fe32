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
import threading

import numpy as np
import pyarrow as pa

from ..arrowio import SPAN_TYPE, decode_features
from ..config import TileOptions
from ._gctune import tune_gc
from ..kernels.geom import GT_LINESTRING
from ..kernels.tile import Tile, add_feature_to_tile
from ..kernels.tileid import tile_id

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


# Pooled quantize scratch, grown geometrically and never shrunk: the
# per-batch buffers here are the engine's biggest transient allocations,
# and freed blocks past glibc's trim threshold go back to the OS — on
# shared VMs the re-fault of tens of MB per batch can cost seconds.
# Per-thread so concurrent map threads can't alias.
_QPOOL = threading.local()


def _qpool(tot: int):
    s = _QPOOL
    # default -1 so a fresh thread initializes even for tot == 0
    if getattr(s, "cap", -1) < tot:
        s.cap = max(4096, 1 << max(0, int(tot - 1).bit_length()))
        s.pts = np.empty((s.cap, 2), np.float64)
        s.ridx = np.empty(s.cap, np.int64)
        s.param = np.empty(s.cap, np.float64)
    return s


class TileRowAccum:
    """Per-batch accumulator of built tile rows; shared by the per-level
    BuildTiles stage and the single-pass FullSplitBuild stage."""

    def __init__(self, options: TileOptions):
        self.options = options
        self.scratch = Tile(0, 0, 0)
        self.o_z, self.o_x, self.o_y, self.o_tid = [], [], [], []
        self.o_okey, self.o_seq, self.o_type = [], [], []
        self.o_ring_lens, self.o_tags = [], []
        # quantization is DEFERRED: world-coord rings + per-ring
        # (z2, tx, ty) accumulate here and table() does ONE vectorized
        # floor(extent*(v*z2-t)+0.5) over the concatenation instead of
        # thousands of tiny per-ring numpy dispatches (bit-identical
        # arithmetic: same float64 op order as the scalar path)
        self.ring_world = []
        self.ring_z2, self.ring_tx, self.ring_ty = [], [], []
        self.src_idx = []

    def add(self, f, zi: int, xi: int, yi: int, tags_json: str | None,
            src_idx: int) -> bool:
        opts = self.options
        tolerance = 0.0 if zi == opts.max_zoom else (
            opts.tolerance / ((1 << zi) * opts.extent))
        tf = add_feature_to_tile(self.scratch, f, tolerance, opts)
        if tf is None:
            return False
        rings = [tf.geometry] if tf.type == 1 else tf.geometry

        tj = tags_json
        if opts.line_metrics and f.gtype == GT_LINESTRING:
            tags = json.loads(tj) if tj else {}
            g = f.geometry
            tags["mapbox_clip_start"] = g.start / g.size
            tags["mapbox_clip_end"] = g.end / g.size
            tj = json.dumps(tags)

        self.o_z.append(zi)
        self.o_x.append(xi)
        self.o_y.append(yi)
        self.o_tid.append(tile_id(zi, xi, yi))
        self.o_okey.append(f.okey)
        self.o_seq.append(f.seq)
        self.o_type.append(tf.type)
        self.o_ring_lens.append([len(r) for r in rings])
        z2 = float(1 << zi)
        for r in rings:
            self.ring_world.append(r)
            self.ring_z2.append(z2)
            self.ring_tx.append(float(xi))
            self.ring_ty.append(float(yi))
        self.o_tags.append(tj)
        self.src_idx.append(src_idx)
        return True

    def __len__(self):
        return len(self.o_z)

    def _quantize_all(self) -> np.ndarray:
        """One vectorized quantize over every accumulated ring: repeat
        each ring's (z2, tx, ty) over its points, then a single
        floor(extent * (v * z2 - t) + 0.5) pass. Identical IEEE float64
        operation order to kernels.transform.quantize."""
        if not self.ring_world:
            return np.empty(0, dtype=np.int32)
        extent = float(self.options.extent)
        nr = len(self.ring_world)
        lens = np.fromiter((len(r) for r in self.ring_world),
                           dtype=np.int64, count=nr)
        tot = int(lens.sum())
        if tot == 0:  # all rings empty (preserved 0-len artifacts)
            return np.empty(0, dtype=np.int32)
        s = _qpool(tot)
        # preallocated fill: np.concatenate over tens of thousands of
        # tiny ring arrays costs ~30us PER ARRAY; slice-assign is ~2us
        pts = s.pts[:tot]
        off = 0
        for r in self.ring_world:
            n = len(r)
            pts[off:off + n] = r
            off += n
        # per-point ring index without np.repeat (which allocates fresh
        # per call): mark ring starts, prefix-sum in the pooled buffer.
        # add.at keeps stacked marks from zero-length rings additive.
        ridx = s.ridx[:tot]
        ridx[:] = 0
        if nr > 1:
            starts = np.cumsum(lens[:-1])
            np.add.at(ridx, starts[starts < tot], 1)
        np.cumsum(ridx, out=ridx)
        param = s.param[:tot]
        # in place over pts, one staged param vector at a time: identical
        # per-element float64 op order to kernels.transform.quantize
        np.take(np.asarray(self.ring_z2), ridx, out=param)
        np.multiply(pts[:, 0], param, out=pts[:, 0])
        np.multiply(pts[:, 1], param, out=pts[:, 1])
        np.take(np.asarray(self.ring_tx), ridx, out=param)
        np.subtract(pts[:, 0], param, out=pts[:, 0])
        np.take(np.asarray(self.ring_ty), ridx, out=param)
        np.subtract(pts[:, 1], param, out=pts[:, 1])
        pts *= extent
        pts += 0.5
        np.floor(pts, out=pts)
        return pts.astype(np.int32).reshape(-1)

    def table(self, carry: pa.Table) -> pa.Table:
        n = len(self.o_z)
        xy_flat = self._quantize_all()
        xy_lens = [sum(rl) * 2 for rl in self.o_ring_lens]
        offsets = np.zeros(n + 1, dtype=np.int64)
        if n:
            np.cumsum(np.asarray(xy_lens, dtype=np.int64), out=offsets[1:])
        idx = pa.array(np.asarray(self.src_idx, dtype=np.int64))
        cols = {
            "z": pa.array(self.o_z, pa.int16()),
            "x": pa.array(self.o_x, pa.int32()),
            "y": pa.array(self.o_y, pa.int32()),
            "tile_id": pa.array(self.o_tid, pa.int64()),
            "okey": pa.array(self.o_okey, pa.binary()),
            "seq": pa.array(self.o_seq, pa.int64()),
            "fid_json": carry.column("fid_json").take(idx),
            "type": pa.array(self.o_type, pa.uint8()),
            "ring_lens": pa.array(self.o_ring_lens, pa.list_(pa.int32())),
            "xy": pa.ListArray.from_arrays(
                pa.array(offsets.astype(np.int32), pa.int32()),
                pa.array(xy_flat.astype(np.int32), pa.int32())),
            "tags_json": pa.array(self.o_tags, pa.string()),
            "doc_id": carry.column("doc_id").take(idx),
            "spans": carry.column("spans").take(idx),
        }
        return pa.table({k: cols[k] for k in TILE_SCHEMA.names})


class BuildTiles:
    def __init__(self, options: TileOptions):
        self.options = options

    def __call__(self, batch: pa.Table) -> pa.Table:
        tune_gc()  # per-worker, no-op after first batch
        z = batch.column("z").to_numpy(zero_copy_only=False)
        x = batch.column("x").to_numpy(zero_copy_only=False)
        y = batch.column("y").to_numpy(zero_copy_only=False)
        tags_json = batch.column("tags_json").to_pylist()
        feats = decode_features(batch)

        accum = TileRowAccum(self.options)
        for i, f in enumerate(feats):
            accum.add(f, int(z[i]), int(x[i]), int(y[i]), tags_json[i], i)
        return accum.table(carry=batch)
