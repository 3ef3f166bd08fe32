"""Quadtree split stage (K1 + K4 inner loop): one zoom level -> the next.

BFS-per-zoom design (SURVEY.md §2.3 K4): every input row is one feature
in one tile at level z; the stage emits that feature's 0..4 child-tile
rows at level z+1. The reference's per-tile clip sequence
(src/index.js:126-147: x-axis left/right with buffer fractions, then
y-axis top/bottom of each half) is preserved exactly for rows that
actually need clipping; the common case — a feature's bbox falling
entirely inside or outside a child's buffered slab — is classified
vectorized over the whole batch from the bbox columns and handled by
Arrow ``take`` without touching geometry (the batch-level equivalent of
clip.js:18-19,30-35 trivial accept/reject).

Skew note (north rule): dense tiles produce many rows under the same
(z,x,y) key, but this stage is key-oblivious (row-local), so no salting
is needed here; only the tiny per-level stats aggregate groups by tile,
over batch-level partials.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..arrowio import FeatureRowBuilder, decode_features
from ..config import TileOptions
from ._gctune import tune_gc
from ..kernels.clip import clip_feature
from ..kernels.tileid import tile_id_vec


def level_counts(batch: pa.Table) -> pa.Table:
    """Per-batch partial of the stopping-rule aggregate (A4): sum of
    vertex counts per tile (reference numPoints, src/index.js:107)."""
    tid = tile_id_vec(batch.column("z").to_numpy(zero_copy_only=False),
                      batch.column("x").to_numpy(zero_copy_only=False),
                      batch.column("y").to_numpy(zero_copy_only=False))
    npts = batch.column("n_points").to_numpy(zero_copy_only=False).astype(np.int64)
    uniq, inv = np.unique(tid, return_inverse=True)
    sums = np.zeros(len(uniq), dtype=np.int64)
    np.add.at(sums, inv, npts)
    rows = np.ones(len(npts), dtype=np.int64)
    nrows = np.zeros(len(uniq), dtype=np.int64)
    np.add.at(nrows, inv, rows)
    return pa.table({"tile_id": pa.array(uniq), "n_points": pa.array(sums),
                     "n_rows": pa.array(nrows)})


class SplitLevel:
    """map_batches callable: rows at level z -> child rows at z+1.

    ``split_ids``: None = split every tile with rows (index_max_points<=0
    fast path), else a numpy int64 array of tile ids to split (driver
    decision from the stopping aggregate, broadcast once per level via
    ray.put and read here zero-copy)."""

    def __init__(self, options: TileOptions, split_ids=None):
        self.options = options
        self.split_ids = split_ids

    def _split_ids_array(self):
        ids = self.split_ids
        if ids is None:
            return None
        # allow ray.ObjectRef for broadcast without per-batch reship
        try:
            import ray
            if isinstance(ids, ray.ObjectRef):
                ids = ray.get(ids)
                self.split_ids = ids
        except ImportError:
            pass
        return ids

    def __call__(self, batch: pa.Table) -> pa.Table:
        tune_gc()  # per-worker, no-op after first batch
        opts = self.options
        lm = opts.line_metrics
        k1f = 0.5 * opts.buffer / opts.extent
        k2f = 0.5 - k1f
        k3f = 0.5 + k1f
        k4f = 1 + k1f

        z = batch.column("z").to_numpy(zero_copy_only=False).astype(np.int64)
        x = batch.column("x").to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch.column("y").to_numpy(zero_copy_only=False).astype(np.int64)

        ids = self._split_ids_array()
        if ids is not None:
            tid = tile_id_vec(z, x, y)
            keep = np.isin(tid, ids)
            if not keep.all():
                batch = batch.filter(pa.array(keep))
                if batch.num_rows == 0:
                    return _empty_like(batch)
                z, x, y = z[keep], x[keep], y[keep]

        if batch.num_rows == 0:
            return batch

        z2 = (1 << z).astype(np.float64)
        xf = x.astype(np.float64)
        yf = y.astype(np.float64)
        minx = batch.column("minx").to_numpy(zero_copy_only=False)
        miny = batch.column("miny").to_numpy(zero_copy_only=False)
        maxx = batch.column("maxx").to_numpy(zero_copy_only=False)
        maxy = batch.column("maxy").to_numpy(zero_copy_only=False)

        # buffered slab bounds per row, in world units ((x±k)/2^z exactly
        # as index.js:136-147 passes tile-unit bounds into clip's /scale)
        lo_l = (xf - k1f) / z2
        hi_l = (xf + k3f) / z2
        lo_r = (xf + k2f) / z2
        hi_r = (xf + k4f) / z2
        lo_t = (yf - k1f) / z2
        hi_t = (yf + k3f) / z2
        lo_b = (yf + k2f) / z2
        hi_b = (yf + k4f) / z2

        acc_l = (minx >= lo_l) & (maxx < hi_l)
        rej_l = (maxx < lo_l) | (minx >= hi_l)
        acc_r = (minx >= lo_r) & (maxx < hi_r)
        rej_r = (maxx < lo_r) | (minx >= hi_r)
        acc_t = (miny >= lo_t) & (maxy < hi_t)
        rej_t = (maxy < lo_t) | (miny >= hi_t)
        acc_b = (miny >= lo_b) & (maxy < hi_b)
        rej_b = (maxy < lo_b) | (miny >= hi_b)

        child_acc = [acc_l & acc_t, acc_l & acc_b, acc_r & acc_t, acc_r & acc_b]
        child_rej = [rej_l | rej_t, rej_l | rej_b, rej_r | rej_t, rej_r | rej_b]
        child_dxy = [(0, 0), (0, 1), (1, 0), (1, 1)]

        out_parts: list[pa.Table] = []
        needs_kernel = np.zeros(batch.num_rows, dtype=bool)
        for acc, rej in zip(child_acc, child_rej):
            needs_kernel |= ~(acc | rej)

        # fast path: whole-row trivial accepts copied columnar
        for (dx, dy), acc in zip(child_dxy, child_acc):
            idx = np.flatnonzero(acc)
            if len(idx) == 0:
                continue
            part = batch.take(pa.array(idx))
            part = part.set_column(part.schema.get_field_index("z"), "z",
                                   pa.array((z[idx] + 1).astype(np.int16)))
            part = part.set_column(part.schema.get_field_index("x"), "x",
                                   pa.array((x[idx] * 2 + dx).astype(np.int32)))
            part = part.set_column(part.schema.get_field_index("y"), "y",
                                   pa.array((y[idx] * 2 + dy).astype(np.int32)))
            out_parts.append(part)

        # slow path: rows where at least one child needs real clipping
        kidx = np.flatnonzero(needs_kernel)
        if len(kidx):
            feats = decode_features(batch.take(pa.array(kidx)))
            builder = FeatureRowBuilder()
            for fi, row in enumerate(kidx):
                f = feats[fi]
                rz, rx, ry = int(z[row]), int(x[row]), int(y[row])
                halves = {}
                for xi, (lo, hi) in ((0, (lo_l[row], hi_l[row])),
                                     (1, (lo_r[row], hi_r[row]))):
                    halves[xi] = clip_feature(f, lo, hi, 0, lm)
                for (dx, dy), acc, rej in zip(child_dxy, child_acc, child_rej):
                    if acc[row] or rej[row]:
                        continue  # handled by fast path / dropped
                    lo, hi = ((lo_t[row], hi_t[row]) if dy == 0
                              else (lo_b[row], hi_b[row]))
                    for piece in halves[dx]:
                        for out_f in clip_feature(piece, lo, hi, 1, lm):
                            builder.add(out_f, rz + 1, rx * 2 + dx,
                                        ry * 2 + dy, src_idx=int(row))
            if len(builder):
                out_parts.append(builder.table(carry=batch))

        if not out_parts:
            return _empty_like(batch)
        return pa.concat_tables(out_parts, promote_options="default")


def _empty_like(batch: pa.Table) -> pa.Table:
    return batch.schema.empty_table()
