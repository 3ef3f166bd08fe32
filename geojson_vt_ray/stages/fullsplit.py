"""Single-pass quadtree drill-down (K4 fast path for index_max_points<=0).

When the stopping rule is vacuous (``indexMaxPoints <= 0`` — the
reference README.md:67 "pre-generate all tiles" recipe: every tile with
features splits until ``indexMaxZoom``), the split decision never needs
cross-feature state: a tile splits iff ANY feature lands in it, and each
feature's contribution to every descendant tile depends only on that
feature. So the whole pyramid becomes ONE embarrassingly-parallel
``map_batches`` pass — no per-level shuffle barrier, no per-level
checkpoint write/read, which is what makes the job scale linearly with
CPUs (SURVEY.md §4 scaling proof).

Per input feature row the stage walks the quadtree (BFS, matching the
reference's per-tile child order tl/bl/tr/br — src/index.js:151-154),
emitting:

- a built+quantized tile row (stages/build.TileRowAccum) for every tile
  the feature touches at z=0..indexMaxZoom, and
- when ``keep_sources``: the full-precision feature row at the
  z==indexMaxZoom leaf — the reference's ``tile.source`` retention
  (src/index.js:101-102) that later drill-down (getTile misses) reads.

Both row kinds ship in one output table under COMBINED_SCHEMA with an
``okind`` discriminator (0=tile row, 1=leaf source row), written once,
hive-partitioned by (okind, z) for pruned reads.

Clipping semantics are identical to the per-level stage: buffered child
slabs (index.js:126-129), per-feature bbox trivial accept/reject
(clip.js:18-19) before the real stripe-clip kernel.
"""

from __future__ import annotations

import os
from collections import deque

import numpy as np
import pyarrow as pa

from ..arrowio import FEATURE_SCHEMA, FeatureRowBuilder, decode_features
from ..config import TileOptions
from ._gctune import tune_gc
from ..kernels import native as _native
from ..kernels.clip import clip_feature
from ..kernels.tileid import tile_id_vec
from .build import TILE_SCHEMA, TileRowAccum

_SHARED = ("z", "x", "y", "okey", "seq", "fid_json", "tags_json",
           "doc_id", "spans")

COMBINED_SCHEMA = pa.schema(
    [("okind", pa.uint8())]
    + [f for f in TILE_SCHEMA]
    + [f for f in FEATURE_SCHEMA if f.name not in TILE_SCHEMA.names]
)


def _pad_to_combined(t: pa.Table, okind: int) -> pa.Table:
    cols = {"okind": pa.array([okind] * t.num_rows, pa.uint8())}
    for field in COMBINED_SCHEMA:
        if field.name == "okind":
            continue
        if field.name in t.column_names:
            col = t.column(field.name)
            if col.type != field.type:
                col = col.cast(field.type)
            cols[field.name] = col
        else:
            cols[field.name] = pa.nulls(t.num_rows, field.type)
    return pa.table({f.name: cols[f.name] for f in COMBINED_SCHEMA})


def _stats_partial(tile_table: pa.Table) -> pa.Table:
    """Distinct (z, x, y) of this batch's tile rows with row counts
    carried in the ``seq`` column (okind=2 manifest side-channel)."""
    import numpy as np
    z = tile_table.column("z").to_numpy(zero_copy_only=False).astype(np.int64)
    x = tile_table.column("x").to_numpy(zero_copy_only=False).astype(np.int64)
    y = tile_table.column("y").to_numpy(zero_copy_only=False).astype(np.int64)
    key = (z << 58) | (y << 29) | x
    uniq, inv = np.unique(key, return_inverse=True)
    cnt = np.zeros(len(uniq), dtype=np.int64)
    np.add.at(cnt, inv, 1)
    return pa.table({
        "z": pa.array((uniq >> 58).astype(np.int16), pa.int16()),
        "x": pa.array((uniq & ((1 << 29) - 1)).astype(np.int32), pa.int32()),
        "y": pa.array(((uniq >> 29) & ((1 << 29) - 1)).astype(np.int32),
                      pa.int32()),
        "seq": pa.array(cnt, pa.int64()),
    })


class FullSplitBuild:
    """map_batches callable: wrapped feature rows -> all tile rows of the
    full pyramid (+ leaf source rows), one pass, no barriers."""

    def __init__(self, options: TileOptions, keep_sources: bool = True):
        if options.index_max_points > 0:
            raise ValueError("FullSplitBuild requires index_max_points <= 0")
        self.options = options
        self.keep_sources = keep_sources

    def __call__(self, batch: pa.Table) -> pa.Table:
        tune_gc()  # per-worker, no-op after first batch
        # C fast path: the whole per-feature BFS (clip + thin + quantize
        # + leaf emission) in one extension call per batch, bit-exact vs
        # this Python loop (tests/test_fullsplit_native.py pins table
        # equality).  line_metrics stays on the Python path (per-slice
        # okey suffixes + tag injection).
        if (_native.EXT is not None
                and hasattr(_native.EXT, "split_batch")
                and not self.options.line_metrics
                and not os.environ.get("GVT_NO_SPLITC")):
            return self._call_native(batch)
        opts = self.options
        imz = opts.index_max_zoom
        lm = opts.line_metrics
        k1f = 0.5 * opts.buffer / opts.extent
        k2f = 0.5 - k1f
        k3f = 0.5 + k1f
        k4f = 1 + k1f

        z_in = batch.column("z").to_numpy(zero_copy_only=False)
        x_in = batch.column("x").to_numpy(zero_copy_only=False)
        y_in = batch.column("y").to_numpy(zero_copy_only=False)
        tags_json = batch.column("tags_json").to_pylist()
        feats = decode_features(batch)

        tiles = TileRowAccum(opts)
        sources = FeatureRowBuilder() if self.keep_sources else None

        for i, f in enumerate(feats):
            queue = deque([(f, int(z_in[i]), int(x_in[i]), int(y_in[i]))])
            while queue:
                g, z0, x0, y0 = queue.popleft()
                tiles.add(g, z0, x0, y0, tags_json[i], src_idx=i)
                if z0 >= imz:
                    if sources is not None:
                        sources.add(g, z0, x0, y0, src_idx=i)
                    continue
                z2 = float(1 << z0)
                lo_l = (x0 - k1f) / z2
                hi_l = (x0 + k3f) / z2
                lo_r = (x0 + k2f) / z2
                hi_r = (x0 + k4f) / z2
                lo_t = (y0 - k1f) / z2
                hi_t = (y0 + k3f) / z2
                lo_b = (y0 + k2f) / z2
                hi_b = (y0 + k4f) / z2

                halves = []
                for lo, hi in ((lo_l, hi_l), (lo_r, hi_r)):
                    if g.minx >= lo and g.maxx < hi:
                        halves.append((g,))
                    elif g.maxx < lo or g.minx >= hi:
                        halves.append(())
                    else:
                        halves.append(tuple(clip_feature(g, lo, hi, 0, lm)))

                # child order tl, bl, tr, br (index.js:151-154)
                for dx in (0, 1):
                    for dy, lo, hi in ((0, lo_t, hi_t), (1, lo_b, hi_b)):
                        for piece in halves[dx]:
                            if piece.miny >= lo and piece.maxy < hi:
                                out = (piece,)
                            elif piece.maxy < lo or piece.miny >= hi:
                                continue
                            else:
                                out = clip_feature(piece, lo, hi, 1, lm)
                            for q in out:
                                queue.append((q, z0 + 1, x0 * 2 + dx,
                                              y0 * 2 + dy))

        parts = []
        if len(tiles):
            tile_table = tiles.table(carry=batch)
            parts.append(_pad_to_combined(tile_table, 0))
            # okind=2 side-channel: this batch's per-tile row counts
            # (count in `seq`), so the manifest aggregate reads a few KB
            # from combined/okind=2/ instead of re-scanning every tile
            # row — the manifest step stops costing a second full read
            parts.append(_pad_to_combined(_stats_partial(tile_table), 2))
        if sources is not None and len(sources):
            parts.append(_pad_to_combined(sources.table(carry=batch), 1))
        if not parts:
            return COMBINED_SCHEMA.empty_table()
        return pa.concat_tables(parts)

    def _call_native(self, batch: pa.Table) -> pa.Table:
        """One split_batch extension call; Arrow assembly by take/offsets
        (zero Python work per feature/row)."""
        opts = self.options

        from ..arrowio import flat_list_column

        def flat(name):
            return flat_list_column(batch, name)

        def col_np(name, dtype):
            a = batch.column(name).to_numpy(zero_copy_only=False)
            return np.ascontiguousarray(a, dtype=dtype)

        pl_off, pl_vals = flat("part_lens")
        _, pi_vals = flat("poly_idx")
        _, sz_vals = flat("sizes")
        _, st_vals = flat("starts")
        _, en_vals = flat("ends")
        xz_off, xz_vals = flat("xyz")

        res = _native.EXT.split_batch(
            col_np("gtype", np.uint8),
            np.ascontiguousarray(pl_off, np.int32),
            np.ascontiguousarray(pl_vals, np.int32),
            np.ascontiguousarray(pi_vals, np.int32),
            np.ascontiguousarray(sz_vals, np.float64),
            np.ascontiguousarray(st_vals, np.float64),
            np.ascontiguousarray(en_vals, np.float64),
            np.ascontiguousarray(xz_off, np.int32),
            np.ascontiguousarray(xz_vals, np.float64),
            col_np("minx", np.float64), col_np("miny", np.float64),
            col_np("maxx", np.float64), col_np("maxy", np.float64),
            col_np("z", np.int32), col_np("x", np.int32),
            col_np("y", np.int32),
            opts.index_max_zoom, opts.max_zoom, float(opts.tolerance),
            opts.extent, opts.buffer, bool(self.keep_sources))
        (tsrc, tz, tx, ty, ttype, tnr, tnp, tring, txy,
         lsrc, lz, lx, ly, lgt, lnr, lnp, lbb, lring, lpoly,
         lsize, lstart, lend, lxyz) = res

        def list_arr(vals: np.ndarray, counts: np.ndarray,
                     pa_type) -> pa.ListArray:
            offs = np.zeros(len(counts) + 1, dtype=np.int32)
            if len(counts):
                offs[1:] = np.cumsum(counts, dtype=np.int64).astype(np.int32)
            return pa.ListArray.from_arrays(
                pa.array(offs, pa.int32()), pa.array(vals, pa_type))

        parts = []
        if len(tsrc):
            idx = pa.array(tsrc)
            tile_table = pa.table({
                "z": pa.array(tz.astype(np.int16), pa.int16()),
                "x": pa.array(tx, pa.int32()),
                "y": pa.array(ty, pa.int32()),
                "tile_id": pa.array(tile_id_vec(tz, tx, ty), pa.int64()),
                "okey": batch.column("okey").take(idx),
                "seq": batch.column("seq").take(idx),
                "fid_json": batch.column("fid_json").take(idx),
                "type": pa.array(ttype, pa.uint8()),
                "ring_lens": list_arr(tring, tnr, pa.int32()),
                "xy": list_arr(txy, 2 * tnp.astype(np.int64), pa.int32()),
                "tags_json": batch.column("tags_json").take(idx),
                "doc_id": batch.column("doc_id").take(idx),
                "spans": batch.column("spans").take(idx),
            })
            parts.append(_pad_to_combined(tile_table, 0))
            parts.append(_pad_to_combined(_stats_partial(tile_table), 2))
        if self.keep_sources and len(lsrc):
            idx = pa.array(lsrc)
            bb = lbb.reshape(-1, 4)
            src_table = pa.table({
                "doc_id": batch.column("doc_id").take(idx),
                "seq": batch.column("seq").take(idx),
                "okey": batch.column("okey").take(idx),
                "fid_json": batch.column("fid_json").take(idx),
                "gtype": pa.array(lgt, pa.uint8()),
                "part_lens": list_arr(lring, lnr, pa.int32()),
                "poly_idx": list_arr(lpoly, lnr, pa.int32()),
                "xyz": list_arr(lxyz, 3 * lnp.astype(np.int64),
                                pa.float64()),
                "sizes": list_arr(lsize, lnr, pa.float64()),
                "starts": list_arr(lstart, lnr, pa.float64()),
                "ends": list_arr(lend, lnr, pa.float64()),
                "minx": pa.array(bb[:, 0], pa.float64()),
                "miny": pa.array(bb[:, 1], pa.float64()),
                "maxx": pa.array(bb[:, 2], pa.float64()),
                "maxy": pa.array(bb[:, 3], pa.float64()),
                "tags_json": batch.column("tags_json").take(idx),
                "spans": batch.column("spans").take(idx),
                "n_points": pa.array(lnp, pa.int32()),
                "z": pa.array(lz.astype(np.int16), pa.int16()),
                "x": pa.array(lx, pa.int32()),
                "y": pa.array(ly, pa.int32()),
            })
            parts.append(_pad_to_combined(src_table, 1))
        if not parts:
            return COMBINED_SCHEMA.empty_table()
        return pa.concat_tables(parts)


def _col_np(batch: pa.Table, name: str):
    """Numeric numpy view of a column that may come back from a hive
    partition as dictionary/string typed."""
    import numpy as np
    col = batch.column(name)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_dictionary(col.type):
        col = col.cast(col.type.value_type)
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        col = col.cast(pa.int64())
    return col.to_numpy(zero_copy_only=False)


def tile_coords_partial(batch: pa.Table) -> pa.Table:
    """Per-batch partial for the manifest: distinct (z,x,y) of tile rows
    with row counts (driver combines — tiny tables only)."""
    import numpy as np
    mask = _col_np(batch, "okind") == 0
    z = _col_np(batch, "z")[mask].astype(np.int64)
    x = _col_np(batch, "x")[mask].astype(np.int64)
    y = _col_np(batch, "y")[mask].astype(np.int64)
    key = (z << 58) | (y << 29) | x
    uniq, inv = np.unique(key, return_inverse=True)
    cnt = np.zeros(len(uniq), dtype=np.int64)
    np.add.at(cnt, inv, 1)
    return pa.table({
        "z": pa.array((uniq >> 58).astype(np.int16)),
        "x": pa.array((uniq & ((1 << 29) - 1)).astype(np.int32)),
        "y": pa.array(((uniq >> 29) & ((1 << 29) - 1)).astype(np.int32)),
        "n_rows": pa.array(cnt),
    })
