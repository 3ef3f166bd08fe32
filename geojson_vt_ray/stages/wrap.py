"""Antimeridian wrap stage (K2) as a pure per-row flat-map.

Reference wrap (src/wrap.js:5-19) is list-level: it concatenates
shift(left_clip, +1) ++ center_clip ++ shift(right_clip, -1), applying
the center re-clip only when any feature wrapped. Per feature the center
clip is a no-op whenever no feature wraps (a feature that would be cut by
[-b, 1+b] necessarily produces a left or right piece itself), so the
row-local emission of (left, center, right) pieces is exactly equivalent
— which is what makes wrap embarrassingly parallel here. The world rank
w∈{0,1,2} is prepended to the ordering key to reproduce the reference's
concat order (SURVEY.md §2.6).
"""

from __future__ import annotations

import pyarrow as pa

from ..arrowio import FeatureRowBuilder, decode_features
from ..config import TileOptions
from ._gctune import tune_gc
from ..kernels.clip import clip_feature
from ..kernels.wrap import shift_feature


class WrapStage:
    def __init__(self, options: TileOptions):
        self.options = options

    def __call__(self, batch: pa.Table) -> pa.Table:
        tune_gc()  # per-worker, no-op after first batch
        opts = self.options
        b = opts.buffer / opts.extent
        lm = opts.line_metrics
        feats = decode_features(batch)
        builder = FeatureRowBuilder()

        for i, f in enumerate(feats):
            for piece in clip_feature(f, -1 - b, b, 0, lm):
                s = shift_feature(piece, 1.0)
                builder.add(s, 0, 0, 0, src_idx=i)
                builder.okey[-1] = b"\x00" + piece.okey
            for piece in clip_feature(f, -b, 1 + b, 0, lm):
                builder.add(piece, 0, 0, 0, src_idx=i)
                builder.okey[-1] = b"\x01" + piece.okey
            for piece in clip_feature(f, 1 - b, 2 + b, 0, lm):
                s = shift_feature(piece, -1.0)
                builder.add(s, 0, 0, 0, src_idx=i)
                builder.okey[-1] = b"\x02" + piece.okey
        return builder.table(carry=batch)
