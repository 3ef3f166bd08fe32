"""Parse stage: interleaved doc table -> projected-feature table.

Ray Data shape: ``docs.map_batches(ParseDocs(options),
batch_format="pyarrow")``. Stateful-by-options actor-pool friendly: the
callable class precomputes option constants once per actor (SURVEY.md §4).

Per doc row: select the ``kind == "geo"`` span (the remaining spans are
opaque payload carried through by Arrow take, never deserialized), parse
its GeoJSON text, and run the reference's convert pipeline (projection
M1, ring sizes M2, id promote/generate M3 with the doc's ``seq`` as the
FeatureCollection index, DP marking M4, bbox M5 —
/root/reference/src/convert.js).
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..arrowio import FeatureRowBuilder
from ..config import TileOptions
from ._gctune import tune_gc
from ..kernels.convert import convert_geojson


class ParseDocs:
    def __init__(self, options: TileOptions):
        self.options = options

    def __call__(self, batch: pa.Table) -> pa.Table:
        tune_gc()  # per-worker, no-op after first batch
        opts = self.options
        spans = batch.column("spans")
        spans = spans.combine_chunks() if isinstance(spans, pa.ChunkedArray) else spans
        # vectorized geo-span extraction: flatten, mask kind=='geo',
        # recover per-row geo text via list offsets
        offs = spans.offsets.to_numpy(zero_copy_only=False)
        flat = spans.values  # StructArray
        kinds = flat.field("kind")
        texts = flat.field("text")
        geo_mask = pc.equal(kinds, "geo").to_numpy(zero_copy_only=False)
        geo_pos = np.flatnonzero(geo_mask)
        geo_row = np.searchsorted(offs, geo_pos, side="right") - 1
        # first geo span per doc wins; docs without one are skipped
        _, first = np.unique(geo_row, return_index=True)
        geo_pos = geo_pos[first]
        geo_row = geo_row[first]
        geo_texts = texts.take(pa.array(geo_pos)).to_pylist()

        seqs = batch.column("seq").to_numpy(zero_copy_only=False)
        builder = FeatureRowBuilder()

        for row_i, geo_text in zip(geo_row, geo_texts):
            row_i = int(row_i)
            seq = int(seqs[row_i])
            doc = json.loads(geo_text)
            feats = convert_geojson(doc, opts, base_index=seq)
            props = None
            if doc.get("type") == "Feature":
                props = doc.get("properties")
            for j, f in enumerate(feats):
                f.seq = seq
                f.okey = seq.to_bytes(8, "big") + j.to_bytes(4, "big")
                tags_json = None if f.tags is None else json.dumps(f.tags)
                fid_json = None if f.fid is None else json.dumps(f.fid)
                builder.add(f, 0, 0, 0, fid_json=fid_json,
                            tags_json=tags_json, src_idx=row_i)
        return builder.table(carry=batch, carry_cols=("doc_id", "spans"))
