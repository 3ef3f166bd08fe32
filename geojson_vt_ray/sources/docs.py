"""Deterministic interleaved text+media document tables (FIXTURES.md §A).

Input schema per BASELINE.json ``input_hint``:
``doc_id: string, spans: list<struct<kind, text, media_ref, offset>>``
plus a ``seq: int64`` column (the FeatureCollection position, which
generateId semantics require — reference convert.js:37-38 uses the input
index as the id; a distributed read has no implicit row order, so the
order is materialized at synthesis time).

Each document carries exactly one ``kind == "geo"`` span whose ``text``
is a GeoJSON Feature string; the other spans are deterministic filler
text / media refs (seed-fixed, no external data). Spans are opaque
payload: the engine must preserve (kind, text, media_ref, offset)
sequence equality on every output row that carries the document.
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..arrowio import SPAN_TYPE

_WORDS = ("tile zoom clip span merge index vector slice world buffer "
          "extent metric point line ring polygon shard batch arrow ray").split()


def _filler(h: int, j: int) -> str:
    rng = np.random.default_rng((h * 31 + j) & 0x7FFFFFFF)
    return " ".join(_WORDS[i] for i in rng.integers(0, len(_WORDS), 8))


def _spans_for(doc_id: str, geo_text: str, seq: int) -> list[dict]:
    """2-6 interleaved spans with the geo span at a deterministic slot."""
    h = int.from_bytes(hashlib.sha1(doc_id.encode()).digest()[:4], "big")
    n_extra = 1 + (h % 5)  # 1..5 non-geo spans
    geo_slot = h % (n_extra + 1)
    spans = []
    offset = 0
    k = 0
    for j in range(n_extra + 1):
        if j == geo_slot:
            spans.append({"kind": "geo", "text": geo_text,
                          "media_ref": "", "offset": offset})
            offset += len(geo_text)
        else:
            if (h >> j) & 1:
                ref = f"media://{hashlib.sha1(f'{doc_id}:{j}'.encode()).hexdigest()[:16]}"
                spans.append({"kind": "image", "text": "",
                              "media_ref": ref, "offset": offset})
                offset += 1
            else:
                txt = _filler(h, j)
                spans.append({"kind": "text", "text": txt,
                              "media_ref": "", "offset": offset})
                offset += len(txt)
            k += 1
    return spans


def doc_table_from_geojson(data: dict, prefix: str = "doc") -> pa.Table:
    """One document per top-level feature (FeatureCollection position ->
    seq); a Feature / bare geometry becomes a single document."""
    if data.get("type") == "FeatureCollection":
        items = data["features"]
    elif data.get("type") == "Feature":
        items = [data]
    else:
        items = [data]  # bare geometry / GeometryCollection / invalid
    doc_ids = []
    seqs = []
    spans = []
    for i, item in enumerate(items):
        doc_id = f"{prefix}-{i:06d}"
        doc_ids.append(doc_id)
        seqs.append(i)
        spans.append(_spans_for(doc_id, json.dumps(item), i))
    return pa.table({
        "doc_id": pa.array(doc_ids, pa.string()),
        "seq": pa.array(seqs, pa.int64()),
        "spans": pa.array(spans, SPAN_TYPE),
    })


def load_seed_geometries(path: str = "/root/reference/test/fixtures/us-states.json") -> list[dict]:
    """us-states features as corpus seeds (BASELINE.json: corpus 'seeded
    with us-states.json-derived geometries'). Read as *data* only."""
    with open(path) as f:
        return json.load(f)["features"]


def _jitter_feature(feat: dict, copy_idx: int) -> dict:
    """Deterministic small lon/lat shift for scale-up copies; geometry
    shape preserved, world bounds respected."""
    if copy_idx == 0:
        return feat
    rng = np.random.default_rng(42 + copy_idx)
    dlon = float(rng.uniform(-40.0, 40.0))
    dlat = float(rng.uniform(-18.0, 18.0))

    def shift(coords):
        if isinstance(coords[0], (int, float)):
            return [coords[0] + dlon, coords[1] + dlat]
        return [shift(c) for c in coords]

    g = feat["geometry"]
    return {"type": "Feature",
            "id": f"{feat.get('id', '')}-{copy_idx}",
            "properties": feat.get("properties", {}),
            "geometry": {"type": g["type"],
                         "coordinates": shift(g["coordinates"])}}


def synthesize_corpus(n_docs: int, seeds: list[dict] | None = None,
                      prefix: str = "doc") -> pa.Table:
    """n_docs documents cycling over jittered seed geometries, seed=42
    deterministic."""
    if seeds is None:
        seeds = load_seed_geometries()
    doc_ids = []
    seqs = []
    spans = []
    n_seeds = len(seeds)
    for i in range(n_docs):
        feat = _jitter_feature(seeds[i % n_seeds], i // n_seeds)
        doc_id = f"{prefix}-{i:08d}"
        doc_ids.append(doc_id)
        seqs.append(i)
        spans.append(_spans_for(doc_id, json.dumps(feat), i))
    return pa.table({
        "doc_id": pa.array(doc_ids, pa.string()),
        "seq": pa.array(seqs, pa.int64()),
        "spans": pa.array(spans, SPAN_TYPE),
    })


def write_corpus(table: pa.Table, path: str, rows_per_file: int = 10000) -> str:
    """Partitioned parquet corpus (one file per shard, resumable reads)."""
    os.makedirs(path, exist_ok=True)
    n = table.num_rows
    for start in range(0, max(n, 1), rows_per_file):
        part = table.slice(start, rows_per_file)
        pq.write_table(part, os.path.join(path, f"docs-{start:010d}.parquet"))
    return path
