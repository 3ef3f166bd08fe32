"""Tiling options — semantics of the reference's option object.

Mirrors the defaults and validation of /root/reference/src/index.js:8-19,29-30
(M11 in SURVEY.md §2.2). Validated once on the driver before any pipeline is
built; stages receive a frozen copy.
"""

from __future__ import annotations

from dataclasses import dataclass, replace


@dataclass(frozen=True)
class TileOptions:
    max_zoom: int = 14          # max zoom to preserve detail on
    index_max_zoom: int = 5     # max zoom in the tile index (first pass)
    index_max_points: int = 100_000  # max points per tile before splitting stops
    tolerance: float = 3.0      # simplification tolerance (higher = simpler)
    extent: int = 4096          # tile extent
    buffer: int = 64            # tile buffer on each side
    line_metrics: bool = False  # track mapbox_clip_start / mapbox_clip_end
    promote_id: str | None = None   # property name promoted to feature id
    generate_id: bool = False   # generate ids from input index
    debug: int = 0              # 0/1/2 timing+stats verbosity (index.js:18)
    # debug >= 1 records Ray's per-operator stats string (the
    # distributed analogue of the reference's console.time 'preprocess
    # data'/'generate tiles' pair, src/index.js:27,39-44): fullsplit +
    # adaptive put it in manifest["metrics"]["ray_stats"] (adaptive: the
    # final level's), sharded puts each shard's in its shards/K.json
    # lineage marker; debug >= 2 (adaptive) adds per-level stats in
    # manifest["levels"]. Phase wall times and the per-zoom histogram
    # are always recorded. append_to_pyramid restores options from the
    # existing manifest (debug is not persisted there), so appends run
    # at debug=0. debug has no effect on results and is excluded from
    # resume-compatibility checks.

    def __post_init__(self) -> None:
        if self.max_zoom < 0 or self.max_zoom > 24:
            raise ValueError("maxZoom should be in the 0-24 range")
        if self.promote_id and self.generate_id:
            raise ValueError("promoteId and generateId cannot be used together.")

    # squared DP tolerance in world units (src/convert.js:32)
    @property
    def sq_tolerance(self) -> float:
        return (self.tolerance / ((1 << self.max_zoom) * self.extent)) ** 2

    def with_(self, **kw) -> "TileOptions":
        return replace(self, **kw)


def options_from_dict(d: dict | None) -> TileOptions:
    """Accept reference-style camelCase option dicts (test parity)."""
    if not d:
        return TileOptions()
    m = {
        "maxZoom": "max_zoom",
        "indexMaxZoom": "index_max_zoom",
        "indexMaxPoints": "index_max_points",
        "tolerance": "tolerance",
        "extent": "extent",
        "buffer": "buffer",
        "lineMetrics": "line_metrics",
        "promoteId": "promote_id",
        "generateId": "generate_id",
    }
    kw = {}
    for k, v in d.items():
        kw[m.get(k, k)] = int(v) if k == "debug" else v
    return TileOptions(**kw)
