"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in geojson_vt_ray) calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF0001 = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship pipeline on sf0.001: synthesized interleaved doc corpus ->
    parse/project/DP-mark -> wrap -> quadtree pyramid -> per-tile counts."""
    from geojson_vt_ray.pipelines.queries import q_pyramid_tiles
    return q_pyramid_tiles(SF0001)


def queries() -> dict[str, Callable[[str], Any]]:
    from geojson_vt_ray.pipelines.queries import QUERIES
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from geojson_vt_ray.pipelines.queries import ORACLE_SQL
    return dict(ORACLE_SQL)
