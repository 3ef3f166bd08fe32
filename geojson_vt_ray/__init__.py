"""geojson_vt_ray — a Ray-Data-native distributed vector-tile slicing and
spatial-join engine with the query surface of mapbox/geojson-vt.

Built from scratch on ray.data.Dataset pipelines (SURVEY.md §1.2, §3):
zero-copy Arrow batches, BFS-per-zoom quadtree splitting with a grouped
stopping aggregate, partitioned Parquet tile sinks, plus spatial joins
(quad-cell index, point-in-polygon, kNN, raster overlay) and
training-data operators (dedup, ANN, text analysis) over the same engine.
"""

from .config import TileOptions, options_from_dict  # noqa: F401
from .local_index import LocalIndex, gen_tiles  # noqa: F401

__version__ = "0.1.0"
