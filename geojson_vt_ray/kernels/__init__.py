"""Pure numpy geometry kernels (no Ray dependency).

Each kernel documents the reference behavior it reproduces with
file:line citations into /root/reference (mapbox/geojson-vt v4.0.2).
The Ray Data stages in ``geojson_vt_ray.stages`` are thin batch
adapters over these kernels.
"""

from .geom import Line, PFeature, create_feature  # noqa: F401
from .project import project_x, project_y  # noqa: F401
from .simplify import simplify_mark  # noqa: F401
from .convert import convert_geojson  # noqa: F401
from .clip import clip_features  # noqa: F401
from .wrap import wrap_features  # noqa: F401
from .tile import Tile, create_tile  # noqa: F401
from .tileid import tile_id, ancestor  # noqa: F401
