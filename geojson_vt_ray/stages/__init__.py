from .parse import ParseDocs  # noqa: F401
from .wrap import WrapStage  # noqa: F401
from .split import SplitLevel, level_counts  # noqa: F401
from .build import BuildTiles, TILE_SCHEMA  # noqa: F401
