from .pyramid import slice_pyramid, TileSet  # noqa: F401
