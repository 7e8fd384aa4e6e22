from .local_index import LocalGeoJSONVT, LocalTileIndex, gen_tiles, tile_id

__all__ = ["LocalGeoJSONVT", "LocalTileIndex", "gen_tiles", "tile_id"]
