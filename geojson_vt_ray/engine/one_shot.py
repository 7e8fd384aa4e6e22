"""Index-free single-tile path (reference `src/geojson-to-tile.ts:42-58`)."""

from __future__ import annotations

from typing import Optional

from ..kernels.clip import AXIS_X, AXIS_Y, clip
from ..kernels.convert import convert_to_internal
from ..kernels.tile import create_tile, transform_tile
from ..kernels.wrap import wrap
from ..options import TilerOptions


def geojson_to_tile(
    data: dict, z: int, x: int, y: int, options: Optional[TilerOptions] = None
) -> dict:
    options = options or TilerOptions()
    features = convert_to_internal(data, options)
    if options.wrap:
        features = wrap(features, options)
    if options.clip or options.line_metrics:
        pow2 = 1 << (z & 31)  # JS shift semantics (negative z wraps mod 32)
        buffer = options.buffer / options.extent
        lm = options.line_metrics
        left = clip(features, pow2, x - buffer, x + 1 + buffer, AXIS_X, -1, 2, lm)
        features = clip(left or [], pow2, y - buffer, y + 1 + buffer, AXIS_Y, -1, 2, lm)
    return transform_tile(create_tile(features or [], z, x, y, options), options.extent)


def geojson_to_mvt(
    data: dict,
    z: int,
    x: int,
    y: int,
    options: Optional[TilerOptions] = None,
    layer_name: str = "geojsonvt",
) -> bytes:
    """One-shot GeoJSON → Mapbox Vector Tile bytes for a single tile —
    `geojson_to_tile` composed with the MVT codec (`kernels/mvt.py`),
    matching the reference ecosystem's geoJSONToTile → vt-pbf one-liner."""
    from ..kernels.mvt import encode_layers

    options = options or TilerOptions()
    tile = geojson_to_tile(data, z, x, y, options)
    return encode_layers(
        {layer_name: {"features": tile["features"], "extent": options.extent}}
    )
