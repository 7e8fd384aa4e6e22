"""Tile assembly and tile-space transform (reference `src/tile.ts`, `src/transform.ts`).

``create_tile`` turns clipped internal features into an MVT-style tile:
per-zoom tolerance (0 at max zoom), tiny-feature dropping against the
*original* ring size, significance filtering against the stride-3 z markers,
ring rewinding, and the numPoints/numSimplified/numFeatures counters.
``transform_tile_features`` converts mercator coords to integer tile
coordinates ``round(extent * (x * 2^z - tx))`` with JS Math.round semantics.
"""

from __future__ import annotations

import math
from typing import Any, Optional

from ..options import TilerOptions
from .feature import Slice

CLIP_START_TAG = "geojsonvt_clip_start"
CLIP_END_TAG = "geojsonvt_clip_end"

# MVT-style tile feature type codes
TYPE_POINT = 1
TYPE_LINE = 2
TYPE_POLYGON = 3


def tile_tolerance(z: int, options: TilerOptions) -> float:
    """Per-zoom simplification tolerance in world units; 0 at max zoom
    (reference `src/tile.ts:16`)."""
    return 0.0 if z == options.max_zoom else options.tolerance / ((1 << (z & 31)) * options.extent)


def create_tile(features: list[dict], z: int, x: int, y: int, options: TilerOptions) -> dict:
    tolerance = tile_tolerance(z, options)
    tile = {
        "z": z,
        "x": x,
        "y": y,
        "features": [],
        "source": None,
        "transformed": False,
        "minX": 2.0,
        "minY": 1.0,
        "maxX": -1.0,
        "maxY": 0.0,
        "numPoints": 0,
        "numSimplified": 0,
        "numFeatures": len(features),
    }
    for feature in features:
        _add_feature(tile, feature, tolerance, options)
    return tile


def _add_feature(tile: dict, feature: dict, tolerance: float, options: TilerOptions) -> None:
    tile["minX"] = min(tile["minX"], feature["minX"])
    tile["minY"] = min(tile["minY"], feature["minY"])
    tile["maxX"] = max(tile["maxX"], feature["maxX"])
    tile["maxY"] = max(tile["maxY"], feature["maxY"])

    ftype = feature["type"]
    geometry = feature["geometry"]

    if ftype in ("Point", "MultiPoint"):
        geom: list = []
        for i in range(0, len(geometry), 3):
            geom.append(geometry[i])
            geom.append(geometry[i + 1])
            tile["numPoints"] += 1
            tile["numSimplified"] += 1
        if not geom:
            return
        _push_tile_feature(tile, TYPE_POINT, geom, feature)
    elif ftype == "LineString":
        geom = []
        _add_line(geom, geometry, tile, tolerance, False, False)
        if not geom:
            return
        tags = feature["tags"]
        if options.line_metrics:
            # annotate the kept fraction of the original line (`src/tile.ts:88-94`)
            tags = dict(feature["tags"]) if feature["tags"] else {}
            size = geometry.size
            if size != 0:
                tags[CLIP_START_TAG] = geometry.start / size
                tags[CLIP_END_TAG] = geometry.end / size
            else:  # JS x/0 -> NaN/Inf instead of raising
                tags[CLIP_START_TAG] = math.nan
                tags[CLIP_END_TAG] = math.nan
        _push_tile_feature(tile, TYPE_LINE, geom, feature, tags_override=tags)
    elif ftype in ("MultiLineString", "Polygon"):
        geom = []
        is_polygon = ftype == "Polygon"
        for i, ring in enumerate(geometry):
            _add_line(geom, ring, tile, tolerance, is_polygon, i == 0)
        if not geom:
            return
        _push_tile_feature(tile, TYPE_POLYGON if is_polygon else TYPE_LINE, geom, feature)
    elif ftype == "MultiPolygon":
        geom = []
        for polygon in geometry:
            for i, ring in enumerate(polygon):
                _add_line(geom, ring, tile, tolerance, True, i == 0)
        if not geom:
            return
        _push_tile_feature(tile, TYPE_POLYGON, geom, feature)


_UNSET = object()


def _push_tile_feature(
    tile: dict, type_code: int, geom: list, feature: dict, tags_override: Any = _UNSET
) -> None:
    tags = feature["tags"] if tags_override is _UNSET else tags_override
    tf: dict = {"type": type_code, "tags": tags, "geometry": geom}
    if feature["id"] is not None:
        tf["id"] = feature["id"]
    tile["features"].append(tf)


def _add_line(
    result: list, geom: Slice, tile: dict, tolerance: float, is_polygon: bool, is_outer: bool
) -> None:
    """Drop tiny rings against *original* size; keep significant points
    (reference `src/tile.ts:143-164`)."""
    sq_tolerance = tolerance * tolerance
    pts = geom.points
    n3 = len(pts)

    if tolerance > 0 and geom.size < (sq_tolerance if is_polygon else tolerance):
        tile["numPoints"] += n3 // 3
        return

    import numpy as np

    if isinstance(pts, np.ndarray) and n3 >= 120:
        # vectorized significance filter (exact: pure comparisons + copy)
        arr = pts.reshape(-1, 3)
        kept = arr[:, :2] if tolerance == 0 else arr[arr[:, 2] > sq_tolerance][:, :2]
        tile["numSimplified"] += len(kept)
        tile["numPoints"] += len(arr)
        ring = kept.reshape(-1).tolist()
    else:
        if isinstance(pts, np.ndarray):
            pts = pts.tolist()
        ring = []
        for i in range(0, n3, 3):
            if tolerance == 0 or pts[i + 2] > sq_tolerance:
                tile["numSimplified"] += 1
                ring.append(pts[i])
                ring.append(pts[i + 1])
            tile["numPoints"] += 1

    if is_polygon:
        _rewind(ring, is_outer)  # sequential area sum — order is load-bearing

    result.append(ring)


def _rewind(ring: list[float], clockwise: bool) -> None:
    """Enforce winding: outer rings CW, holes CCW in screen space
    (reference `src/tile.ts:166-184`)."""
    area = 0.0
    n = len(ring)
    j = n - 2
    for i in range(0, n, 2):
        area += (ring[i] - ring[j]) * (ring[i + 1] + ring[j + 1])
        j = i
    if (area > 0) != clockwise:
        return
    half = n // 2
    for i in range(0, half, 2):
        ring[i], ring[n - 2 - i] = ring[n - 2 - i], ring[i]
        ring[i + 1], ring[n - 1 - i] = ring[n - 1 - i], ring[i + 1]


def _js_round(v: float) -> int:
    """JS Math.round: half rounds toward +infinity."""
    return math.floor(v + 0.5)


def transform_tile_features(tile: dict, extent: int) -> list[dict]:
    """Pure variant of the reference's in-place `transformTile`
    (`src/transform.ts:10-29`): mercator → integer tile coords."""
    z2 = 1 << (tile["z"] & 31)  # JS shift semantics
    tx = tile["x"]
    ty = tile["y"]
    out = []
    for feature in tile["features"]:
        geometry = feature["geometry"]
        if feature["type"] == TYPE_POINT:
            new_geom = [
                _transform_point(geometry[i], geometry[i + 1], extent, z2, tx, ty)
                for i in range(0, len(geometry), 2)
            ]
        else:
            new_geom = [
                [
                    _transform_point(ring[i], ring[i + 1], extent, z2, tx, ty)
                    for i in range(0, len(ring), 2)
                ]
                for ring in geometry
            ]
        nf = {"type": feature["type"], "tags": feature["tags"], "geometry": new_geom}
        if "id" in feature:
            nf["id"] = feature["id"]
        out.append(nf)
    return out


def _transform_point(x: float, y: float, extent: int, z2: int, tx: int, ty: int) -> list:
    return [_js_round(extent * (x * z2 - tx)), _js_round(extent * (y * z2 - ty))]


def transform_tile(tile: dict, extent: int) -> dict:
    """Memoizing transform matching the reference contract (in-place)."""
    if tile["transformed"]:
        return tile
    tile["features"] = transform_tile_features(tile, extent)
    tile["transformed"] = True
    return tile
