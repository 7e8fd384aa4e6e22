"""GeoJSON → internal projected features (reference `src/convert.ts`).

Projects every coordinate to mercator [0,1]^2, accumulates per-ring size
(area/length), and runs Douglas-Peucker significance marking with the
base tolerance for max zoom. GeometryCollections flatten recursively
(depth ≤ 1024). Features with null geometry or empty coordinates drop
silently (`src/convert.ts:34,46`).
"""

from __future__ import annotations

import math
from typing import Any, Optional

from ..options import TilerOptions
from .feature import Slice, create_feature
from .project import project_x, project_y
from .simplify import simplify_mark

MAX_GEOMETRY_COLLECTION_DEPTH = 1024

GEOM_TYPES = ("Point", "MultiPoint", "LineString", "MultiLineString", "Polygon", "MultiPolygon")


def convert_to_internal(data: dict, options: TilerOptions) -> list[dict]:
    """Dispatch over FeatureCollection / Feature / bare geometry
    (reference `src/convert.ts:14-31`)."""
    features: list[dict] = []
    dtype = data.get("type")
    if dtype == "FeatureCollection":
        for i, f in enumerate(data["features"]):
            _feature_to_internal(features, f, options, i)
    elif dtype == "Feature":
        _feature_to_internal(features, data, options, None)
    else:
        _feature_to_internal(
            features, {"type": "Feature", "geometry": data, "properties": None}, options, None
        )
    return features


def convert_single_feature(geojson_feature: dict, options: TilerOptions, index: Optional[int]) -> list[dict]:
    """Convert one GeoJSON Feature (with collection index for generateId)."""
    features: list[dict] = []
    _feature_to_internal(features, geojson_feature, options, index)
    return features


def _feature_to_internal(
    features: list[dict], geojson: dict, options: TilerOptions, index: Optional[int], depth: int = 0
) -> None:
    geometry = geojson.get("geometry")
    if not geometry:
        return
    if depth > MAX_GEOMETRY_COLLECTION_DEPTH:
        raise ValueError(
            f"GeometryCollection nesting exceeds supported depth: {MAX_GEOMETRY_COLLECTION_DEPTH}"
        )

    gtype = geometry.get("type")
    if gtype == "GeometryCollection":
        for geom in geometry["geometries"]:
            _feature_to_internal(
                features,
                {
                    "id": geojson.get("id"),
                    "type": "Feature",
                    "geometry": geom,
                    "properties": geojson.get("properties"),
                },
                options,
                index,
                depth + 1,
            )
        return

    coords = geometry.get("coordinates")
    if not coords:
        return

    fid = _feature_id(geojson, options, index)
    tags = geojson.get("properties")
    tolerance = options.base_sq_tolerance

    if gtype == "Point":
        pts = [project_x(coords[0]), project_y(coords[1]), 0.0]
        features.append(create_feature(fid, "Point", pts, tags))
    elif gtype == "MultiPoint":
        pts = []
        for c in coords:
            pts.extend((project_x(c[0]), project_y(c[1]), 0.0))
        features.append(create_feature(fid, "MultiPoint", pts, tags))
    elif gtype == "LineString":
        features.append(
            create_feature(fid, "LineString", _convert_ring(coords, tolerance, False), tags)
        )
    elif gtype == "MultiLineString":
        if options.line_metrics:
            # explode so each line tracks its own metrics (`src/convert.ts:122-129`)
            for line in coords:
                features.append(
                    create_feature(fid, "LineString", _convert_ring(line, tolerance, False), tags)
                )
        else:
            geom = [_convert_ring(line, tolerance, False) for line in coords]
            features.append(create_feature(fid, "MultiLineString", geom, tags))
    elif gtype == "Polygon":
        geom = [_convert_ring(ring, tolerance, True) for ring in coords]
        features.append(create_feature(fid, "Polygon", geom, tags))
    elif gtype == "MultiPolygon":
        geom = [[_convert_ring(ring, tolerance, True) for ring in poly] for poly in coords]
        features.append(create_feature(fid, "MultiPolygon", geom, tags))
    else:
        raise ValueError("Input data is not a valid GeoJSON object.")


def _feature_id(geojson: dict, options: TilerOptions, index: Optional[int]) -> Any:
    """promoteId property → generateId index → native id (`src/convert.ts:81-89`)."""
    if options.promote_id:
        props = geojson.get("properties")
        return props.get(options.promote_id) if props else None
    if options.generate_id:
        return index or 0
    return geojson.get("id")


def _convert_ring(ring: list, tolerance: float, is_polygon: bool) -> Slice:
    """Project one ring, accumulate size, run DP marking, pin endpoints
    (reference `src/convert.ts:153-183`)."""
    points: list[float] = []
    size = 0.0
    x0 = y0 = 0.0
    for j, c in enumerate(ring):
        x = project_x(c[0])
        y = project_y(c[1])
        points.extend((x, y, 0.0))
        if j > 0:
            if is_polygon:
                size += (x0 * y - x * y0) / 2  # signed area contribution
            else:
                size += math.sqrt((x - x0) ** 2 + (y - y0) ** 2)  # length
        x0 = x
        y0 = y

    last = len(points) - 3
    points[2] = 1.0
    if tolerance > 0:
        simplify_mark(points, 0, last, tolerance)
    points[last + 2] = 1.0

    out = Slice(points)
    out.size = abs(size)
    out.start = 0.0
    out.end = out.size
    return out
