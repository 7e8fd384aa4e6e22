"""Antimeridian handling (reference `src/wrap.ts`).

Clips the world into left/center/right copies with a buffer; features that
spill over ±180° are duplicated into shifted copies so both world edges render
seamlessly. Output order: shifted-left copies, center, shifted-right copies —
order is load-bearing for tile feature order downstream.
"""

from __future__ import annotations

from ..options import TilerOptions
from .clip import AXIS_X, clip
from .feature import Slice, create_feature


def wrap(features: list[dict], options: TilerOptions) -> list[dict]:
    buffer = options.buffer / options.extent
    merged = features

    left = clip(features, 1, -1 - buffer, buffer, AXIS_X, -1, 2, options.line_metrics)
    right = clip(features, 1, 1 - buffer, 2 + buffer, AXIS_X, -1, 2, options.line_metrics)

    if not left and not right:
        return merged

    merged = clip(features, 1, -buffer, 1 + buffer, AXIS_X, -1, 2, options.line_metrics) or []
    if left:
        merged = shift_features(left, 1.0) + merged
    if right:
        merged = merged + shift_features(right, -1.0)
    return merged


def shift_features(features: list[dict], offset: float) -> list[dict]:
    out = []
    for feature in features:
        ftype = feature["type"]
        geometry = feature["geometry"]
        if ftype in ("Point", "MultiPoint"):
            new_geom = _shift_flat(geometry, offset)
        elif ftype == "LineString":
            new_geom = _shift_slice(geometry, offset)
        elif ftype in ("MultiLineString", "Polygon"):
            new_geom = [_shift_slice(line, offset) for line in geometry]
        else:  # MultiPolygon
            new_geom = [[_shift_slice(ring, offset) for ring in poly] for poly in geometry]
        out.append(create_feature(feature["id"], ftype, new_geom, feature["tags"]))
    return out


def _shift_flat(points: list[float], offset: float) -> list[float]:
    out: list[float] = []
    for i in range(0, len(points), 3):
        out.extend((points[i] + offset, points[i + 1], points[i + 2]))
    return out


def _shift_slice(line: Slice, offset: float) -> Slice:
    new_line = Slice([], line.size, line.start, line.end)
    pts = line.points
    for i in range(0, len(pts), 3):
        new_line.points.extend((pts[i] + offset, pts[i + 1], pts[i + 2]))
    return new_line
