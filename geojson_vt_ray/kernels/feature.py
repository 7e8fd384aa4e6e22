"""Internal projected feature model.

A feature is a dict ``{id, type, geometry, tags, minX, minY, maxX, maxY}``
over flat stride-3 coordinate rings (x, y, simplification-marker z), mirroring
the reference's internal model (`src/definitions.ts:94-130`, `src/feature.ts`).

Geometry nesting by type:
  Point / MultiPoint   -> flat list[float]
  LineString           -> Slice
  MultiLineString      -> list[Slice]
  Polygon              -> list[Slice]           (ring 0 = outer)
  MultiPolygon         -> list[list[Slice]]
"""

from __future__ import annotations

from typing import Any, Optional

INF = float("inf")


class Slice:
    """One line/ring: flat stride-3 points + size/metrics bookkeeping.

    ``size`` is the *original* ring area (polygons) or length (lines), computed
    once at convert time and copied through every clip (reference
    `src/clip.ts:243-250`) — tiny-feature dropping tests the original size.
    ``start``/``end`` are cumulative line-metrics offsets.
    """

    __slots__ = ("points", "size", "start", "end")

    def __init__(
        self,
        points: Optional[list[float]] = None,
        size: float = 0.0,
        start: Optional[float] = None,
        end: Optional[float] = None,
    ):
        self.points: list[float] = points if points is not None else []
        self.size = size
        self.start = start
        self.end = end

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"Slice(n={len(self.points) // 3}, size={self.size}, start={self.start}, end={self.end})"


def create_feature(fid: Any, ftype: str, geom: Any, tags: Optional[dict]) -> dict:
    """Build an internal feature with its bbox (reference `src/feature.ts:20-65`).

    Polygon bboxes consider outer rings only — the outer ring contains all
    holes (reference `src/feature.ts:46-47`).
    """
    feature = {
        "id": fid,  # None == reference null/undefined
        "type": ftype,
        "geometry": geom,
        "tags": tags,
        "minX": INF,
        "minY": INF,
        "maxX": -INF,
        "maxY": -INF,
    }
    if ftype in ("Point", "MultiPoint"):
        _grow_bbox(feature, geom)
    elif ftype == "LineString":
        _grow_bbox(feature, geom.points)
    elif ftype == "Polygon":
        _grow_bbox(feature, geom[0].points)
    elif ftype == "MultiLineString":
        for line in geom:
            _grow_bbox(feature, line.points)
    elif ftype == "MultiPolygon":
        for polygon in geom:
            _grow_bbox(feature, polygon[0].points)
    return feature


def _grow_bbox(feature: dict, points) -> None:
    n = len(points)
    if n >= 96:  # vectorized min/max over strided views
        import numpy as np

        arr = points if isinstance(points, np.ndarray) else np.asarray(points, dtype=np.float64)
        xs = arr[0::3]
        ys = arr[1::3]
        feature["minX"] = min(feature["minX"], float(xs.min()))
        feature["minY"] = min(feature["minY"], float(ys.min()))
        feature["maxX"] = max(feature["maxX"], float(xs.max()))
        feature["maxY"] = max(feature["maxY"], float(ys.max()))
        return
    min_x = feature["minX"]
    min_y = feature["minY"]
    max_x = feature["maxX"]
    max_y = feature["maxY"]
    for i in range(0, n, 3):
        x = points[i]
        y = points[i + 1]
        if x < min_x:
            min_x = x
        if x > max_x:
            max_x = x
        if y < min_y:
            min_y = y
        if y > max_y:
            max_y = y
    feature["minX"] = min_x
    feature["minY"] = min_y
    feature["maxX"] = max_x
    feature["maxY"] = max_y
