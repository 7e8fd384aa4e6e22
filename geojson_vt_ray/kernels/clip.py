"""Single-slab clipping of internal features (reference `src/clip.ts`).

Clips a feature list against an axis-parallel slab ``[start/scale, end/scale]``
on X (axis=0) or Y (axis=1). Per-feature bbox gives trivial accept/reject;
lines/rings go through a Sutherland-Hodgman-style pass that inserts
intersection points with significance marker z=1 and closes polygons whose
endpoints diverge after clipping. Line-metrics mode tracks cumulative length
through the cut (`src/clip.ts:183-219`).
"""

from __future__ import annotations

import math
from typing import Optional

from .clip_vec import VEC_MIN_FLOATS, clip_ring_vec
from .feature import Slice, create_feature

AXIS_X = 0
AXIS_Y = 1


def clip(
    features: list[dict],
    scale: float,
    start: float,
    end: float,
    axis: int,
    min_all: float,
    max_all: float,
    line_metrics: bool = False,
) -> Optional[list[dict]]:
    start /= scale
    end /= scale

    if min_all >= start and max_all < end:  # trivial accept all
        return features
    if max_all < start or min_all >= end:  # trivial reject all
        return None

    clipped: list[dict] = []
    for feature in features:
        fmin = feature["minX"] if axis == AXIS_X else feature["minY"]
        fmax = feature["maxX"] if axis == AXIS_X else feature["maxY"]

        if fmin >= start and fmax < end:  # trivial accept
            clipped.append(feature)
            continue
        if fmax < start or fmin >= end:  # trivial reject
            continue

        ftype = feature["type"]
        fid = feature["id"]
        tags = feature["tags"]
        geometry = feature["geometry"]

        if ftype in ("Point", "MultiPoint"):
            pts = _clip_points(geometry, start, end, axis)
            if pts:
                new_type = "Point" if len(pts) == 3 else "MultiPoint"
                clipped.append(create_feature(fid, new_type, pts, tags))
        elif ftype == "LineString":
            slices: list[Slice] = []
            _clip_line(geometry, slices, start, end, axis, False, line_metrics)
            if not slices:
                continue
            if line_metrics:
                # each slice becomes its own LineString feature (`src/clip.ts:102-107`)
                for line in slices:
                    clipped.append(create_feature(fid, "LineString", line, tags))
            elif len(slices) > 1:
                clipped.append(create_feature(fid, "MultiLineString", slices, tags))
            else:
                clipped.append(create_feature(fid, "LineString", slices[0], tags))
        elif ftype == "MultiLineString":
            slices = []
            for line in geometry:
                _clip_line(line, slices, start, end, axis, False, False)
            if not slices:
                continue
            if len(slices) == 1:
                clipped.append(create_feature(fid, "LineString", slices[0], tags))
            else:
                clipped.append(create_feature(fid, "MultiLineString", slices, tags))
        elif ftype == "Polygon":
            slices = []
            for ring in geometry:
                _clip_line(ring, slices, start, end, axis, True, False)
            if slices:
                clipped.append(create_feature(fid, "Polygon", slices, tags))
        elif ftype == "MultiPolygon":
            polys: list[list[Slice]] = []
            for polygon in geometry:
                new_polygon: list[Slice] = []
                for ring in polygon:
                    _clip_line(ring, new_polygon, start, end, axis, True, False)
                if new_polygon:
                    polys.append(new_polygon)
            if polys:
                clipped.append(create_feature(fid, "MultiPolygon", polys, tags))

    return clipped or None


def _clip_points(points: list[float], start: float, end: float, axis: int) -> list[float]:
    out: list[float] = []
    for i in range(0, len(points), 3):
        a = points[i + axis]
        if start <= a <= end:
            out.extend((points[i], points[i + 1], points[i + 2]))
    return out


def _clip_line(
    geom: Slice,
    out: list[Slice],
    start: float,
    end: float,
    axis: int,
    is_polygon: bool,
    track_metrics: bool,
) -> None:
    """Clip one line/ring into slices (reference `src/clip.ts:166-241`).

    Long rings take the bit-exact vectorized path (same IEEE expressions
    elementwise); short rings and the metrics path stay scalar."""
    if not track_metrics and len(geom.points) >= VEC_MIN_FLOATS:
        import numpy as np

        pts = geom.points
        arr = pts if isinstance(pts, np.ndarray) else np.asarray(pts, dtype=np.float64)
        for piece in clip_ring_vec(arr, start, end, axis, is_polygon):
            out.append(Slice(piece, geom.size, geom.start, geom.end))
        return

    sl = _new_slice(geom)
    pts = geom.points
    if hasattr(pts, "tolist"):  # small ndarray: scalar loop is faster on lists
        pts = pts.tolist()
    length = geom.start  # cumulative length walked so far (metrics mode)
    seg_len = 0.0
    t = 0.0

    for i in range(0, len(pts) - 3, 3):
        ax = pts[i]
        ay = pts[i + 1]
        az = pts[i + 2]
        bx = pts[i + 3]
        by = pts[i + 4]
        a = ax if axis == AXIS_X else ay
        b = bx if axis == AXIS_X else by
        exited = False

        if track_metrics:
            seg_len = math.sqrt((ax - bx) ** 2 + (ay - by) ** 2)

        if a < start:
            if b > start:  # enters the slab from below `start`
                t = _intersect(sl, ax, ay, bx, by, start, axis)
                if track_metrics:
                    sl.start = length + seg_len * t
        elif a > end:
            if b < end:  # enters the slab from above `end`
                t = _intersect(sl, ax, ay, bx, by, end, axis)
                if track_metrics:
                    sl.start = length + seg_len * t
        else:
            sl.points.extend((ax, ay, az))

        if b < start and a >= start:  # exits below `start`
            t = _intersect(sl, ax, ay, bx, by, start, axis)
            exited = True
        if b > end and a <= end:  # exits above `end`
            t = _intersect(sl, ax, ay, bx, by, end, axis)
            exited = True

        if not is_polygon and exited:
            if track_metrics:
                sl.end = length + seg_len * t
            out.append(sl)
            sl = _new_slice(geom)

        if track_metrics:
            length += seg_len

    # tail point
    last = len(pts) - 3
    ax = pts[last]
    ay = pts[last + 1]
    az = pts[last + 2]
    a = ax if axis == AXIS_X else ay
    if start <= a <= end:
        sl.points.extend((ax, ay, az))

    # re-close the ring if clipping separated its endpoints
    p = sl.points
    last = len(p) - 3
    if is_polygon and last >= 3 and (p[last] != p[0] or p[last + 1] != p[1]):
        p.extend((p[0], p[1], p[2]))

    if sl.points:
        out.append(sl)


def _new_slice(line: Slice) -> Slice:
    return Slice([], line.size, line.start, line.end)


def _intersect(sl: Slice, ax: float, ay: float, bx: float, by: float, v: float, axis: int) -> float:
    """Insert the slab-boundary intersection point with keep-marker z=1
    (reference `src/clip.ts:262-272`)."""
    if axis == AXIS_X:
        t = (v - ax) / (bx - ax)
        sl.points.extend((v, ay + (by - ay) * t, 1.0))
    else:
        t = (v - ay) / (by - ay)
        sl.points.extend((ax + (bx - ax) * t, v, 1.0))
    return t
