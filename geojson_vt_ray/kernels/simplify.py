"""Douglas-Peucker significance *marking* over flat stride-3 rings.

Instead of removing points, writes into every third slot the maximum squared
segment-distance at which the point becomes significant (reference
`src/simplify.ts:8-45`). Endpoints are pinned by the caller. Uses an explicit
stack (the reference recursion overflowed on degenerate inputs before the
mid-pivot tie-break, `src/simplify.ts:28-37`; we avoid recursion entirely).
"""

from __future__ import annotations

import math


def simplify_mark(points: list[float], first: int, last: int, sq_tolerance: float) -> None:
    """Mark significance for points[first..last] (flat indices, stride 3).

    ``points[i+2]`` receives the max squared distance for significant interior
    points; unmarked interior points keep their existing value (0).
    """
    stack = [(first, last)]
    while stack:
        first, last = stack.pop()
        max_sq_dist = sq_tolerance
        mid = first + ((last - first) >> 1)
        min_pos_to_mid = last - first
        index = None

        n = len(points)
        ax = points[first]
        ay = points[first + 1]
        # JS out-of-bounds reads yield undefined (NaN in arithmetic); mirror
        # that so a caller passing last == len(points) degrades to a no-op
        bx = points[last] if last < n else math.nan
        by = points[last + 1] if last + 1 < n else math.nan

        for i in range(first + 3, last, 3):
            if i + 1 >= n:
                break
            d = _sq_seg_dist(points[i], points[i + 1], ax, ay, bx, by)
            if d > max_sq_dist:
                index = i
                max_sq_dist = d
            elif d == max_sq_dist:
                # prefer a pivot near the middle on ties (bounds split depth for
                # degenerate inputs; mapbox/geojson-vt#104)
                pos_to_mid = abs(i - mid)
                if pos_to_mid < min_pos_to_mid:
                    index = i
                    min_pos_to_mid = pos_to_mid

        if max_sq_dist > sq_tolerance:
            if index - first > 3:
                stack.append((first, index))
            points[index + 2] = max_sq_dist
            if last - index > 3:
                stack.append((index, last))


def _sq_seg_dist(px: float, py: float, x: float, y: float, bx: float, by: float) -> float:
    """Squared distance from point to segment (reference `src/simplify.ts:57-78`)."""
    dx = bx - x
    dy = by - y

    if dx != 0 or dy != 0:
        t = ((px - x) * dx + (py - y) * dy) / (dx * dx + dy * dy)
        if t > 1:
            x = bx
            y = by
        elif t > 0:
            x += dx * t
            y += dy * t

    dx = px - x
    dy = py - y
    return dx * dx + dy * dy
