"""Deterministic rectangle layer for spatial joins (FIXTURES.md §4).

Rectangles live in mercator [0,1]² world space with dyadic-rational corners,
derived from an integer key with SQL-expressible arithmetic so the DuckDB
oracle reproduces them bit-exactly:

    cx = ((key * 2654435761) % 2^32) / 2^32
    cy = ((key * 2246822519) % 2^31) / 2^31
    hw = (8 + key % 40) / 1024        hh = (8 + (key * 3) % 40) / 1024
    rect = [max(0, cx-hw), min(1, cx+hw)] × [max(0, cy-hh), min(1, cy+hh)]

All quantities are exact binary fractions — comparisons against mercator
point coordinates are bit-deterministic on every engine.
"""

from __future__ import annotations

import numpy as np

from .images import LAT_MULT, LNG_MULT


def rect_table(keys: np.ndarray) -> dict[str, np.ndarray]:
    k = np.asarray(keys, dtype=np.uint64)
    cx = ((k * np.uint64(LNG_MULT)) % np.uint64(1 << 32)) / np.float64(1 << 32)
    cy = ((k * np.uint64(LAT_MULT)) % np.uint64(1 << 31)) / np.float64(1 << 31)
    hw = (8 + (k % np.uint64(40)).astype(np.float64)) / 1024.0
    hh = (8 + ((k * np.uint64(3)) % np.uint64(40)).astype(np.float64)) / 1024.0
    return {
        "rect_id": k.astype(np.int64),
        "x0": np.maximum(0.0, cx - hw),
        "x1": np.minimum(1.0, cx + hw),
        "y0": np.maximum(0.0, cy - hh),
        "y1": np.minimum(1.0, cy + hh),
    }


def rect_internal_features(keys: np.ndarray) -> list[dict]:
    """The rectangles as *internal* projected polygon features with exact
    dyadic corners (no lng/lat round trip) — feeds the tiler directly for
    edge-exact PIP joins."""
    from ..kernels.feature import Slice, create_feature

    t = rect_table(keys)
    out = []
    for i in range(len(t["rect_id"])):
        x0, x1 = t["x0"][i], t["x1"][i]
        y0, y1 = t["y0"][i], t["y1"][i]
        ring = [x0, y0, 1.0, x1, y0, 1.0, x1, y1, 1.0, x0, y1, 1.0, x0, y0, 1.0]
        size = abs((x1 - x0) * (y1 - y0))
        sl = Slice(ring, size, 0.0, size)
        out.append(
            create_feature(
                int(t["rect_id"][i]),
                "Polygon",
                [sl],
                {"name": f"rect-{int(t['rect_id'][i])}"},
            )
        )
    return out


def rect_geojson(keys: np.ndarray) -> dict:
    """The same rectangles as GeoJSON polygons (unprojected) — feeds the tiler
    for volume/skew benches and PIP tests."""
    from ..kernels.project import unproject_xy

    t = rect_table(keys)
    features = []
    for i in range(len(t["rect_id"])):
        xs = np.array([t["x0"][i], t["x1"][i]])
        ys = np.array([t["y0"][i], t["y1"][i]])
        lngs, lats = unproject_xy(xs, ys)
        ring = [
            [lngs[0], lats[0]],
            [lngs[1], lats[0]],
            [lngs[1], lats[1]],
            [lngs[0], lats[1]],
            [lngs[0], lats[0]],
        ]
        features.append(
            {
                "type": "Feature",
                "id": int(t["rect_id"][i]),
                "geometry": {"type": "Polygon", "coordinates": [ring]},
                "properties": {"name": f"rect-{int(t['rect_id'][i])}"},
            }
        )
    return {"type": "FeatureCollection", "features": features}
