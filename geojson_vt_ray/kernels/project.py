"""Spherical-mercator projection into [0,1]^2 world space.

Matches the reference math bit-for-bit where libm allows
(`src/convert.ts:196-207`, `src/deconvert.ts:86-96`). Scalar versions are used
by the exact per-feature kernels; vectorized versions (same arithmetic,
element-wise IEEE double) serve the columnar fast paths.
"""

from __future__ import annotations

import math

import numpy as np


def project_x(lng: float) -> float:
    return lng / 360 + 0.5


def project_y(lat: float) -> float:
    s = math.sin(lat * math.pi / 180)
    if s == 1.0:
        return 0.0  # log(inf) -> y2 = -inf -> clamp low
    if s == -1.0:
        return 1.0
    y2 = 0.5 - 0.25 * math.log((1 + s) / (1 - s)) / math.pi
    return 0.0 if y2 < 0 else 1.0 if y2 > 1 else y2


def unproject_x(x: float) -> float:
    return (x - 0.5) * 360


def unproject_y(y: float) -> float:
    y2 = (180 - y * 360) * math.pi / 180
    return 360 * math.atan(math.exp(y2)) / math.pi - 90


def project_xy(lng: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized projection; identical element-wise arithmetic to the scalar path."""
    lng = np.asarray(lng, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    x = lng / 360 + 0.5
    s = np.sin(lat * math.pi / 180)
    with np.errstate(divide="ignore", invalid="ignore"):
        y = 0.5 - 0.25 * np.log((1 + s) / (1 - s)) / math.pi
    y = np.where(np.isnan(y) | (y < 0), 0.0, y)
    y = np.where(y > 1, 1.0, y)
    # poles: s == +-1 handled by the nan/clamp rules above (log(inf) -> -inf -> clamped)
    return x, y


def unproject_xy(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    lng = (np.asarray(x, dtype=np.float64) - 0.5) * 360
    y2 = (180 - np.asarray(y, dtype=np.float64) * 360) * math.pi / 180
    lat = 360 * np.arctan(np.exp(y2)) / math.pi - 90
    return lng, lat
