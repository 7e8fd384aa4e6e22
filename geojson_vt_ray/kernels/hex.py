"""H3-style hexagonal cell index over the mercator unit square.

The north rule names an "H3/S2 index"; `kernels/s2.py` covers the S2
side (spherical Hilbert cells). This module covers the hex side with
the scheme H3 popularized — axial/cube hex coordinates, cube rounding,
approximate parent/child hierarchy by resolution, ring neighborhoods —
re-expressed on this engine's flat [0,1)² world space (H3 proper lives
on an icosahedron; the gnomonic-face plumbing is irrelevant to a flat
world and is deliberately not reproduced).

Why hexes at all (same reasons H3 gives): every neighbor of a hex cell
is edge-adjacent at the SAME center distance (squares have two neighbor
distances), which makes k-ring halos isotropic — the natural cell shape
for radius queries, density smoothing, and convolution-style spatial
aggregation.

Determinism contract: every operation is float64 arithmetic with
explicit `floor(v + 0.5)` rounding (no banker's rounding), so a DuckDB
oracle can evaluate the identical expression tree bit-for-bit — the
same trick the S2 oracle uses for its transcendental steps.

Pointy-top orientation, `size` = circumradius in world units. Axial
(q, r) from world (x, y):

    q = (sqrt(3)/3 * x - 1/3 * y) / size
    r = (2/3 * y) / size

then cube rounding (x=q, z=r, y=-q-r; fix the component with the
largest rounding error). All kernels vectorized numpy; no per-row
Python. No counterpart in the reference (geojson-vt is quadtree-only);
this layer exists for the spatial-join extension.
"""

from __future__ import annotations

import numpy as np

SQRT3 = np.sqrt(3.0)

# resolution -> circumradius: res 0 is 1/8 of the world per hex edge-ish,
# each finer resolution halves the size (aperture 4; H3 uses aperture 7 —
# the halving variant keeps parent lookups exact arithmetic)
BASE_SIZE = 1.0 / 8.0
MAX_RES = 20

_PACK = np.int64(1) << np.int64(24)  # q/r each fit comfortably in 24 bits


def hex_size(res: int) -> float:
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"resolution {res} outside [0, {MAX_RES}]")
    return BASE_SIZE / (1 << res)


def _round_half_up(v: np.ndarray) -> np.ndarray:
    """floor(v + 0.5): the SQL-expressible deterministic rounding used by
    both sides of the oracle (numpy's `round` is half-to-even)."""
    return np.floor(v + 0.5)


def axial_from_xy(
    x: np.ndarray, y: np.ndarray, size: float
) -> tuple[np.ndarray, np.ndarray]:
    """Fractional axial coords of world points on the pointy-top grid."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    q = (SQRT3 / 3.0 * x - (1.0 / 3.0) * y) / size
    r = ((2.0 / 3.0) * y) / size
    return q, r


def cube_round(q: np.ndarray, r: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Nearest hex cell of fractional axial coords (cube rounding)."""
    q = np.asarray(q, dtype=np.float64)
    r = np.asarray(r, dtype=np.float64)
    s = -q - r
    rq = _round_half_up(q)
    rr = _round_half_up(r)
    rs = _round_half_up(s)
    dq = np.abs(rq - q)
    dr = np.abs(rr - r)
    ds = np.abs(rs - s)
    fix_q = (dq > dr) & (dq > ds)
    fix_r = ~fix_q & (dr > ds)
    rq = np.where(fix_q, -rr - rs, rq)
    rr = np.where(fix_r, -rq - rs, rr)
    return rq.astype(np.int64), rr.astype(np.int64)


def hex_cell(x: np.ndarray, y: np.ndarray, res: int) -> np.ndarray:
    """World points -> packed hex cell id at `res` (int64 q*2^24 + r;
    injective because |q|,|r| < 2^23 for any in-range resolution)."""
    q, r = cube_round(*axial_from_xy(x, y, hex_size(res)))
    return q * _PACK + r


def hex_unpack(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of the id packing (floor-division handles negative q)."""
    cell = np.asarray(cell, dtype=np.int64)
    r = ((cell % _PACK) + _PACK) % _PACK
    r = np.where(r >= _PACK // np.int64(2), r - _PACK, r)
    q = (cell - r) // _PACK
    return q, r


def hex_center(q: np.ndarray, r: np.ndarray, size: float) -> tuple[np.ndarray, np.ndarray]:
    """World coords of cell centers (inverse of the axial transform)."""
    q = np.asarray(q, dtype=np.float64)
    r = np.asarray(r, dtype=np.float64)
    x = size * (SQRT3 * q + SQRT3 / 2.0 * r)
    y = size * (1.5 * r)
    return x, y


def hex_parent(cell: np.ndarray, res: int, parent_res: int) -> np.ndarray:
    """Ancestor cell at a coarser resolution — H3's definition: the
    coarse hex containing this cell's center. Approximate hierarchy
    (hexes don't nest exactly; ~equal-area children per parent)."""
    if parent_res > res:
        raise ValueError("parent_res must be coarser (<=) than res")
    q, r = hex_unpack(cell)
    x, y = hex_center(q, r, hex_size(res))
    return hex_cell(x, y, parent_res)


# the six axial direction vectors, in H3's counterclockwise order
HEX_DIRECTIONS = np.array(
    [(1, 0), (1, -1), (0, -1), (-1, 0), (-1, 1), (0, 1)], dtype=np.int64
)


def hex_ring(cell: np.ndarray, k: int) -> np.ndarray:
    """All cells at hex-grid distance exactly `k` from each input cell.
    Returns shape (len(cell), 6k) for k >= 1 (the classical ring walk:
    start k steps in direction 4, take 6 sides of k steps)."""
    if k < 1:
        raise ValueError("k >= 1; use the cell itself for k == 0")
    q, r = hex_unpack(np.atleast_1d(cell))
    out_q = np.empty((len(q), 6 * k), dtype=np.int64)
    out_r = np.empty((len(q), 6 * k), dtype=np.int64)
    cq = q + HEX_DIRECTIONS[4, 0] * k
    cr = r + HEX_DIRECTIONS[4, 1] * k
    idx = 0
    for side in range(6):
        for _ in range(k):
            out_q[:, idx] = cq
            out_r[:, idx] = cr
            cq = cq + HEX_DIRECTIONS[side, 0]
            cr = cr + HEX_DIRECTIONS[side, 1]
            idx += 1
    return out_q * _PACK + out_r


def hex_disk(cell: np.ndarray, k: int) -> np.ndarray:
    """All cells within hex-grid distance `k` (inclusive): the cell plus
    rings 1..k; shape (len(cell), 1 + 3k(k+1))."""
    cell = np.atleast_1d(cell).astype(np.int64)
    parts = [cell[:, None]]
    for kk in range(1, k + 1):
        parts.append(hex_ring(cell, kk))
    return np.concatenate(parts, axis=1)


def hex_distance(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Hex-grid (cube) distance between packed cell ids."""
    aq, ar = hex_unpack(a)
    bq, br = hex_unpack(b)
    dq = aq - bq
    dr = ar - br
    return (np.abs(dq) + np.abs(dr) + np.abs(dq + dr)) // 2
