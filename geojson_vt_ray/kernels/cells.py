"""Space-filling-curve cell ids over the mercator unit square.

The north-star rule asks for an "H3/S2 cell encoding" that assigns
phash-georeferenced image rows to spatial cells. S2's scheme is a Hilbert
curve over each cube face; H3's is a hex grid. Re-expressed for this
engine's [0,1)² web-mercator world space (the same space every tile
operator uses), a level-L cell id is the position of the cell's (x, y)
grid coordinates on a space-filling curve over the 2^L × 2^L grid:

- **Morton (Z-order)**: bit interleaving. Cheap, order-preserving within
  quadrants, and expressible in plain SQL (spread-bits magic numbers), so
  it backs the DuckDB-oracled queries.
- **Hilbert**: S2's curve. Locality-preserving — consecutive ids are
  edge-adjacent cells — which makes it the right *range-partitioning /
  shuffle* key at scale: contiguous id ranges are compact spatial blobs,
  so a `sort`/`repartition` on hilbert id gives each task a spatially
  coherent shard (fewer halo neighbors off-shard).

All kernels are vectorized numpy over uint64; level ≤ 30 per axis.
No counterpart in the reference (geojson-vt uses pure quadtree z/x/y
keys, src/tile-index.ts toID); this layer exists for the spatial-join
extension.
"""

from __future__ import annotations

import numpy as np

_M1 = np.uint64(0x5555555555555555)
_M2 = np.uint64(0x3333333333333333)
_M4 = np.uint64(0x0F0F0F0F0F0F0F0F)
_M8 = np.uint64(0x00FF00FF00FF00FF)
_M16 = np.uint64(0x0000FFFF0000FFFF)
_M32 = np.uint64(0x00000000FFFFFFFF)


def _spread_bits(v: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of each uint64 onto the even bit positions."""
    v = v.astype(np.uint64) & _M32
    v = (v | (v << np.uint64(16))) & _M16
    v = (v | (v << np.uint64(8))) & _M8
    v = (v | (v << np.uint64(4))) & _M4
    v = (v | (v << np.uint64(2))) & _M2
    v = (v | (v << np.uint64(1))) & _M1
    return v


def _compact_bits(v: np.ndarray) -> np.ndarray:
    """Inverse of `_spread_bits`: gather the even bit positions."""
    v = v.astype(np.uint64) & _M1
    v = (v | (v >> np.uint64(1))) & _M2
    v = (v | (v >> np.uint64(2))) & _M4
    v = (v | (v >> np.uint64(4))) & _M8
    v = (v | (v >> np.uint64(8))) & _M16
    v = (v | (v >> np.uint64(16))) & _M32
    return v


def morton_encode(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Z-order id of grid cells: x bits on even positions, y bits on odd."""
    return _spread_bits(np.asarray(x)) | (_spread_bits(np.asarray(y)) << np.uint64(1))


def morton_decode(code: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    code = np.asarray(code).astype(np.uint64)
    return _compact_bits(code), _compact_bits(code >> np.uint64(1))


def hilbert_encode(x: np.ndarray, y: np.ndarray, level: int) -> np.ndarray:
    """Hilbert-curve distance of grid cells on the 2^level × 2^level grid.

    Vectorized form of the classical xy2d bit-at-a-time walk: O(level)
    numpy passes over the whole array, no per-element Python.
    """
    x = np.asarray(x).astype(np.uint64).copy()
    y = np.asarray(y).astype(np.uint64).copy()
    d = np.zeros(x.shape, dtype=np.uint64)
    one = np.uint64(1)
    for i in range(level - 1, -1, -1):
        s = np.uint64(1) << np.uint64(i)
        rx = ((x & s) > 0).astype(np.uint64)
        ry = ((y & s) > 0).astype(np.uint64)
        d += s * s * ((np.uint64(3) * rx) ^ ry)
        # rotate the quadrant so the sub-curve enters/exits correctly
        swap = ry == 0
        flip = swap & (rx == 1)
        sm1 = s - one
        x_f = np.where(flip, sm1 - x, x)
        y_f = np.where(flip, sm1 - y, y)
        x, y = np.where(swap, y_f, x_f), np.where(swap, x_f, y_f)
    return d


def hilbert_decode(d: np.ndarray, level: int) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of `hilbert_encode` (classical d2xy, vectorized)."""
    d = np.asarray(d).astype(np.uint64)
    t = d.copy()
    x = np.zeros(d.shape, dtype=np.uint64)
    y = np.zeros(d.shape, dtype=np.uint64)
    one = np.uint64(1)
    for i in range(level):
        s = np.uint64(1) << np.uint64(i)
        rx = (t // np.uint64(2)) & one
        ry = (t ^ rx) & one
        swap = ry == 0
        flip = swap & (rx == 1)
        sm1 = s - one
        x_f = np.where(flip, sm1 - x, x)
        y_f = np.where(flip, sm1 - y, y)
        x, y = np.where(swap, y_f, x_f), np.where(swap, x_f, y_f)
        x += s * rx
        y += s * ry
        t //= np.uint64(4)
    return x, y


def cell_parent(cx: np.ndarray, cy: np.ndarray, levels_up: int = 1) -> tuple[np.ndarray, np.ndarray]:
    """Grid coords of the ancestor cell `levels_up` levels coarser."""
    sh = np.uint64(levels_up)
    return (
        np.asarray(cx).astype(np.uint64) >> sh,
        np.asarray(cy).astype(np.uint64) >> sh,
    )


def cell_children(cx: int, cy: int) -> list[tuple[int, int]]:
    """The four child cells one level finer, in (x-major) grid order."""
    bx, by = int(cx) << 1, int(cy) << 1
    return [(bx, by), (bx + 1, by), (bx, by + 1), (bx + 1, by + 1)]


def cell_neighbors(
    cx: np.ndarray, cy: np.ndarray, level: int, include_self: bool = True
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """3×3 neighborhood of each cell on the level grid, x wrapping across
    the antimeridian (like the tiler's wrap semantics), y clamped at the
    poles (rows outside [0, 2^level) are dropped).

    Returns (orig_index, nx, ny): one row per surviving neighbor, where
    orig_index points back into the input arrays.
    """
    cx = np.asarray(cx).astype(np.int64)
    cy = np.asarray(cy).astype(np.int64)
    n = 1 << level
    offs = [
        (dx, dy)
        for dy in (-1, 0, 1)
        for dx in (-1, 0, 1)
        if include_self or (dx, dy) != (0, 0)
    ]
    idx_out: list[np.ndarray] = []
    nx_out: list[np.ndarray] = []
    ny_out: list[np.ndarray] = []
    base_idx = np.arange(len(cx), dtype=np.int64)
    for dx, dy in offs:
        ny = cy + dy
        keep = (ny >= 0) & (ny < n)
        idx_out.append(base_idx[keep])
        nx_out.append((cx[keep] + dx) % n)
        ny_out.append(ny[keep])
    idx_all = np.concatenate(idx_out)
    nx_all = np.concatenate(nx_out)
    ny_all = np.concatenate(ny_out)
    if n <= 2:
        # On a <=2-column grid dx=-1 and dx=+1 alias mod n (and dx=0 too at
        # n=1), so the wrapped 3x3 set repeats cells; emitting duplicates
        # makes radius/kNN consumers count the same neighbor multiple times.
        key = idx_all * 16 + ny_all * 4 + nx_all
        _, first = np.unique(key, return_index=True)
        first.sort()
        idx_all, nx_all, ny_all = idx_all[first], nx_all[first], ny_all[first]
    return (idx_all, nx_all, ny_all)
