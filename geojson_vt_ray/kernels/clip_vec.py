"""Vectorized single-slab ring clip — bit-exact numpy version of
``clip._clip_line`` for the non-metrics path.

Per segment the scalar kernel emits (in order):
  E1: entering intersection (from below start / above end) OR the segment's
      first point when it lies inside the slab;
  E2/E3: exiting intersection (below start / above end) — at most one.
Lines additionally split into a new slice after every exit emission.

All arithmetic uses the exact same expressions elementwise in float64, so
outputs are bit-identical to the scalar kernel (validated by fuzz tests).
"""

from __future__ import annotations

import numpy as np

# below this many floats the numpy setup costs more than the scalar loop
VEC_MIN_FLOATS = 120


def clip_ring_vec(
    pts: np.ndarray, start: float, end: float, axis: int, is_polygon: bool
) -> list[np.ndarray]:
    """Clip one stride-3 ring against [start, end] on the given axis.

    Returns a list of stride-3 float64 arrays (slices); polygons always
    yield at most one (closed) slice.
    """
    n = len(pts) // 3
    if n < 2:
        # degenerate: only the tail-point rule applies
        if n == 1 and start <= pts[axis] <= end:
            return [pts[:3].copy()]
        return []

    p = pts.reshape(n, 3)
    ax = p[:-1, 0]
    ay = p[:-1, 1]
    az = p[:-1, 2]
    bx = p[1:, 0]
    by = p[1:, 1]

    a = ax if axis == 0 else ay
    b = bx if axis == 0 else by

    m_in = (a >= start) & (a <= end)
    m_enter_lo = (a < start) & (b > start)
    m_enter_hi = (a > end) & (b < end)
    m_exit_lo = (b < start) & (a >= start)
    m_exit_hi = (b > end) & (a <= end)

    e1 = m_in | m_enter_lo | m_enter_hi
    e2 = m_exit_lo | m_exit_hi

    counts = e1.astype(np.int64) + e2.astype(np.int64)
    offsets = np.concatenate(([0], np.cumsum(counts)))
    total = int(offsets[-1])

    # tail point
    last = p[-1]
    tail_in = start <= (last[0] if axis == 0 else last[1]) <= end

    out = np.empty((total + (1 if tail_in else 0), 3), dtype=np.float64)

    # E1 placements
    pos1 = offsets[:-1][e1]
    if len(pos1):
        # inside points pass through unchanged
        sel_in = m_in
        if sel_in.any():
            idx = offsets[:-1][sel_in]
            out[idx, 0] = ax[sel_in]
            out[idx, 1] = ay[sel_in]
            out[idx, 2] = az[sel_in]
        _fill_intersections(out, offsets[:-1], m_enter_lo, ax, ay, bx, by, start, axis)
        _fill_intersections(out, offsets[:-1], m_enter_hi, ax, ay, bx, by, end, axis)

    # E2/E3 placements (after E1 within the same segment)
    pos2 = offsets[:-1] + e1.astype(np.int64)
    _fill_intersections(out, pos2, m_exit_lo, ax, ay, bx, by, start, axis)
    _fill_intersections(out, pos2, m_exit_hi, ax, ay, bx, by, end, axis)

    if tail_in:
        out[total] = last

    if is_polygon:
        m = len(out)
        if m >= 2 and (out[m - 1, 0] != out[0, 0] or out[m - 1, 1] != out[0, 1]):
            out = np.vstack([out, out[0]])
        return [out.reshape(-1)] if len(out) else []

    # line: split after each exit emission
    if not e2.any():
        flat = out.reshape(-1)
        return [flat] if len(flat) else []
    exit_pos = pos2[e2]  # output indices of exit intersections
    slices = []
    prev = 0
    for cut in exit_pos:
        seg = out[prev : cut + 1]
        if len(seg):
            slices.append(seg.reshape(-1).copy())
        prev = cut + 1
    tail_seg = out[prev:]
    if len(tail_seg):
        slices.append(tail_seg.reshape(-1).copy())
    return slices


def _fill_intersections(out, positions, mask, ax, ay, bx, by, v, axis) -> None:
    if not mask.any():
        return
    idx = positions[mask]
    if axis == 0:
        t = (v - ax[mask]) / (bx[mask] - ax[mask])
        out[idx, 0] = v
        out[idx, 1] = ay[mask] + (by[mask] - ay[mask]) * t
    else:
        t = (v - ay[mask]) / (by[mask] - ay[mask])
        out[idx, 0] = ax[mask] + (bx[mask] - ax[mask]) * t
        out[idx, 1] = v
    out[idx, 2] = 1.0
