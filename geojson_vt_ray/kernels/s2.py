"""From-scratch S2-style cell ids over the unit sphere (vectorized numpy).

The north rule asks for an "H3/S2 index" over the phash-georeferenced
image rows. `kernels/cells.py` provides the flat mercator-square curve
index; this module implements the spherical one following the public S2
geometry scheme (s2geometry.io docs / "S2 cells" design):

- project lon/lat to the unit sphere, pick the dominant cube **face**
  (6 faces: +x +y +z -x -y -z), and map the on-face (u, v) ∈ [-1,1]²
  through the **quadratic ST transform** s = sqrt-based reparametrization
  that equalizes cell areas across a face;
- discretize (s, t) to leaf grid coords (i, j) at 2^MAX_LEVEL per axis;
- order cells along a **Hilbert curve** whose per-quadrant orientation
  (swap/invert masks) chains the six face curves into ONE continuous
  space-filling curve over the whole sphere — the property that makes a
  sort/range-partition on cell id produce spatially compact shards with
  no face-boundary seams (the reason S2 ids are the shuffle key of
  choice at planet scale);
- pack as the 64-bit S2CellId layout: 3 face bits, 2·level position
  bits, then a trailing 1 sentinel marking the level.

Everything is float64 numpy over whole columns; the Hilbert walk is
O(level) vectorized passes (no per-row Python). No counterpart in the
reference (geojson-vt is quadtree-only, src/tile-index.ts toID); this
layer exists for the spatial-join extension.
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 30
_POS_BITS = 2 * MAX_LEVEL + 1  # 61: position bits + trailing sentinel

_SWAP = 1  # swap i/j axes
_INVERT = 2  # invert both axes

# Hilbert sub-quadrant tables (classical; S2's orientation convention).
# _IJ_TO_POS[orientation][i_bit*2 + j_bit] -> quadrant index on the curve
_IJ_TO_POS = np.array(
    [
        [0, 1, 3, 2],  # canonical order
        [0, 3, 1, 2],  # axes swapped
        [2, 3, 1, 0],  # bits inverted
        [2, 1, 3, 0],  # swapped & inverted
    ],
    dtype=np.uint64,
)
# _POS_TO_IJ[orientation][quadrant] -> i_bit*2 + j_bit  (inverse tables)
_POS_TO_IJ = np.array(
    [
        [0, 1, 3, 2],
        [0, 2, 3, 1],
        [3, 2, 0, 1],
        [3, 1, 0, 2],
    ],
    dtype=np.uint64,
)
# orientation delta applied after entering each quadrant
_POS_TO_ORIENTATION = np.array([_SWAP, 0, 0, _SWAP + _INVERT], dtype=np.uint64)


def mercator_to_lonlat(mx: np.ndarray, my: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Inverse web-mercator: unit-square (x right, y down) -> lon/lat radians."""
    lon = (np.asarray(mx, dtype=np.float64) - 0.5) * (2.0 * np.pi)
    lat = np.arctan(np.sinh(np.pi * (1.0 - 2.0 * np.asarray(my, dtype=np.float64))))
    return lon, lat


def lonlat_to_xyz(lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    cl = np.cos(lat)
    return cl * np.cos(lon), cl * np.sin(lon), np.sin(lat)


def mercator_to_xyz(mx: np.ndarray, my: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Unit-square mercator -> unit-sphere xyz WITHOUT the lat detour:
    sin(lat) = tanh(a), cos(lat) = sech(a) for a = pi*(1-2*my), written
    out via exp so the DuckDB oracle (no sinh/tanh builtins) evaluates
    the identical float64 expression tree — verified bit-equal on all
    testdata scales."""
    mx = np.asarray(mx, dtype=np.float64)
    my = np.asarray(my, dtype=np.float64)
    lon = (mx - 0.5) * (2.0 * np.pi)
    e = np.exp(np.pi * (1.0 - 2.0 * my))
    inv = 1.0 / e
    sinlat = (e - inv) / (e + inv)
    coslat = 2.0 / (e + inv)
    return coslat * np.cos(lon), coslat * np.sin(lon), sinlat


def xyz_to_face_uv(
    x: np.ndarray, y: np.ndarray, z: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Dominant cube face (0..5) and the on-face (u, v) ∈ [-1, 1]².

    Face numbering and per-face uv axes follow the public S2 convention
    (faces 0..2 are +x +y +z; 3..5 are the antipodes) so that the uv
    frames of adjacent faces line up and the Hilbert curves chain.
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    z = np.asarray(z, dtype=np.float64)
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    # largest |component| picks the axis; sign picks the hemisphere
    axis = np.where(az >= np.maximum(ax, ay), 2, np.where(ay >= ax, 1, 0))
    comp = np.choose(axis, [x, y, z])
    face = np.where(comp >= 0, axis, axis + 3).astype(np.int64)

    u = np.empty_like(x)
    v = np.empty_like(x)
    for f, (unum, vnum, den) in enumerate(
        (
            (y, z, x),  # face 0 (+x): u = y/x,  v = z/x
            (-x, z, y),  # face 1 (+y): u = -x/y, v = z/y
            (-x, -y, z),  # face 2 (+z): u = -x/z, v = -y/z
            (z, y, x),  # face 3 (-x): u = z/x,  v = y/x
            (z, -x, y),  # face 4 (-y): u = z/y,  v = -x/y
            (-y, -x, z),  # face 5 (-z): u = -y/z, v = -x/z
        )
    ):
        m = face == f
        if m.any():
            u[m] = unum[m] / den[m]
            v[m] = vnum[m] / den[m]
    return face, u, v


def face_uv_to_xyz(
    face: np.ndarray, u: np.ndarray, v: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Un-normalized sphere direction for a point on a cube face."""
    face = np.asarray(face, dtype=np.int64)
    u = np.asarray(u, dtype=np.float64)
    v = np.asarray(v, dtype=np.float64)
    one = np.ones_like(u)
    x = np.empty_like(u)
    y = np.empty_like(u)
    z = np.empty_like(u)
    for f, (fx, fy, fz) in enumerate(
        (
            (one, u, v),
            (-u, one, v),
            (-u, -v, one),
            (-one, -v, -u),
            (v, -one, -u),
            (v, u, -one),
        )
    ):
        m = face == f
        if m.any():
            x[m], y[m], z[m] = fx[m], fy[m], fz[m]
    return x, y, z


def uv_to_st(u: np.ndarray) -> np.ndarray:
    """S2's quadratic projection: equalizes cell areas across a face."""
    u = np.asarray(u, dtype=np.float64)
    # max(.., 0.0) only guards the branch np.where discards (sqrt of a
    # negative); taken branches always see arguments >= 1.0
    pos = 0.5 * np.sqrt(np.maximum(1.0 + 3.0 * u, 0.0))
    neg = 1.0 - 0.5 * np.sqrt(np.maximum(1.0 - 3.0 * u, 0.0))
    return np.where(u >= 0.0, pos, neg)


def st_to_uv(s: np.ndarray) -> np.ndarray:
    """Inverse of `uv_to_st`."""
    s = np.asarray(s, dtype=np.float64)
    return np.where(
        s >= 0.5,
        (1.0 / 3.0) * (4.0 * s * s - 1.0),
        (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s)),
    )


def st_to_ij(s: np.ndarray, level: int = MAX_LEVEL) -> np.ndarray:
    """Discretize s ∈ [0,1] to the level grid, clamped to the valid range."""
    n = np.int64(1) << np.int64(level)
    ij = np.floor(np.asarray(s, dtype=np.float64) * np.float64(n)).astype(np.int64)
    return np.clip(ij, 0, n - 1).astype(np.uint64)


def face_ij_to_pos(
    face: np.ndarray, i: np.ndarray, j: np.ndarray, level: int
) -> np.ndarray:
    """Hilbert-curve position of level-`level` cells on their face.

    Per-bit vectorized walk: at each level one (i,j) bit pair is mapped
    through the orientation tables and the orientation state advances.
    Initial orientation is `face & _SWAP`, which is what chains the six
    face curves into one continuous sphere-filling curve.
    """
    face = np.asarray(face).astype(np.uint64)
    i = np.asarray(i).astype(np.uint64)
    j = np.asarray(j).astype(np.uint64)
    orient = face & np.uint64(_SWAP)
    pos = np.zeros(i.shape, dtype=np.uint64)
    ij_to_pos = _IJ_TO_POS.ravel()
    for k in range(level - 1, -1, -1):
        kk = np.uint64(k)
        ij = (((i >> kk) & np.uint64(1)) << np.uint64(1)) | ((j >> kk) & np.uint64(1))
        quad = ij_to_pos[(orient << np.uint64(2)) | ij]
        pos = (pos << np.uint64(2)) | quad
        orient = orient ^ _POS_TO_ORIENTATION[quad]
    return pos


def pos_to_face_ij(
    face: np.ndarray, pos: np.ndarray, level: int
) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of `face_ij_to_pos`: (i, j) grid coords at `level`."""
    face = np.asarray(face).astype(np.uint64)
    pos = np.asarray(pos).astype(np.uint64)
    orient = face & np.uint64(_SWAP)
    i = np.zeros(pos.shape, dtype=np.uint64)
    j = np.zeros(pos.shape, dtype=np.uint64)
    pos_to_ij = _POS_TO_IJ.ravel()
    for k in range(level - 1, -1, -1):
        quad = (pos >> np.uint64(2 * k)) & np.uint64(3)
        ij = pos_to_ij[(orient << np.uint64(2)) | quad]
        i = (i << np.uint64(1)) | (ij >> np.uint64(1))
        j = (j << np.uint64(1)) | (ij & np.uint64(1))
        orient = orient ^ _POS_TO_ORIENTATION[quad]
    return i, j


def cell_id_from_face_pos(face: np.ndarray, pos: np.ndarray, level: int) -> np.ndarray:
    """64-bit S2CellId layout: face(3) | curve position | 1 sentinel | 0s."""
    face = np.asarray(face).astype(np.uint64)
    pos = np.asarray(pos).astype(np.uint64)
    shift = np.uint64(_POS_BITS - 2 * level)  # bits below the sentinel
    return (face << np.uint64(_POS_BITS)) | (pos << shift) | (np.uint64(1) << (shift - np.uint64(1)))


def cell_id_level(cid: np.ndarray) -> np.ndarray:
    """Level encoded by the trailing-1 sentinel (leaf = MAX_LEVEL)."""
    cid = np.asarray(cid).astype(np.uint64)
    lsb = cid & (np.uint64(0) - cid)  # lowest set bit
    # sentinel at bit b => level = (POS_BITS - 1 - b) / 2
    b = np.zeros(cid.shape, dtype=np.uint64)
    v = lsb.copy()
    for sh in (32, 16, 8, 4, 2, 1):
        big = v >= (np.uint64(1) << np.uint64(sh))
        b += np.where(big, np.uint64(sh), np.uint64(0))
        v = np.where(big, v >> np.uint64(sh), v)
    return ((np.uint64(_POS_BITS - 1) - b) >> np.uint64(1)).astype(np.int64)


def cell_id_face(cid: np.ndarray) -> np.ndarray:
    return (np.asarray(cid).astype(np.uint64) >> np.uint64(_POS_BITS)).astype(np.int64)


def cell_id_pos(cid: np.ndarray, level: int) -> np.ndarray:
    """Curve position at `level` (the cell's own level or an ancestor's)."""
    cid = np.asarray(cid).astype(np.uint64)
    return (cid >> np.uint64(_POS_BITS - 2 * level)) & (
        (np.uint64(1) << np.uint64(2 * level)) - np.uint64(1)
    )


def cell_id_parent(cid: np.ndarray, level: int) -> np.ndarray:
    """Ancestor cell id at a coarser `level` (sentinel re-planted)."""
    cid = np.asarray(cid).astype(np.uint64)
    shift = np.uint64(_POS_BITS - 2 * level)
    lsb = np.uint64(1) << (shift - np.uint64(1))
    return (cid & ~(lsb + lsb - np.uint64(1))) | lsb


def s2_cell_id(mx: np.ndarray, my: np.ndarray, level: int) -> np.ndarray:
    """Mercator unit-square points -> S2 cell ids at `level` (uint64)."""
    x, y, z = mercator_to_xyz(mx, my)
    face, u, v = xyz_to_face_uv(x, y, z)
    i = st_to_ij(uv_to_st(u), level)
    j = st_to_ij(uv_to_st(v), level)
    pos = face_ij_to_pos(face, i, j, level)
    return cell_id_from_face_pos(face, pos, level)


def s2_cell_center(cid: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Unit-sphere center of each cell (normalized xyz)."""
    cid = np.asarray(cid).astype(np.uint64)
    level = cell_id_level(cid)
    # decode at each distinct level present (usually one)
    x = np.empty(cid.shape, dtype=np.float64)
    y = np.empty(cid.shape, dtype=np.float64)
    z = np.empty(cid.shape, dtype=np.float64)
    for lv in np.unique(level):
        m = level == lv
        face = cell_id_face(cid[m])
        pos = cell_id_pos(cid[m], int(lv))
        i, j = pos_to_face_ij(face, pos, int(lv))
        n = np.float64(np.uint64(1) << np.uint64(lv))
        s = (i.astype(np.float64) + 0.5) / n
        t = (j.astype(np.float64) + 0.5) / n
        cx, cy, cz = face_uv_to_xyz(face, st_to_uv(s), st_to_uv(t))
        norm = np.sqrt(cx * cx + cy * cy + cz * cz)
        x[m], y[m], z[m] = cx / norm, cy / norm, cz / norm
    return x, y, z
