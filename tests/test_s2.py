"""S2-style cell index invariants (kernels/s2.py).

No external S2 library exists in this sandbox, so correctness is pinned
by the scheme's defining structural properties instead of golden ids:
bijectivity of the per-face curve, Hilbert edge-adjacency of consecutive
positions, continuity of the curve ACROSS face boundaries (the property
the swap/invert orientation chaining exists to provide), quadratic-ST
round-trips, hierarchical containment, and the 64-bit id layout.
"""

import numpy as np
import pytest

from geojson_vt_ray.kernels import s2


def _rng(seed=7):
    return np.random.default_rng(seed)


def test_uv_st_round_trip():
    u = np.linspace(-1.0, 1.0, 10001)
    s = s2.uv_to_st(u)
    assert s.min() >= 0.0 and s.max() <= 1.0
    assert np.all(np.diff(s) > 0)  # strictly monotone
    back = s2.st_to_uv(s)
    np.testing.assert_allclose(back, u, atol=1e-15)
    # endpoints and center are exact
    np.testing.assert_array_equal(s2.uv_to_st(np.array([-1.0, 0.0, 1.0])), [0.0, 0.5, 1.0])


def test_xyz_face_uv_round_trip():
    r = _rng()
    n = 5000
    v = r.normal(size=(3, n))
    v /= np.sqrt((v**2).sum(axis=0))
    face, u, vv = s2.xyz_to_face_uv(v[0], v[1], v[2])
    assert u.min() >= -1.0 - 1e-12 and u.max() <= 1.0 + 1e-12
    x, y, z = s2.face_uv_to_xyz(face, u, vv)
    norm = np.sqrt(x * x + y * y + z * z)
    np.testing.assert_allclose(
        np.stack([x / norm, y / norm, z / norm]), v, atol=1e-12
    )
    assert set(np.unique(face)) <= set(range(6))


def test_face_curve_bijective_and_hilbert_adjacent():
    """On every face, the level-5 curve visits all 1024 cells exactly once
    and each step moves to an edge-adjacent cell (|di|+|dj| == 1)."""
    level = 5
    n = 1 << level
    pos = np.arange(n * n, dtype=np.uint64)
    for f in range(6):
        face = np.full(pos.shape, f, dtype=np.uint64)
        i, j = s2.pos_to_face_ij(face, pos, level)
        assert len(set(zip(i.tolist(), j.tolist()))) == n * n
        step = np.abs(np.diff(i.astype(np.int64))) + np.abs(np.diff(j.astype(np.int64)))
        assert np.all(step == 1), f"face {f}: non-adjacent hilbert step"
        # and the encode direction inverts it
        back = s2.face_ij_to_pos(face, i, j, level)
        np.testing.assert_array_equal(back, pos)


def test_curve_continuous_across_faces():
    """The six face curves chain into one continuous sphere-filling curve:
    the LAST cell of face f and the FIRST cell of face f+1 are neighbors
    on the sphere (center distance ~ one cell diagonal, not a face apart)."""
    level = 8
    n = np.uint64(1) << np.uint64(level)
    last = n * n - np.uint64(1)
    cells = []
    for f in range(6):
        cells.append(s2.cell_id_from_face_pos(np.array([f], dtype=np.uint64), np.array([0], dtype=np.uint64), level)[0])
        cells.append(s2.cell_id_from_face_pos(np.array([f], dtype=np.uint64), np.array([last]), level)[0])
    cid = np.array(cells, dtype=np.uint64)
    x, y, z = s2.s2_cell_center(cid)
    # consecutive (end of face f, start of face f+1) pairs
    cell_diag = 2.0 * np.sqrt(2.0) / float(n)  # upper bound on neighbor distance
    for f in range(5):
        ex, ey, ez = x[2 * f + 1], y[2 * f + 1], z[2 * f + 1]
        sx, sy, sz = x[2 * f + 2], y[2 * f + 2], z[2 * f + 2]
        d = np.sqrt((ex - sx) ** 2 + (ey - sy) ** 2 + (ez - sz) ** 2)
        assert d < cell_diag, f"curve breaks between face {f} and {f + 1}: {d}"


def test_cell_id_layout_and_level():
    r = _rng(3)
    mx = r.random(2000)
    my = r.random(2000)
    for level in (0, 1, 7, 12, 30):
        cid = s2.s2_cell_id(mx, my, level)
        np.testing.assert_array_equal(s2.cell_id_level(cid), level)
        faces = s2.cell_id_face(cid)
        assert faces.min() >= 0 and faces.max() <= 5
        # sentinel bit: id is odd iff leaf level
        if level == s2.MAX_LEVEL:
            assert np.all(cid & np.uint64(1) == 1)
        else:
            assert np.all(cid & np.uint64(1) == 0)


def test_parent_containment():
    """A point's level-L id equals the parent of its level-(L+1) id, and
    children sort inside the parent's id range (range-query property)."""
    r = _rng(11)
    mx = r.random(3000)
    my = r.random(3000)
    for level in (2, 6, 11):
        coarse = s2.s2_cell_id(mx, my, level)
        fine = s2.s2_cell_id(mx, my, level + 1)
        np.testing.assert_array_equal(s2.cell_id_parent(fine, level), coarse)
        # id-range containment: |fine - coarse| < coarse's lsb
        lsb = coarse & (np.uint64(0) - coarse)
        delta = np.abs(fine.astype(np.int64) - coarse.astype(np.int64))
        assert np.all(delta < lsb.astype(np.int64))


def test_mercator_lonlat():
    lon, lat = s2.mercator_to_lonlat(np.array([0.0, 0.5, 1.0]), np.array([0.5, 0.5, 0.5]))
    np.testing.assert_allclose(lon, [-np.pi, 0.0, np.pi])
    np.testing.assert_allclose(lat, 0.0, atol=1e-15)
    # y is screen-down: my < 0.5 is the northern hemisphere
    _, lat_n = s2.mercator_to_lonlat(np.array([0.5]), np.array([0.25]))
    assert lat_n[0] > 0


def test_cell_center_inside_cell():
    """Re-encoding a cell's center returns the same cell id."""
    r = _rng(5)
    mx = r.random(1000)
    my = r.random(1000)
    level = 10
    cid = s2.s2_cell_id(mx, my, level)
    cx, cy, cz = s2.s2_cell_center(cid)
    face, u, v = s2.xyz_to_face_uv(cx, cy, cz)
    i = s2.st_to_ij(s2.uv_to_st(u), level)
    j = s2.st_to_ij(s2.uv_to_st(v), level)
    pos = s2.face_ij_to_pos(face, i, j, level)
    np.testing.assert_array_equal(s2.cell_id_from_face_pos(face, pos, level), cid)


def test_locality_beats_morton_on_face():
    """Spot-check the locality property that motivates hilbert ids as the
    shuffle key: mean center distance between consecutive curve cells is
    ~1 grid step (it IS 1 by adjacency), while consecutive morton ids
    average > 1. Guards against accidentally wiring morton into the id."""
    from geojson_vt_ray.kernels.cells import morton_decode

    level = 6
    n = 1 << level
    pos = np.arange(n * n, dtype=np.uint64)
    face = np.zeros(pos.shape, dtype=np.uint64)
    i, j = s2.pos_to_face_ij(face, pos, level)
    hil = np.abs(np.diff(i.astype(np.int64))) + np.abs(np.diff(j.astype(np.int64)))
    mi, mj = morton_decode(pos)
    mor = np.abs(np.diff(mi.astype(np.int64))) + np.abs(np.diff(mj.astype(np.int64)))
    assert hil.mean() == 1.0
    assert mor.mean() > 1.3


def test_with_s2_cell_id_stage(ray_session):
    """Pipeline wiring: the Dataset stage emits the same ids as the kernel
    and the counts groupby reproduces a local histogram."""
    import pyarrow as pa
    import ray

    from geojson_vt_ray.datagen.images import mercator_xy, phash_of_index_vec
    from geojson_vt_ray.ray_pipeline.cells import s2_cell_counts, with_s2_cell_id

    idx = np.arange(1, 400, dtype=np.int64)
    ph = phash_of_index_vec(idx)
    tbl = pa.table(
        {
            "image_id": pa.array([f"img-{i:012d}" for i in idx.tolist()]),
            "phash": pa.array(ph),
        }
    )
    ds = ray.data.from_arrow(tbl)
    level = 9
    tagged = with_s2_cell_id(ds, level).to_pandas().set_index("image_id")
    mx, my = mercator_xy(ph)
    expect = s2.s2_cell_id(mx, my, level).astype(np.int64)
    got = tagged.loc[[f"img-{i:012d}" for i in idx.tolist()], "s2_cell"].to_numpy()
    np.testing.assert_array_equal(got, expect)

    counts = s2_cell_counts(ds, level).to_pandas().sort_values("s2_cell")
    vals, cnts = np.unique(expect, return_counts=True)
    np.testing.assert_array_equal(counts["s2_cell"].to_numpy(), vals)
    np.testing.assert_array_equal(counts["count()"].to_numpy(), cnts)
