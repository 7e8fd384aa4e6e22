"""H3-style hex cell index invariants (kernels/hex.py)."""

import numpy as np
import pytest

from geojson_vt_ray.kernels import hex as hx


def _rng(seed=13):
    return np.random.default_rng(seed)


def test_pack_unpack_roundtrip_signed():
    q = np.array([0, 1, -1, 500, -500, 8_000_000, -8_000_000], dtype=np.int64)
    r = np.array([0, -1, 1, -321, 321, -8_000_000, 8_000_000], dtype=np.int64)
    cell = q * hx._PACK + r
    uq, ur = hx.hex_unpack(cell)
    np.testing.assert_array_equal(uq, q)
    np.testing.assert_array_equal(ur, r)


def test_center_reassigns_to_same_cell():
    """hex_cell(hex_center(c)) == c — centers are interior points."""
    r = _rng()
    res = 5
    size = hx.hex_size(res)
    pts = r.random((2, 4000))
    cell = hx.hex_cell(pts[0], pts[1], res)
    q, rr = hx.hex_unpack(cell)
    cx, cy = hx.hex_center(q, rr, size)
    np.testing.assert_array_equal(hx.hex_cell(cx, cy, res), cell)


def test_assignment_is_nearest_center():
    """Cube rounding implements the hex Voronoi: the assigned cell's
    center is the Euclid-nearest among all disk-2 candidate centers."""
    r = _rng(2)
    res = 4
    size = hx.hex_size(res)
    x = r.random(1500)
    y = r.random(1500)
    cell = hx.hex_cell(x, y, res)
    cand = hx.hex_disk(cell, 2)  # (n, 19) candidate cells incl. self
    cq, cr = hx.hex_unpack(cand)
    cx, cy = hx.hex_center(cq, cr, size)
    d2 = (cx - x[:, None]) ** 2 + (cy - y[:, None]) ** 2
    # column 0 is the assigned cell; allow exact ties on boundaries
    assert np.all(d2[:, 0] <= d2.min(axis=1) + 1e-15)


def test_ring_counts_and_distance():
    cells = hx.hex_cell(np.array([0.3, 0.71]), np.array([0.42, 0.9]), 6)
    for k in (1, 2, 3):
        ring = hx.hex_ring(cells, k)
        assert ring.shape == (2, 6 * k)
        for row in range(2):
            assert len(set(ring[row].tolist())) == 6 * k  # all distinct
            d = hx.hex_distance(ring[row], np.repeat(cells[row], 6 * k))
            np.testing.assert_array_equal(d, k)
    disk = hx.hex_disk(cells, 2)
    assert disk.shape == (2, 1 + 3 * 2 * 3)
    d = hx.hex_distance(disk[0], np.repeat(cells[0], disk.shape[1]))
    assert d.max() == 2 and d.min() == 0


def test_neighbors_isotropic():
    """The hex selling point: all six ring-1 neighbors sit at the SAME
    center distance (squares have sqrt(2)-diagonal neighbors)."""
    res = 5
    size = hx.hex_size(res)
    cell = hx.hex_cell(np.array([0.5]), np.array([0.5]), res)
    ring = hx.hex_ring(cell, 1)[0]
    q0, r0 = hx.hex_unpack(cell)
    x0, y0 = hx.hex_center(q0, r0, size)
    q, r = hx.hex_unpack(ring)
    x, y = hx.hex_center(q, r, size)
    d = np.sqrt((x - x0[0]) ** 2 + (y - y0[0]) ** 2)
    np.testing.assert_allclose(d, d[0], rtol=1e-12)
    np.testing.assert_allclose(d[0], size * np.sqrt(3.0), rtol=1e-12)


def test_parent_contains_child_center():
    r = _rng(9)
    x = r.random(2000)
    y = r.random(2000)
    child = hx.hex_cell(x, y, 7)
    parent = hx.hex_parent(child, 7, 4)
    # parent of the child computed directly from each child's center
    cq, cr = hx.hex_unpack(child)
    cx, cy = hx.hex_center(cq, cr, hx.hex_size(7))
    np.testing.assert_array_equal(hx.hex_cell(cx, cy, 4), parent)
    with pytest.raises(ValueError):
        hx.hex_parent(child, 4, 7)


def test_hex_distance_metric():
    r = _rng(4)
    pts = r.random((2, 300))
    a = hx.hex_cell(pts[0], pts[1], 5)
    b = np.roll(a, 1)
    c = np.roll(a, 7)
    d_ab = hx.hex_distance(a, b)
    np.testing.assert_array_equal(d_ab, hx.hex_distance(b, a))  # symmetric
    assert np.all(hx.hex_distance(a, a) == 0)
    assert np.all(hx.hex_distance(a, c) <= d_ab + hx.hex_distance(b, c))


def test_hex_stage_and_density(ray_session):
    """Pipeline wiring: stage ids match the kernel; 1-ring smoothing
    equals a local scatter-sum reference."""
    import pyarrow as pa
    import ray

    from geojson_vt_ray.datagen.images import mercator_xy, phash_of_index_vec
    from geojson_vt_ray.ray_pipeline.cells import (
        hex_cell_counts,
        hex_smoothed_density,
        with_hex_cell,
    )

    idx = np.arange(1, 500, dtype=np.int64)
    ph = phash_of_index_vec(idx)
    tbl = pa.table(
        {
            "image_id": pa.array([f"img-{i:012d}" for i in idx.tolist()]),
            "phash": pa.array(ph),
        }
    )
    ds = ray.data.from_arrow(tbl)
    res = 4
    tagged = with_hex_cell(ds, res).to_pandas().set_index("image_id")
    mx, my = mercator_xy(ph)
    expect = hx.hex_cell(mx, my, res)
    got = tagged.loc[[f"img-{i:012d}" for i in idx.tolist()], "hex_cell"].to_numpy()
    np.testing.assert_array_equal(got, expect)

    counts = hex_cell_counts(ds, res).to_pandas().sort_values("hex_cell")
    vals, cnts = np.unique(expect, return_counts=True)
    np.testing.assert_array_equal(counts["hex_cell"].to_numpy(), vals)
    np.testing.assert_array_equal(counts["count()"].to_numpy(), cnts)

    # local reference for the smoothed surface
    ref: dict[int, int] = {}
    for cell, n in zip(vals.tolist(), cnts.tolist()):
        for target in hx.hex_disk(np.array([cell]), 1)[0].tolist():
            ref[target] = ref.get(target, 0) + n
    sm = hex_smoothed_density(ds, res, k=1).to_pandas()
    got_map = dict(zip(sm["hex_cell"].tolist(), sm["smoothed"].tolist()))
    assert got_map == ref


def test_hex_radius_knn_matches_bruteforce(ray_session):
    """The hex-disk halo join is exact: equal to a local all-pairs
    radius-kNN reference on a dense synthetic set (includes cross-cell
    and diagonal-cell neighbor pairs)."""
    import pyarrow as pa
    import ray

    from geojson_vt_ray.datagen.images import mercator_xy, phash_of_index_vec
    from geojson_vt_ray.ray_pipeline.cells import hex_radius_knn_join

    idx = np.arange(1, 900, dtype=np.int64)
    ph = phash_of_index_vec(idx)
    pts = ray.data.from_arrow(
        pa.table(
            {
                "image_id": pa.array([f"img-{i:012d}" for i in idx.tolist()]),
                "phash": pa.array(ph),
            }
        )
    )
    qidx = idx[idx % 37 == 0]
    queries = ray.data.from_arrow(
        pa.table(
            {
                "query_id": pa.array(qidx),
                "phash": pa.array(phash_of_index_vec(qidx)),
            }
        )
    )
    radius, k = 0.045, 4
    got = (
        hex_radius_knn_join(pts, queries, radius=radius, k=k)
        .to_pandas()
        .sort_values(["query_id", "d2", "neighbor_id"])
        .reset_index(drop=True)
    )

    mx, my = mercator_xy(ph)
    rows = []
    for qi in qidx.tolist():
        qx, qy = mx[qi - 1], my[qi - 1]
        d2 = (mx - qx) ** 2 + (my - qy) ** 2
        order = np.lexsort((idx, d2))
        taken = 0
        for j in order:
            if idx[j] == qi or d2[j] > radius * radius:
                continue
            rows.append((qi, f"img-{idx[j]:012d}", d2[j]))
            taken += 1
            if taken == k:
                break
    import pandas as pd

    want = pd.DataFrame(rows, columns=["query_id", "neighbor_id", "d2"]).sort_values(
        ["query_id", "d2", "neighbor_id"]
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_hex_radius_knn_rejects_oversized_radius(ray_session):
    import pyarrow as pa
    import ray

    from geojson_vt_ray.datagen.images import phash_of_index_vec
    from geojson_vt_ray.ray_pipeline.cells import hex_radius_knn_join

    idx = np.arange(1, 10, dtype=np.int64)
    t = pa.table(
        {
            "image_id": pa.array([f"img-{i:012d}" for i in idx.tolist()]),
            "phash": pa.array(phash_of_index_vec(idx)),
        }
    )
    q = pa.table({"query_id": pa.array(idx), "phash": pa.array(phash_of_index_vec(idx))})
    with pytest.raises(ValueError):
        hex_radius_knn_join(
            ray.data.from_arrow(t), ray.data.from_arrow(q), radius=0.2, k=3, res=4
        )
