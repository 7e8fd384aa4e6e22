"""Curve-cell kernels + co-partitioned per-cell radius-kNN join."""

import numpy as np
import pyarrow as pa
import pytest

from geojson_vt_ray.kernels.cells import (
    cell_children,
    cell_neighbors,
    cell_parent,
    hilbert_decode,
    hilbert_encode,
    morton_decode,
    morton_encode,
)


def _hilbert_xy2d_scalar(level: int, x: int, y: int) -> int:
    # classical bit-at-a-time reference walk (independent of the
    # vectorized implementation under test)
    d = 0
    s = 1 << (level - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_morton_matches_bit_interleave():
    rng = np.random.default_rng(7)
    x = rng.integers(0, 1 << 16, 200, dtype=np.uint64)
    y = rng.integers(0, 1 << 16, 200, dtype=np.uint64)
    codes = morton_encode(x, y)
    for xi, yi, ci in zip(x.tolist(), y.tolist(), codes.tolist()):
        expect = 0
        for b in range(16):
            expect |= ((xi >> b) & 1) << (2 * b)
            expect |= ((yi >> b) & 1) << (2 * b + 1)
        assert ci == expect


def test_morton_roundtrip_wide():
    rng = np.random.default_rng(11)
    x = rng.integers(0, 1 << 30, 5000, dtype=np.uint64)
    y = rng.integers(0, 1 << 30, 5000, dtype=np.uint64)
    dx, dy = morton_decode(morton_encode(x, y))
    assert np.array_equal(dx, x) and np.array_equal(dy, y)


@pytest.mark.parametrize("level", [1, 2, 3, 5, 8])
def test_hilbert_matches_scalar_reference(level):
    n = 1 << level
    rng = np.random.default_rng(level)
    x = rng.integers(0, n, 300, dtype=np.uint64)
    y = rng.integers(0, n, 300, dtype=np.uint64)
    d = hilbert_encode(x, y, level)
    for xi, yi, di in zip(x.tolist(), y.tolist(), d.tolist()):
        assert di == _hilbert_xy2d_scalar(level, xi, yi)


def test_hilbert_bijection_and_adjacency():
    level = 4
    n = 1 << level
    gx, gy = np.meshgrid(np.arange(n, dtype=np.uint64), np.arange(n, dtype=np.uint64))
    d = hilbert_encode(gx.ravel(), gy.ravel(), level)
    assert sorted(d.tolist()) == list(range(n * n))  # bijection
    # walk the curve: consecutive ids are 4-neighbors (the locality
    # property that makes hilbert ranges good shuffle partitions)
    xs, ys = hilbert_decode(np.arange(n * n, dtype=np.uint64), level)
    step = np.abs(np.diff(xs.astype(np.int64))) + np.abs(np.diff(ys.astype(np.int64)))
    assert (step == 1).all()


def test_hilbert_roundtrip_high_level():
    rng = np.random.default_rng(3)
    level = 20
    x = rng.integers(0, 1 << level, 2000, dtype=np.uint64)
    y = rng.integers(0, 1 << level, 2000, dtype=np.uint64)
    dx, dy = hilbert_decode(hilbert_encode(x, y, level), level)
    assert np.array_equal(dx, x) and np.array_equal(dy, y)


def test_parent_children():
    cx, cy = cell_parent(np.array([13]), np.array([6]), 2)
    assert (cx[0], cy[0]) == (3, 1)
    kids = cell_children(3, 1)
    assert set(kids) == {(6, 2), (7, 2), (6, 3), (7, 3)}
    for kx, ky in kids:
        px, py = cell_parent(np.array([kx]), np.array([ky]), 1)
        assert (px[0], py[0]) == (3, 1)


def test_neighbors_wrap_and_clamp():
    level = 3  # 8x8 grid
    idx, nx, ny = cell_neighbors(np.array([0]), np.array([0]), level)
    got = set(zip(nx.tolist(), ny.tolist()))
    # y=-1 row clamped away; x=-1 wraps to 7
    assert got == {(7, 0), (0, 0), (1, 0), (7, 1), (0, 1), (1, 1)}
    assert (idx == 0).all()
    idx, nx, ny = cell_neighbors(np.array([4]), np.array([7]), level)
    got = set(zip(nx.tolist(), ny.tolist()))
    assert got == {(3, 6), (4, 6), (5, 6), (3, 7), (4, 7), (5, 7)}


def test_neighbors_no_duplicates_on_tiny_grids():
    # n<=2 columns: dx=-1 and dx=+1 alias mod n; the wrapped 3x3 set must
    # still be duplicate-free or radius/kNN consumers double-count neighbors.
    for level, cells in [(0, [(0, 0)]), (1, [(0, 0), (1, 1), (0, 1)])]:
        cx = np.array([c[0] for c in cells])
        cy = np.array([c[1] for c in cells])
        idx, nx, ny = cell_neighbors(cx, cy, level)
        trip = list(zip(idx.tolist(), nx.tolist(), ny.tolist()))
        assert len(trip) == len(set(trip)), (level, trip)
        n = 1 << level
        for i in range(len(cells)):
            got = {(x, y) for j, x, y in trip if j == i}
            want = {
                ((cells[i][0] + dx) % n, cells[i][1] + dy)
                for dx in (-1, 0, 1)
                for dy in (-1, 0, 1)
                if 0 <= cells[i][1] + dy < n
            }
            assert got == want


def test_knn_radius_join_level1_grid_matches_bruteforce(ray_session):
    # radius in (0.25, 0.5] auto-picks level 1 (2x2 grid) where the x-wrap
    # aliasing lived; survivors must not be double-counted in the top-k.
    import ray

    from geojson_vt_ray.datagen.images import mercator_xy, phash_of_index_vec
    from geojson_vt_ray.ray_pipeline.cells import knn_radius_join_cells

    idx = np.arange(1, 301, dtype=np.int64)
    q_idx = idx[(idx - 1) % 29 == 0]
    points = ray.data.from_arrow(_point_table(idx)).repartition(4)
    q_ph = phash_of_index_vec(q_idx)
    queries = ray.data.from_arrow(
        pa.table({"query_id": pa.array(q_idx), "phash": pa.array(q_ph)})
    ).repartition(2)

    radius, k = 0.3, 4
    got = (
        knn_radius_join_cells(points, queries, radius=radius, k=k)
        .to_pandas()
        .sort_values(["query_id", "d2", "neighbor_id"])
        .reset_index(drop=True)
    )

    mx, my = mercator_xy(phash_of_index_vec(idx))
    qmx, qmy = mercator_xy(q_ph)
    rows = []
    for qi, (qx, qy) in zip(q_idx.tolist(), zip(qmx, qmy)):
        d2 = (mx - qx) ** 2 + (my - qy) ** 2
        order = np.lexsort((idx, d2))
        taken = 0
        for j in order:
            if idx[j] == qi:
                continue
            if d2[j] > radius * radius or taken >= k:
                break
            rows.append((qi, f"img-{idx[j]:012d}", d2[j]))
            taken += 1
    assert len(got) == len(rows)
    for (_, r), (qi, nid, d2v) in zip(got.iterrows(), rows):
        assert r.query_id == qi and r.neighbor_id == nid
        assert r.d2 == d2v


def _point_table(idx: np.ndarray) -> pa.Table:
    from geojson_vt_ray.datagen.images import phash_of_index_vec

    ph = phash_of_index_vec(idx)
    ids = [f"img-{i:012d}" for i in idx.tolist()]
    return pa.table({"image_id": pa.array(ids, pa.string()), "phash": pa.array(ph)})


def test_knn_radius_join_cells_matches_bruteforce(ray_session):
    import ray

    from geojson_vt_ray.datagen.images import mercator_xy, phash_of_index_vec
    from geojson_vt_ray.ray_pipeline.cells import knn_radius_join_cells

    idx = np.arange(1, 1201, dtype=np.int64)
    q_idx = idx[(idx - 1) % 53 == 0]
    points = ray.data.from_arrow(_point_table(idx)).repartition(6)
    q_ph = phash_of_index_vec(q_idx)
    queries = ray.data.from_arrow(
        pa.table({"query_id": pa.array(q_idx), "phash": pa.array(q_ph)})
    ).repartition(2)

    radius, k = 0.01, 5
    got = (
        knn_radius_join_cells(points, queries, radius=radius, k=k)
        .to_pandas()
        .sort_values(["query_id", "d2", "neighbor_id"])
        .reset_index(drop=True)
    )

    mx, my = mercator_xy(phash_of_index_vec(idx))
    qmx, qmy = mercator_xy(q_ph)
    rows = []
    for qi, (qx, qy) in zip(q_idx.tolist(), zip(qmx, qmy)):
        d2 = (mx - qx) ** 2 + (my - qy) ** 2
        order = np.lexsort((idx, d2))
        taken = 0
        for j in order:
            if idx[j] == qi:
                continue
            if d2[j] > radius * radius or taken >= k:
                break
            rows.append((qi, f"img-{idx[j]:012d}", d2[j]))
            taken += 1
    assert len(got) == len(rows)
    for (_, r), (qi, nid, d2v) in zip(got.iterrows(), rows):
        assert r.query_id == qi and r.neighbor_id == nid
        assert r.d2 == d2v  # exact dyadic arithmetic, bit-equal


def test_knn_radius_join_rejects_oversized_radius(ray_session):
    import ray

    from geojson_vt_ray.ray_pipeline.cells import knn_radius_join_cells

    ds = ray.data.from_arrow(_point_table(np.arange(1, 10)))
    q = ray.data.from_arrow(
        pa.table({"query_id": pa.array([1]), "phash": pa.array([0], pa.int64())})
    )
    with pytest.raises(ValueError):
        knn_radius_join_cells(ds, q, radius=0.5, k=3, level=4)


def test_with_cell_id_and_counts(ray_session):
    import ray

    from geojson_vt_ray.datagen.images import phash_of_index_vec, tile_xy
    from geojson_vt_ray.ray_pipeline.cells import cell_counts, with_cell_id

    idx = np.arange(1, 400, dtype=np.int64)
    ds = ray.data.from_arrow(_point_table(idx))
    level = 6
    tagged = with_cell_id(ds, level, curve="hilbert").to_pandas()
    cx, cy = tile_xy(phash_of_index_vec(idx), level)
    by_id = tagged.set_index("image_id")
    expect = hilbert_encode(cx, cy, level).astype(np.int64)
    for i, e, ex, ey in zip(idx.tolist(), expect.tolist(), cx.tolist(), cy.tolist()):
        row = by_id.loc[f"img-{i:012d}"]
        assert (row.cell, row.cx, row.cy) == (e, ex, ey)

    counts = cell_counts(ds, level, curve="morton").to_pandas()
    codes = morton_encode(cx.astype(np.uint64), cy.astype(np.uint64)).astype(np.int64)
    vals, cnts = np.unique(codes, return_counts=True)
    got = counts.sort_values("cell").reset_index(drop=True)
    assert np.array_equal(got["cell"].to_numpy(), vals)
    assert np.array_equal(got["count()"].to_numpy(), cnts)


def test_geo_knn_matches_bruteforce(ray_session):
    """geo_knn_join == local spherical-chord brute force by (query,
    neighbor, rank)."""
    import pyarrow as pa
    import ray

    from geojson_vt_ray.datagen.images import mercator_xy, phash_of_index_vec
    from geojson_vt_ray.kernels.s2 import mercator_to_xyz
    from geojson_vt_ray.ray_pipeline.cells import geo_knn_join

    idx = np.arange(1, 700, dtype=np.int64)
    ph = phash_of_index_vec(idx)
    pts = ray.data.from_arrow(
        pa.table(
            {
                "image_id": pa.array([f"img-{i:012d}" for i in idx.tolist()]),
                "phash": pa.array(ph),
            }
        )
    )
    qidx = idx[idx % 53 == 0]
    k = 4
    got = (
        geo_knn_join(pts, phash_of_index_vec(qidx), qidx, k=k)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )

    mx, my = mercator_xy(ph)
    x, y, z = mercator_to_xyz(mx, my)
    rows = []
    for qi in qidx.tolist():
        j = qi - 1
        d2 = (x - x[j]) ** 2 + (y - y[j]) ** 2 + (z - z[j]) ** 2
        order = np.lexsort((idx, d2))
        rank = 0
        for t in order:
            if idx[t] == qi:
                continue
            rank += 1
            rows.append((qi, f"img-{idx[t]:012d}", rank))
            if rank == k:
                break
    import pandas as pd

    want = pd.DataFrame(rows, columns=["query_id", "neighbor_id", "rank"])
    pd.testing.assert_frame_equal(
        got[["query_id", "neighbor_id", "rank"]], want
    )


def test_geo_knn_differs_from_planar_near_poles(ray_session):
    """Why the geodesic variant exists: near the poles the planar
    mercator metric inflates longitudinal distance, so planar and
    geodesic kNN disagree — construct such a case and check geo_knn's
    pick is the true great-circle nearest."""
    import pyarrow as pa
    import ray

    from geojson_vt_ray.kernels.s2 import mercator_to_xyz
    from geojson_vt_ray.ray_pipeline.cells import geo_knn_join
    from geojson_vt_ray.datagen.images import mercator_xy

    # phash packs (lat_bits << 32) | lng_bits
    def mk_phash(mx, my):
        return np.int64((int(my * (1 << 31)) << 32) | int(mx * (1 << 32)))

    # query at high latitude (my near 0 = far north). Candidate A: same
    # latitude, 0.3 world-x away (planar 0.3, geodesic small because the
    # parallel circle is short up there). Candidate B: south by 0.23
    # world-y (planar 0.23 < 0.3, but geodesically farther than A — the
    # mercator y axis is stretched near the pole).
    q = mk_phash(0.50, 0.02)
    a = mk_phash(0.80, 0.02)
    b = mk_phash(0.50, 0.25)
    pts = ray.data.from_arrow(
        pa.table(
            {
                "image_id": pa.array(["img-a", "img-b"]),
                "phash": pa.array([a, b]),
            }
        )
    )
    got = geo_knn_join(
        pts, np.array([q]), np.array([1]), k=1, exclude_self=False
    ).to_pandas()
    # planar would pick B (0.05 < 0.2); geodesic must pick A
    mxs, mys = mercator_xy(np.array([q, a, b]))
    xs, ys, zs = mercator_to_xyz(mxs, mys)
    d2a = (xs[1] - xs[0]) ** 2 + (ys[1] - ys[0]) ** 2 + (zs[1] - zs[0]) ** 2
    d2b = (xs[2] - xs[0]) ** 2 + (ys[2] - ys[0]) ** 2 + (zs[2] - zs[0]) ** 2
    assert d2a < d2b  # construction sanity: A is geodesically nearer
    planar = (mxs[1:] - mxs[0]) ** 2 + (mys[1:] - mys[0]) ** 2
    assert planar[1] < planar[0]  # ...while planar prefers B
    assert got["neighbor_id"].tolist() == ["img-a"]


def test_hilbert_bbox_ranges_compact_and_exact():
    """Range decomposition covers exactly the bbox cells, and the range
    count is O(perimeter): far fewer ranges than cells for a fat bbox
    (the property that makes curve-sorted range scans cheap)."""
    from geojson_vt_ray.ray_pipeline.cells import hilbert_bbox_ranges

    level = 8
    n = 1 << level
    x0, y0, x1, y1 = 0.2, 0.3, 0.45, 0.55
    starts, ends = hilbert_bbox_ranges(x0, y0, x1, y1, level)
    assert np.all(starts <= ends)
    assert np.all(starts[1:] > ends[:-1] + 1)  # maximally compressed
    covered = np.concatenate(
        [np.arange(s, e + 1, dtype=np.uint64) for s, e in zip(starts, ends)]
    )
    # exact cover of the cell rectangle
    gx, gy = np.meshgrid(
        np.arange(int(x0 * n), int(x1 * n) + 1, dtype=np.uint64),
        np.arange(int(y0 * n), int(y1 * n) + 1, dtype=np.uint64),
    )
    want = np.sort(hilbert_encode(gx.ravel(), gy.ravel(), level))
    np.testing.assert_array_equal(np.sort(covered), want)
    n_cells = len(want)
    assert len(starts) < n_cells / 4  # compact: ranges ~ perimeter, not area


def test_range_query_bbox_matches_filter(ray_session):
    """Index-pruned bbox query == direct coordinate filter."""
    import pyarrow as pa
    import ray

    from geojson_vt_ray.datagen.images import mercator_xy, phash_of_index_vec
    from geojson_vt_ray.ray_pipeline.cells import range_query_bbox

    idx = np.arange(1, 3000, dtype=np.int64)
    ph = phash_of_index_vec(idx)
    pts = ray.data.from_arrow(
        pa.table(
            {
                "image_id": pa.array([f"img-{i:012d}" for i in idx.tolist()]),
                "phash": pa.array(ph),
            }
        )
    )
    bbox = (0.1, 0.62, 0.33, 0.9)
    got = range_query_bbox(pts, bbox, level=7).to_pandas().sort_values("image_id")
    mx, my = mercator_xy(ph)
    m = (mx >= bbox[0]) & (mx < bbox[2]) & (my >= bbox[1]) & (my < bbox[3])
    assert got["image_id"].tolist() == [f"img-{i:012d}" for i in idx[m].tolist()]
    np.testing.assert_array_equal(got["mx"].to_numpy(), mx[m])
    np.testing.assert_array_equal(got["my"].to_numpy(), my[m])


def test_radius_join_hot_cell_blocking(ray_session):
    """With cell_cap forced tiny, hot cells chunk their points across
    blocks and the result is identical to the unblocked join — for both
    the square-halo and hex-halo variants."""
    import ray

    from geojson_vt_ray.datagen.images import phash_of_index_vec
    from geojson_vt_ray.ray_pipeline.cells import (
        hex_radius_knn_join,
        knn_radius_join_cells,
    )

    idx = np.arange(1, 900, dtype=np.int64)
    points = ray.data.from_arrow(_point_table(idx))
    q_idx = idx[idx % 41 == 0]
    queries = ray.data.from_arrow(
        pa.table({"query_id": pa.array(q_idx), "phash": pa.array(phash_of_index_vec(q_idx))})
    )

    def frame(ds):
        return (
            ds.to_pandas()
            .sort_values(["query_id", "d2", "neighbor_id"])
            .reset_index(drop=True)
        )

    import pandas as pd

    # coarse level/res => few giant cells => blocking engages at cap 16
    a = frame(knn_radius_join_cells(points, queries, radius=0.05, k=4, level=4, cell_cap=10**9))
    b = frame(knn_radius_join_cells(points, queries, radius=0.05, k=4, level=4, cell_cap=16))
    pd.testing.assert_frame_equal(a, b)

    a = frame(hex_radius_knn_join(points, queries, radius=0.05, k=4, res=1, cell_cap=10**9))
    b = frame(hex_radius_knn_join(points, queries, radius=0.05, k=4, res=1, cell_cap=16))
    pd.testing.assert_frame_equal(a, b)
