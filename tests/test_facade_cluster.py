"""Facade-level cluster mode (reference `geojsonvt.ts` cluster branches)."""

from geojson_vt_ray.engine import LocalGeoJSONVT
from geojson_vt_ray.options import ClusterOptions, TilerOptions

from .conftest import load_fixture
from .util import assert_deep_equal


def test_empty_cluster_index_returns_null():
    vt = LocalGeoJSONVT(
        {"type": "FeatureCollection", "features": []}, TilerOptions(cluster=True)
    )
    assert vt.get_tile(0, 0, 0) is None


def test_cluster_mode_matches_cluster_index():
    """Facade cluster mode feeds convert+wrap output into the cluster index
    (reference `geojsonvt.ts:64-68`) — compare against a ClusterIndex fed the
    same internal features (wrap duplicates dateline points, so this
    intentionally differs from the direct `load()` fixture path)."""
    from geojson_vt_ray.cluster import ClusterIndex
    from geojson_vt_ray.kernels.convert import convert_to_internal
    from geojson_vt_ray.kernels.wrap import wrap as wrap_features

    places = load_fixture("places.json")
    options = TilerOptions(cluster=True)
    vt = LocalGeoJSONVT(places, options)

    direct = ClusterIndex(options.cluster_options)
    direct.initialize(wrap_features(convert_to_internal(places, options), options))

    assert_deep_equal(
        vt.get_tile(0, 0, 0)["features"], direct.get_tile(0, 0, 0)["features"]
    )
    # cluster query surface through the facade (ids offset by the wrapped
    # point count — resolve a real cluster id from the tile)
    cid = next(
        f["id"] for f in vt.get_tile(0, 0, 0)["features"] if f["tags"].get("cluster")
    )
    assert vt.get_cluster_expansion_zoom(cid) == 1
    assert len(vt.get_cluster_children(cid)) >= 2
    assert len(vt.get_cluster_leaves(cid, 10, 0)) == 10


def test_update_cluster_options_toggle():
    places = load_fixture("places.json")
    vt = LocalGeoJSONVT(places, TilerOptions(updateable=True))
    t_plain = vt.get_tile(0, 0, 0)
    n0 = len(t_plain["features"])
    assert n0 >= 163  # 163 points + wrap duplicates near the dateline

    vt.update_cluster_options(True, ClusterOptions())
    t_cluster = vt.get_tile(0, 0, 0)
    assert len(t_cluster["features"]) < n0  # clustered

    vt.update_cluster_options(False, ClusterOptions())
    t_back = vt.get_tile(0, 0, 0)
    assert len(t_back["features"]) == n0


def test_cluster_tiles_size_dispatch(ray_session):
    """Below the cap: bit-exact greedy; above: the grid scale-out variant."""
    import numpy as np
    import ray.data

    from geojson_vt_ray.options import ClusterOptions
    from geojson_vt_ray.ray_pipeline.cluster_stage import (
        cluster_tiles, cluster_tiles_exact,
    )

    rs = np.random.RandomState(0)
    pts = ray.data.from_items(
        [{"image_id": int(i), "phash": int(rs.randint(1 << 48))} for i in range(300)]
    )
    small = cluster_tiles(pts, ClusterOptions(max_zoom=6), zoom=1).to_pandas()
    exact = cluster_tiles_exact(pts, ClusterOptions(max_zoom=6), zoom=1).to_pandas()
    assert small.equals(exact)

    big = cluster_tiles(pts, ClusterOptions(max_zoom=6), zoom=1, exact_max_points=100)
    # grid path emits the cell-local schema (cluster ids per seed), still rows
    assert big.count() > 0


def test_grid_cluster_hot_cell_cap(ray_session):
    """A degenerate corpus (all points in one grid cell) must not serialize
    into one O(n^2) task: the cap splits the cell, while total point_count
    is preserved and every point is represented exactly once."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from geojson_vt_ray.options import ClusterOptions
    from geojson_vt_ray.ray_pipeline.cluster_stage import grid_cluster_tiles

    n = 400
    # identical phash -> every point in the same spot, one hot cell
    tbl = pa.table(
        {
            "image_id": pa.array([f"img-{i:012d}" for i in range(n)], pa.string()),
            "phash": pa.array(np.full(n, (1 << 40) | 12345, dtype=np.int64)),
        }
    )

    def run(cap):
        pts = ray.data.from_arrow(tbl).repartition(4)
        return grid_cluster_tiles(
            pts, ClusterOptions(max_zoom=6), zoom=1, cell_cap=cap
        ).to_pandas()

    unblocked = run(10**9)
    blocked = run(50)
    assert int(unblocked["point_count"].sum()) == n
    assert int(blocked["point_count"].sum()) == n
    # unblocked: one cluster; blocked: one cluster per chunk, each <= cap
    assert len(unblocked) == 1
    assert len(blocked) == -(-n // 50)
    # rank restarts per batch (4 partitions), so chunks balance to within
    # one row per batch of the cap
    assert blocked["point_count"].max() <= 50 + 4


def _places_mercator_points(fixtures):
    from geojson_vt_ray.kernels.project import project_x, project_y

    places = fixtures("places.json")
    rows = []
    for i, f in enumerate(places["features"]):
        if f["geometry"] is None or f["geometry"]["type"] != "Point":
            continue
        lng, lat = f["geometry"]["coordinates"][:2]
        rows.append(
            {"pid": str(i), "px": float(project_x(lng)), "py": float(project_y(lat))}
        )
    # the distributed exact cascade defines input order as ascending pid
    # (Ray block order is not deterministic); feed the local comparison
    # index in the same order
    rows.sort(key=lambda r: r["pid"])
    return rows


def test_cluster_cascade_exact_matches_local_index(ray_session, fixtures):
    """Per-zoom distributed cascade output == the local ClusterIndex zoom
    cascade on places.json (reference cluster-tile-index.ts:109-156)."""
    import ray.data

    from geojson_vt_ray.cluster import ClusterIndex
    from geojson_vt_ray.cluster.index import OFF_ID, OFF_NUM
    from geojson_vt_ray.options import ClusterOptions
    from geojson_vt_ray.ray_pipeline.cluster_stage import cluster_cascade_exact

    rows = _places_mercator_points(fixtures)
    options = ClusterOptions(max_zoom=6)

    got = cluster_cascade_exact(
        ray.data.from_items(rows).repartition(3), options
    ).to_pandas()

    feats = [
        {
            "id": r["pid"], "type": "Point",
            "geometry": [r["px"], r["py"]], "tags": None,
            "minX": 0.0, "minY": 0.0, "maxX": 0.0, "maxY": 0.0,
        }
        for r in rows
    ]
    index = ClusterIndex(options)
    index.initialize(feats)
    for z in range(options.min_zoom, options.max_zoom + 2):
        data = index.trees[z].flat_data
        want = set()
        for i in range(0, len(data), index.stride):
            is_cluster = data[i + OFF_NUM] > 1
            want.add(
                (
                    int(data[i + OFF_ID]) if is_cluster else -1,
                    "" if is_cluster else str(index.points[int(data[i + OFF_ID])]["id"]),
                    int(data[i + OFF_NUM]),
                    data[i],
                    data[i + 1],
                )
            )
        lv = got[got.zoom == z]
        have = set(
            map(
                tuple,
                lv[["cluster_id", "point_id", "point_count", "px", "py"]].itertuples(
                    index=False
                ),
            )
        )
        assert have == want, f"zoom {z}"
    assert (got[got.zoom == options.max_zoom + 1].point_count == 1).all()


def test_get_clusters_bbox_matches_local(ray_session, fixtures):
    """Dataset-side getClusters(bbox, zoom) == ClusterIndex.get_clusters on
    places.json, including an antimeridian-crossing bbox."""
    import ray.data

    from geojson_vt_ray.cluster import ClusterIndex
    from geojson_vt_ray.kernels.project import unproject_x, unproject_y
    from geojson_vt_ray.options import ClusterOptions
    from geojson_vt_ray.ray_pipeline.cluster_stage import (
        cluster_cascade_exact,
        get_clusters_bbox,
    )

    rows = _places_mercator_points(fixtures)
    options = ClusterOptions(max_zoom=6)
    cascade = cluster_cascade_exact(ray.data.from_items(rows), options).materialize()

    feats = [
        {
            "id": r["pid"], "type": "Point",
            "geometry": [r["px"], r["py"]], "tags": None,
            "minX": 0.0, "minY": 0.0, "maxX": 0.0, "maxY": 0.0,
        }
        for r in rows
    ]
    index = ClusterIndex(options)
    index.initialize(feats)

    for bbox, zoom in [
        ([-100.0, 10.0, 30.0, 60.0], 2),
        ([150.0, -40.0, -120.0, 20.0], 3),  # crosses the antimeridian
        ([-180.0, -85.0, 180.0, 85.0], 0),
    ]:
        want = []
        for f in index.get_clusters(bbox, zoom):
            props = f.get("properties") or {}
            lng, lat = f["geometry"]["coordinates"][:2]
            want.append((int(props.get("point_count", 1)), round(lng, 9), round(lat, 9)))
        got_df = get_clusters_bbox(cascade, bbox, zoom, options).to_pandas()
        got = [
            (int(c), round(unproject_x(x), 9), round(unproject_y(y), 9))
            for c, x, y in zip(got_df.point_count, got_df.opx, got_df.opy)
        ]
        assert sorted(got) == sorted(want), (bbox, zoom)


def test_cluster_cascade_grid_invariants(ray_session, fixtures):
    """Scale-out cascade: per-level point_count totals are conserved and the
    coarsest level has no more rows than the finest."""
    import ray.data

    from geojson_vt_ray.options import ClusterOptions
    from geojson_vt_ray.ray_pipeline.cluster_stage import cluster_cascade_grid

    rows = _places_mercator_points(fixtures)
    options = ClusterOptions(max_zoom=5)
    got = cluster_cascade_grid(
        ray.data.from_items(rows).repartition(3), options
    ).to_pandas()
    n = len(rows)
    counts = got.groupby("zoom").point_count.sum()
    for z in range(options.min_zoom, options.max_zoom + 2):
        assert counts[z] == n, z
    sizes = got.groupby("zoom").size()
    assert sizes[options.min_zoom] <= sizes[options.max_zoom + 1]
    # cluster rows carry synthetic ids, singleton points keep their identity
    lv0 = got[got.zoom == options.min_zoom]
    assert ((lv0.point_count > 1) == (lv0.point_id == "")).all()


def test_cluster_cascade_exact_fuzz_random_points(ray_session):
    """Randomized per-zoom cascade equality vs the local ClusterIndex on
    random point sets (beyond the places.json fixture)."""
    import numpy as np
    import ray.data

    from geojson_vt_ray.cluster import ClusterIndex
    from geojson_vt_ray.cluster.index import OFF_ID, OFF_NUM
    from geojson_vt_ray.options import ClusterOptions
    from geojson_vt_ray.ray_pipeline.cluster_stage import cluster_cascade_exact

    rs = np.random.RandomState(31)
    for trial in range(2):
        n = int(rs.choice([120, 260]))
        # mix of uniform points and a dense blob (forces multi-level merges)
        px = np.concatenate([rs.uniform(0, 1, n), 0.5 + 0.001 * rs.standard_normal(n // 4)])
        py = np.concatenate([rs.uniform(0, 1, n), 0.5 + 0.001 * rs.standard_normal(n // 4)])
        px, py = np.clip(px, 0, 1), np.clip(py, 0, 1)
        rows = sorted(
            (
                {"pid": str(i), "px": float(px[i]), "py": float(py[i])}
                for i in range(len(px))
            ),
            key=lambda r: r["pid"],
        )
        options = ClusterOptions(max_zoom=int(rs.choice([4, 6])))
        got = cluster_cascade_exact(
            ray.data.from_items(rows).repartition(4), options
        ).to_pandas()

        feats = [
            {
                "id": r["pid"], "type": "Point",
                "geometry": [r["px"], r["py"]], "tags": None,
                "minX": 0.0, "minY": 0.0, "maxX": 0.0, "maxY": 0.0,
            }
            for r in rows
        ]
        index = ClusterIndex(options)
        index.initialize(feats)
        for z in range(options.min_zoom, options.max_zoom + 2):
            data = index.trees[z].flat_data
            want = set()
            for i in range(0, len(data), index.stride):
                is_cluster = data[i + OFF_NUM] > 1
                want.add(
                    (
                        int(data[i + OFF_ID]) if is_cluster else -1,
                        int(data[i + OFF_NUM]),
                        data[i],
                        data[i + 1],
                    )
                )
            lv = got[got.zoom == z]
            have = set(
                map(tuple, lv[["cluster_id", "point_count", "px", "py"]].itertuples(index=False))
            )
            assert have == want, (trial, z)


def test_cluster_cascade_write_read_roundtrip(ray_session, fixtures, tmp_path):
    """Zoom-partitioned cascade output: write, read one zoom back, and the
    bbox query over the read matches the in-memory cascade."""
    import ray.data

    from geojson_vt_ray.options import ClusterOptions
    from geojson_vt_ray.ray_pipeline.cluster_stage import (
        cluster_cascade_exact,
        get_clusters_bbox,
        read_cluster_cascade,
        write_cluster_cascade,
    )

    rows = _places_mercator_points(fixtures)
    options = ClusterOptions(max_zoom=4)
    cascade = cluster_cascade_exact(ray.data.from_items(rows), options).materialize()
    out = str(tmp_path / "cascade")
    stats = write_cluster_cascade(cascade, out)
    assert stats["rows"] == cascade.count()
    assert set(stats["zooms"]) == set(range(options.min_zoom, options.max_zoom + 2))

    # rerun must OVERWRITE, not append-duplicate, every partition
    stats2 = write_cluster_cascade(cascade, out)
    assert stats2 == stats

    bbox, zoom = [-100.0, 10.0, 30.0, 60.0], 2
    want = (
        get_clusters_bbox(cascade, bbox, zoom, options)
        .to_pandas()
        .sort_values(["px", "py"]) 
        .reset_index(drop=True)
    )
    back = read_cluster_cascade(out, zoom=zoom)
    got = (
        get_clusters_bbox(back, bbox, zoom, options)
        .to_pandas()[want.columns]
        .sort_values(["px", "py"]) 
        .reset_index(drop=True)
    )
    assert got.equals(want)


def test_get_cluster_tile_matches_local(ray_session, fixtures):
    """Distributed getTile over the cascade == ClusterIndex.get_tile on
    places.json (as multisets — the kdbush range order is not reproduced),
    including the x-edge dateline tiles."""
    import json as _json

    import ray.data

    from geojson_vt_ray.cluster import ClusterIndex
    from geojson_vt_ray.options import ClusterOptions
    from geojson_vt_ray.ray_pipeline.cluster_stage import (
        cluster_cascade_exact,
        get_cluster_tile,
    )

    rows = _places_mercator_points(fixtures)
    options = ClusterOptions(max_zoom=5)
    cascade = cluster_cascade_exact(ray.data.from_items(rows), options).materialize()

    # the cascade input (pid, px, py) carries no tags, so compare against a
    # tagless local index (tags round-trip through tags_json as null)
    index_plain = ClusterIndex(options)
    index_plain.initialize(
        [
            {
                "id": r["pid"], "type": "Point",
                "geometry": [r["px"], r["py"]], "tags": None,
                "minX": 0.0, "minY": 0.0, "maxX": 0.0, "maxY": 0.0,
            }
            for r in rows
        ]
    )

    def norm(tile):
        if tile is None or not tile["features"]:
            return set()
        out = set()
        for f in tile["features"]:
            tags = f.get("tags")
            out.add(
                (
                    tuple(map(tuple, f["geometry"])),
                    _json.dumps(tags, sort_keys=True),
                    str(f.get("id")),
                )
            )
        return out

    z2 = 1 << 2
    for (z, tx, ty) in [(0, 0, 0), (1, 0, 0), (2, 0, 1), (2, z2 - 1, 1), (2, 2, 1)]:
        want = norm(index_plain.get_tile(z, tx, ty))
        got = norm(get_cluster_tile(cascade, z, tx, ty, options))
        assert got == want, (z, tx, ty)


def test_get_cluster_tile_empty_is_tile_not_none(ray_session):
    """An in-range tile with no matching rows is an empty-features tile dict,
    never None — reference getTile returns {features: []} whenever the zoom's
    tree exists (cluster-tile-index.ts:248-284), reserving None for 'no
    tree'. The local ClusterIndex agrees."""
    import ray.data

    from geojson_vt_ray.cluster import ClusterIndex
    from geojson_vt_ray.options import ClusterOptions
    from geojson_vt_ray.ray_pipeline.cluster_stage import (
        cluster_cascade_exact,
        get_cluster_tile,
    )

    options = ClusterOptions(max_zoom=5)
    rows = [{"pid": "p0", "px": 0.1, "py": 0.1}]
    cascade = cluster_cascade_exact(ray.data.from_items(rows), options).materialize()

    index = ClusterIndex(options)
    index.initialize(
        [
            {
                "id": "p0", "type": "Point", "geometry": [0.1, 0.1],
                "tags": None, "minX": 0.0, "minY": 0.0, "maxX": 0.0, "maxY": 0.0,
            }
        ]
    )

    # the point lives in z2 tile (0, 0); (3, 3) is in-range but empty
    local = index.get_tile(2, 3, 3)
    dist = get_cluster_tile(cascade, 2, 3, 3, options)
    assert local == {"z": 2, "x": 3, "y": 3, "features": [],
                     "transformed": True, "source": None}
    assert dist == local


def test_distributed_drill_apis_match_local(ray_session, fixtures):
    """getChildren / getLeaves / getClusterExpansionZoom over the persisted
    cascade == the local ClusterIndex drill APIs on places.json (reference
    cluster-tile-index.ts:198-240), including leaf pagination order and the
    ValueError contract for unknown ids."""
    import json as _json

    import pytest as _pytest
    import ray.data

    from geojson_vt_ray.cluster import ClusterIndex
    from geojson_vt_ray.kernels.project import project_x, project_y
    from geojson_vt_ray.options import ClusterOptions
    from geojson_vt_ray.ray_pipeline.cluster_stage import (
        cascade_num_points,
        cluster_cascade_exact,
        get_cluster_children,
        get_cluster_expansion_zoom,
        get_cluster_leaves,
    )

    places = fixtures("places.json")
    rows = []
    for i, f in enumerate(places["features"]):
        if f["geometry"] is None or f["geometry"]["type"] != "Point":
            continue
        lng, lat = f["geometry"]["coordinates"][:2]
        rows.append(
            {
                "pid": str(i),
                "px": float(project_x(lng)),
                "py": float(project_y(lat)),
                "tags_json": _json.dumps(f.get("properties")),
            }
        )
    rows.sort(key=lambda r: r["pid"])

    options = ClusterOptions(max_zoom=6)
    cascade = cluster_cascade_exact(ray.data.from_items(rows), options).materialize()

    index = ClusterIndex(options)
    index.initialize(
        [
            {
                "id": r["pid"], "type": "Point",
                "geometry": [r["px"], r["py"]],
                "tags": _json.loads(r["tags_json"]),
                "minX": 0.0, "minY": 0.0, "maxX": 0.0, "maxY": 0.0,
            }
            for r in rows
        ]
    )
    n_points = cascade_num_points(cascade, options)
    assert n_points == len(index.points)

    def norm_feature(f):
        return (
            str(f.get("id")),
            _json.dumps(f.get("properties"), sort_keys=True),
            round(f["geometry"]["coordinates"][0], 9),
            round(f["geometry"]["coordinates"][1], 9),
        )

    # every cluster id at a few zooms: children + expansion zoom parity
    from geojson_vt_ray.cluster.index import OFF_ID, OFF_NUM

    checked = 0
    for z in (0, 1, 2, 3):
        data = index.trees[z].flat_data
        for i in range(0, len(data), index.stride):
            if data[i + OFF_NUM] <= 1:
                continue
            cid = int(data[i + OFF_ID])
            want = [norm_feature(c) for c in index.get_children(cid)]
            got = [
                norm_feature(c)
                for c in get_cluster_children(cascade, cid, n_points, options)
            ]
            assert got == want, (z, cid)
            assert get_cluster_expansion_zoom(cid, n_points) == (
                index.get_cluster_expansion_zoom(cid)
            )
            checked += 1
    assert checked >= 10

    # leaf pagination parity, including offsets that prune subtrees
    big = max(
        (
            (int(data[i + OFF_NUM]), int(data[i + OFF_ID]))
            for data in [index.trees[0].flat_data]
            for i in range(0, len(data), index.stride)
            if data[i + OFF_NUM] > 1
        ),
    )[1]
    for limit, offset in [(10, 0), (10, 5), (5, 12), (3, 0), (100, 0), (1, 6)]:
        want = [norm_feature(f) for f in index.get_leaves(big, limit, offset)]
        got = [
            norm_feature(f)
            for f in get_cluster_leaves(cascade, big, n_points, limit, offset, options)
        ]
        assert got == want, (limit, offset)

    with _pytest.raises(ValueError):
        get_cluster_children(cascade, 12, n_points, options)
