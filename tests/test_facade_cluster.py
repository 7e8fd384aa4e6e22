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
