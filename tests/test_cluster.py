"""Cluster index parity with the reference supercluster goldens
(`src/cluster-tile-index.test.ts`)."""

import pytest

from geojson_vt_ray.cluster import ClusterIndex
from geojson_vt_ray.options import ClusterOptions

from .conftest import load_fixture
from .util import assert_deep_equal


def _load(options=None, extra=()):
    index = ClusterIndex(options)
    places = load_fixture("places.json")
    index.load_geojson_points(places["features"] + list(extra))
    return index


def test_generates_clusters():
    index = _load()
    tile = index.get_tile(0, 0, 0)
    expected = load_fixture("places-z0-0-0.json")
    assert_deep_equal(tile["features"], expected["features"])


def test_min_points_option():
    index = _load(ClusterOptions(min_points=5))
    tile = index.get_tile(0, 0, 0)
    expected = load_fixture("places-z0-0-0-min5.json")
    assert_deep_equal(tile["features"], expected["features"])


def test_children_of_cluster():
    index = _load()
    counts = [c["properties"].get("point_count", 1) if c["properties"] else 1
              for c in index.get_children(163)]
    assert counts == [6, 7, 2, 1]


def test_leaves_of_cluster():
    index = _load()
    names = [p["properties"]["name"] for p in index.get_leaves(163, 10, 5)]
    assert names == [
        "Niagara Falls", "Cape San Blas", "Cape Sable", "Cape Canaveral",
        "San  Salvador", "Cabo Gracias a Dios", "I. de Cozumel", "Grand Cayman",
        "Miquelon", "Cape Bauld",
    ]


def test_generate_id_option():
    index = _load(ClusterOptions(generate_id=True))
    tile = index.get_tile(0, 0, 0)
    ids = [
        f.get("id")
        for f in tile["features"]
        if not (f["tags"] and f["tags"].get("cluster"))
    ]
    assert ids == [12, 20, 21, 22, 24, 28, 30, 62, 81, 118, 119, 125, 81, 118]


def test_leaves_null_properties():
    extra = [
        {
            "type": "Feature",
            "properties": None,
            "geometry": {"type": "Point", "coordinates": [-79.04411780507252, 43.08771393436908]},
        }
    ]
    index = _load(extra=extra)
    leaves = index.get_leaves(164, 1, 6)
    assert leaves[0]["properties"] is None


def test_cluster_expansion_zoom():
    index = _load()
    assert index.get_cluster_expansion_zoom(163) == 1
    assert index.get_cluster_expansion_zoom(195) == 1
    assert index.get_cluster_expansion_zoom(580) == 2
    assert index.get_cluster_expansion_zoom(1156) == 2
    assert index.get_cluster_expansion_zoom(4133) == 3


def test_cluster_expansion_zoom_max():
    index = _load(ClusterOptions(radius=60, extent=256, max_zoom=4))
    assert index.get_cluster_expansion_zoom(2503) == 5


def test_reduce_aggregation():
    def mapper(props):
        return {"sum": props.get("scalerank") if props else None}

    def reducer(a, b):
        a["sum"] += b["sum"]

    index = _load(ClusterOptions(map=mapper, reduce=reducer, radius=100))
    sums1 = [f["tags"].get("sum") for f in index.get_tile(1, 0, 0)["features"]]
    assert [s for s in sums1 if s] == [146, 84, 63, 23, 34, 12, 19, 29, 8, 8, 80, 35]
    sums0 = [f["tags"].get("sum") for f in index.get_tile(0, 0, 0)["features"]]
    assert [s for s in sums0 if s] == [298, 122, 12, 36, 98, 7, 24, 8, 125, 98, 125, 12, 36, 8]


def test_default_map_with_reduce():
    index = _load(ClusterOptions(reduce=lambda a, b: None, radius=100))
    assert index.get_tile(0, 0, 0) is not None


def test_dateline_crossing_query():
    pts = [
        {"type": "Feature", "properties": None,
         "geometry": {"type": "Point", "coordinates": [lng, 0]}}
        for lng in (-178.989, -178.990, -178.991, -178.992)
    ]
    index = ClusterIndex()
    index.load_geojson_points(pts)
    non_crossing = index.get_clusters([-179, -10, -177, 10], 1)
    crossing = index.get_clusters([179, -10, -177, 10], 1)
    assert len(non_crossing) > 0
    assert len(crossing) > 0
    assert len(non_crossing) == len(crossing)


def test_weird_bbox_values():
    index = _load()
    assert len(index.get_clusters([129.426390, -103.720017, -445.930843, 114.518236], 1)) == 26
    assert len(index.get_clusters([112.207836, -84.578666, -463.149397, 120.169159], 1)) == 27
    assert len(index.get_clusters([129.886277, -82.332680, -445.470956, 120.390930], 1)) == 26
    assert len(index.get_clusters([458.220043, -84.239039, -117.137190, 120.206585], 1)) == 25
    assert len(index.get_clusters([456.713058, -80.354196, -118.644175, 120.539148], 1)) == 25
    assert len(index.get_clusters([453.105328, -75.857422, -122.251904, 120.732760], 1)) == 25
    assert len(index.get_clusters([-180, -90, 180, 90], 1)) == 61


def test_non_integer_zoom():
    index = _load()
    assert index.get_clusters([179, -10, -177, 10], 1.25) is not None


def test_same_location_points_clustered():
    index = ClusterIndex(ClusterOptions(max_zoom=20, extent=8192, radius=16))
    index.load_geojson_points(
        [
            {"type": "Feature", "properties": None,
             "geometry": {"type": "Point", "coordinates": [-1.426798, 53.943034]}},
            {"type": "Feature", "properties": None,
             "geometry": {"type": "Point", "coordinates": [-1.426798, 53.943034]}},
        ]
    )
    assert index.trees[20].num_items == 1


def test_unclustered_coords_not_rounded():
    index = ClusterIndex(ClusterOptions(max_zoom=19))
    index.load_geojson_points(
        [
            {"type": "Feature", "properties": None,
             "geometry": {"type": "Point",
                          "coordinates": [173.19150559062456, -41.340357424709275]}}
        ]
    )
    tile = index.get_tile(20, 1028744, 656754)
    assert tile["features"][0]["geometry"][0] == [421, 281]


def test_zero_items():
    index = ClusterIndex()
    index.load_geojson_points([])
    assert index.get_clusters([-180, -85, 180, 85], 0) == []
