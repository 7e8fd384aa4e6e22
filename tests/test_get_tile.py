"""getTile drill-down + one-shot tile parity (reference `test/get-tile.test.ts`,
`test/geojson-to-tile.test.ts`)."""

from geojson_vt_ray.engine import LocalGeoJSONVT
from geojson_vt_ray.engine.one_shot import geojson_to_tile
from geojson_vt_ray.options import TilerOptions

from .conftest import load_fixture
from .util import assert_deep_equal

PENNSYLVANIA = [
    {
        "geometry": [[[-64, 4160], [-64, -64], [4160, -64], [4160, 4160], [-64, 4160]]],
        "type": 3,
        "tags": {"name": "Pennsylvania", "density": 284.3},
        "id": "42",
    }
]


def test_get_tile_empty_index():
    index = LocalGeoJSONVT({"type": "FeatureCollection", "features": []})
    assert index.get_tile(0, 0, 0) is None


def test_get_tile_us_states():
    index = LocalGeoJSONVT(load_fixture("us-states.json"))

    expected = load_fixture("us-states-z7-37-48.json")
    assert_deep_equal(index.get_tile(7, 37, 48)["features"], expected)
    assert_deep_equal(index.get_tile("7", "37", "48")["features"], expected)

    assert_deep_equal(index.get_tile(9, 148, 192)["features"], PENNSYLVANIA)

    assert index.get_tile(11, 800, 400) is None
    assert index.get_tile(-5, 123.25, 400.25) is None
    assert index.get_tile(25, 200, 200) is None


def test_get_tile_unbuffered_left_right_edges():
    index = LocalGeoJSONVT(
        {"type": "LineString", "coordinates": [[0, 90], [0, -90]]},
        TilerOptions(buffer=0),
    )
    assert index.get_tile(2, 1, 1) is None
    assert_deep_equal(
        index.get_tile(2, 2, 1)["features"],
        [{"geometry": [[[0, 0], [0, 4096]]], "type": 2, "tags": None}],
    )


def test_get_tile_unbuffered_top_bottom_edges():
    index = LocalGeoJSONVT(
        {"type": "LineString", "coordinates": [[-90, 66.51326044311188], [90, 66.51326044311188]]},
        TilerOptions(buffer=0),
    )
    assert_deep_equal(
        index.get_tile(2, 1, 0)["features"],
        [{"geometry": [[[0, 4096], [4096, 4096]]], "type": 2, "tags": None}],
    )
    assert index.get_tile(2, 1, 1)["features"] == []


def test_get_tile_polygon_clipping_on_boundary():
    index = LocalGeoJSONVT(
        {
            "type": "Polygon",
            "coordinates": [
                [
                    [42.1875, 57.32652122521708],
                    [47.8125, 57.32652122521708],
                    [47.8125, 54.16243396806781],
                    [42.1875, 54.16243396806781],
                    [42.1875, 57.32652122521708],
                ]
            ],
        },
        TilerOptions(buffer=1024),
    )
    assert_deep_equal(
        index.get_tile(5, 19, 9)["features"],
        [
            {
                "geometry": [[[3072, 3072], [5120, 3072], [5120, 5120], [3072, 5120], [3072, 3072]]],
                "type": 3,
                "tags": None,
            }
        ],
    )


def test_one_shot_single_tile():
    tile = geojson_to_tile(load_fixture("single-tile.json"), 12, 1171, 1566)
    assert len(tile["features"]) == 1
    assert (
        tile["features"][0]["tags"]["name"]
        == "P Street Northwest - Massachusetts Avenue Northwest"
    )


def test_one_shot_wrap():
    geojson = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "properties": {"name": "test"},
                "geometry": {"type": "LineString", "coordinates": [[-200, 0], [200, 0]]},
            }
        ],
    }
    no_wrap = geojson_to_tile(geojson, 0, 0, 0, TilerOptions(wrap=False, clip=True))
    assert_deep_equal(
        no_wrap["features"],
        [{"type": 2, "tags": {"name": "test"}, "geometry": [[[-64, 2048], [4160, 2048]]]}],
    )
    wrapped = geojson_to_tile(geojson, 0, 0, 0, TilerOptions(wrap=True, clip=True))
    assert_deep_equal(
        wrapped["features"],
        [
            {"type": 2, "tags": {"name": "test"}, "geometry": [[[3868, 2048], [4160, 2048]]]},
            {"type": 2, "tags": {"name": "test"}, "geometry": [[[-64, 2048], [4160, 2048]]]},
            {"type": 2, "tags": {"name": "test"}, "geometry": [[[-64, 2048], [228, 2048]]]},
        ],
    )


def test_one_shot_wrap_duplicates_beyond_world():
    geojson = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "properties": {"name": "test"},
                "geometry": {"type": "LineString", "coordinates": [[-200, 0], [-170, 0]]},
            }
        ],
    }
    no_wrap = geojson_to_tile(geojson, 0, 0, 0, TilerOptions(wrap=False, clip=False))
    assert_deep_equal(
        no_wrap["features"],
        [{"type": 2, "tags": {"name": "test"}, "geometry": [[[-228, 2048], [114, 2048]]]}],
    )
    wrapped = geojson_to_tile(geojson, 0, 0, 0, TilerOptions(wrap=True, clip=False))
    assert_deep_equal(
        wrapped["features"],
        [
            {"type": 2, "tags": {"name": "test"}, "geometry": [[[3868, 2048], [4160, 2048]]]},
            {"type": 2, "tags": {"name": "test"}, "geometry": [[[-64, 2048], [114, 2048]]]},
        ],
    )


def test_one_shot_clip_us_states():
    geojson = load_fixture("us-states.json")
    tile1 = geojson_to_tile(geojson, 7, 37, 48, TilerOptions(clip=True))
    assert_deep_equal(tile1["features"], load_fixture("us-states-z7-37-48.json"))

    tile2 = geojson_to_tile(geojson, 9, 148, 192, TilerOptions(clip=True))
    expected = [dict(PENNSYLVANIA[0])]
    expected[0] = {
        **expected[0],
        "geometry": [[[4160, -64], [4160, 4160], [-64, 4160], [-64, -64], [4160, -64]]],
    }
    assert_deep_equal(tile2["features"], expected)

    assert geojson_to_tile(geojson, 11, 800, 400, TilerOptions(clip=True))["features"] == []
    assert geojson_to_tile(geojson, -5, 123.25, 400.25, TilerOptions(clip=True))["features"] == []
    assert geojson_to_tile(geojson, 25, 200, 200, TilerOptions(clip=True))["features"] == []
