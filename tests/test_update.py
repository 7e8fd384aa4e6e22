"""Incremental update/diff semantics (reference `test/update.test.ts`,
`src/difference.ts`)."""

import pytest

from geojson_vt_ray.engine import LocalGeoJSONVT
from geojson_vt_ray.options import TilerOptions


def _point(fid, lng, lat, props=None):
    return {
        "type": "Feature",
        "id": fid,
        "geometry": {"type": "Point", "coordinates": [lng, lat]},
        "properties": props or {"name": f"p{fid}"},
    }


def _index(features, **opts):
    data = {"type": "FeatureCollection", "features": features}
    return LocalGeoJSONVT(data, TilerOptions(updateable=True, **opts))


def _tile_ids(vt, z, x, y):
    tile = vt.get_tile(z, x, y)
    if tile is None:
        return []
    return [f.get("id") for f in tile["features"]]


def test_update_requires_updateable():
    vt = LocalGeoJSONVT({"type": "FeatureCollection", "features": [_point(1, 0, 0)]})
    with pytest.raises(ValueError):
        vt.update_data({"add": [_point(2, 10, 10)]})


def test_add_feature():
    vt = _index([_point(1, 0, 0)])
    assert _tile_ids(vt, 0, 0, 0) == [1]
    vt.update_data({"add": [_point(2, 10, 10)]})
    assert _tile_ids(vt, 0, 0, 0) == [1, 2]


def test_remove_feature():
    vt = _index([_point(1, 0, 0), _point(2, 10, 10)])
    vt.update_data({"remove": [1]})
    assert _tile_ids(vt, 0, 0, 0) == [2]


def test_add_with_existing_id_replaces():
    vt = _index([_point(1, 0, 0, {"name": "old"})])
    vt.update_data({"add": [_point(1, 20, 20, {"name": "new"})]})
    tile = vt.get_tile(0, 0, 0)
    assert len(tile["features"]) == 1
    assert tile["features"][0]["tags"]["name"] == "new"


def test_remove_all():
    vt = _index([_point(1, 0, 0), _point(2, 10, 10)])
    vt.update_data({"removeAll": True, "add": [_point(7, -5, -5)]})
    assert _tile_ids(vt, 0, 0, 0) == [7]


def test_property_update():
    vt = _index([_point(1, 0, 0, {"a": 1, "b": 2})])
    vt.update_data(
        {
            "update": [
                {
                    "id": 1,
                    "removeProperties": ["b"],
                    "addOrUpdateProperties": [{"key": "c", "value": 3}],
                }
            ]
        }
    )
    tags = vt.get_tile(0, 0, 0)["features"][0]["tags"]
    assert tags == {"a": 1, "c": 3}


def test_remove_all_properties():
    vt = _index([_point(1, 0, 0, {"a": 1})])
    vt.update_data({"update": [{"id": 1, "removeAllProperties": True}]})
    assert vt.get_tile(0, 0, 0)["features"][0]["tags"] == {}


def test_geometry_update_moves_feature():
    vt = _index([_point(1, -170, 0)])
    vt.update_data(
        {"update": [{"id": 1, "newGeometry": {"type": "Point", "coordinates": [170, 0]}}]}
    )
    # old western tile invalidated, feature now in the eastern hemisphere
    tile = vt.get_tile(2, 3, 1)  # x=3 covers 90..180
    assert [f.get("id") for f in tile["features"]] == [1]


def test_antimeridian_duplicates_updated_together():
    # a line crossing the antimeridian wraps into duplicated features
    line = {
        "type": "Feature",
        "id": "L",
        "geometry": {"type": "LineString", "coordinates": [[-190, 0], [-170, 5]]},
        "properties": {"v": 1},
    }
    vt = _index([line])
    vt.update_data(
        {"update": [{"id": "L", "addOrUpdateProperties": [{"key": "v", "value": 2}]}]}
    )
    tile = vt.get_tile(0, 0, 0)
    assert len(tile["features"]) >= 2  # wrap duplicates
    assert all(f["tags"]["v"] == 2 for f in tile["features"])


def test_no_duplicates_after_repeated_updates():
    vt = _index([_point(1, 0, 0)])
    for _ in range(3):
        vt.update_data({"add": [_point(1, 1, 1)]})
    assert _tile_ids(vt, 0, 0, 0) == [1]


def test_filter_predicate_removes_features():
    vt = _index([_point(1, 0, 0, {"keep": True}), _point(2, 5, 5, {"keep": False})])
    vt.update_data(
        {"add": [_point(3, 8, 8, {"keep": False})]},
        filter_fn=lambda f: f["properties"]["keep"],
    )
    assert _tile_ids(vt, 0, 0, 0) == [1]


def test_drill_down_after_update():
    vt = _index([_point(1, 0.01, 0.01)])
    vt.update_data({"add": [_point(2, 0.02, 0.02)]})
    tile = vt.get_tile(10, 512, 511)  # lat>0 → mercator y just below 0.5
    assert tile is not None
    assert sorted(f.get("id") for f in tile["features"]) == [1, 2]


def test_get_data_round_trip():
    vt = _index([_point(1, 0, 0)])
    vt.update_data({"add": [_point(2, 10, 10)]})
    data = vt.get_data()
    assert data["type"] == "FeatureCollection"
    assert sorted(f["id"] for f in data["features"]) == [1, 2]
