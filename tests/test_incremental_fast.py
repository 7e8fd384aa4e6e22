"""O(affected) incremental updates over the persisted per-feature cascade
state (`write_pyramid_fast(updateable=True)` + `incremental._fast_update`):
the fast path must produce the SAME served tiles as a full rebuild of the
patched source, compose across sequential updates, and never re-cascade
the unchanged source."""

import json

import ray.data

from geojson_vt_ray.options import TilerOptions


def _rows(features):
    return ray.data.from_items(
        [{"feature_json": json.dumps(f), "input_seq": i} for i, f in enumerate(features)]
    )


def _point(fid, lng, lat):
    return {
        "type": "Feature",
        "id": fid,
        "geometry": {"type": "Point", "coordinates": [lng, lat]},
        "properties": {"name": f"p{fid}"},
    }


def _assert_serves_like_local(server, patched_features, options, probes):
    from geojson_vt_ray.engine import LocalGeoJSONVT

    local = LocalGeoJSONVT(
        {"type": "FeatureCollection", "features": patched_features},
        options.with_(index_max_zoom=0, index_max_points=0),
    )
    for (z, x, y) in probes:
        lt = local.get_tile(z, x, y)
        st = server.get_tile(z, x, y)
        if lt is None:
            assert st is None or st["features"] == [], (z, x, y)
        else:
            assert st is not None, (z, x, y)
            assert json.loads(json.dumps(st["features"])) == json.loads(
                json.dumps(lt["features"])
            ), (z, x, y)
            assert st["numPoints"] == lt["numPoints"], (z, x, y)
            assert st["numFeatures"] == lt["numFeatures"], (z, x, y)


def test_updateable_build_matches_normal_build(ray_session, tmp_path):
    """Per-feature cascade sharding is erased by the partial merge: an
    updateable build's tiles equal the batch-cascade build's tiles."""
    import os

    from geojson_vt_ray.ray_pipeline.cascade import TileServer, write_pyramid_fast
    from geojson_vt_ray.ray_pipeline.tiler import dataset_from_geojson

    with open(os.path.join(os.path.dirname(__file__), "fixtures", "us-states.json")) as f:
        gj = json.load(f)
    options = TilerOptions(max_zoom=4)
    a = str(tmp_path / "plain")
    b = str(tmp_path / "upd")
    write_pyramid_fast(dataset_from_geojson(gj), options, a, z_handoff=2)
    write_pyramid_fast(
        dataset_from_geojson(gj), options, b, z_handoff=2, updateable=True
    )
    assert os.path.exists(os.path.join(b, "_cascade", "base.done"))
    assert os.path.exists(os.path.join(b, "_cascade", "meta.json"))

    sa, sb = TileServer(a), TileServer(b)
    keys_a = sa.tile_keys()
    assert keys_a == sb.tile_keys() and len(keys_a) > 50
    for (z, x, y) in keys_a:
        ta, tb = sa.get_tile(z, x, y), sb.get_tile(z, x, y)
        assert ta["features"] == tb["features"], (z, x, y)
        assert (ta["numPoints"], ta["numSimplified"], ta["numFeatures"]) == (
            tb["numPoints"], tb["numSimplified"], tb["numFeatures"]
        ), (z, x, y)


def test_fast_update_add_parity_and_pruning(ray_session, tmp_path):
    from geojson_vt_ray.ray_pipeline.cascade import TileServer, write_pyramid_fast
    from geojson_vt_ray.ray_pipeline.incremental import incremental_update_pyramid

    options = TilerOptions(max_zoom=5)
    feats = [_point(1, 0.5, 0.5), _point(2, 100, 45), _point(4, 101, 44)]
    src = _rows(feats)
    out = str(tmp_path / "pyr")
    write_pyramid_fast(src, options, out, z_handoff=3, updateable=True)

    diff = {"add": [_point(3, 0.6, 0.6)]}
    res = incremental_update_pyramid(src, diff, options, out, z_handoff=3)
    assert res.get("fast_path") is True
    assert 0 < res["affected_subtrees"] <= 4

    _assert_serves_like_local(
        TileServer(out),
        feats + diff["add"],
        options,
        [(0, 0, 0), (2, 2, 1), (5, 16, 15), (3, 6, 2), (5, 24, 11)],
    )


def test_fast_update_sequential_compose(ray_session, tmp_path):
    """add → remove → geometry-update chained through the state patches:
    every step serves exactly what a full rebuild of the running patched
    source would, including removal of a feature ADDED by a prior fast
    update (resolved from the chain's added-map, not the base source)."""
    from geojson_vt_ray.ray_pipeline.cascade import TileServer, write_pyramid_fast
    from geojson_vt_ray.ray_pipeline.incremental import incremental_update_pyramid

    options = TilerOptions(max_zoom=5)
    feats = [_point(1, 0.5, 0.5), _point(2, 100, 45)]
    src = _rows(feats)
    out = str(tmp_path / "pyr")
    write_pyramid_fast(src, options, out, z_handoff=3, updateable=True)
    probes = [(0, 0, 0), (1, 1, 0), (3, 4, 3), (5, 16, 15), (5, 24, 11), (2, 3, 1)]

    r1 = incremental_update_pyramid(
        src, {"add": [_point(7, 0.7, 0.7)]}, options, out, z_handoff=3
    )
    assert r1.get("fast_path") is True
    state1 = feats + [_point(7, 0.7, 0.7)]
    _assert_serves_like_local(TileServer(out), state1, options, probes)

    # remove the feature the PREVIOUS update added
    r2 = incremental_update_pyramid(src, {"remove": [7]}, options, out, z_handoff=3)
    assert r2.get("fast_path") is True
    _assert_serves_like_local(TileServer(out), feats, options, probes)

    # geometry update of a base feature (replace semantics: moves to the end)
    r3 = incremental_update_pyramid(
        src,
        {"update": [{"id": 2, "newGeometry": {"type": "Point", "coordinates": [100.2, 45.1]}}]},
        options,
        out,
        z_handoff=3,
    )
    assert r3.get("fast_path") is True
    moved = {
        "type": "Feature",
        "id": 2,
        "geometry": {"type": "Point", "coordinates": [100.2, 45.1]},
        "properties": {},
    }
    _assert_serves_like_local(
        TileServer(out), [feats[0], moved], options, probes
    )


def test_fast_update_remove_only_feature_tombstones(ray_session, tmp_path):
    from geojson_vt_ray.ray_pipeline.cascade import TileServer, write_pyramid_fast
    from geojson_vt_ray.ray_pipeline.incremental import incremental_update_pyramid

    options = TilerOptions(max_zoom=4)
    feats = [_point(1, 0.5, 0.5), _point(2, 100, 45)]
    src = _rows(feats)
    out = str(tmp_path / "pyr")
    write_pyramid_fast(src, options, out, z_handoff=2, updateable=True)

    res = incremental_update_pyramid(src, {"remove": [2]}, options, out, z_handoff=2)
    assert res.get("fast_path") is True
    assert res["tombstones"] > 0
    _assert_serves_like_local(
        TileServer(out),
        [feats[0]],
        options,
        [(0, 0, 0), (2, 3, 1), (4, 12, 7), (1, 1, 0), (4, 8, 7)],
    )


def test_fast_update_us_states_region(ray_session, tmp_path):
    """A polygon diff over the us-states pyramid: fast path parity against
    the full local rebuild on probes inside AND outside the diff region."""
    import os

    from geojson_vt_ray.ray_pipeline.cascade import TileServer, write_pyramid_fast
    from geojson_vt_ray.ray_pipeline.incremental import incremental_update_pyramid
    from geojson_vt_ray.ray_pipeline.tiler import dataset_from_geojson

    with open(os.path.join(os.path.dirname(__file__), "fixtures", "us-states.json")) as f:
        gj = json.load(f)
    options = TilerOptions(max_zoom=6)
    out = str(tmp_path / "pyr")
    write_pyramid_fast(
        dataset_from_geojson(gj), options, out, z_handoff=3, updateable=True
    )
    rect = {
        "type": "Feature",
        "id": "upd-rect",
        "properties": {"name": "upd"},
        "geometry": {
            "type": "Polygon",
            "coordinates": [
                [[-101.2, 39.1], [-100.9, 39.1], [-100.9, 39.4], [-101.2, 39.4], [-101.2, 39.1]]
            ],
        },
    }
    res = incremental_update_pyramid(
        dataset_from_geojson(gj), {"add": [rect]}, options, out, z_handoff=3
    )
    assert res.get("fast_path") is True
    assert res["affected_subtrees"] <= 4

    _assert_serves_like_local(
        TileServer(out),
        gj["features"] + [rect],
        options,
        [(0, 0, 0), (2, 0, 1), (4, 3, 5), (6, 14, 24), (6, 17, 22), (5, 5, 11)],
    )
