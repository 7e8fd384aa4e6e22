"""Distributed incremental update: diff broadcast + affected-subtree rebuild."""

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


def test_apply_diff_dataset(ray_session):
    from geojson_vt_ray.ray_pipeline.incremental import apply_diff_dataset

    options = TilerOptions(max_zoom=4)
    src = _rows([_point(1, 0, 0), _point(2, 10, 10), _point(3, 20, 20)])
    patched, affected = apply_diff_dataset(
        src, {"remove": [2], "add": [_point(9, -10, -10)]}, options
    )
    ids = sorted(
        json.loads(r["feature_json"]).get("id") for r in patched.iter_rows()
    )
    assert ids == [1, 3, 9]
    # affected = removed old instance + added new instance
    assert sorted(f["id"] for f in affected) == [2, 9]


def test_affected_tile_keys_match_local_invalidation(ray_session):
    from geojson_vt_ray.engine import LocalGeoJSONVT
    from geojson_vt_ray.kernels.convert import convert_to_internal
    from geojson_vt_ray.ray_pipeline.incremental import affected_tile_keys

    options = TilerOptions(max_zoom=4, updateable=True)
    data = {"type": "FeatureCollection", "features": [_point(1, 0.5, 0.5), _point(2, 100, 45)]}
    vt = LocalGeoJSONVT(data, options)
    # drill everything
    for z in range(5):
        for x in range(1 << z):
            for y in range(1 << z):
                vt.get_tile(z, x, y)
    before = set(vt.index.tile_coords)

    moved = convert_to_internal(_point(1, 0.5, 0.5), options)
    keys = affected_tile_keys(moved, options.max_zoom, options)

    vt.index.invalidate_tiles(moved)
    after = set(vt.index.tile_coords)
    removed = before - after
    # the computed key set must cover every tile the engine invalidated
    assert removed <= keys


def test_incremental_update_pyramid(ray_session, tmp_path):
    from geojson_vt_ray.ray_pipeline.incremental import incremental_update_pyramid

    options = TilerOptions(max_zoom=3)
    src = _rows([_point(1, 0.5, 0.5), _point(2, 100, 45)])
    res = incremental_update_pyramid(
        src,
        {"add": [_point(3, 0.6, 0.6)]},
        options,
        str(tmp_path),
        z_handoff=1,
    )
    assert res["affected_tiles"] > 0
    import glob

    import pyarrow.parquet as pq

    rows = []
    for p in glob.glob(f"{res['update_dir']}/*.parquet"):
        rows.extend(pq.read_table(p).to_pylist())
    assert rows
    # the updated root tile contains all three points
    root = [r for r in rows if (r["z"], r["x"], r["y"]) == (0, 0, 0)]
    assert root and root[0]["num_features"] == 3


def test_incremental_update_overlay_and_pruning(ray_session, tmp_path):
    """End-to-end updateData -> getTile: base pyramid written, a diff applied
    incrementally, TileServer overlays the update; the drill only ran over
    affected hand-off subtrees and the served tiles match a full rebuild of
    the patched source."""
    import json as _json

    from geojson_vt_ray.engine import LocalGeoJSONVT
    from geojson_vt_ray.ray_pipeline.cascade import TileServer, write_pyramid_fast
    from geojson_vt_ray.ray_pipeline.incremental import incremental_update_pyramid

    options = TilerOptions(max_zoom=5)
    # two far-apart clusters: an update near (0.5, 0.5) must not touch the
    # subtree containing (100, 45)
    feats = [_point(1, 0.5, 0.5), _point(2, 100, 45), _point(4, 101, 44)]
    src = _rows(feats)
    out = str(tmp_path / "pyr")
    write_pyramid_fast(src, TilerOptions(max_zoom=5), out, z_handoff=3)

    diff = {"add": [_point(3, 0.6, 0.6)]}
    res = incremental_update_pyramid(src, diff, options, out, z_handoff=3)
    # pruning: far fewer subtrees than the 4^3 hand-off grid
    assert 0 < res["affected_subtrees"] <= 4

    # ground truth: local engine over the patched source
    patched = {
        "type": "FeatureCollection",
        "features": feats + diff["add"],
    }
    local = LocalGeoJSONVT(
        patched, options.with_(index_max_zoom=0, index_max_points=0)
    )
    server = TileServer(out)
    # updated region AND untouched region both serve correctly
    for (z, x, y) in ((0, 0, 0), (2, 2, 1), (5, 16, 15), (3, 6, 2), (5, 24, 11)):
        lt = local.get_tile(z, x, y)
        st = server.get_tile(z, x, y)
        if lt is None:
            assert st is None or st["features"] == []
        else:
            assert st is not None, (z, x, y)
            assert _json.loads(_json.dumps(st["features"])) == _json.loads(
                _json.dumps(lt["features"])
            ), (z, x, y)


def test_update_remove_writes_tombstones(ray_session, tmp_path):
    """Removing the only feature in a subtree must stop TileServer from
    serving the stale base tiles (reference: after updateData removes a
    feature, getTile no longer returns its tiles)."""
    import json as _json

    from geojson_vt_ray.engine import LocalGeoJSONVT
    from geojson_vt_ray.ray_pipeline.cascade import TileServer, write_pyramid_fast
    from geojson_vt_ray.ray_pipeline.incremental import incremental_update_pyramid

    options = TilerOptions(max_zoom=5)
    feats = [_point(1, 0.5, 0.5), _point(2, 100, 45), _point(4, 101, 44)]
    src = _rows(feats)
    out = str(tmp_path / "pyr")
    write_pyramid_fast(src, TilerOptions(max_zoom=5), out, z_handoff=3)

    base = TileServer(out)
    assert base.get_tile(5, 16, 15) is not None  # point 1 lives here

    res = incremental_update_pyramid(src, {"remove": [1]}, options, out, z_handoff=3)
    assert res["tombstones"] > 0

    server = TileServer(out)
    patched = {"type": "FeatureCollection", "features": feats[1:]}
    local = LocalGeoJSONVT(patched, options.with_(index_max_zoom=0, index_max_points=0))
    for (z, x, y) in ((0, 0, 0), (1, 0, 0), (3, 4, 3), (5, 16, 15), (5, 24, 11), (3, 6, 2)):
        lt = local.get_tile(z, x, y)
        st = server.get_tile(z, x, y)
        if lt is None:
            assert st is None or st["features"] == [], (z, x, y)
        else:
            assert st is not None, (z, x, y)
            assert _json.loads(_json.dumps(st["features"])) == _json.loads(
                _json.dumps(lt["features"])
            ), (z, x, y)


def test_compact_pyramid_updates(ray_session, tmp_path):
    """Compaction folds overlays into the base bins: served tiles identical,
    _updates removed, bins untouched by the diff never rewritten."""
    import glob
    import os

    from geojson_vt_ray.ray_pipeline.cascade import (
        TileServer,
        compact_pyramid_updates,
        write_pyramid_fast,
    )
    from geojson_vt_ray.ray_pipeline.incremental import incremental_update_pyramid

    options = TilerOptions(max_zoom=5)
    feats = [_point(1, 0.5, 0.5), _point(2, 100, 45), _point(4, 101, 44)]
    src = _rows(feats)
    out = str(tmp_path / "pyr")
    write_pyramid_fast(src, TilerOptions(max_zoom=5), out, z_handoff=3)

    incremental_update_pyramid(src, {"remove": [1]}, options, out, z_handoff=3)
    incremental_update_pyramid(
        _rows(feats[1:]), {"add": [_point(7, 0.7, 0.7)]}, options, out, z_handoff=3
    )

    overlaid = TileServer(out)
    probes = [
        (0, 0, 0), (1, 0, 0), (2, 2, 1), (3, 4, 3),
        (5, 16, 15), (5, 24, 11), (3, 6, 2), (4, 8, 7),
    ]
    expect = {p: overlaid.get_tile(*p) for p in probes}

    mtimes = {
        p: os.path.getmtime(p)
        for p in glob.glob(os.path.join(out, "bins", "skey=*", "*.parquet"))
    }
    stats = compact_pyramid_updates(out)
    assert stats["updates"] == 2
    assert not os.path.exists(os.path.join(out, "_updates"))

    compacted = TileServer(out)
    for p in probes:
        got = compacted.get_tile(*p)
        if expect[p] is None:
            assert got is None, p
        else:
            assert got == expect[p], p

    # bins the updates never touched keep their original part files
    touched = set(stats["bin_tiles"])
    for path, mt in mtimes.items():
        b = int(path.split("skey=")[1].split(os.sep)[0])
        if b not in touched:
            assert os.path.exists(path) and os.path.getmtime(path) == mt, path

    # idempotent no-op on a second call
    assert compact_pyramid_updates(out)["updates"] == 0


def test_apply_diff_recomputes_keys_under_different_promote_id(ray_session):
    """A dataset ingested without options (native-id keys) must not satisfy a
    promote_id diff with stale keys — the shim recomputes under the diff's
    options (the id-key column name encodes the extraction rule)."""
    from geojson_vt_ray.ray_pipeline.incremental import apply_diff_dataset
    from geojson_vt_ray.ray_pipeline.tiler import dataset_from_geojson

    feats = [_point(1, 0, 0), _point(2, 10, 10)]
    gj = {"type": "FeatureCollection", "features": feats}
    src = dataset_from_geojson(gj)  # ingested with options=None

    options = TilerOptions(max_zoom=4, promote_id="name")
    patched, affected = apply_diff_dataset(src, {"remove": ["p2"]}, options)
    names = sorted(
        json.loads(r["feature_json"])["properties"]["name"]
        for r in patched.iter_rows()
    )
    assert names == ["p1"]
    assert [f["id"] for f in affected] == ["p2"]


def test_apply_diff_integral_float_id_matches_int(ray_session):
    """JSON 'id': 1.0 and diff remove [1] are the same number (reference JS
    semantics; pre-key Python equality too)."""
    from geojson_vt_ray.ray_pipeline.incremental import apply_diff_dataset

    f = _point(1, 0, 0)
    f["id"] = 1.0
    src = _rows([f, _point(2, 10, 10)])
    patched, affected = apply_diff_dataset(src, {"remove": [1]}, TilerOptions(max_zoom=4))
    ids = [json.loads(r["feature_json"]).get("id") for r in patched.iter_rows()]
    assert ids == [2]
    assert len(affected) == 1


def test_apply_diff_upsert_keeps_schema_and_chains(ray_session):
    """Upsert rows must carry every id-key column of the source schema, so a
    second diff under DIFFERENT options still works on the unioned dataset
    (regression: schema-divergent union crashed the follow-up anti-join)."""
    from geojson_vt_ray.ray_pipeline.incremental import apply_diff_dataset
    from geojson_vt_ray.ray_pipeline.tiler import dataset_from_geojson

    gj = {"type": "FeatureCollection", "features": [_point(1, 0, 0), _point(2, 10, 10)]}
    src = dataset_from_geojson(gj)  # carries native fid_key

    promoted = TilerOptions(max_zoom=4, promote_id="name")
    added = _point(9, -10, -10)
    patched, _ = apply_diff_dataset(src, {"add": [added]}, promoted)
    cols = set(patched.schema().names)
    assert {"feature_json", "input_seq", "fid_key", "fid_key__promote_name"} <= cols

    # chain a second diff under NATIVE options on the unioned dataset
    patched2, affected2 = apply_diff_dataset(patched, {"remove": [9]}, TilerOptions(max_zoom=4))
    ids = sorted(json.loads(r["feature_json"]).get("id") for r in patched2.iter_rows())
    assert ids == [1, 2]
    assert [f["id"] for f in affected2] == [9]
