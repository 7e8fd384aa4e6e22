"""Debug stats parity: local engine counters vs reference semantics and the
distributed pyramid_stats aggregate."""
import json
import pytest

from geojson_vt_ray.options import TilerOptions
from .conftest import load_fixture


def test_local_stats_counts_created_tiles():
    from geojson_vt_ray.engine import LocalGeoJSONVT

    data = load_fixture("us-states.json")
    opts = TilerOptions(max_zoom=4, index_max_zoom=0, index_max_points=0, debug=1)
    vt = LocalGeoJSONVT(data, opts)
    # full pyramid built at init: stats must equal tile_coords per zoom
    from collections import Counter
    per_z = Counter(z for (z, x, y) in vt.index.tile_coords)
    assert vt.stats == {f"z{z}": n for z, n in per_z.items()}
    assert vt.total == len(vt.index.tile_coords)

    # invalidation decrements (reference `src/tile-index.ts:291-294`)
    opts2 = TilerOptions(max_zoom=3, updateable=True, debug=1)
    vt2 = LocalGeoJSONVT({"type": "FeatureCollection", "features": [
        {"type": "Feature", "id": 1, "geometry": {"type": "Point", "coordinates": [0.5, 0.5]}, "properties": {}},
    ]}, opts2)
    for z in range(4):
        for x in range(1 << z):
            for y in range(1 << z):
                vt2.get_tile(z, x, y)
    before = vt2.total
    vt2.update_data({"remove": [1]})
    assert vt2.total < before
    assert vt2.total == len(vt2.index.tile_coords)


def test_pyramid_stats_matches_local(ray_session):
    from geojson_vt_ray.engine import LocalGeoJSONVT
    from geojson_vt_ray.ray_pipeline.cascade import build_pyramid_fast, pyramid_stats
    from geojson_vt_ray.ray_pipeline.tiler import dataset_from_geojson

    data = load_fixture("us-states.json")
    opts = TilerOptions(max_zoom=5)
    tiles = build_pyramid_fast(dataset_from_geojson(data), opts, z_handoff=2)
    got = pyramid_stats(tiles)

    # drill the local engine fully; its stats count created (non-empty) tiles
    local = LocalGeoJSONVT(data, opts.with_(index_max_zoom=0, index_max_points=0, debug=1))
    for z in range(6):
        for x in range(1 << z):
            for y in range(1 << z):
                local.get_tile(z, x, y)
    assert got["stats"] == local.stats
    assert got["total"] == local.total
    # counter sums match the local engine's tiles
    pts = {z: 0 for z in range(6)}
    for (z, x, y) in local.index.tile_coords:
        pts[z] += local.index.tiles[__import__("geojson_vt_ray.engine.local_index", fromlist=["tile_id"]).tile_id(z, x, y)]["numPoints"]
    for z, info in got["per_zoom"].items():
        assert info["points"] == pts[z]
