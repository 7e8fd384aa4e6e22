"""Rasterizer correctness: scanline fill vs dense per-pixel-center PIP."""

import numpy as np

from geojson_vt_ray.ray_pipeline.raster import (
    decode_raster,
    encode_raster,
    rasterize_features,
)


def _brute_force_polygon(rings, extent, size):
    img = np.zeros((size, size), dtype=np.uint8)
    scale = extent / size
    for r in range(size):
        for c in range(size):
            px = (c + 0.5) * scale
            py = (r + 0.5) * scale
            inside = False
            for ring in rings:
                pts = np.asarray(ring, dtype=np.float64)
                a = pts
                b = np.roll(pts, -1, axis=0)
                cross = ((a[:, 1] > py) != (b[:, 1] > py)) & (
                    px < (b[:, 0] - a[:, 0]) * (py - a[:, 1]) / (b[:, 1] - a[:, 1]) + a[:, 0]
                )
                inside ^= bool(np.count_nonzero(cross) % 2)
            if inside:
                img[r, c] = 255
    return img


def test_polygon_fill_matches_bruteforce():
    extent, size = 4096, 64
    rings = [
        [[500, 500], [3500, 700], [3000, 3600], [800, 3200], [500, 500]],
        [[1500, 1500], [2500, 1600], [2300, 2500], [1500, 1500]],  # hole (even-odd)
    ]
    feats = [{"type": 3, "tags": None, "geometry": rings}]
    got = rasterize_features(feats, extent, size)
    want = _brute_force_polygon(rings, extent, size)
    assert np.array_equal(got, want)


def test_triangle_fill_matches_bruteforce():
    extent, size = 4096, 32
    rings = [[[0, 0], [4096, 0], [0, 4096], [0, 0]]]
    feats = [{"type": 3, "tags": None, "geometry": rings}]
    got = rasterize_features(feats, extent, size)
    want = _brute_force_polygon(rings, extent, size)
    assert np.array_equal(got, want)


def test_points_and_lines_marked():
    extent, size = 4096, 64
    feats = [
        {"type": 1, "tags": None, "geometry": [[100, 100], [4000, 4000]]},
        {"type": 2, "tags": None, "geometry": [[[0, 0], [4095, 4095]]]},
    ]
    img = rasterize_features(feats, extent, size)
    assert img[1, 1] == 255  # point at 100/64
    assert img[62, 62] == 255
    assert np.count_nonzero(img) >= 64  # diagonal line touches every row


def test_raster_codec_round_trip():
    img = (np.arange(64 * 64) % 251).astype(np.uint8).reshape(64, 64)
    assert np.array_equal(decode_raster(encode_raster(img)), img)


def test_rasterize_tiles_dataset(ray_session):
    import json as _json

    from geojson_vt_ray.options import TilerOptions
    from geojson_vt_ray.ray_pipeline.raster import rasterize_tiles
    from geojson_vt_ray.ray_pipeline.tiler import build_tiles, dataset_from_geojson

    from .conftest import load_fixture

    data = load_fixture("us-states.json")
    tiles = build_tiles(dataset_from_geojson(data), TilerOptions(max_zoom=2), mode="pyramid")
    rasters = rasterize_tiles(tiles, size=64).take_all()
    assert len(rasters) > 5
    by_key = {(r["z"], r["x"], r["y"]): r for r in rasters}
    root = by_key[(0, 0, 0)]
    img = decode_raster(root["raster"])
    assert img.shape == (64, 64)
    assert 0.0 < root["coverage"] < 1.0  # the US covers some but not all of the world


def test_vectorize_mask_roundtrip_fuzz():
    """raster -> vector -> raster is bit-exact for arbitrary masks, including
    checkerboards and corner-touching regions (even-odd parity depends only
    on the union of boundary edges)."""
    from geojson_vt_ray.ray_pipeline.raster import vectorize_mask

    rng = np.random.default_rng(1234)
    for _ in range(25):
        size = int(rng.integers(2, 33))
        img = (rng.random((size, size)) < rng.uniform(0.1, 0.9)).astype(np.uint8) * 255
        rings = vectorize_mask(img)
        feats = [{"type": 3, "geometry": rings, "tags": {}}] if rings else []
        back = rasterize_features(feats, extent=size, size=size)
        assert np.array_equal(back != 0, img != 0)
    for size in (2, 3, 16):
        img = (np.indices((size, size)).sum(axis=0) % 2).astype(np.uint8) * 255
        rings = vectorize_mask(img)
        back = rasterize_features(
            [{"type": 3, "geometry": rings, "tags": {}}], extent=size, size=size
        )
        assert np.array_equal(back != 0, img != 0)


def test_vectorize_tiles_roundtrip_pyramid(ray_session):
    """Full pipeline: vector tiles -> rasterize_tiles -> vectorize_tiles ->
    re-rasterize per row reproduces every tile's mask exactly, at a
    non-trivial extent/size ratio."""
    import json as _json

    from geojson_vt_ray.options import TilerOptions
    from geojson_vt_ray.ray_pipeline.raster import (
        rasterize_tiles,
        vectorize_mask,
        vectorize_tiles,
    )
    from geojson_vt_ray.ray_pipeline.tiler import build_tiles, dataset_from_geojson

    gj = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "geometry": {
                    "type": "Polygon",
                    "coordinates": [
                        [[-60, -40], [70, -35], [50, 55], [-70, 40], [-60, -40]],
                        [[-20, -10], [25, -5], [15, 20], [-20, -10]],
                    ],
                },
                "properties": {},
            }
        ],
    }
    tiles = build_tiles(dataset_from_geojson(gj), TilerOptions(max_zoom=2), mode="pyramid")
    rasters = rasterize_tiles(tiles, size=32).materialize()
    vec = {
        (r["z"], r["x"], r["y"]): r["features_json"]
        for r in vectorize_tiles(rasters, size=32).iter_rows()
    }
    checked = 0
    for row in rasters.iter_rows():
        from geojson_vt_ray.ray_pipeline.raster import decode_raster

        img = decode_raster(row["raster"])
        feats = _json.loads(vec[(row["z"], row["x"], row["y"])])
        back = rasterize_features(feats, extent=4096, size=32)
        assert np.array_equal(back != 0, img != 0), (row["z"], row["x"], row["y"])
        checked += 1
    assert checked > 4
