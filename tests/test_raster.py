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
