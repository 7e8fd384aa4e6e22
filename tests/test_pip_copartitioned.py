"""Co-partitioned (both-sides-large) PIP join must agree with the
broadcast-side implementation on identical inputs."""

import numpy as np

from geojson_vt_ray.options import TilerOptions


def test_copartitioned_matches_broadcast(ray_session):
    from geojson_vt_ray.datagen.rects import rect_geojson
    from geojson_vt_ray.ray_pipeline.images import image_dataset
    from geojson_vt_ray.ray_pipeline.spatial import pip_join, pip_join_copartitioned
    from geojson_vt_ray.ray_pipeline.tiler import build_tiles, dataset_from_geojson

    z = 4
    gj = rect_geojson(np.arange(1, 21))
    opts = TilerOptions(max_zoom=z, tolerance=0.0)
    tiles_ds = build_tiles(dataset_from_geojson(gj), opts, mode="pyramid")
    tile_rows = tiles_ds.take_all()

    points = image_dataset(1500, with_bytes=False)

    broadcast = {
        (r["image_id"], r["poly_id"])
        for r in pip_join(points, tile_rows, z, opts.extent).iter_rows()
    }
    copart = {
        (r["image_id"], r["poly_id"])
        for r in pip_join_copartitioned(
            image_dataset(1500, with_bytes=False), tiles_ds, z
        ).iter_rows()
    }
    assert copart == broadcast
    assert len(broadcast) > 0


def test_copartitioned_skew_guard_blocked_equals_unblocked(ray_session):
    """Degenerate corpus (every point in one hot z-tile) must produce the
    identical pair set whether or not the tile_cap chunking kicks in."""
    import pyarrow as pa
    import ray

    from geojson_vt_ray.ray_pipeline.spatial import pip_join_copartitioned
    from geojson_vt_ray.ray_pipeline.tiler import build_tiles, dataset_from_geojson

    z = 2
    # one rectangle covering a quarter of the world => all its points share
    # few z2 tiles; points are forced into ONE tile by pinning phash bits
    gj = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "id": "hot-rect",
                "properties": {"name": "hot"},
                "geometry": {
                    "type": "Polygon",
                    "coordinates": [
                        [[-90.0, 0.0], [0.0, 0.0], [0.0, 66.0], [-90.0, 66.0], [-90.0, 0.0]]
                    ],
                },
            }
        ],
    }
    opts_tiles = build_tiles(
        dataset_from_geojson(gj),
        __import__("geojson_vt_ray.options", fromlist=["TilerOptions"]).TilerOptions(
            max_zoom=z, tolerance=0.0
        ),
        mode="pyramid",
    )

    # craft phashes landing inside the rect in MERCATOR space (the datagen
    # georeference rule: mx = lng_bits/2^32, my = lat_bits/2^31): rect spans
    # mx in (0.25, 0.5), my in (~0.285, 0.5) — park points well inside
    n = 600
    lng_bits = (np.arange(n, dtype=np.int64) * 1789 + 5) % (1 << 29) + int(0.30 * (1 << 32))
    lat_bits = (np.arange(n, dtype=np.int64) * 911 + 3) % (1 << 28) + int(0.32 * (1 << 31))
    phash = (lat_bits << 32) | lng_bits
    ids = [f"img-{i:012d}" for i in range(1, n + 1)]
    pts_tbl = pa.table({"image_id": pa.array(ids, pa.string()), "phash": pa.array(phash)})

    def pairs(cap: int) -> set:
        pts = ray.data.from_arrow(pts_tbl).repartition(4)
        return {
            (r["image_id"], r["poly_id"])
            for r in pip_join_copartitioned(pts, opts_tiles, z, tile_cap=cap).iter_rows()
        }

    unblocked = pairs(10**9)
    blocked = pairs(50)  # forces ceil(600/50)=12 chunks on the hot tiles
    assert blocked == unblocked
    assert len(unblocked) > 0


def test_copartitioned_fuzz_random_layers(ray_session):
    """Randomized equality fuzz: co-partitioned (with a low tile_cap so the
    skew guard is always active) vs broadcast PIP across random rectangle
    layers, point sets, and zoom levels."""
    import pyarrow as pa
    import ray

    from geojson_vt_ray.datagen.rects import rect_geojson
    from geojson_vt_ray.options import TilerOptions
    from geojson_vt_ray.ray_pipeline.images import image_dataset
    from geojson_vt_ray.ray_pipeline.spatial import pip_join, pip_join_copartitioned
    from geojson_vt_ray.ray_pipeline.tiler import build_tiles, dataset_from_geojson

    rs = np.random.RandomState(17)
    for trial in range(3):
        z = int(rs.choice([2, 3, 5]))
        keys = rs.choice(np.arange(1, 4000), size=30, replace=False)
        gj = rect_geojson(np.sort(keys))
        opts = TilerOptions(max_zoom=z, tolerance=0.0)
        tiles_ds = build_tiles(dataset_from_geojson(gj), opts, mode="pyramid")
        tile_rows = tiles_ds.take_all()
        n_pts = int(rs.choice([400, 900]))

        broadcast = {
            (r["image_id"], r["poly_id"])
            for r in pip_join(
                image_dataset(n_pts, with_bytes=False), tile_rows, z, opts.extent
            ).iter_rows()
        }
        copart = {
            (r["image_id"], r["poly_id"])
            for r in pip_join_copartitioned(
                image_dataset(n_pts, with_bytes=False), tiles_ds, z, tile_cap=25
            ).iter_rows()
        }
        assert copart == broadcast, (trial, z, n_pts)
