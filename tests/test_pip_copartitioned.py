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
