"""Fast-pyramid (cascade + hand-off drill) parity with the per-level groupby
pyramid and the local engine."""

import json

from geojson_vt_ray.options import TilerOptions

from .conftest import load_fixture


def _tiles_dict(ds):
    return {
        (r["z"], r["x"], r["y"]): (
            json.loads(r["features_json"]),
            r["num_points"],
            r["num_simplified"],
            r["num_features"],
        )
        for r in ds.iter_rows()
    }


def test_fast_pyramid_matches_bfs_pyramid(ray_session):
    from geojson_vt_ray.ray_pipeline.cascade import build_pyramid_fast
    from geojson_vt_ray.ray_pipeline.tiler import build_tiles, dataset_from_geojson

    data = load_fixture("us-states.json")
    opts = TilerOptions(max_zoom=6)

    a = _tiles_dict(build_tiles(dataset_from_geojson(data), opts, mode="pyramid"))
    # exercise all three paths: cascade levels, heavy re-split, local drill
    b = _tiles_dict(
        build_pyramid_fast(
            dataset_from_geojson(data), opts, z_handoff=3, heavy_threshold=500
        )
    )
    assert set(a) == set(b)
    assert all(a[k] == b[k] for k in a)

    # single-pass mode (no heavy loop)
    c = _tiles_dict(
        build_pyramid_fast(dataset_from_geojson(data), opts, z_handoff=4)
    )
    assert set(a) == set(c)
    assert all(a[k] == c[k] for k in a)


def test_fast_pyramid_chunked_heavy_tiles(ray_session):
    """Force the heavy-tile chunked drill (tiny chunk_threshold) — output
    must be identical to the unchunked single-pass drill."""
    from geojson_vt_ray.ray_pipeline import cascade as cas
    from geojson_vt_ray.ray_pipeline.tiler import dataset_from_geojson

    data = load_fixture("us-states.json")
    rep = {"type": "FeatureCollection", "features": data["features"] * 2}
    opts = TilerOptions(max_zoom=6)

    a = _tiles_dict(cas.build_pyramid_fast(dataset_from_geojson(rep), opts, z_handoff=3))
    b = _tiles_dict(
        cas.build_pyramid_fast(
            dataset_from_geojson(rep), opts, z_handoff=3, chunk_threshold=30.0
        )
    )

    assert set(a) == set(b)
    bad = [k for k in a if a[k] != b[k]]
    assert not bad, bad[:5]


def test_fast_pyramid_replicated_input(ray_session):
    """Replicated input (the bench shape): same tile keys, n x the features."""
    from geojson_vt_ray.ray_pipeline.cascade import build_pyramid_fast
    from geojson_vt_ray.ray_pipeline.tiler import dataset_from_geojson

    data = load_fixture("us-states.json")
    rep = {"type": "FeatureCollection", "features": data["features"] * 2}
    opts = TilerOptions(max_zoom=4)

    single = _tiles_dict(build_pyramid_fast(dataset_from_geojson(data), opts, z_handoff=2))
    double = _tiles_dict(build_pyramid_fast(dataset_from_geojson(rep), opts, z_handoff=2))
    assert set(single) == set(double)
    for k, (feats, np_, ns, nf) in single.items():
        dfeats, dnp, dns, dnf = double[k]
        assert dnp == 2 * np_ and dns == 2 * ns and dnf == 2 * nf
        assert len(dfeats) == 2 * len(feats)
