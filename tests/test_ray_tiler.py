"""Ray Data pipeline parity: the distributed tiler must equal the reference
fixtures (index mode) and the local engine's full drill-down (pyramid mode)."""

import json

import pytest

from geojson_vt_ray.engine import LocalGeoJSONVT, gen_tiles
from geojson_vt_ray.options import TilerOptions

from .conftest import load_fixture
from .util import assert_deep_equal


@pytest.mark.parametrize(
    "input_file,expected_file,opts",
    [
        ("us-states.json", "us-states-tiles.json", dict(index_max_zoom=7, index_max_points=200)),
        ("dateline.json", "dateline-tiles.json", dict(index_max_zoom=0, index_max_points=10000)),
        (
            "dateline.json",
            "dateline-metrics-tiles.json",
            dict(index_max_zoom=0, index_max_points=10000, line_metrics=True),
        ),
        ("ids.json", "ids-generate-id-tiles.json", dict(index_max_zoom=0, generate_id=True)),
    ],
    ids=["us-states", "dateline", "dateline-metrics", "ids-generate"],
)
def test_ray_index_mode_matches_fixtures(ray_session, input_file, expected_file, opts):
    from geojson_vt_ray.ray_pipeline.tiler import gen_tiles_ray

    data = load_fixture(input_file)
    expected = load_fixture(expected_file)
    tiles = gen_tiles_ray(data, TilerOptions(**opts), mode="index")
    assert set(tiles) == set(expected)
    for key in expected:
        assert_deep_equal(tiles[key], expected[key])


def test_ray_pyramid_matches_local_drilldown(ray_session):
    """Pyramid mode = every tile the local engine would serve via getTile."""
    from geojson_vt_ray.ray_pipeline.tiler import gen_tiles_ray

    data = load_fixture("us-states.json")
    options = TilerOptions(max_zoom=6)

    tiles = gen_tiles_ray(data, options, mode="pyramid")

    # local engine: drill every tile that exists
    local = LocalGeoJSONVT(data, options.with_(index_max_zoom=0, index_max_points=0))
    # force full drill-down by querying every tile the Ray run produced,
    # then compare feature dumps
    assert len(tiles) > 100
    for key, feats in tiles.items():
        z, x, y = (int(v) for v in key[1:].split("-"))
        lt = local.get_tile(z, x, y)
        assert lt is not None, key
        assert_deep_equal(feats, lt["features"])

    # and the local index should not know tiles Ray missed: every local tile
    # with features must exist in the Ray output
    full_local = gen_tiles(data, options.with_(index_max_zoom=6, index_max_points=0))
    assert set(full_local) == set(tiles)
    for key in full_local:
        assert_deep_equal(tiles[key], full_local[key])
