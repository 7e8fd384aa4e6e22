"""Full-pyramid fixture parity (reference `test/full.test.ts`).

Runs the 8 golden configurations through the local engine and compares every
indexed tile's transformed features against the committed reference goldens.
"""

import pytest

from geojson_vt_ray.engine import gen_tiles
from geojson_vt_ray.options import TilerOptions

from .conftest import load_fixture
from .util import assert_deep_equal

CASES = [
    ("us-states.json", "us-states-tiles.json", dict(index_max_zoom=7, index_max_points=200)),
    ("dateline.json", "dateline-tiles.json", dict(index_max_zoom=0, index_max_points=10000)),
    (
        "dateline.json",
        "dateline-metrics-tiles.json",
        dict(index_max_zoom=0, index_max_points=10000, line_metrics=True),
    ),
    ("feature.json", "feature-tiles.json", dict(index_max_zoom=0, index_max_points=10000)),
    ("collection.json", "collection-tiles.json", dict(index_max_zoom=0, index_max_points=10000)),
    ("single-geom.json", "single-geom-tiles.json", dict(index_max_zoom=0, index_max_points=10000)),
    ("ids.json", "ids-promote-id-tiles.json", dict(index_max_zoom=0, promote_id="prop0")),
    ("ids.json", "ids-generate-id-tiles.json", dict(index_max_zoom=0, generate_id=True)),
]


@pytest.mark.parametrize(
    "input_file,expected_file,opts", CASES, ids=[c[1].replace("-tiles.json", "") for c in CASES]
)
def test_full_tiling(input_file, expected_file, opts):
    data = load_fixture(input_file)
    expected = load_fixture(expected_file)
    tiles = gen_tiles(data, TilerOptions(**opts))
    assert set(tiles) == set(expected), (
        f"tile key sets differ: missing={sorted(set(expected) - set(tiles))[:5]} "
        f"extra={sorted(set(tiles) - set(expected))[:5]}"
    )
    for key in expected:
        assert_deep_equal(tiles[key], expected[key])


def test_invalid_geojson_type_throws():
    with pytest.raises(ValueError):
        gen_tiles({"type": "Pologon", "coordinates": [[-0.26, 51.45], [-0.26, 51.45]]})


@pytest.mark.parametrize(
    "name", ["empty.json", "feature-null-geometry.json", "empty-coords.json"]
)
def test_degenerate_inputs_produce_no_tiles(name):
    assert gen_tiles(load_fixture(name)) == {}
