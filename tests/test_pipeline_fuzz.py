"""Randomized cross-path equality: the distributed Ray pyramid must be
bit-identical to the local single-process engine on arbitrary geometry —
not just the curated fixture corpus. Hypothesis generates mixed
feature collections (points, multipoints, lines, polygons with holes,
degenerate slivers, dateline-crossers, polar extremes); every generated
world is built through BOTH paths and compared tile-for-tile.

Examples are capped small (pyramids are whole jobs), but each one
exercises convert → wrap → clip → simplify → tile assembly → transform
end to end through the production cascade.
"""

import json

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from geojson_vt_ray.options import TilerOptions


def _ring(cx, cy, r, n, rot):
    ang = rot + np.linspace(0.0, 2 * np.pi, n, endpoint=False)
    pts = [[cx + r * np.cos(a), cy + r * np.sin(a)] for a in ang]
    pts.append(pts[0])
    return [[round(x, 6), round(y, 6)] for x, y in pts]


coord = st.tuples(
    st.floats(min_value=-179.0, max_value=179.0),
    st.floats(min_value=-84.0, max_value=84.0),
)


@st.composite
def feature(draw):
    kind = draw(st.sampled_from(["point", "multipoint", "line", "polygon", "holed"]))
    cx, cy = draw(coord)
    if kind == "point":
        geom = {"type": "Point", "coordinates": [round(cx, 6), round(cy, 6)]}
    elif kind == "multipoint":
        k = draw(st.integers(2, 5))
        geom = {
            "type": "MultiPoint",
            "coordinates": [
                [round(cx + i * draw(st.floats(0.01, 3.0)), 6), round(cy, 6)]
                for i in range(k)
            ],
        }
    elif kind == "line":
        k = draw(st.integers(2, 8))
        step = draw(st.floats(0.05, 8.0))
        geom = {
            "type": "LineString",
            "coordinates": [
                [
                    round(min(179.0, cx + i * step), 6),
                    round(max(-84.0, min(84.0, cy + ((-1) ** i) * step * 0.3)), 6),
                ]
                for i in range(k)
            ],
        }
    else:
        r = draw(st.floats(0.01, 25.0))
        n = draw(st.integers(3, 9))
        rot = draw(st.floats(0.0, 3.0))
        rings = [_ring(cx, cy, r, n, rot)]
        if kind == "holed" and r > 0.1:
            rings.append(list(reversed(_ring(cx, cy, r * 0.4, max(3, n - 1), rot + 0.5))))
        geom = {"type": "Polygon", "coordinates": rings}
    return {"type": "Feature", "properties": {"k": kind}, "geometry": geom}


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(st.lists(feature(), min_size=1, max_size=8), st.integers(2, 4))
def test_cascade_matches_local_engine_on_random_geometry(
    ray_session, feats, max_zoom
):
    from geojson_vt_ray.engine import LocalGeoJSONVT, gen_tiles
    from geojson_vt_ray.ray_pipeline.tiler import gen_tiles_ray
    from tests.util import assert_deep_equal

    data = {"type": "FeatureCollection", "features": feats}
    options = TilerOptions(max_zoom=max_zoom)
    tiles = gen_tiles_ray(json.loads(json.dumps(data)), options, mode="pyramid")

    local = LocalGeoJSONVT(
        json.loads(json.dumps(data)),
        options.with_(index_max_zoom=0, index_max_points=0),
    )
    for key, got in tiles.items():
        z, x, y = (int(v) for v in key[1:].split("-"))
        lt = local.get_tile(z, x, y)
        assert lt is not None, key
        assert_deep_equal(got, lt["features"])

    # reverse direction: Ray must not silently DROP tiles (an empty tiles
    # dict would make the loop above pass vacuously)
    full_local = gen_tiles(
        json.loads(json.dumps(data)),
        options.with_(index_max_zoom=max_zoom, index_max_points=0),
    )
    assert set(full_local) == set(tiles)
