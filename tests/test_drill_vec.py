"""Batched subtree drill must be bit-identical to the scalar drill.

Fuzz: random GeoJSON of every geometry class goes through convert + wrap,
then both drill paths emit the full subtree of a tile; every output column
(including the serialized features_json strings) must match exactly.
"""

import json

import numpy as np
import pytest

from geojson_vt_ray.kernels.convert import convert_to_internal
from geojson_vt_ray.kernels.drill_vec import drill_subtree_vec
from geojson_vt_ray.kernels.tile import create_tile, transform_tile_features
from geojson_vt_ray.kernels.wrap import wrap
from geojson_vt_ray.options import TilerOptions
from geojson_vt_ray.ray_pipeline.cascade import TileRowBuilder, _drill_subtree


def _rand_coords(rs, n, lon0, lat0, span):
    return [
        [float(lon0 + rs.uniform(0, span)), float(lat0 + rs.uniform(0, span))]
        for _ in range(n)
    ]


def _rand_feature(rs, i):
    lon0 = rs.uniform(-170, 120)
    lat0 = rs.uniform(-70, 60)
    span = rs.uniform(0.5, 40)
    kind = rs.randint(6)
    if kind == 0:
        geom = {"type": "Point", "coordinates": _rand_coords(rs, 1, lon0, lat0, span)[0]}
    elif kind == 1:
        geom = {"type": "MultiPoint", "coordinates": _rand_coords(rs, rs.randint(1, 6), lon0, lat0, span)}
    elif kind == 2:
        geom = {"type": "LineString", "coordinates": _rand_coords(rs, rs.randint(2, 30), lon0, lat0, span)}
    elif kind == 3:
        geom = {
            "type": "MultiLineString",
            "coordinates": [
                _rand_coords(rs, rs.randint(2, 15), lon0, lat0, span)
                for _ in range(rs.randint(1, 4))
            ],
        }
    elif kind == 4:
        ring = _rand_coords(rs, rs.randint(3, 25), lon0, lat0, span)
        ring.append(ring[0])
        hole = _rand_coords(rs, 4, lon0 + span / 4, lat0 + span / 4, span / 4)
        hole.append(hole[0])
        rings = [ring] + ([hole] if rs.rand() < 0.5 else [])
        geom = {"type": "Polygon", "coordinates": rings}
    else:
        polys = []
        for _ in range(rs.randint(1, 3)):
            ring = _rand_coords(rs, rs.randint(3, 15), lon0, lat0, span)
            ring.append(ring[0])
            polys.append([ring])
        geom = {"type": "MultiPolygon", "coordinates": polys}
    props = {"name": f"f{i}", "v": float(rs.uniform(-5, 5))}
    f = {"type": "Feature", "geometry": geom, "properties": props}
    if rs.rand() < 0.5:
        f["id"] = int(rs.randint(1000))
    return f


def _rows(builder):
    t = builder.table()
    cols = [
        "z", "x", "y", "features_json", "num_points", "num_simplified",
        "num_features", "min_seq", "max_seq",
    ]
    d = {c: t.column(c).to_pylist() for c in cols}
    return sorted(zip(*[d[c] for c in cols]))


@pytest.mark.parametrize("seed", range(25))
def test_drill_vec_matches_scalar_fuzz(seed):
    rs = np.random.RandomState(seed)
    options = TilerOptions(
        max_zoom=int(rs.choice([4, 5, 6])),
        buffer=int(rs.choice([0, 64, 2048])),
        tolerance=float(rs.choice([0.0, 3.0, 6.0])),
        extent=4096,
    ).validate()
    fc = {
        "type": "FeatureCollection",
        "features": [_rand_feature(rs, i) for i in range(rs.randint(2, 12))],
    }
    internal = wrap(convert_to_internal(fc, options), options)
    features = [(bytes([i]), f) for i, f in enumerate(internal)]

    o1 = TileRowBuilder()
    tile = create_tile([f for _, f in features], 0, 0, 0, options)
    o1.add_tile(
        tile,
        json.dumps(transform_tile_features(tile, options.extent)),
        features[0][0] if features else b"",
        features[-1][0] if features else b"",
    )
    if features and 0 < options.max_zoom:
        _drill_subtree(o1, features, 0, 0, 0, tile, options)

    o2 = TileRowBuilder()
    drill_subtree_vec(o2, features, 0, 0, 0, options, emit_root=True)

    r1, r2 = _rows(o1), _rows(o2)
    assert len(r1) == len(r2)
    for a, b in zip(r1, r2):
        assert a == b, (a[:3], b[:3])


def test_drill_vec_matches_scalar_us_states(fixtures):
    data = fixtures("us-states.json")
    options = TilerOptions(max_zoom=7).validate()
    internal = wrap(convert_to_internal(data, options), options)
    features = [(i.to_bytes(4, "big"), f) for i, f in enumerate(internal)]

    o1 = TileRowBuilder()
    tile = create_tile([f for _, f in features], 0, 0, 0, options)
    o1.add_tile(
        tile, json.dumps(transform_tile_features(tile, options.extent)),
        features[0][0], features[-1][0],
    )
    _drill_subtree(o1, features, 0, 0, 0, tile, options)

    o2 = TileRowBuilder()
    drill_subtree_vec(o2, features, 0, 0, 0, options, emit_root=True)
    assert _rows(o1) == _rows(o2)


def test_drill_forest_matches_per_root(fixtures):
    """A forest of mixed-zoom roots (incl. an empty one) must emit exactly
    the union of the per-root drills."""
    from geojson_vt_ray.kernels.clip import AXIS_X, AXIS_Y, clip
    from geojson_vt_ray.kernels.drill_vec import drill_forest_vec

    data = fixtures("us-states.json")
    options = TilerOptions(max_zoom=8).validate()
    internal = wrap(convert_to_internal(data, options), options)
    feats = [(i.to_bytes(4, "big"), f) for i, f in enumerate(internal)]

    # build disjoint roots: z2 tiles by clipping the world, plus one z3 root
    def tile_feats(fs, z, x, y):
        z2 = 1 << z
        k1 = 0.5 * options.buffer / options.extent
        out = []
        for seq, f in fs:
            a = clip([f], z2, x - k1, x + 1 + k1, AXIS_X, f["minX"], f["maxX"], False)
            if not a:
                continue
            b = clip(a, z2, y - k1, y + 1 + k1, AXIS_Y, f["minY"], f["maxY"], False)
            if b:
                out.append((seq, b[0]))
        return out

    roots = []
    for (z, x, y) in ((2, 0, 1), (2, 1, 1), (3, 2, 3)):
        roots.append((tile_feats(feats, z, x, y), z, x, y))
    roots.append(([], 2, 3, 3))  # marker-only root

    o_forest = TileRowBuilder()
    drill_forest_vec(o_forest, roots, options, emit_roots=True)

    o_single = TileRowBuilder()
    for fs, z, x, y in roots:
        if fs:
            drill_subtree_vec(o_single, fs, z, x, y, options, emit_root=True)
        else:
            o_single.add_tiles_bulk(z, [x], [y], [((1 << z) * y + x) * 32 + z],
                                    ["[]"], [0], [0], [0], [b""], [b""])
    assert _rows(o_forest) == _rows(o_single)
