"""MVT encoding: spec-pinned command streams + lossless round trips.

The encoder's contract is vt-pbf's (the serializer the reference README
points users at): transformed tile features in, MVT 2.1 bytes out.
Byte-level cases are pinned straight from the vector-tile-spec 2.1
examples; everything else is round-tripped through the from-scratch
decoder over real reference-fixture tiles.
"""

import json
import os

from geojson_vt_ray.kernels.mvt import (
    _geometry_commands,
    decode_tile,
    encode_layers,
    encode_tile,
)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def test_point_command_stream_matches_spec_example():
    # vector-tile-spec 2.1 §4.3.5.1: Point(25, 17) => [9, 50, 34]
    assert _geometry_commands(1, [[25, 17]]) == [9, 50, 34]


def test_multipoint_command_stream_matches_spec_example():
    # §4.3.5.2: MultiPoint(5,7),(3,2) => MoveTo count 2, deltas
    assert _geometry_commands(1, [[5, 7], [3, 2]]) == [17, 10, 14, 3, 9]


def test_polygon_command_stream_matches_spec_example():
    # §4.3.5.4: ring (3,6) (8,12) (20,34) closed =>
    # [MoveTo(3,6), LineTo(5,6),(12,22), ClosePath]
    ring = [[3, 6], [8, 12], [20, 34], [3, 6]]
    assert _geometry_commands(3, [ring]) == [9, 6, 12, 18, 10, 12, 24, 44, 15]


def test_linestring_cursor_persists_across_parts():
    # §4.3.5.3: two lines (2,2)-(2,10)-(10,10) and (1,1)-(3,5): the second
    # MoveTo is relative to the previous part's last point.
    geom = [[[2, 2], [2, 10], [10, 10]], [[1, 1], [3, 5]]]
    assert _geometry_commands(2, geom) == [
        9, 4, 4, 18, 0, 16, 16, 0, 9, 17, 17, 10, 4, 8,
    ]


def test_value_types_round_trip():
    feats = [
        {
            "type": 1,
            "tags": {
                "s": "name",
                "i": 7,
                "neg": -3,
                "f": 2.5,
                "b": True,
                "b2": False,
            },
            "geometry": [[10, 20]],
            "id": 42,
        }
    ]
    out = decode_tile(encode_layers({"L": {"features": feats, "extent": 4096}}))
    assert list(out) == ["L"]
    f = out["L"]["features"][0]
    assert out["L"]["extent"] == 4096
    assert f["id"] == 42
    assert f["tags"] == feats[0]["tags"]
    assert f["geometry"] == [[10, 20]]


def test_value_table_deduplicates():
    feats = [
        {"type": 1, "tags": {"a": "x", "b": "x"}, "geometry": [[0, 0]]},
        {"type": 1, "tags": {"a": "x"}, "geometry": [[1, 1]]},
    ]
    blob = encode_layers({"L": {"features": feats, "extent": 4096}})
    # one shared "x" value: the 3-byte value message appears exactly once
    assert blob.count(b"\x0a\x01x") == 1
    out = decode_tile(blob)
    assert [f["tags"] for f in out["L"]["features"]] == [
        {"a": "x", "b": "x"},
        {"a": "x"},
    ]


def _round_trip_features(transformed: list, extent: int = 4096) -> bytes:
    """Encode already-TRANSFORMED tile features (the `get_tile` output
    shape) and assert the decode reproduces them exactly."""
    blob = encode_tile({"features": transformed}, extent=extent)
    dec = decode_tile(blob)["geojsonvt"]
    assert dec["extent"] == extent
    assert len(dec["features"]) == len(transformed)
    for got, want in zip(dec["features"], transformed):
        assert got["type"] == want["type"]
        # null tag set and null-VALUED tags are both omitted (MVT has no null)
        want_tags = {k: v for k, v in (want["tags"] or {}).items() if v is not None}
        assert got["tags"] == want_tags
        assert got["geometry"] == want["geometry"]
        if isinstance(want.get("id"), int) and want["id"] >= 0:
            assert got["id"] == want["id"]
    return blob


def test_us_states_tiles_round_trip():
    from geojson_vt_ray.engine import LocalGeoJSONVT

    with open(os.path.join(FIXTURES, "us-states.json")) as f:
        vt = LocalGeoJSONVT(json.load(f))
    checked = 0
    for z, x, y in [(0, 0, 0), (2, 0, 1), (7, 37, 48), (9, 148, 192)]:
        tile = vt.get_tile(z, x, y)
        if tile is None:
            continue
        blob = _round_trip_features(tile["features"])
        assert len(blob) > 0
        checked += 1
    assert checked >= 2


def test_points_and_linemetrics_tiles_round_trip():
    from geojson_vt_ray.engine import LocalGeoJSONVT

    with open(os.path.join(FIXTURES, "single-geom.json")) as f:
        gj = json.load(f)
    vt = LocalGeoJSONVT(gj)
    tile = vt.get_tile(0, 0, 0)
    if tile is not None:
        _round_trip_features(tile["features"])


def test_empty_tile_encodes_valid_empty_layer():
    blob = encode_tile({"features": [], "z": 3, "x": 1, "y": 2})
    dec = decode_tile(blob)
    assert dec["geojsonvt"]["features"] == []


def test_codec_fuzz_round_trip():
    """Property fuzz: arbitrary feature sets survive encode→decode exactly
    (coords across the sint32 delta range, all tag value types, multi-part
    geometries, duplicate values across features)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    coord = st.integers(min_value=-100_000, max_value=100_000)
    point = st.tuples(coord, coord).map(list)
    tag_val = st.one_of(
        st.booleans(),
        st.integers(min_value=-(2**53), max_value=2**53),
        st.floats(allow_nan=False, allow_infinity=False, width=64),
        st.text(max_size=12),
    )
    tags = st.dictionaries(st.text(min_size=1, max_size=8), tag_val, max_size=5)

    def close(ring):
        return ring + [list(ring[0])]

    feature = st.one_of(
        st.builds(
            lambda pts, t: {"type": 1, "geometry": pts, "tags": t},
            st.lists(point, min_size=1, max_size=6),
            tags,
        ),
        st.builds(
            lambda parts, t: {"type": 2, "geometry": parts, "tags": t},
            st.lists(st.lists(point, min_size=2, max_size=6), min_size=1, max_size=3),
            tags,
        ),
        st.builds(
            lambda rings, t: {"type": 3, "geometry": [close(r) for r in rings], "tags": t},
            st.lists(st.lists(point, min_size=3, max_size=6), min_size=1, max_size=3),
            tags,
        ),
    )

    @settings(max_examples=150, deadline=None)
    @given(st.lists(feature, max_size=8))
    def check(feats):
        dec = decode_tile(encode_layers({"L": {"features": feats, "extent": 4096}}))
        got = dec["L"]["features"] if feats else dec.get("L", {"features": []})["features"]
        assert len(got) == len(feats)
        for g, w in zip(got, feats):
            assert g["type"] == w["type"]
            assert g["geometry"] == w["geometry"]
            assert g["tags"] == {k: v for k, v in w["tags"].items() if v is not None}

    check()


def test_one_shot_geojson_to_mvt():
    """The geoJSONToTile -> vt-pbf one-liner: bytes decode to the same
    features geojson_to_tile produces for that tile."""
    from geojson_vt_ray.engine.one_shot import geojson_to_mvt, geojson_to_tile

    from geojson_vt_ray.options import TilerOptions

    with open(os.path.join(FIXTURES, "us-states.json")) as f:
        gj = json.load(f)
    opts = TilerOptions(clip=True)  # the one-shot's clip is off by default
    want = geojson_to_tile(gj, 7, 37, 48, opts)["features"]
    dec = decode_tile(geojson_to_mvt(gj, 7, 37, 48, opts))["geojsonvt"]
    assert len(dec["features"]) == len(want) > 0
    for got, exp in zip(dec["features"], want):
        assert got["geometry"] == exp["geometry"]
        assert got["tags"] == {
            k: v for k, v in (exp["tags"] or {}).items() if v is not None
        }


def test_cluster_tiles_round_trip():
    """Supercluster tiles (cluster markers with point_count/cluster_id
    tags + leaf points) encode and decode losslessly — the other tile
    type a map server hands to renderers."""
    from geojson_vt_ray.cluster import ClusterIndex

    with open(os.path.join(FIXTURES, "places.json")) as f:
        places = json.load(f)
    idx = ClusterIndex()
    idx.load_geojson_points(places["features"])
    tile = idx.get_tile(0, 0, 0)
    assert tile is not None and len(tile["features"]) > 0
    assert any((f["tags"] or {}).get("cluster") for f in tile["features"])
    _round_trip_features(tile["features"], extent=512)


def test_mvt_join_layers_multilayer_tiles(ray_session):
    """Two pyramids merge into multi-layer tiles: every (z,x,y) in either
    source appears once, carrying exactly the layers whose source has that
    tile, each decoding to that source's stored features."""
    from geojson_vt_ray.datagen.rects import rect_geojson
    from geojson_vt_ray.options import TilerOptions
    from geojson_vt_ray.ray_pipeline.cascade import build_pyramid_fast
    from geojson_vt_ray.ray_pipeline.mvt_sink import mvt_join_layers
    from geojson_vt_ray.ray_pipeline.tiler import dataset_from_geojson

    with open(os.path.join(FIXTURES, "us-states.json")) as f:
        states_gj = json.load(f)
    opts = TilerOptions(max_zoom=3)
    states = build_pyramid_fast(
        dataset_from_geojson(states_gj), opts, z_handoff=1
    ).materialize()
    rects = build_pyramid_fast(
        dataset_from_geojson(rect_geojson(list(range(1, 40)))), opts, z_handoff=1
    ).materialize()

    out = mvt_join_layers({"states": states, "rects": rects}).to_pandas()

    def tile_map(ds):
        df = ds.to_pandas()
        return {
            (int(r.z), int(r.x), int(r.y)): json.loads(r.features_json)
            for r in df.itertuples(index=False)
        }

    want_states, want_rects = tile_map(states), tile_map(rects)
    assert set(zip(out.z, out.x, out.y)) == set(want_states) | set(want_rects)
    assert len(out) == len(set(want_states) | set(want_rects))
    both = multi = 0
    for r in out.itertuples(index=False):
        key = (int(r.z), int(r.x), int(r.y))
        dec = decode_tile(r.mvt)
        expect_layers = {n for n, m in (("states", want_states), ("rects", want_rects)) if key in m}
        assert set(dec) == expect_layers and r.num_layers == len(expect_layers)
        for name, want_map in (("states", want_states), ("rects", want_rects)):
            if key not in want_map:
                continue
            want = want_map[key]
            got = dec[name]["features"]
            assert len(got) == len(want)
            for g, w in zip(got, want):
                assert g["geometry"] == w["geometry"]
                assert g["tags"] == (w["tags"] or {})
        if len(expect_layers) == 2:
            multi += 1
        both += 1
    assert multi > 0  # the sources genuinely overlap somewhere


def test_tilejson_for_pyramid(ray_session):
    """TileJSON metadata: zoom range, bounds covering the data (computed
    from deepest-zoom tile coverage), and the tag field schema."""
    from geojson_vt_ray.options import TilerOptions
    from geojson_vt_ray.ray_pipeline.cascade import build_pyramid_fast
    from geojson_vt_ray.ray_pipeline.mvt_sink import tilejson_for_pyramid
    from geojson_vt_ray.ray_pipeline.tiler import dataset_from_geojson

    with open(os.path.join(FIXTURES, "us-states.json")) as f:
        gj = json.load(f)
    pyr = build_pyramid_fast(
        dataset_from_geojson(gj), TilerOptions(max_zoom=4), z_handoff=2
    )
    tj = tilejson_for_pyramid(pyr, name="states")
    assert tj["tilejson"] == "3.0.0"
    assert tj["minzoom"] == 0 and tj["maxzoom"] == 4
    west, south, east, north = tj["bounds"]
    assert west < -170 and east > -67  # Alaska through the east coast
    assert south < 25 and north > 70
    assert west < east and south < north
    (layer,) = tj["vector_layers"]
    assert layer["id"] == "states"
    assert layer["fields"] == {"name": "String", "density": "Number"}


def test_tile_server_serves_mvt(ray_session, tmp_path):
    """TileServer.get_tile_mvt returns bytes that decode to exactly the
    features get_tile serves; missing tiles return None."""
    from geojson_vt_ray.options import TilerOptions
    from geojson_vt_ray.ray_pipeline.cascade import TileServer, write_pyramid_fast
    from geojson_vt_ray.ray_pipeline.tiler import dataset_from_geojson

    with open(os.path.join(FIXTURES, "us-states.json")) as f:
        gj = json.load(f)
    out = str(tmp_path / "pyr")
    write_pyramid_fast(
        dataset_from_geojson(gj), TilerOptions(max_zoom=3), out, z_handoff=1
    )
    server = TileServer(out)
    checked = 0
    for z, x, y in [(0, 0, 0), (1, 0, 0), (2, 0, 1), (3, 1, 3)]:
        tile = server.get_tile(z, x, y)
        blob = server.get_tile_mvt(z, x, y)
        if tile is None:
            assert blob is None
            continue
        dec = decode_tile(blob)["geojsonvt"]
        assert len(dec["features"]) == len(tile["features"])
        for got, want in zip(dec["features"], tile["features"]):
            assert got["geometry"] == want["geometry"]
            assert got["tags"] == (want["tags"] or {})
        checked += 1
    assert checked >= 2
    assert server.get_tile_mvt(3, 0, 7) is None or isinstance(
        server.get_tile_mvt(3, 0, 7), bytes
    )


def test_mvt_tiles_ray_stage(ray_session):
    import ray.data

    from geojson_vt_ray.options import TilerOptions
    from geojson_vt_ray.ray_pipeline.cascade import build_pyramid_fast
    from geojson_vt_ray.ray_pipeline.mvt_sink import mvt_tiles
    from geojson_vt_ray.ray_pipeline.tiler import dataset_from_geojson

    with open(os.path.join(FIXTURES, "us-states.json")) as f:
        gj = json.load(f)
    pyramid = build_pyramid_fast(
        dataset_from_geojson(gj), TilerOptions(max_zoom=4), z_handoff=2
    )
    out = mvt_tiles(pyramid).to_pandas()
    src = pyramid.to_pandas()
    assert len(out) == len(src)
    assert set(out.columns) == {"z", "x", "y", "num_features", "mvt"}
    # every blob decodes back to exactly the stored (already-transformed)
    # tile features
    src_idx = {
        (r.z, r.x, r.y): r.features_json for r in src.itertuples(index=False)
    }
    checked = 0
    for r in out.itertuples(index=False):
        dec = decode_tile(r.mvt)["geojsonvt"]
        want = json.loads(src_idx[(r.z, r.x, r.y)])
        assert len(dec["features"]) == len(want) == r.num_features
        for got, exp in zip(dec["features"], want):
            assert got["geometry"] == exp["geometry"]
            assert got["tags"] == (exp["tags"] or {})
        checked += 1
    assert checked == len(out) and checked > 20


def test_unhashable_tag_values_encode_and_dedup():
    # GeoJSON properties routinely hold arrays/objects; they encode as
    # their stringified form (the _encode_value nested branch) and the
    # value table must dedup them without raising (ADVICE r4).
    feats = [
        {"type": 1, "tags": {"arr": [1, 2], "obj": {"k": 1}}, "geometry": [[0, 0]]},
        {"type": 1, "tags": {"arr": [1, 2]}, "geometry": [[1, 1]]},
    ]
    blob = encode_layers({"L": {"features": feats, "extent": 4096}})
    out = decode_tile(blob)["L"]["features"]
    assert out[0]["tags"] == {"arr": "[1, 2]", "obj": "{'k': 1}"}
    assert out[1]["tags"] == {"arr": "[1, 2]"}
    # shared "[1, 2]" string value appears once in the value table
    assert blob.count(b"[1, 2]") == 1


def test_decode_value_float32_wire_type():
    # spec Value.float_value (field 2, wire type 5): produced by external
    # encoders (tippecanoe); must parse as float32, not desync (ADVICE r4).
    import struct

    from geojson_vt_ray.kernels.mvt import _decode_value

    assert _decode_value(bytes([0x15]) + struct.pack("<f", 2.5)) == 2.5
    # trailing string field after the float still parses (no desync)
    payload = bytes([0x15]) + struct.pack("<f", 1.5) + b"\x0a\x02hi"
    assert _decode_value(payload) == "hi"


def test_decoder_skips_foreign_fixed_fields():
    # A foreign producer may attach fixed32/fixed64 fields at layer or
    # feature level; the decoder must skip them by wire type.
    import struct

    feats = [{"type": 1, "tags": {"a": 1}, "geometry": [[3, 4]]}]
    blob = bytearray(encode_layers({"L": {"features": feats, "extent": 4096}}))
    # splice an unknown layer-level fixed64 (field 13, wire 1) into the
    # layer payload: re-frame the outer message
    _, p0 = _read_varint_test(blob, 0)
    ln, p1 = _read_varint_test(blob, p0)
    layer = blob[p1 : p1 + ln] + bytes([(13 << 3) | 1]) + struct.pack("<d", 9.9)
    out = bytearray()
    out.append((3 << 3) | 2)
    v = len(layer)
    while v > 0x7F:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)
    out.extend(layer)
    dec = decode_tile(bytes(out))["L"]
    assert dec["features"][0]["tags"] == {"a": 1}
    assert dec["features"][0]["geometry"] == [[3, 4]]


def _read_varint_test(data, pos):
    out = 0
    shift = 0
    while True:
        b = data[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7
