"""In-drill MVT emission (`build_pyramid_fast(emit_mvt=True)`) and the
vectorized encoder (`kernels/mvt_fast.py`): both must be BYTE-identical to
the scalar features_json → `mvt.encode_layers` path — the golden contract
VERDICT r4 task 2 pins (same blobs, no JSON round trip)."""

import json
import os

import pytest

from geojson_vt_ray.kernels.mvt import encode_layers
from geojson_vt_ray.kernels.mvt_fast import encode_layers_fast

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def _scalar_blob(features_json: str, extent: int = 4096) -> bytes:
    feats = json.loads(features_json) if features_json else []
    return encode_layers({"geojsonvt": {"features": feats, "extent": extent}})


@pytest.mark.parametrize(
    "fixture,max_zoom",
    [("us-states.json", 7), ("dateline.json", 6), ("single-geom.json", 4)],
)
def test_emit_mvt_byte_identical_to_json_path(ray_session, fixture, max_zoom):
    from geojson_vt_ray.options import TilerOptions
    from geojson_vt_ray.ray_pipeline.cascade import build_pyramid_fast
    from geojson_vt_ray.ray_pipeline.tiler import dataset_from_geojson

    with open(os.path.join(FIXTURES, fixture)) as f:
        gj = json.load(f)
    opts = TilerOptions(max_zoom=max_zoom, index_max_zoom=max_zoom)
    rows = (
        build_pyramid_fast(dataset_from_geojson(gj), opts, emit_mvt=True)
        .materialize()
        .take_all()
    )
    assert rows
    for r in rows:
        assert len(r["mvt"]) > 0  # even empty tiles carry a valid layer
        assert r["mvt"] == _scalar_blob(r["features_json"]), (r["z"], r["x"], r["y"])


def test_emit_mvt_with_ids_and_generate_id(ray_session):
    # feature ids flow through meta suffix parsing: int ids land in the MVT
    # id field, string ids are dropped (MVT ids are uint64) — exactly as
    # the features_json path does
    from geojson_vt_ray.options import TilerOptions
    from geojson_vt_ray.ray_pipeline.cascade import build_pyramid_fast
    from geojson_vt_ray.ray_pipeline.tiler import dataset_from_geojson

    gj = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "id": 7,
                "properties": {"kind": "a", "rank": 1.5},
                "geometry": {"type": "Point", "coordinates": [10.0, 20.0]},
            },
            {
                "type": "Feature",
                "id": "str-id",
                "properties": {"arr": [1, 2], "obj": {"k": "v"}},
                "geometry": {
                    "type": "LineString",
                    "coordinates": [[0.0, 0.0], [30.0, 10.0], [40.0, 15.0]],
                },
            },
        ],
    }
    opts = TilerOptions(max_zoom=3, index_max_zoom=3)
    rows = (
        build_pyramid_fast(dataset_from_geojson(gj), opts, emit_mvt=True)
        .materialize()
        .take_all()
    )
    assert rows
    for r in rows:
        assert r["mvt"] == _scalar_blob(r["features_json"]), (r["z"], r["x"], r["y"])


def test_encode_layers_fast_fuzz_byte_identical():
    """Property fuzz: the vectorized standalone encoder reproduces the
    scalar encoder byte-for-byte on arbitrary transformed features."""
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
        layers = {"L": {"features": feats, "extent": 4096}}
        assert encode_layers_fast(layers) == encode_layers(layers)

    check()


def test_encode_layers_fast_falls_back_on_degenerate_parts():
    # empty line part: the array builder rejects it; public entry point
    # must fall back to the scalar encoder, not crash or diverge
    feats = [{"type": 2, "geometry": [[]], "tags": {}}]
    layers = {"L": {"features": feats, "extent": 4096}}
    assert encode_layers_fast(layers) == encode_layers(layers)


def test_fill_mvt_completes_non_drill_rows(ray_session):
    import pyarrow as pa
    import ray.data

    from geojson_vt_ray.ray_pipeline.mvt_sink import fill_mvt

    fj = json.dumps(
        [{"type": 1, "tags": {"a": 1}, "geometry": [[100, 200]]}]
    )
    t = pa.table(
        {
            "z": pa.array([1, 1], pa.int16()),
            "x": pa.array([0, 1], pa.int32()),
            "y": pa.array([0, 1], pa.int32()),
            "features_json": pa.array([fj, "[]"], pa.string()),
            "mvt": pa.array([b"", b""], pa.binary()),
        }
    )
    out = fill_mvt(ray.data.from_arrow(t)).take_all()
    for r in out:
        assert r["mvt"] == _scalar_blob(r["features_json"])


def test_mvt_extent_validated():
    import ray.data

    from geojson_vt_ray.ray_pipeline.mvt_sink import mvt_join_layers, mvt_tiles

    with pytest.raises(ValueError):
        mvt_tiles(None, extent=0)
    with pytest.raises(ValueError):
        mvt_tiles(None, extent=4096.0)
    with pytest.raises(ValueError):
        mvt_join_layers({}, extent=-1)


def test_write_emit_mvt_serve_and_resume(ray_session, tmp_path):
    """emit_mvt pyramids: the stored blob is what TileServer serves (no
    re-encode), survives the per-bin kill/resume protocol, and equals the
    scalar encode of the served features — the task-8 storage→serving
    round trip."""
    import glob
    import os
    import shutil

    from geojson_vt_ray.options import TilerOptions
    from geojson_vt_ray.ray_pipeline.cascade import TileServer, write_pyramid_fast
    from geojson_vt_ray.ray_pipeline.tiler import dataset_from_geojson

    with open(os.path.join(FIXTURES, "us-states.json")) as f:
        data = json.load(f)
    opts = TilerOptions(max_zoom=5)
    out = str(tmp_path / "pyr_mvt")

    stats = write_pyramid_fast(
        dataset_from_geojson(data), opts, out, z_handoff=2, emit_mvt=True
    )
    assert stats["resumed"] is False

    # kill/resume over the same manifests the plain pyramid uses
    os.remove(os.path.join(out, "_pyramid.done"))
    bins = sorted(glob.glob(os.path.join(out, "bins", "skey=*")))
    k0 = int(os.path.basename(bins[0]).split("=")[1])
    os.remove(os.path.join(out, "_done", f"{k0}.done"))
    shutil.rmtree(bins[0])
    stats2 = write_pyramid_fast(
        dataset_from_geojson(data), opts, out, z_handoff=2, emit_mvt=True
    )
    assert stats2["resumed"] is True and stats2["tiles"] == stats["tiles"]

    server = TileServer(out)
    checked = 0
    for (z, x, y) in ((0, 0, 0), (2, 0, 1), (3, 2, 3), (5, 8, 11)):
        blob = server.get_tile_mvt(z, x, y)
        tile = server.get_tile(z, x, y)
        if tile is None:
            assert blob is None
            continue
        want = encode_layers(
            {"geojsonvt": {"features": tile["features"], "extent": 4096}}
        )
        assert blob == want
        # stored-blob path, not the re-encode fallback
        path = server._lookup(z, x, y)[0]
        assert path in server._mvt_cache and path not in server._no_mvt
        checked += 1
    assert checked >= 3


def test_copartitioned_join_matches_shuffle_join(ray_session, tmp_path):
    """`write_pyramid_pkey` + `mvt_join_layers_copartitioned` (zero
    shuffle) produce the SAME joined tiles, blob-for-blob, as the
    shuffle-based `mvt_join_layers` over the same two pyramids (round-5
    task 4)."""
    from geojson_vt_ray.datagen.rects import rect_geojson
    from geojson_vt_ray.options import TilerOptions
    from geojson_vt_ray.ray_pipeline.cascade import build_pyramid_fast
    from geojson_vt_ray.ray_pipeline.mvt_sink import (
        mvt_join_layers,
        mvt_join_layers_copartitioned,
        write_pyramid_pkey,
    )
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

    sdir = str(tmp_path / "layer_states")
    rdir = str(tmp_path / "layer_rects")
    assert write_pyramid_pkey(states, sdir, n_partitions=16) == {"n_partitions": 16}
    write_pyramid_pkey(rects, rdir, n_partitions=16)

    want = {
        (int(r.z), int(r.x), int(r.y)): (int(r.num_layers), r.mvt)
        for r in mvt_join_layers({"states": states, "rects": rects})
        .to_pandas()
        .itertuples(index=False)
    }
    got = {
        (int(r.z), int(r.x), int(r.y)): (int(r.num_layers), r.mvt)
        for r in mvt_join_layers_copartitioned({"states": sdir, "rects": rdir})
        .to_pandas()
        .itertuples(index=False)
    }
    assert got == want and len(got) > 20

    # misaligned partitioning must be rejected, not silently mis-joined
    bad = str(tmp_path / "layer_bad")
    write_pyramid_pkey(rects, bad, n_partitions=8)
    with pytest.raises(ValueError):
        mvt_join_layers_copartitioned({"states": sdir, "rects": bad}).count()
