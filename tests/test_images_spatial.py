"""Image table invariants (input_hint) + spatial join oracles.

Per-row invariants: decoded-pixel exactness for `raw`, PSNR ≥ 40 dB for
`qlossy`, caption equality. Spatial joins are checked against brute-force
numpy oracles at test scale.
"""

import numpy as np
import pytest

from geojson_vt_ray.datagen.images import (
    caption_of_index,
    decode_image,
    encode_image,
    image_size,
    mercator_xy,
    phash_of_index,
    phash_of_index_vec,
    psnr,
    synth_image_row,
    synth_pixels,
    tile_xy,
)
from geojson_vt_ray.datagen.rects import rect_geojson, rect_table


def test_codec_raw_lossless():
    for i in (0, 1, 7, 1234):
        w, h = image_size(i)
        px = synth_pixels(i, w, h)
        assert np.array_equal(decode_image(encode_image(px, "raw")), px)


def test_codec_qlossy_psnr_bound():
    worst = np.inf
    for i in range(0, 200):
        w, h = image_size(i)
        px = synth_pixels(i, w, h)
        rec = decode_image(encode_image(px, "qlossy"))
        worst = min(worst, psnr(px, rec))
    assert worst >= 40.0, worst


def test_row_invariants():
    for i in (0, 5, 999):
        row = synth_image_row(i)
        assert row["image_id"] == f"img-{i:012d}"
        assert row["caption"] == caption_of_index(i)
        px = decode_image(row["bytes"])
        assert px.shape == (3, row["h"], row["w"])
        orig = synth_pixels(i, row["w"], row["h"])
        if row["fmt"] == "raw":
            assert np.array_equal(px, orig)
        else:
            assert psnr(orig, px) >= 40.0


def test_phash_vec_matches_scalar():
    idx = np.arange(1000)
    vec = phash_of_index_vec(idx)
    for i in (0, 1, 31, 999):
        assert vec[i] == phash_of_index(i)
        assert vec[i] >= 0  # fits int64


def test_tile_assignment_pure_integer():
    idx = np.arange(5000)
    ph = phash_of_index_vec(idx)
    mx, my = mercator_xy(ph)
    for z in (0, 4, 8, 14):
        x, y = tile_xy(ph, z)
        # matches floor(m * 2^z) exactly
        assert np.array_equal(x, np.floor(mx * (1 << z)).astype(np.int64))
        assert np.array_equal(y, np.floor(my * (1 << z)).astype(np.int64))
        assert x.max() < (1 << z) and y.max() < (1 << z)


def test_rect_join_matches_bruteforce(ray_session):
    from geojson_vt_ray.ray_pipeline.images import image_dataset
    from geojson_vt_ray.ray_pipeline.spatial import rect_contain_join

    n, nrects = 2000, 40
    rects = rect_table(np.arange(1, nrects + 1))
    images = image_dataset(n, with_bytes=False)
    got = {
        (r["image_id"], r["rect_id"])
        for r in rect_contain_join(images, rects).iter_rows()
    }

    ph = phash_of_index_vec(np.arange(n))
    mx, my = mercator_xy(ph)
    expected = set()
    for j in range(nrects):
        mask = (mx >= rects["x0"][j]) & (mx < rects["x1"][j]) & (my >= rects["y0"][j]) & (my < rects["y1"][j])
        for i in np.nonzero(mask)[0]:
            expected.add((f"img-{i:012d}", int(rects["rect_id"][j])))
    assert got == expected
    assert len(expected) > 0


def test_knn_matches_bruteforce(ray_session):
    from geojson_vt_ray.ray_pipeline.images import image_dataset
    from geojson_vt_ray.ray_pipeline.spatial import knn_join

    n, k = 1500, 5
    qidx = np.arange(0, n, 97)
    qph = phash_of_index_vec(qidx)
    images = image_dataset(n, with_bytes=False)
    out = knn_join(images, qph, qidx, k).to_pandas()

    ph = phash_of_index_vec(np.arange(n))
    mx, my = mercator_xy(ph)
    qmx, qmy = mercator_xy(qph)
    for qi, qid in enumerate(qidx):
        d2 = (mx - qmx[qi]) ** 2 + (my - qmy[qi]) ** 2
        order = sorted(range(n), key=lambda j: (d2[j], f"img-{j:012d}"))
        expect = [f"img-{j:012d}" for j in order if j != qid][:k]
        got = out[out["query_id"] == qid].sort_values(["d2", "neighbor_id"])["neighbor_id"].tolist()
        assert got == expect, qid


def test_pip_join_matches_bruteforce(ray_session):
    from geojson_vt_ray.options import TilerOptions
    from geojson_vt_ray.ray_pipeline.images import image_dataset
    from geojson_vt_ray.ray_pipeline.spatial import pip_join
    from geojson_vt_ray.ray_pipeline.tiler import build_tiles, dataset_from_geojson

    z = 4
    nrects = 25
    rects = rect_table(np.arange(1, nrects + 1))
    gj = rect_geojson(np.arange(1, nrects + 1))
    # slice with tolerance=0 (no simplification) so membership is exact
    opts = TilerOptions(max_zoom=z, tolerance=0.0)
    tiles = build_tiles(dataset_from_geojson(gj), opts, mode="pyramid").take_all()

    n = 3000
    images = image_dataset(n, with_bytes=False)
    got = {
        (r["image_id"], r["poly_id"])
        for r in pip_join(images, tiles, z, opts.extent).iter_rows()
    }

    ph = phash_of_index_vec(np.arange(n))
    mx, my = mercator_xy(ph)
    expected = set()
    for j in range(nrects):
        # rect polygons closed via unproject/project round trip: membership in
        # mercator space is the rectangle interior (even-odd on the rect ring)
        mask = (mx > rects["x0"][j]) & (mx < rects["x1"][j]) & (my > rects["y0"][j]) & (my < rects["y1"][j])
        for i in np.nonzero(mask)[0]:
            expected.add((f"img-{i:012d}", str(int(rects["rect_id"][j]))))
    missing = expected - got
    extra = got - expected
    # boundary-exact points may differ on the edge; interiors must match
    assert not missing, list(missing)[:5]
    assert not extra, list(extra)[:5]


def test_pip_join_world_flat_index_matches_bruteforce(ray_session):
    """pip_join_world (flat broadcast edge index) must agree with the exact
    rectangle-interior oracle: rect edges are axis-aligned and corners are
    exact dyadics, so world-space even-odd membership IS the open interior."""
    from geojson_vt_ray.ray_pipeline.images import image_dataset
    from geojson_vt_ray.ray_pipeline.spatial import (
        build_pip_edge_index,
        pip_join_world,
        slice_polygons_to_tiles,
    )
    from geojson_vt_ray.datagen.rects import rect_internal_features

    z = 4
    nrects = 25
    rects = rect_table(np.arange(1, nrects + 1))
    tile_polys = slice_polygons_to_tiles(
        rect_internal_features(np.arange(1, nrects + 1)), z
    )

    # the flat index must cover every edge of every tile exactly once
    idx = build_pip_edge_index(tile_polys)
    n_edges = sum(
        len(ring) - 1
        for polys in tile_polys.values()
        for _, rings in polys
        for ring in rings
    )
    assert len(idx["xs"]) == n_edges
    assert idx["edge_off"][-1] == n_edges
    assert len(idx["pids"]) == sum(len(p) for p in tile_polys.values())
    assert np.all(np.diff(idx["tkeys"].astype(np.uint64)) > 0)

    n = 3000
    images = image_dataset(n, with_bytes=False)
    got = {
        (r["image_id"], r["rect_id"])
        for r in pip_join_world(images, tile_polys, z).iter_rows()
    }

    ph = phash_of_index_vec(np.arange(n))
    mx, my = mercator_xy(ph)
    expected = set()
    for j in range(nrects):
        mask = (
            (mx > rects["x0"][j])
            & (mx < rects["x1"][j])
            & (my > rects["y0"][j])
            & (my < rects["y1"][j])
        )
        for i in np.nonzero(mask)[0]:
            expected.add((f"img-{i:012d}", int(rects["rect_id"][j])))
    assert got == expected
    assert len(expected) > 0


def test_read_image_table_parquet_and_schema_guard(ray_session, tmp_path):
    """read_image_table streams the Parquet twin of the Lance input_hint
    table with pushdown column pruning and fails loudly on schema drift."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from geojson_vt_ray.datagen.images import synth_image_table
    from geojson_vt_ray.ray_pipeline.images import read_image_table

    t = synth_image_table(np.arange(64), with_bytes=True)
    p = str(tmp_path / "images.parquet")
    pq.write_table(t, p)

    ds = read_image_table(p, columns=["image_id", "phash"])
    assert set(ds.schema().names) == {"image_id", "phash"}
    assert ds.count() == 64

    full = read_image_table(p)
    row = full.take(1)[0]
    assert {"image_id", "bytes", "w", "h", "fmt", "caption", "phash"} <= set(row)

    # schema drift: w stored as int64 must be rejected
    bad = t.set_column(
        t.schema.get_field_index("w"),
        "w",
        t.column("w").cast(pa.int64()),
    )
    pbad = str(tmp_path / "bad.parquet")
    pq.write_table(bad, pbad)
    with pytest.raises(TypeError, match="input_hint"):
        read_image_table(pbad)

    # a .lance path without the lance package is a clear ImportError
    with pytest.raises((ImportError, TypeError)):
        read_image_table(str(tmp_path / "images.lance"))
