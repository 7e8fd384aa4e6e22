"""Resumable pyramid sink + read-side tile server."""

from geojson_vt_ray.options import TilerOptions

from .conftest import load_fixture
from .util import assert_deep_equal


def test_write_pyramid_fast_and_serve(ray_session, tmp_path):
    from geojson_vt_ray.engine import LocalGeoJSONVT
    from geojson_vt_ray.ray_pipeline.cascade import TileServer, write_pyramid_fast
    from geojson_vt_ray.ray_pipeline.tiler import dataset_from_geojson

    data = load_fixture("us-states.json")
    opts = TilerOptions(max_zoom=4)
    out = str(tmp_path / "pyr")

    stats = write_pyramid_fast(dataset_from_geojson(data), opts, out, z_handoff=2)
    assert stats["resumed"] is False
    assert stats["tiles"] > 50

    # resume skips the whole run
    stats2 = write_pyramid_fast(dataset_from_geojson(data), opts, out, z_handoff=2)
    assert stats2 == {"tiles": stats["tiles"], "resumed": True}

    server = TileServer(out)
    local = LocalGeoJSONVT(data, opts.with_(index_max_zoom=0, index_max_points=0))
    for (z, x, y) in ((0, 0, 0), (2, 0, 1), (4, 4, 6), (3, -5, 2)):
        lt = local.get_tile(z, x, y)
        st = server.get_tile(z, x, y)
        if lt is None:
            assert st is None or st["features"] == []
        else:
            assert st is not None, (z, x, y)
            assert_deep_equal(st["features"], lt["features"])
            assert st["numPoints"] == lt["numPoints"]


def test_write_pyramid_fast_per_bin_resume(ray_session, tmp_path):
    import glob
    import os
    import shutil

    from geojson_vt_ray.ray_pipeline.cascade import TileServer, write_pyramid_fast
    from geojson_vt_ray.ray_pipeline.tiler import dataset_from_geojson

    data = load_fixture("us-states.json")
    opts = TilerOptions(max_zoom=5)
    out = str(tmp_path / "pyr")

    stats = write_pyramid_fast(dataset_from_geojson(data), opts, out, z_handoff=2)
    assert stats["resumed"] is False

    # simulate a killed run: overall manifest missing, two bins incomplete
    # (one partial dir without marker, one marker+dir both gone)
    os.remove(os.path.join(out, "_pyramid.done"))
    bins = sorted(glob.glob(os.path.join(out, "bins", "skey=*")))
    assert len(bins) >= 3
    k0 = int(os.path.basename(bins[0]).split("=")[1])
    k1 = int(os.path.basename(bins[1]).split("=")[1])
    os.remove(os.path.join(out, "_done", f"{k0}.done"))  # partial: dir stays
    os.remove(os.path.join(out, "_done", f"{k1}.done"))
    shutil.rmtree(bins[1])
    untouched = {
        p: os.path.getmtime(p)
        for p in glob.glob(os.path.join(out, "bins", "skey=*", "*.parquet"))
        if f"skey={k0}" not in p and f"skey={k1}" not in p
    }

    stats2 = write_pyramid_fast(dataset_from_geojson(data), opts, out, z_handoff=2)
    assert stats2["resumed"] is True
    assert stats2["tiles"] == stats["tiles"]
    # finished bins were not rewritten (their compute was skipped)
    for p, mt in untouched.items():
        assert os.path.getmtime(p) == mt, p

    # served tiles equal the local engine after the resumed completion
    from geojson_vt_ray.engine import LocalGeoJSONVT

    server = TileServer(out)
    local = LocalGeoJSONVT(data, opts.with_(index_max_zoom=0, index_max_points=0))
    for (z, x, y) in ((0, 0, 0), (3, 2, 3), (5, 8, 11)):
        lt = local.get_tile(z, x, y)
        st = server.get_tile(z, x, y)
        if lt is None:
            assert st is None or st["features"] == []
        else:
            assert_deep_equal(st["features"], lt["features"])


def test_per_bin_manifests_record_metrics_and_lineage(ray_session, tmp_path):
    """Each bin's done marker is a JSON checkpoint manifest: tile/feature/
    point metrics plus the input-seq lineage span, and the manifest sums
    reconcile with the partition files they describe."""
    import glob
    import json
    import os

    import pyarrow.parquet as pq

    from geojson_vt_ray.ray_pipeline.cascade import write_pyramid_fast
    from geojson_vt_ray.ray_pipeline.tiler import dataset_from_geojson

    data = load_fixture("us-states.json")
    out = str(tmp_path / "pyr")
    stats = write_pyramid_fast(
        dataset_from_geojson(data), TilerOptions(max_zoom=3), out, z_handoff=2
    )

    total_tiles = total_feats = 0
    manifests = glob.glob(os.path.join(out, "_done", "*.done"))
    assert manifests
    for marker in manifests:
        with open(marker) as f:
            m = json.load(f)
        d = os.path.join(out, "bins", f"skey={os.path.basename(marker)[:-5]}")
        rows = feats = 0
        seqs = []
        for part in glob.glob(os.path.join(d, "*.parquet")):
            t = pq.read_table(part, columns=["num_features", "min_seq", "max_seq"])
            rows += t.num_rows
            feats += sum(t.column("num_features").to_pylist())
            seqs += [s for s in t.column("min_seq").to_pylist() if s]
            seqs += [s for s in t.column("max_seq").to_pylist() if s]
        assert m["tiles"] == rows, marker
        assert m["num_features"] == feats, marker
        if seqs:
            assert m["seq_min"] == min(seqs).hex()
            assert m["seq_max"] == max(seqs).hex()
        assert m["files"]
        total_tiles += m["tiles"]
        total_feats += m["num_features"]
    assert total_tiles == stats["tiles"]
    assert total_feats > 0
