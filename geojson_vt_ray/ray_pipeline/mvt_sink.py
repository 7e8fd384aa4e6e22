"""MVT egress: pyramid tile rows → Mapbox Vector Tile binary rows.

The serving path the reference ecosystem uses (geojson-vt tile objects →
vt-pbf → MapLibre) expressed Ray-Data-first: one stateless `map_batches`
over the pyramid's per-tile rows (the `TILE_COLUMNS` schema that
`build_pyramid_fast` / `write_pyramid_fast` produce — one row per tile,
`features_json` already in integer extent coordinates, the exact shape
`TileServer.get_tile` serves and vt-pbf consumes) encoding each tile
with the from-scratch MVT 2.1 writer in `kernels/mvt.py`.

Scale shape: embarrassingly parallel over tile rows — no shuffle, no
state, output is one (z, x, y, mvt) binary row per tile, ready for
`write_parquet` partitioned by zoom (resumable, same layout as the
pyramid sink) or for any tile store that takes standard .mvt blobs.
"""

from __future__ import annotations

import json

import pyarrow as pa

from ..kernels.mvt import encode_layers


def mvt_tiles(
    pyramid: "ray.data.Dataset",
    extent: int = 4096,
    layer_name: str = "geojsonvt",
) -> "ray.data.Dataset":
    """Encode every pyramid tile row as an MVT blob.

    Input: Dataset with at least (z, x, y, features_json) per tile, the
    pyramid sink schema — features already transformed to integer extent
    coords. ``extent`` must match the TilerOptions extent the pyramid was
    built with (it is written into each layer header). Output: Dataset of
    (z, x, y, num_features, mvt binary). Empty tiles encode as a valid
    empty layer, matching the empty-tile-is-not-None serving contract.
    """

    def encode_batch(batch: pa.Table) -> pa.Table:
        zs = batch.column("z").to_pylist()
        xs = batch.column("x").to_pylist()
        ys = batch.column("y").to_pylist()
        fjs = batch.column("features_json").to_pylist()
        blobs = []
        nfeats = []
        for fj in fjs:
            feats = json.loads(fj) if fj else []
            blobs.append(
                encode_layers({layer_name: {"features": feats, "extent": extent}})
            )
            nfeats.append(len(feats))
        return pa.table(
            {
                "z": pa.array([int(v) for v in zs], pa.int32()),
                "x": pa.array([int(v) for v in xs], pa.int32()),
                "y": pa.array([int(v) for v in ys], pa.int32()),
                "num_features": pa.array(nfeats, pa.int64()),
                "mvt": pa.array(blobs, pa.binary()),
            }
        )

    return pyramid.map_batches(encode_batch, batch_format="pyarrow")
