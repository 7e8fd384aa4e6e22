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


def mvt_join_layers(
    pyramids: dict[str, "ray.data.Dataset"],
    extent: int = 4096,
    n_partitions: int = 256,
) -> "ray.data.Dataset":
    """Merge several pyramids into multi-layer MVT tiles — the standard
    basemap shape (e.g. a roads layer and a buildings layer rendered from
    one tile fetch).

    Each input is a pyramid tile Dataset (z, x, y, features_json); the
    output has one row per (z, x, y) present in ANY input, with an `mvt`
    blob containing one MVT layer per source that has that tile (layers
    keep the dict's key as their name; a source without the tile simply
    contributes no layer, mirroring how basemap tilesets omit empty
    layers).

    Scale shape: tile keys number in the millions at deep zooms, so the
    join follows the repo's bounded-dispatch rule — tkey hashes onto
    ``n_partitions`` partitions (`blocking.mix_to_partitions`) and one
    task per partition segments by tkey vectorized inside
    (`lexsort_segments`); the per-tile encode loop runs inside the task,
    never as a Python dispatch per distinct tile.
    """
    import numpy as np

    from .blocking import lexsort_segments, mix_to_partitions

    def tag(name: str):
        def add(batch: pa.Table) -> pa.Table:
            z = np.asarray(batch.column("z").to_numpy(), dtype=np.int64)
            x = np.asarray(batch.column("x").to_numpy(), dtype=np.int64)
            y = np.asarray(batch.column("y").to_numpy(), dtype=np.int64)
            tkey = (z << 58) | (x << 29) | y
            return pa.table(
                {
                    "pk": pa.array(mix_to_partitions(tkey, n_partitions)),
                    "tkey": pa.array(tkey),
                    "layer": pa.array([name] * batch.num_rows, pa.string()),
                    "features_json": batch.column("features_json").cast(pa.string()),
                }
            )

        return add

    tagged = None
    for name, ds in pyramids.items():
        part = ds.map_batches(tag(name), batch_format="pyarrow")
        tagged = part if tagged is None else tagged.union(part)

    order = list(pyramids)

    def encode_partition(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "z": pa.array([], pa.int32()),
                "x": pa.array([], pa.int32()),
                "y": pa.array([], pa.int32()),
                "num_layers": pa.array([], pa.int64()),
                "mvt": pa.array([], pa.binary()),
            }
        )
        if group.num_rows == 0:
            return empty
        tkey = group.column("tkey").to_numpy()
        names = group.column("layer").to_pylist()
        fjs = group.column("features_json").to_pylist()
        sort, starts, ends = lexsort_segments([tkey])
        zs, xs, ys, nl, blobs = [], [], [], [], []
        for s, e in zip(starts, ends):
            idxs = sort[s:e]
            k = int(tkey[idxs[0]])
            present = {
                names[i]: {
                    "features": json.loads(fjs[i]) if fjs[i] else [],
                    "extent": extent,
                }
                for i in idxs
            }
            # deterministic layer order: the caller's dict order
            layers = {n: present[n] for n in order if n in present}
            zs.append(k >> 58)
            xs.append((k >> 29) & ((1 << 29) - 1))
            ys.append(k & ((1 << 29) - 1))
            nl.append(len(layers))
            blobs.append(encode_layers(layers))
        return pa.table(
            {
                "z": pa.array(zs, pa.int32()),
                "x": pa.array(xs, pa.int32()),
                "y": pa.array(ys, pa.int32()),
                "num_layers": pa.array(nl, pa.int64()),
                "mvt": pa.array(blobs, pa.binary()),
            }
        )

    return tagged.groupby("pk").map_groups(encode_partition, batch_format="pyarrow")
