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


def _check_extent(extent: int) -> None:
    """``extent`` must equal the TilerOptions extent the pyramid was built
    with — tile coordinates are already integers in that extent, and the
    value is only written into each layer header, so a mismatch silently
    makes renderers scale geometry wrong. The pyramid schema doesn't carry
    it, so callers must pass the build-time value (bench/serving callers
    read it off their TilerOptions); at least reject impossible values."""
    if not (isinstance(extent, int) and extent > 0):
        raise ValueError(f"extent must be a positive int, got {extent!r}")


def fill_mvt(
    pyramid: "ray.data.Dataset",
    extent: int = 4096,
    layer_name: str = "geojsonvt",
) -> "ray.data.Dataset":
    """Complete a pyramid's ``mvt`` column: rows whose blob is empty
    (produced by non-drill paths — shallow partial merges, scalar heavy
    tiles, chunk-fragment merges) are encoded from ``features_json`` with
    the scalar codec, byte-identical to the drill's in-array emission.
    Streaming map, no shuffle; rows already carrying a blob pass through
    zero-copy. (A valid encoded empty tile is ~20 bytes, so b"" is
    unambiguous as "not yet encoded".)"""
    _check_extent(extent)

    def fix(batch: pa.Table) -> pa.Table:
        import numpy as np

        lens = pa.compute.binary_length(batch.column("mvt")).to_numpy()
        if (lens > 0).all():
            return batch
        idx = np.nonzero(lens == 0)[0]
        mvt = batch.column("mvt").to_pylist()
        fjs = batch.column("features_json").take(pa.array(idx)).to_pylist()
        for i, fj in zip(idx, fjs):
            feats = json.loads(fj) if fj else []
            mvt[i] = encode_layers(
                {layer_name: {"features": feats, "extent": extent}}
            )
        return batch.set_column(
            batch.schema.get_field_index("mvt"), "mvt", pa.array(mvt, pa.binary())
        )

    return pyramid.map_batches(fix, batch_format="pyarrow")


_EMPTY_JOINED = pa.table(
    {
        "z": pa.array([], pa.int32()),
        "x": pa.array([], pa.int32()),
        "y": pa.array([], pa.int32()),
        "num_layers": pa.array([], pa.int64()),
        "mvt": pa.array([], pa.binary()),
    }
)


def _encode_tile_groups(tkey, names, fjs, order, extent) -> pa.Table:
    """Encode one partition's (tkey, layer, features_json) rows as
    multi-layer MVT tiles — vectorized tkey segmentation, layers in the
    caller's dict order. Shared by the shuffle join and the
    co-partitioned stored join (identical blobs by construction)."""
    from .blocking import lexsort_segments

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
    _check_extent(extent)

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
    _check_extent(extent)
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
        if group.num_rows == 0:
            return _EMPTY_JOINED
        return _encode_tile_groups(
            group.column("tkey").to_numpy(),
            group.column("layer").to_pylist(),
            group.column("features_json").to_pylist(),
            order,
            extent,
        )

    return tagged.groupby("pk").map_groups(encode_partition, batch_format="pyarrow")


def tilejson_for_pyramid(
    pyramid: "ray.data.Dataset",
    name: str = "geojsonvt",
    tiles_url: str = "{z}/{x}/{y}.mvt",
) -> dict:
    """TileJSON 3.0 metadata for a pyramid — what a MapLibre style's
    vector source consumes next to the .mvt tiles: zoom range, geographic
    bounds, and the `vector_layers` field schema (key → MVT value type).

    Everything is computed distributed with small mergeable partials: one
    pass over tile rows emits per-batch (min/max zoom, deepest-zoom tile
    bbox, tag key → type) rows, reduced on the driver (the reduction is
    O(distinct keys + batches), never O(tiles)). Field-type conflicts
    across features resolve to "String" (TileJSON's convention for mixed
    types)."""

    def partial(batch: pa.Table) -> pa.Table:
        zs = batch.column("z").to_numpy()
        xs = batch.column("x").to_numpy()
        ys = batch.column("y").to_numpy()
        fjs = batch.column("features_json").to_pylist()
        zmax = int(zs.max())
        deep = zs == zmax
        fields: dict[str, str] = {}
        for fj in fjs:
            for f in json.loads(fj) if fj else []:
                for k, v in (f.get("tags") or {}).items():
                    if v is None:
                        continue
                    t = (
                        "Boolean"
                        if isinstance(v, bool)
                        else "Number"
                        if isinstance(v, (int, float))
                        else "String"
                    )
                    if fields.setdefault(k, t) != t:
                        fields[k] = "String"
        return pa.table(
            {
                "zmin": pa.array([int(zs.min())], pa.int32()),
                "zmax": pa.array([zmax], pa.int32()),
                "xmin": pa.array([int(xs[deep].min())], pa.int64()),
                "xmax": pa.array([int(xs[deep].max())], pa.int64()),
                "ymin": pa.array([int(ys[deep].min())], pa.int64()),
                "ymax": pa.array([int(ys[deep].max())], pa.int64()),
                "fields_json": pa.array([json.dumps(fields)], pa.string()),
            }
        )

    parts = pyramid.map_batches(partial, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return {"tilejson": "3.0.0", "name": name, "tiles": [tiles_url],
                "vector_layers": [{"id": name, "fields": {}}]}
    zmax = int(parts.zmax.max())
    at_deep = parts[parts.zmax == zmax]
    z2 = float(1 << zmax)
    from ..kernels.project import unproject_x, unproject_y

    west = unproject_x(float(at_deep.xmin.min()) / z2)
    east = unproject_x((float(at_deep.xmax.max()) + 1) / z2)
    north = unproject_y(float(at_deep.ymin.min()) / z2)
    south = unproject_y((float(at_deep.ymax.max()) + 1) / z2)
    fields: dict[str, str] = {}
    for fj in parts.fields_json:
        for k, t in json.loads(fj).items():
            if fields.setdefault(k, t) != t:
                fields[k] = "String"
    zmin = int(parts.zmin.min())
    return {
        "tilejson": "3.0.0",
        "name": name,
        "tiles": [tiles_url],
        "minzoom": zmin,
        "maxzoom": zmax,
        "bounds": [
            round(west, 6), round(south, 6), round(east, 6), round(north, 6)
        ],
        "center": [
            round((west + east) / 2, 6),
            round((south + north) / 2, 6),
            (zmin + zmax) // 2,
        ],
        "vector_layers": [
            {"id": name, "minzoom": zmin, "maxzoom": zmax, "fields": fields}
        ],
    }


def write_pyramid_pkey(
    pyramid: "ray.data.Dataset",
    out_dir: str,
    n_partitions: int = 256,
) -> dict:
    """Write a pyramid partitioned by hashed tile key — the layout that
    makes multi-layer joins shuffle-free.

    Every layer written with the SAME ``n_partitions`` puts any given
    (z, x, y) in the same ``pkey=<p>`` directory across layers (pkey =
    `blocking.mix_to_partitions` of the packed tkey), so a downstream
    join is a partition-aligned read: task p reads each layer's pkey=p
    files and merges locally — no AllToAll. A ``_pkey.json`` manifest
    records ``n_partitions`` so the joiner can verify alignment.
    """
    import os

    import numpy as np

    from .blocking import mix_to_partitions

    def add_pkey(batch: pa.Table) -> pa.Table:
        z = np.asarray(batch.column("z").to_numpy(), dtype=np.int64)
        x = np.asarray(batch.column("x").to_numpy(), dtype=np.int64)
        y = np.asarray(batch.column("y").to_numpy(), dtype=np.int64)
        tkey = (z << 58) | (x << 29) | y
        return pa.table(
            {
                "tkey": pa.array(tkey),
                "pkey": pa.array(mix_to_partitions(tkey, n_partitions)),
                "features_json": batch.column("features_json").cast(pa.string()),
            }
        )

    pyramid.map_batches(add_pkey, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["pkey"]
    )
    manifest = {"n_partitions": n_partitions}
    with open(os.path.join(out_dir, "_pkey.json"), "w") as f:
        json.dump(manifest, f)
    return manifest


def mvt_join_layers_copartitioned(
    layer_dirs: dict[str, str],
    extent: int = 4096,
) -> "ray.data.Dataset":
    """Multi-layer MVT join over `write_pyramid_pkey` layouts — ZERO
    shuffle (round-5 task 4).

    Where `mvt_join_layers` pays one tkey sort-shuffle over every tile
    row of every layer, this variant exploits the shared hash
    partitioning: one task per partition id reads each layer's aligned
    ``pkey=<p>`` directory straight off storage and merges/encodes
    locally (`_encode_tile_groups`, the exact code the shuffle join
    runs — identical blobs). The only cross-node movement is the
    partition-id fan-out itself: O(n_partitions) int rows.

    Layer order in the output tiles follows ``layer_dirs`` dict order,
    matching `mvt_join_layers`'s caller-dict-order contract.
    """
    _check_extent(extent)
    import glob
    import os

    import numpy as np
    import ray.data

    n_parts: "Optional[int]" = None
    for name, d in layer_dirs.items():
        with open(os.path.join(d, "_pkey.json")) as f:
            m = json.load(f)
        if n_parts is None:
            n_parts = int(m["n_partitions"])
        elif int(m["n_partitions"]) != n_parts:
            raise ValueError(
                "layers are not co-partitioned: "
                f"{name} has n_partitions={m['n_partitions']}, expected {n_parts}"
            )
    order = list(layer_dirs)
    dirs = dict(layer_dirs)

    def join_partition(batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        out: list[pa.Table] = []
        for pid in batch.column("id").to_pylist():
            tkeys: list[np.ndarray] = []
            names: list[str] = []
            fjs: list[str] = []
            for name in order:
                pdir = os.path.join(dirs[name], f"pkey={pid}")
                for part in sorted(glob.glob(os.path.join(pdir, "*.parquet"))):
                    t = pq.read_table(part, columns=["tkey", "features_json"])
                    tkeys.append(t.column("tkey").to_numpy())
                    names.extend([name] * t.num_rows)
                    fjs.extend(t.column("features_json").to_pylist())
            if not names:
                continue
            out.append(
                _encode_tile_groups(
                    np.concatenate(tkeys), names, fjs, order, extent
                )
            )
        return pa.concat_tables(out) if out else _EMPTY_JOINED

    # one row per partition id; batch_size=1 => one aligned read per task
    return ray.data.range(n_parts).map_batches(
        join_partition, batch_format="pyarrow", batch_size=1
    )
