"""Shuffle-free pyramid cascade — the 100 TB-shape tiler.

Key property of hierarchical tiling: every child-tile feature descends from
exactly one parent-tile feature, and tile assembly is per-feature + an
order-preserving merge. So the full pyramid needs NO per-level shuffle at
all:

  level z map_batches:  tile-shard rows → per-shard 4-way buffered clip →
                        child feature rows (stay co-located) + a mergeable
                        *partial tile* row (this shard's transformed tile
                        features, with per-feature binary ``seq`` order keys,
                        plus counter partials)

Partial-tile rows stream through the remaining levels untouched; one final
``groupby(tkey)`` merges partials (merge-sort by seq, sum counters). A tile
with a single partial — the overwhelming majority below the top zooms — is
passed through the merge unchanged. The z0–z4 hot tiles are exactly the
salted-partial-merge design (SURVEY.md §4): their assembly is spread across
every shard and only the pre-assembled partials shuffle.

Levels deliberately alternate ``num_cpus`` by an epsilon so Ray's operator
fusion keeps each level a separate operator — the streaming executor then
re-balances blocks between levels, which is what absorbs geographic skew.
"""

from __future__ import annotations

import json
from typing import Optional

import pyarrow as pa

import ray.data

from ..arrowio.codec import (
    KIND_FEATURE,
    KIND_MARKER,
    KIND_TILE,
    KIND_TILE_PARTIAL,
    LevelRowBuilder,
    decode_features,
)
from ..kernels.tile import create_tile, transform_tile_features
from ..options import TilerOptions
from .tiler import ConvertWrap, _clip_children

TILE_COLUMNS = ["z", "x", "y", "features_json", "num_points", "num_simplified", "num_features", "min_seq", "max_seq"]


class CascadeLevel:
    """One pyramid level: consume feature rows at zoom z, emit child feature
    rows at z+1 plus partial tile rows; pass tile rows through."""

    def __init__(self, z: int, options: TilerOptions, markers_for_children: bool = False):
        self.z = z
        self.options = options
        # last cascade level: children existence must become KIND_MARKER rows
        # (so the hand-off groupby forms a group and emits a complete empty
        # tile) instead of empty partials (which would duplicate hand-off
        # tiles already emitted complete)
        self.markers_for_children = markers_for_children

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        z = self.z
        options = self.options
        out = LevelRowBuilder()

        # pass through partial tile rows untouched
        tile_mask = pc.equal(batch.column("kind"), KIND_TILE_PARTIAL)
        passthrough = batch.filter(tile_mask)

        features = decode_features(batch)  # (seq, feature) pairs, kind==0 only
        # group this batch's rows into tile shards
        shards: dict[tuple[int, int], list] = {}
        xs = batch.column("x").to_pylist()
        ys = batch.column("y").to_pylist()
        kinds = batch.column("kind").to_pylist()
        fi = 0
        for i in range(batch.num_rows):
            if kinds[i] != KIND_FEATURE:
                continue
            shards.setdefault((xs[i], ys[i]), []).append(features[fi])
            fi += 1

        for (x, y), shard in shards.items():
            self._emit_partial(out, shard, z, x, y)
            if z < options.max_zoom and shard:
                bbox = {
                    "minX": min(f["minX"] for _, f in shard),
                    "maxX": max(f["maxX"] for _, f in shard),
                    "minY": min(f["minY"] for _, f in shard),
                    "maxY": max(f["maxY"] for _, f in shard),
                }
                for cx, cy, child in _clip_children(shard, z, x, y, options, bbox):
                    if self.markers_for_children:
                        out.add_marker(z + 1, cx, cy)
                    else:
                        # existence marker: empty partial (dedup'd at merge)
                        out.add_partial_tile(z + 1, cx, cy, [], "[]", 0, 0, 0)
                    for seq, f in child:
                        out.add_feature(z + 1, cx, cy, seq, f)

        built = out.table()
        if passthrough.num_rows:
            return pa.concat_tables([passthrough.select(built.column_names), built])
        return built

    def _emit_partial(self, out: LevelRowBuilder, shard: list, z: int, x: int, y: int) -> None:
        options = self.options
        seqs: list[bytes] = []
        tfeatures: list[dict] = []
        num_points = num_simplified = 0
        for seq, f in shard:
            t = create_tile([f], z, x, y, options)
            num_points += t["numPoints"]
            num_simplified += t["numSimplified"]
            if t["features"]:
                tf = transform_tile_features(t, options.extent)
                seqs.append(seq)
                tfeatures.append(tf[0])
        out.add_partial_tile(
            z, x, y, seqs, json.dumps(tfeatures), num_points, num_simplified, len(shard)
        )


def _merge_partials(group: pa.Table) -> pa.Table:
    z = group.column("z")[0].as_py()
    x = group.column("x")[0].as_py()
    y = group.column("y")[0].as_py()
    seqs_col = group.column("seqs").to_pylist()
    feats_col = group.column("features_json").to_pylist()
    np_ = int(pa.compute.sum(group.column("num_points")).as_py() or 0)
    ns = int(pa.compute.sum(group.column("num_simplified")).as_py() or 0)
    nf = int(pa.compute.sum(group.column("num_features")).as_py() or 0)

    pairs: list[tuple[bytes, dict]] = []
    for seqs, fj in zip(seqs_col, feats_col):
        if not seqs:
            continue
        feats = json.loads(fj)
        pairs.extend(zip(seqs, feats))
    pairs.sort(key=lambda p: p[0])

    return pa.table(
        {
            "z": pa.array([z], pa.int16()),
            "x": pa.array([x], pa.int32()),
            "y": pa.array([y], pa.int32()),
            "features_json": pa.array([json.dumps([f for _, f in pairs])], pa.string()),
            "num_points": pa.array([np_], pa.int64()),
            "num_simplified": pa.array([ns], pa.int64()),
            "num_features": pa.array([nf], pa.int64()),
            "min_seq": pa.array([pairs[0][0] if pairs else b""], pa.binary()),
            "max_seq": pa.array([pairs[-1][0] if pairs else b""], pa.binary()),
        }
    )


def build_tiles_cascade(
    ds: "ray.data.Dataset",
    options: TilerOptions,
    batch_size: int = 1024,
) -> "ray.data.Dataset":
    """Full z0..max_zoom pyramid as a pure map cascade + one partial merge.

    Correct at any scale but pays an Arrow re-encode per level for every
    surviving feature row — `build_pyramid_fast` below is the production
    shape (cascade only to the hand-off zoom, then local subtree drill)."""
    options = options.validate()
    cur = ds.map_batches(ConvertWrap(options), batch_format="pyarrow")
    for z in range(options.max_zoom + 1):
        cur = cur.map_batches(
            CascadeLevel(z, options),
            batch_format="pyarrow",
            batch_size=batch_size,
            # epsilon keeps levels un-fused → per-level block re-balancing
            num_cpus=1 + (z % 2) * 1e-4,
        )
    return cur.groupby("tkey").map_groups(_merge_partials, batch_format="pyarrow")


def write_pyramid_fast(
    ds: "ray.data.Dataset",
    options: TilerOptions,
    out_dir: str,
    **kwargs,
) -> dict:
    """Streaming resumable sink over the fast pyramid: partitioned Parquet
    keyed by zoom (`z=<n>/`) plus a `_pyramid.done` manifest. A completed
    run is skipped wholesale on resume; per-level resume granularity is
    available via `tiler.write_pyramid` (BFS path)."""
    import os

    done = os.path.join(out_dir, "_pyramid.done")
    if os.path.exists(done):
        with open(done) as f:
            return {"tiles": int(f.read() or 0), "resumed": True}
    os.makedirs(out_dir, exist_ok=True)
    tiles = build_pyramid_fast(ds, options, **kwargs)
    tiles.write_parquet(out_dir, partition_cols=["z"])

    # count rows from the written files (cheap metadata scan)
    import glob

    import pyarrow.parquet as pq

    n = 0
    for part in glob.glob(os.path.join(out_dir, "z=*", "*.parquet")):
        n += pq.ParquetFile(part).metadata.num_rows
    with open(done, "w") as f:
        f.write(str(n))
    return {"tiles": n, "resumed": False}


class TileServer:
    """Read-side getTile over a written pyramid (the batch engine's stand-in
    for the reference's lazy in-memory index, SURVEY.md §3.2)."""

    def __init__(self, out_dir: str):
        import glob
        import os

        import pyarrow.parquet as pq

        self.by_zoom: dict[int, dict[tuple[int, int], dict]] = {}
        for zdir in glob.glob(os.path.join(out_dir, "z=*")):
            z = int(os.path.basename(zdir).split("=")[1])
            level: dict[tuple[int, int], dict] = {}
            for part in glob.glob(os.path.join(zdir, "*.parquet")):
                t = pq.read_table(part)
                for row in t.to_pylist():
                    level[(row["x"], row["y"])] = row
            self.by_zoom[z] = level

    def get_tile(self, z: int, x: int, y: int):
        level = self.by_zoom.get(z)
        if level is None:
            return None
        z2 = 1 << z
        x = (x + z2) & (z2 - 1)  # wrap x like the reference
        row = level.get((x, y))
        if row is None:
            return None
        return {
            "z": z,
            "x": x,
            "y": y,
            "features": json.loads(row["features_json"]),
            "numPoints": row["num_points"],
            "numSimplified": row["num_simplified"],
            "numFeatures": row["num_features"],
        }


KIND_CHUNK = 4  # pickled feature-chunk of a heavy tile, drilled in a map stage


class TileRowBuilder:
    """Narrow tile-only output rows (the single-pass drill emits nothing
    else — skipping the 24-column level schema saves ~15% drill CPU)."""

    __slots__ = ("kind", "tkey", "z", "x", "y", "features_json", "num_points",
                 "num_simplified", "num_features", "min_seq", "max_seq", "payload")

    def __init__(self) -> None:
        self.kind: list[int] = []
        self.tkey: list[int] = []
        self.z: list[int] = []
        self.x: list[int] = []
        self.y: list[int] = []
        self.features_json: list[str] = []
        self.num_points: list[int] = []
        self.num_simplified: list[int] = []
        self.num_features: list[int] = []
        self.min_seq: list[bytes] = []
        self.max_seq: list[bytes] = []
        self.payload: list[bytes] = []

    def add_tile(
        self,
        tile: dict,
        features_json: str,
        min_seq: bytes = b"",
        max_seq: bytes = b"",
        kind: int = KIND_TILE,
    ) -> None:
        from ..arrowio.codec import tile_key

        self.kind.append(kind)
        self.tkey.append(tile_key(tile["z"], tile["x"], tile["y"]))
        self.z.append(tile["z"])
        self.x.append(tile["x"])
        self.y.append(tile["y"])
        self.features_json.append(features_json)
        self.num_points.append(tile["numPoints"])
        self.num_simplified.append(tile["numSimplified"])
        self.num_features.append(tile["numFeatures"])
        self.min_seq.append(min_seq)
        self.max_seq.append(max_seq)
        self.payload.append(b"")

    def add_chunk(self, z: int, x: int, y: int, payload: bytes) -> None:
        from ..arrowio.codec import tile_key

        self.kind.append(KIND_CHUNK)
        self.tkey.append(tile_key(z, x, y))
        self.z.append(z)
        self.x.append(x)
        self.y.append(y)
        self.features_json.append("")
        self.num_points.append(0)
        self.num_simplified.append(0)
        self.num_features.append(0)
        self.min_seq.append(b"")
        self.max_seq.append(b"")
        self.payload.append(payload)

    def table(self) -> pa.Table:
        return pa.table(
            {
                "kind": pa.array(self.kind, pa.int8()),
                "tkey": pa.array(self.tkey, pa.int64()),
                "z": pa.array(self.z, pa.int16()),
                "x": pa.array(self.x, pa.int32()),
                "y": pa.array(self.y, pa.int32()),
                "features_json": pa.array(self.features_json, pa.string()),
                "num_points": pa.array(self.num_points, pa.int64()),
                "num_simplified": pa.array(self.num_simplified, pa.int64()),
                "num_features": pa.array(self.num_features, pa.int64()),
                "min_seq": pa.array(self.min_seq, pa.binary()),
                "max_seq": pa.array(self.max_seq, pa.binary()),
                "payload": pa.array(self.payload, pa.binary()),
            }
        )


def _drill_subtree(
    out, features: list, z: int, x: int, y: int, tile_bbox: dict, options: TilerOptions,
    chunk_threshold=None,
) -> None:
    """Emit every descendant tile of (z, x, y) for these features.

    With a chunk_threshold, subtrees whose estimated leaf-tile cost exceeds
    it are deferred as KIND_CHUNK rows instead of drilled inline — child
    subtrees are disjoint, so chunked drilling needs no merge and duplicates
    nothing."""
    import pickle

    stack = [(features, z, x, y, tile_bbox)]
    while stack:
        feats, cz, cx0, cy0, ctile = stack.pop()
        for cx, cy, child in _clip_children(feats, cz, cx0, cy0, options, ctile):
            child_tile = create_tile([f for _, f in child], cz + 1, cx, cy, options)
            out.add_tile(
                child_tile,
                json.dumps(transform_tile_features(child_tile, options.extent)),
                child[0][0] if child else b"",
                child[-1][0] if child else b"",
            )
            if cz + 1 < options.max_zoom and child:
                if (
                    chunk_threshold is not None
                    and sum(_est_leaf_tiles(child, cz + 1, cx, cy, options.max_zoom))
                    > chunk_threshold
                ):
                    out.add_chunk(cz + 1, cx, cy, pickle.dumps((child, cz + 1, cx, cy)))
                else:
                    stack.append((child, cz + 1, cx, cy, child_tile))


def _est_leaf_tiles(pairs: list, z: int, x: int, y: int, max_zoom: int) -> list[float]:
    """Per-feature drill-cost estimate in max-zoom leaf tiles:
    clipped-geometry area × 4^mz (interior fill — every covered leaf is a
    tile) + clipped perimeter × 2^mz (boundary tiles) + a per-point floor.
    Uses the feature's *clipped* rings, so edge-crossing features (tiny area,
    modest perimeter) stay cheap while interior-covering polygons are
    detected. Drives heavy-tile chunking."""
    import numpy as np

    area_scale = 4.0 ** max_zoom
    perim_scale = 2.0 ** max_zoom
    ests = []
    for _, f in pairs:
        geometry = f["geometry"]
        ftype = f["type"]
        if ftype in ("Point", "MultiPoint"):
            ests.append(8.0 + len(geometry) / 3)
            continue
        if ftype == "LineString":
            rings = [geometry]
        elif ftype in ("MultiLineString", "Polygon"):
            rings = geometry
        else:
            rings = [r for poly in geometry for r in poly]
        area = 0.0
        perim = 0.0
        npts = 0
        for r in rings:
            pts = r.points
            arr = pts if isinstance(pts, np.ndarray) else np.asarray(pts, dtype=np.float64)
            n = len(arr) // 3
            npts += n
            if n < 2:
                continue
            xs = arr[0::3]
            ys = arr[1::3]
            dx = np.diff(xs)
            dy = np.diff(ys)
            perim += float(np.sqrt(dx * dx + dy * dy).sum())
            if ftype in ("Polygon", "MultiPolygon"):
                area += abs(float((xs[:-1] * ys[1:] - xs[1:] * ys[:-1]).sum()) / 2.0)
        ests.append(area * area_scale + perim * perim_scale + 8.0 + npts)
    return ests


class DrillOrSplit:
    """Hand-off stage: one call per co-located tile group. Normal tiles drill
    their whole subtree locally (complete tile rows, Python-object speed,
    zero further shuffles). Heavy tiles — estimated to cover more than
    ``chunk_threshold`` max-zoom leaf tiles — split their features into
    contiguous-seq chunks that drill in a parallel map stage and merge per
    tile afterwards (single giant features can't be split and remain the
    per-task cost bound). The wide (non-narrow) mode instead re-splits heavy
    tiles into child feature rows for another groupby pass."""

    def __init__(
        self,
        z: int,
        options: TilerOptions,
        heavy_threshold: int,
        narrow: bool = False,
        chunk_threshold: float | None = None,
    ):
        self.z = z
        self.options = options
        self.heavy_threshold = heavy_threshold
        self.narrow = narrow
        self.chunk_threshold = chunk_threshold

    def __call__(self, group: pa.Table) -> pa.Table:
        options = self.options
        z = self.z
        x = group.column("x")[0].as_py()
        y = group.column("y")[0].as_py()

        features = decode_features(group)
        features.sort(key=lambda p: p[0])

        out = TileRowBuilder() if self.narrow else LevelRowBuilder()
        tile = create_tile([f for _, f in features], z, x, y, options)
        out.add_tile(
            tile,
            json.dumps(transform_tile_features(tile, options.extent)),
            features[0][0] if features else b"",
            features[-1][0] if features else b"",
        )

        if z >= options.max_zoom or not features:
            return out.table()

        if self.narrow:
            _drill_subtree(
                out, features, z, x, y, tile, options, chunk_threshold=self.chunk_threshold
            )
            return out.table()

        if tile["numPoints"] <= self.heavy_threshold or z >= options.max_zoom - 1:
            _drill_subtree(out, features, z, x, y, tile, options)
        else:
            for cx, cy, child in _clip_children(features, z, x, y, options, tile):
                out.add_marker(z + 1, cx, cy)
                for seq, f in child:
                    out.add_feature(z + 1, cx, cy, seq, f)
        return out.table()


class ChunkDrill:
    """Parallel drill of deferred heavy subtrees. Each chunk's tile row was
    already emitted by its parent task; this stage drills the descendants,
    re-deferring any still-heavy grandchild subtree (the driver loops until
    no chunks remain)."""

    def __init__(self, options: TilerOptions, chunk_threshold: float):
        self.options = options
        self.chunk_threshold = chunk_threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pickle

        out = TileRowBuilder()
        for payload in batch.column("payload").to_pylist():
            chunk, z, x, y = pickle.loads(payload)
            bbox = {
                "minX": min(f["minX"] for _, f in chunk),
                "maxX": max(f["maxX"] for _, f in chunk),
                "minY": min(f["minY"] for _, f in chunk),
                "maxY": max(f["maxY"] for _, f in chunk),
            }
            _drill_subtree(
                out, chunk, z, x, y, bbox, self.options,
                chunk_threshold=self.chunk_threshold,
            )
        return out.table()


def _merge_chunk_fragments(group: pa.Table) -> pa.Table:
    rows = group.to_pylist()
    rows.sort(key=lambda r: r["min_seq"])  # contiguous seq ranges → concat order
    feats: list = []
    np_ = ns = nf = 0
    min_seq = b""
    max_seq = b""
    for r in rows:
        np_ += r["num_points"]
        ns += r["num_simplified"]
        nf += r["num_features"]
        fl = json.loads(r["features_json"]) if r["features_json"] else []
        if fl:
            if not feats:
                min_seq = r["min_seq"]
            max_seq = r["max_seq"]
            feats.extend(fl)
    first = rows[0]
    return pa.table(
        {
            "z": pa.array([first["z"]], pa.int16()),
            "x": pa.array([first["x"]], pa.int32()),
            "y": pa.array([first["y"]], pa.int32()),
            "features_json": pa.array([json.dumps(feats)], pa.string()),
            "num_points": pa.array([np_], pa.int64()),
            "num_simplified": pa.array([ns], pa.int64()),
            "num_features": pa.array([nf], pa.int64()),
            "min_seq": pa.array([min_seq], pa.binary()),
            "max_seq": pa.array([max_seq], pa.binary()),
        }
    )


def build_pyramid_fast(
    ds: "ray.data.Dataset",
    options: TilerOptions,
    z_handoff: int = 6,
    heavy_threshold: Optional[int] = None,
    batch_size: int = 1024,
    drill_partitions: int = 64,
    chunk_threshold: Optional[float] = None,
) -> "ray.data.Dataset":
    """Production pyramid: shuffle-free cascade to ``z_handoff`` (shallow
    tiles assembled as mergeable partials), ONE groupby at the hand-off to
    co-locate each tile, then per-tile local subtree drill. Heavy tiles
    (num_points > heavy_threshold) re-split for additional bounded passes.

    Shuffle budget: 1 feature groupby at z_handoff (+ a few for heavy
    remainders) + a tiny partial merge over the < 4^z_handoff shallow tiles.
    """
    import pyarrow.compute as pc

    options = options.validate()
    z_handoff = min(z_handoff, options.max_zoom)

    cur = ds.map_batches(ConvertWrap(options), batch_format="pyarrow")
    for z in range(z_handoff):
        cur = cur.map_batches(
            CascadeLevel(z, options, markers_for_children=(z == z_handoff - 1)),
            batch_format="pyarrow",
            batch_size=batch_size,
            num_cpus=1 + (z % 2) * 1e-4,
        )
    cur = cur.materialize()

    def _kind_filter(kinds: tuple, invert: bool = False, scatter: bool = False):
        def fn(batch: pa.Table) -> pa.Table:
            mask = pc.is_in(batch.column("kind"), value_set=pa.array(kinds, pa.int8()))
            out = batch.filter(pc.invert(mask) if invert else mask)
            if scatter:
                # bijective key hash: groupby sorts by key, and raw tile keys
                # are spatially contiguous — dense regions would range-partition
                # into the same reduce task. Scatter, keeping group identity.
                import numpy as np

                tk = out.column("tkey").to_numpy().astype(np.uint64)
                mixed = (tk * np.uint64(0x9E3779B97F4A7C15)) & np.uint64((1 << 63) - 1)
                out = out.append_column("skey", pa.array(mixed.astype(np.int64)))
            return out

        return fn

    partials = cur.map_batches(_kind_filter((KIND_TILE_PARTIAL,)), batch_format="pyarrow")
    shallow_tiles = partials.groupby("tkey").map_groups(_merge_partials, batch_format="pyarrow")

    frontier = cur.map_batches(
        _kind_filter((KIND_FEATURE, KIND_MARKER), scatter=True), batch_format="pyarrow"
    )

    if heavy_threshold is None:
        # single-pass: drill every hand-off tile's subtree in one stage;
        # heavy tiles emit bounded feature-chunks that drill in a parallel
        # map stage and merge per tile (straggler control)
        splitter = DrillOrSplit(
            z_handoff, options, 1 << 62, narrow=True, chunk_threshold=chunk_threshold
        )

        def run_single(group: pa.Table, _s=splitter) -> pa.Table:
            return _s(group)

        level_out = (
            frontier.repartition(drill_partitions)
            .groupby("skey")
            .map_groups(run_single, batch_format="pyarrow")
        )
        if chunk_threshold is None:
            # fully streaming: drill output flows straight to the consumer
            complete = (
                level_out.map_batches(_kind_filter((KIND_TILE,)), batch_format="pyarrow")
                .select_columns(TILE_COLUMNS)
            )
            return shallow_tiles.union(complete)

        # chunked mode: monstrous subtrees are deferred as chunk rows and
        # drilled in additional map rounds (disjoint subtrees → complete
        # tiles, no merge). Costs one materialize per round; rounds ≈
        # log4(monster/threshold).
        level_out = level_out.materialize()
        tiles = shallow_tiles.union(
            level_out.map_batches(_kind_filter((KIND_TILE,)), batch_format="pyarrow")
            .select_columns(TILE_COLUMNS)
        )
        chunks = level_out.map_batches(_kind_filter((KIND_CHUNK,)), batch_format="pyarrow")
        while chunks.count() > 0:
            nxt = (
                chunks.repartition(drill_partitions)
                .map_batches(
                    ChunkDrill(options, chunk_threshold),
                    batch_format="pyarrow",
                    batch_size=1,
                )
                .materialize()
            )
            tiles = tiles.union(
                nxt.map_batches(_kind_filter((KIND_TILE,)), batch_format="pyarrow")
                .select_columns(TILE_COLUMNS)
            )
            chunks = nxt.map_batches(_kind_filter((KIND_CHUNK,)), batch_format="pyarrow")
        return tiles

    tiles = shallow_tiles
    z = z_handoff
    while z <= options.max_zoom:
        splitter = DrillOrSplit(z, options, heavy_threshold)

        def run(group: pa.Table, _s=splitter) -> pa.Table:
            return _s(group)

        # pre-shuffle block fan-out: Ray's sort-based map_groups parallelism
        # follows input block count — a small-byte frontier would otherwise
        # collapse into one reduce task and serialize the whole drill
        level_out = (
            frontier.repartition(drill_partitions)
            .groupby("skey")
            .map_groups(run, batch_format="pyarrow")
            .materialize()
        )
        complete = (
            level_out.map_batches(_kind_filter((KIND_TILE,)), batch_format="pyarrow")
            .select_columns(TILE_COLUMNS)
        )
        tiles = tiles.union(complete)
        frontier = level_out.map_batches(
            _kind_filter((KIND_FEATURE, KIND_MARKER), scatter=True), batch_format="pyarrow"
        )
        z += 1
        if frontier.count() == 0:
            break
    return tiles
