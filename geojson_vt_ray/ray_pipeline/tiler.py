"""Distributed tile-pyramid pipeline on Ray Data.

Shape (SURVEY.md §3.1/§4): features → ``map_batches`` convert+wrap (stateless,
per-feature, order preserved via binary ``seq`` keys) → per-zoom BFS of
[``groupby(tkey).map_groups`` fused tile-assembly + 4-way buffered clip
flat-map] → hand-off to *local subtree drilldown* once a tile is small enough
(``num_points <= local_drill_threshold``) or deep enough — the drilldown emits
every descendant tile from inside the group task with zero further shuffles.
This mirrors the reference's lazy index (first-pass BFS to indexMaxZoom /
indexMaxPoints, per-tile drill-down on demand, `src/tile-index.ts:138-228`)
but runs each subtree in parallel across the cluster.

Partitioning key: packed ``tkey = ((2^z)*y + x)*32 + z`` — the reference's
toID. Hierarchical clipping means every child-tile row descends from exactly
one parent group, so only BFS levels shuffle; subtree drilldown is
shuffle-free. Hot z0–4 groups are the skew point: the BFS/local-drill
hand-off bounds group payload by ``local_drill_threshold`` points, and
``bfs_min_zoom`` forces BFS through the first levels so the fan-out reaches
cluster width before any heavy local work.

Modes:
  "index"   — reproduce the reference first-pass tile set exactly
              (indexMaxZoom / indexMaxPoints stop rule; fixture parity).
  "pyramid" — materialize every tile down to max_zoom (what getTile would
              serve), the 100 TB / bench shape.
"""

from __future__ import annotations

import json
import struct
from typing import Iterator, Optional

import pyarrow as pa

import ray.data

from ..arrowio.codec import (
    KIND_FEATURE,
    KIND_TILE,
    LevelRowBuilder,
    decode_features,
    empty_level_table,
)
from ..kernels.clip import AXIS_X, AXIS_Y, clip
from ..kernels.convert import convert_single_feature
from ..kernels.tile import create_tile, transform_tile_features
from ..kernels.wrap import shift_features
from ..options import TilerOptions


def _seq(world: int, input_seq: int) -> bytes:
    return struct.pack(">BQ", world, input_seq)


def _child_seq(parent: bytes, k: int) -> bytes:
    # lexicographic extension: siblings order by k, different parents by prefix
    return parent + struct.pack(">I", k)


class ConvertWrap:
    """Stateless convert+wrap stage: one GeoJSON feature row → 1..3 world
    copies of internal feature rows at the root tile.

    Per-feature wrap is equivalent to the reference's whole-collection wrap
    (`src/wrap.ts:6-21`): any feature altered by the center clip necessarily
    intersects the left or right world slab, so the global "did anything
    cross" gate reduces to a per-feature one; output order is restored by the
    (world, input_seq) key.
    """

    def __init__(self, options: TilerOptions):
        self.options = options

    def __call__(self, batch: pa.Table) -> pa.Table:
        options = self.options
        buffer = options.buffer / options.extent
        lm = options.line_metrics
        out = LevelRowBuilder()

        feature_json = batch.column("feature_json").to_pylist()
        input_seq = batch.column("input_seq").to_pylist()
        for fj, iseq in zip(feature_json, input_seq):
            gj = json.loads(fj)
            for f in convert_single_feature(gj, options, iseq):
                left = clip([f], 1, -1 - buffer, buffer, AXIS_X, -1, 2, lm)
                right = clip([f], 1, 1 - buffer, 2 + buffer, AXIS_X, -1, 2, lm)
                if not left and not right:
                    self._emit(out, 1, iseq, [f])
                    continue
                center = clip([f], 1, -buffer, 1 + buffer, AXIS_X, -1, 2, lm) or []
                if left:
                    self._emit(out, 0, iseq, shift_features(left, 1.0))
                self._emit(out, 1, iseq, center)
                if right:
                    self._emit(out, 2, iseq, shift_features(right, -1.0))
        return out.table()

    @staticmethod
    def _emit(out: LevelRowBuilder, world: int, iseq: int, features: list[dict]) -> None:
        base = _seq(world, iseq)
        if len(features) == 1:
            out.add_feature(0, 0, 0, base, features[0])
        else:
            for k, f in enumerate(features):
                out.add_feature(0, 0, 0, _child_seq(base, k), f)


def _clip_children(
    features: list[tuple[bytes, dict]], z: int, x: int, y: int, options: TilerOptions, tile: dict
) -> Iterator[tuple[int, int, list[tuple[bytes, dict]]]]:
    """4-way buffered clip of a tile's features into its children
    (reference `src/tile-index.ts:197-226`). Yields (cx, cy, child_features)
    for all four children (possibly empty lists)."""
    z2 = 1 << z
    k1 = 0.5 * options.buffer / options.extent
    k2 = 0.5 - k1
    k3 = 0.5 + k1
    k4 = 1 + k1
    lm = options.line_metrics

    feats = [f for _, f in features]
    min_x, max_x = tile["minX"], tile["maxX"]
    min_y, max_y = tile["minY"], tile["maxY"]

    def keyed(clipped: Optional[list[dict]], parents: list[bytes]) -> list[tuple[bytes, dict]]:
        return list(zip(parents, clipped)) if clipped else []

    # clip per feature to preserve seq association through line-metrics splits
    def clip_side(start: float, end: float, axis: int, source: list[tuple[bytes, dict]],
                  mn: float, mx: float) -> list[tuple[bytes, dict]]:
        out: list[tuple[bytes, dict]] = []
        for seq, f in source:
            res = clip([f], z2, start, end, axis, mn, mx, lm)
            if not res:
                continue
            if len(res) == 1:
                out.append((seq, res[0]))
            else:
                out.extend((_child_seq(seq, k), g) for k, g in enumerate(res))
        return out

    left = clip_side(x - k1, x + k3, AXIS_X, features, min_x, max_x)
    right = clip_side(x + k2, x + k4, AXIS_X, features, min_x, max_x)

    tl = clip_side(y - k1, y + k3, AXIS_Y, left, min_y, max_y) if left else []
    bl = clip_side(y + k2, y + k4, AXIS_Y, left, min_y, max_y) if left else []
    tr = clip_side(y - k1, y + k3, AXIS_Y, right, min_y, max_y) if right else []
    br = clip_side(y + k2, y + k4, AXIS_Y, right, min_y, max_y) if right else []

    yield (x * 2, y * 2, tl)
    yield (x * 2, y * 2 + 1, bl)
    yield (x * 2 + 1, y * 2, tr)
    yield (x * 2 + 1, y * 2 + 1, br)


class LevelSplitter:
    """Fused per-tile assembly + split decision + child emission for one BFS
    level. Runs as ``groupby(tkey).map_groups``."""

    def __init__(
        self,
        options: TilerOptions,
        mode: str,
        bfs_min_zoom: int,
        local_drill_threshold: int,
    ):
        self.options = options
        self.mode = mode
        self.bfs_min_zoom = bfs_min_zoom
        self.local_drill_threshold = local_drill_threshold

    def __call__(self, group: pa.Table) -> pa.Table:
        options = self.options
        z = group.column("z")[0].as_py()
        x = group.column("x")[0].as_py()
        y = group.column("y")[0].as_py()

        features = decode_features(group)
        features.sort(key=lambda p: p[0])

        out = LevelRowBuilder()
        tile = self._emit_tile(out, features, z, x, y)

        if self.mode == "index":
            split = not (z == options.index_max_zoom or tile["numPoints"] <= options.index_max_points)
            if split and features:
                self._emit_bfs_children(out, features, z, x, y, tile)
        else:  # pyramid
            if z < options.max_zoom and features:
                go_local = z >= self.bfs_min_zoom and (
                    tile["numPoints"] <= self.local_drill_threshold
                    or z >= options.max_zoom - 1
                )
                if go_local:
                    self._local_drill(out, features, z, x, y, tile)
                else:
                    self._emit_bfs_children(out, features, z, x, y, tile)
        return out.table()

    def _emit_tile(
        self, out: LevelRowBuilder, features: list[tuple[bytes, dict]], z: int, x: int, y: int
    ) -> dict:
        tile = create_tile([f for _, f in features], z, x, y, self.options)
        tfeatures = transform_tile_features(tile, self.options.extent)
        out.add_tile(tile, json.dumps(tfeatures))
        return tile

    def _emit_bfs_children(
        self,
        out: LevelRowBuilder,
        features: list[tuple[bytes, dict]],
        z: int,
        x: int,
        y: int,
        tile: dict,
    ) -> None:
        for cx, cy, child in _clip_children(features, z, x, y, self.options, tile):
            out.add_marker(z + 1, cx, cy)  # guarantee the child tile exists
            for seq, f in child:
                out.add_feature(z + 1, cx, cy, seq, f)

    def _local_drill(
        self,
        out: LevelRowBuilder,
        features: list[tuple[bytes, dict]],
        z: int,
        x: int,
        y: int,
        tile: dict,
    ) -> None:
        """Emit the whole descendant subtree from inside this task
        (shuffle-free; the reference's drill-down loop run to max_zoom)."""
        options = self.options
        stack = [(features, z, x, y, tile)]
        while stack:
            features, z, x, y, tile = stack.pop()
            for cx, cy, child in _clip_children(features, z, x, y, options, tile):
                child_tile = self._emit_tile(out, child, z + 1, cx, cy)
                if z + 1 < options.max_zoom and child:
                    stack.append((child, z + 1, cx, cy, child_tile))


def _filter_kind(predicate_kind: int, invert: bool = False):
    import pyarrow.compute as pc

    def fn(batch: pa.Table) -> pa.Table:
        mask = pc.equal(batch.column("kind"), predicate_kind)
        if invert:
            mask = pc.invert(mask)
        return batch.filter(mask)

    return fn


TILE_COLUMNS = ["z", "x", "y", "features_json", "num_points", "num_simplified", "num_features"]


def build_tiles(
    ds: "ray.data.Dataset",
    options: TilerOptions,
    mode: str = "pyramid",
    bfs_min_zoom: int = 3,
    local_drill_threshold: int = 100_000,
) -> "ray.data.Dataset":
    """Run the pyramid over a Dataset of ``{feature_json, input_seq}`` rows.

    Returns a Dataset of tile rows ``(z, x, y, features_json, num_points,
    num_simplified, num_features)``.
    """
    options = options.validate()
    level0 = ds.map_batches(ConvertWrap(options), batch_format="pyarrow")

    tiles = None
    for tiles_z in iter_level_tiles(level0, options, mode, bfs_min_zoom, local_drill_threshold):
        tiles = tiles_z if tiles is None else tiles.union(tiles_z)
    return tiles


def iter_level_tiles(
    level0: "ray.data.Dataset",
    options: TilerOptions,
    mode: str,
    bfs_min_zoom: int,
    local_drill_threshold: int,
) -> Iterator["ray.data.Dataset"]:
    """Run the BFS level loop, yielding each level's tile Dataset.

    Each level is materialized once: the frontier is the live working set of
    the BFS (the reference's retained per-frontier-tile ``source`` arrays,
    `src/tile-index.ts:173-174`) — without pinning it, every level's lazy
    lineage would re-execute all upstream groupbys (O(levels²) shuffles).
    The object store spills oversized frontiers to disk.
    """
    max_bfs = options.index_max_zoom if mode == "index" else options.max_zoom
    frontier = level0
    for z in range(max_bfs + 1):
        splitter = LevelSplitter(options, mode, bfs_min_zoom, local_drill_threshold)

        def split_level(group: pa.Table, _s=splitter) -> pa.Table:
            return _s(group)

        level_out = (
            frontier.groupby("tkey").map_groups(split_level, batch_format="pyarrow").materialize()
        )
        yield (
            level_out.map_batches(_filter_kind(KIND_TILE), batch_format="pyarrow")
            .select_columns(TILE_COLUMNS)
        )
        if z == max_bfs:
            break
        frontier = level_out.map_batches(
            _filter_kind(KIND_TILE, invert=True), batch_format="pyarrow"
        )
        if frontier.count() == 0:
            break


def write_pyramid(
    ds: "ray.data.Dataset",
    options: TilerOptions,
    out_dir: str,
    mode: str = "pyramid",
    bfs_min_zoom: int = 3,
    local_drill_threshold: int = 100_000,
) -> dict:
    """Streaming, resumable pyramid sink.

    Writes one Parquet directory per BFS level (``level=<i>``; a level holds
    every tile emitted at that BFS step — in pyramid mode a level includes the
    locally-drilled subtrees handed off at that depth). A ``_level_<i>.done``
    manifest marks completion so a rerun skips finished levels; this is the
    per-partition checkpoint/lineage surface (SURVEY.md §4).
    """
    import os

    options = options.validate()
    level0 = ds.map_batches(ConvertWrap(options), batch_format="pyarrow")
    os.makedirs(out_dir, exist_ok=True)
    stats = {"levels": 0, "tiles": 0}
    for i, tiles_z in enumerate(
        iter_level_tiles(level0, options, mode, bfs_min_zoom, local_drill_threshold)
    ):
        done = os.path.join(out_dir, f"_level_{i}.done")
        target = os.path.join(out_dir, f"level={i}")
        if os.path.exists(done):
            stats["levels"] += 1
            continue
        n = tiles_z.count()
        tiles_z.write_parquet(target)
        with open(done, "w") as f:
            f.write(str(n))
        stats["levels"] += 1
        stats["tiles"] += n
    return stats


def dataset_from_geojson(
    data: dict, parallelism: int = -1, options: Optional[TilerOptions] = None
) -> "ray.data.Dataset":
    """Driver-side normalization of a GeoJSON value into per-feature rows.

    Materializes ``fid_key`` (canonical JSON encoding of the diff id —
    ``properties[promote_id]`` when the options promote, else the native
    ``id``) once at ingest so incremental diffs anti-join with a vectorized
    ``pc.is_in`` instead of re-parsing every feature's JSON per update
    (reference extracts the same id in `src/convert.ts:117` region)."""
    from .incremental import fid_key_column, fid_key_of_feature

    key_col = fid_key_column(options)
    if data.get("type") == "FeatureCollection":
        feats = data["features"]
    elif data.get("type") == "Feature":
        feats = [data]
    else:
        feats = [{"type": "Feature", "geometry": data, "properties": None}]
    rows = [
        {
            "feature_json": json.dumps(f),
            "input_seq": i,
            key_col: fid_key_of_feature(f, options),
        }
        for i, f in enumerate(feats)
    ]
    if not rows:
        return ray.data.from_arrow(
            pa.table({"feature_json": pa.array([], pa.string()),
                      "input_seq": pa.array([], pa.int64()),
                      key_col: pa.array([], pa.string())})
        )
    return ray.data.from_items(rows, override_num_blocks=max(1, min(len(rows), 64)))


def gen_tiles_ray(data: dict, options: Optional[TilerOptions] = None, mode: str = "index") -> dict:
    """Collect the pipeline output into the fixture dump format
    (``z{z}-{x}-{y}`` → transformed feature list). Test scale only."""
    options = (options or TilerOptions()).validate()
    ds = dataset_from_geojson(data)
    tiles = build_tiles(ds, options, mode=mode)
    out = {}
    for row in tiles.iter_rows():
        out[f"z{row['z']}-{row['x']}-{row['y']}"] = json.loads(row["features_json"])
    return out
