"""Single-process tile index — the semantic reference for the Ray pipeline.

Reproduces the reference's top-down quadtree split (`src/tile-index.ts`) and
entry-point behavior (`src/geojsonvt.ts`) using the shared kernels. The Ray
Data pipeline in ``geojson_vt_ray.ray_pipeline`` must produce identical tiles;
tests assert both against the reference fixture corpus.
"""

from __future__ import annotations

from typing import Optional

from ..kernels.clip import AXIS_X, AXIS_Y, clip
from ..kernels.convert import convert_to_internal
from ..kernels.deconvert import convert_to_geojson
from ..kernels.tile import create_tile, transform_tile
from ..kernels.wrap import wrap
from ..options import TilerOptions


def tile_id(z: int, x: int, y: int) -> int:
    """Packed tile key (reference `src/tile-index.ts:308-310`)."""
    return ((1 << z) * y + x) * 32 + z


class LocalTileIndex:
    """In-memory quadtree tile index with lazy drill-down."""

    def __init__(self, options: TilerOptions):
        self.options = options
        self.tiles: dict[int, dict] = {}
        self.tile_coords: list[tuple[int, int, int]] = []
        # debug counters (reference `src/tile-index.ts:9-31,162-169,291-294`)
        self.stats: dict[str, int] = {}
        self.total: int = 0

    def _count_tile(self, z: int) -> None:
        if self.options.debug:
            key = f"z{z}"
            self.stats[key] = self.stats.get(key, 0) + 1
            self.total += 1

    def initialize(self, features: list[dict]) -> None:
        self._split_tile(features, 0, 0, 0)

    def get_tile(self, z: int, x: int, y: int) -> Optional[dict]:
        z = int(z)
        x = int(x)
        y = int(y)
        extent = self.options.extent

        z2 = 1 << z
        x = (x + z2) & (z2 - 1)  # wrap tile x

        tid = tile_id(z, x, y)
        if tid in self.tiles:
            return transform_tile(self.tiles[tid], extent)

        # walk up to the nearest ancestor that retained its source features
        z0, x0, y0 = z, x, y
        parent = None
        while parent is None and z0 > 0:
            z0 -= 1
            x0 >>= 1
            y0 >>= 1
            parent = self.tiles.get(tile_id(z0, x0, y0))

        if parent is None or parent.get("source") is None:
            return None

        self._split_tile(parent["source"], z0, x0, y0, z, x, y)

        if tid not in self.tiles:
            return None
        return transform_tile(self.tiles[tid], extent)

    def update_index(self, source: list[dict], affected: list[dict]) -> None:
        """Invalidate affected tiles and rebuild the root; deeper tiles
        regenerate lazily on the next get_tile (reference
        `src/tile-index.ts:36-61`)."""
        self.invalidate_tiles(affected)

        root = create_tile(source, 0, 0, 0, self.options)
        root["source"] = source
        tid = tile_id(0, 0, 0)
        self.tiles[tid] = root
        self.tile_coords.append((0, 0, 0))
        self._count_tile(0)

    def invalidate_tiles(self, features: list[dict]) -> None:
        """Remove tiles whose buffered bounds intersect any affected feature
        (reference `src/tile-index.ts:235-305`)."""
        if not features:
            return
        options = self.options

        min_x = min(f["minX"] for f in features)
        max_x = max(f["maxX"] for f in features)
        min_y = min(f["minY"] for f in features)
        max_y = max(f["maxY"] for f in features)

        # full tile-extent buffer (not halved: tested against own bounds)
        k1 = options.buffer / options.extent
        removed = set()

        for tid, tile in list(self.tiles.items()):
            z2 = 1 << tile["z"]
            tile_min_x = (tile["x"] - k1) / z2
            tile_max_x = (tile["x"] + 1 + k1) / z2
            tile_min_y = (tile["y"] - k1) / z2
            tile_max_y = (tile["y"] + 1 + k1) / z2

            if max_x < tile_min_x or min_x >= tile_max_x or max_y < tile_min_y or min_y >= tile_max_y:
                continue
            if not any(
                f["maxX"] >= tile_min_x
                and f["minX"] < tile_max_x
                and f["maxY"] >= tile_min_y
                and f["minY"] < tile_max_y
                for f in features
            ):
                continue
            if self.options.debug:
                key = f"z{tile['z']}"
                self.stats[key] = self.stats.get(key, 0) - 1
                self.total -= 1
            del self.tiles[tid]
            removed.add(tid)

        if removed:
            self.tile_coords = [
                (z, x, y) for (z, x, y) in self.tile_coords if tile_id(z, x, y) not in removed
            ]

    def _split_tile(
        self,
        features: list[dict],
        z: int,
        x: int,
        y: int,
        cz: Optional[int] = None,
        cx: Optional[int] = None,
        cy: Optional[int] = None,
    ) -> None:
        """BFS quadtree split with buffered 4-way clip (reference
        `src/tile-index.ts:138-228`)."""
        options = self.options
        stack: list = [(features, z, x, y)]

        while stack:
            features, z, x, y = stack.pop()

            z2 = 1 << z
            tid = tile_id(z, x, y)
            tile = self.tiles.get(tid)

            if tile is None:
                tile = create_tile(features, z, x, y, options)
                self.tiles[tid] = tile
                self.tile_coords.append((z, x, y))
                self._count_tile(z)

            # retain source so deeper zooms can drill from here
            tile["source"] = features

            if cz is None:
                # first pass: stop at index frontier
                if z == options.index_max_zoom or tile["numPoints"] <= options.index_max_points:
                    continue
            elif z == options.max_zoom or z == cz:
                continue
            else:
                # drill-down: only descend toward the target tile
                zoom_steps = cz - z
                if x != cx >> zoom_steps or y != cy >> zoom_steps:
                    continue

            tile["source"] = None

            if not features:
                continue

            k1 = 0.5 * options.buffer / options.extent
            k2 = 0.5 - k1
            k3 = 0.5 + k1
            k4 = 1 + k1
            lm = options.line_metrics

            left = clip(features, z2, x - k1, x + k3, AXIS_X, tile["minX"], tile["maxX"], lm)
            right = clip(features, z2, x + k2, x + k4, AXIS_X, tile["minX"], tile["maxX"], lm)

            tl = bl = tr = br = None
            if left:
                tl = clip(left, z2, y - k1, y + k3, AXIS_Y, tile["minY"], tile["maxY"], lm)
                bl = clip(left, z2, y + k2, y + k4, AXIS_Y, tile["minY"], tile["maxY"], lm)
            if right:
                tr = clip(right, z2, y - k1, y + k3, AXIS_Y, tile["minY"], tile["maxY"], lm)
                br = clip(right, z2, y + k2, y + k4, AXIS_Y, tile["minY"], tile["maxY"], lm)

            stack.append((tl or [], z + 1, x * 2, y * 2))
            stack.append((bl or [], z + 1, x * 2, y * 2 + 1))
            stack.append((tr or [], z + 1, x * 2 + 1, y * 2))
            stack.append((br or [], z + 1, x * 2 + 1, y * 2 + 1))


class LocalGeoJSONVT:
    """Local equivalent of the reference `GeoJSONVT` facade
    (tiling + cluster modes, `src/geojsonvt.ts:28-183`)."""

    def __init__(self, data: dict, options: Optional[TilerOptions] = None):
        options = (options or TilerOptions()).validate()
        self.options = options

        features = convert_to_internal(data, options)
        features = wrap(features, options)
        self.source = features if options.updateable else None

        self._init_index(features)

    def _init_index(self, features: list[dict]) -> None:
        if self.options.cluster:
            from ..cluster import ClusterIndex

            self.index = ClusterIndex(self.options.cluster_options)
        else:
            self.index = LocalTileIndex(self.options)
        if features:
            self.index.initialize(features)

    def get_tile(self, z, x, y) -> Optional[dict]:
        z = int(z)
        if z < 0 or z > 24:
            return None
        return self.index.get_tile(z, int(x), int(y))

    @property
    def stats(self) -> dict:
        """Per-zoom created-tile counters (with ``options.debug``), matching
        the reference's `this.stats` (`src/tile-index.ts:14,162-169`)."""
        return getattr(self.index, "stats", {})

    @property
    def total(self) -> int:
        return getattr(self.index, "total", 0)

    def get_cluster_children(self, cluster_id: int):
        from ..cluster import ClusterIndex

        return self.index.get_children(cluster_id) if isinstance(self.index, ClusterIndex) else None

    def get_cluster_leaves(self, cluster_id: int, limit: int = 10, offset: int = 0):
        from ..cluster import ClusterIndex

        if not isinstance(self.index, ClusterIndex):
            return None
        return self.index.get_leaves(cluster_id, limit, offset)

    def get_cluster_expansion_zoom(self, cluster_id: int):
        from ..cluster import ClusterIndex

        if not isinstance(self.index, ClusterIndex):
            return None
        return self.index.get_cluster_expansion_zoom(cluster_id)

    def get_data(self) -> dict:
        if not self.options.updateable:
            raise ValueError("to retrieve data the `updateable` option must be set to true")
        return convert_to_geojson(self.source)

    def update_data(self, diff: dict, filter_fn=None) -> None:
        """Apply a source diff (add/remove/update/removeAll) and re-index
        affected tiles (reference `src/geojsonvt.ts:91-110`)."""
        if not self.options.updateable:
            raise ValueError("to update tile geojson `updateable` option must be set to true")
        from .difference import apply_source_diff

        affected, source = apply_source_diff(self.source, diff, self.options)
        if filter_fn is not None:
            affected, source = self._filter_update(source, affected, filter_fn)
        if not affected:
            return
        self.source = source
        if self.options.cluster:
            self._init_index(source)
        else:
            self.index.update_index(source, affected)

    def _filter_update(self, source, affected, predicate):
        from ..kernels.deconvert import feature_to_geojson

        remove_ids = set()
        for feature in source:
            if feature["id"] is None:
                continue
            if predicate(feature_to_geojson(feature)):
                continue
            affected.append(feature)
            remove_ids.add(feature["id"])
        source = [f for f in source if f["id"] not in remove_ids]
        return affected, source

    def update_cluster_options(self, cluster: bool, cluster_options) -> None:
        was_cluster = self.options.cluster
        self.options = self.options.with_(cluster=cluster, cluster_options=cluster_options)
        if was_cluster == cluster and not cluster:
            self.index.update_index(self.source or [], [])
            return
        self._init_index(self.source or [])


def gen_tiles(data: dict, options: Optional[TilerOptions] = None) -> dict[str, list]:
    """Dump every indexed tile's transformed features keyed ``z{z}-{x}-{y}``
    — mirrors the fixture dump format (`test/full.test.ts:52-72`)."""
    options = (options or TilerOptions()).validate()
    index = LocalTileIndex(options)
    features = wrap(convert_to_internal(data, options), options)
    if features:
        index.initialize(features)
    out = {}
    for z, x, y in list(index.tile_coords):
        out[f"z{z}-{x}-{y}"] = index.get_tile(z, x, y)["features"]
    return out
