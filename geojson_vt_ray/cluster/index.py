"""Greedy radius clustering across zoom levels (supercluster semantics,
reference `src/cluster-tile-index.ts`).

Per-zoom cascade from maxZoom down to minZoom; each level greedily merges
unvisited points within ``radius/(extent*2^zoom)`` into weighted-centroid
clusters (iteration in index order — order-dependent by design). Cluster id
encodes origin (index<<5) + zoom + n_points offset. Coordinates are float32
in the KD-trees (fround), float64 in the flat data rows.

This is the exact-match engine (single-actor mode in the Ray pipeline); the
scale-out grid variant is a documented deviation.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional

import numpy as np

from ..kernels.deconvert import feature_to_geojson
from ..kernels.project import project_x, project_y, unproject_x, unproject_y
from ..options import ClusterOptions
from .kdbush import KDBush

# flat row layout: x, y, zoom, id, parent, num_points [, prop_index]
OFF_ZOOM = 2
OFF_ID = 3
OFF_PARENT = 4
OFF_NUM = 5
OFF_PROP = 6

INF = float("inf")


def _fround(v: float) -> float:
    return float(np.float32(v))


class _Tree:
    __slots__ = ("kd", "flat_data", "num_items")

    def __init__(self, kd: KDBush, flat_data: list[float]):
        self.kd = kd
        self.flat_data = flat_data
        self.num_items = kd.num_items

    def range(self, *a) -> list[int]:
        return self.kd.range(*a)

    def within(self, *a) -> list[int]:
        return self.kd.within(*a)


class ClusterIndex:
    """Point clustering index over internal Point features."""

    def __init__(self, options: Optional[ClusterOptions] = None):
        self.options = options or ClusterOptions()
        self.stride = 7 if self.options.reduce else 6
        self.trees: dict[int, _Tree] = {}
        self.cluster_props: list[dict] = []
        self.points: list[dict] = []

    # -- loading -------------------------------------------------------------

    def load_geojson_points(self, points: list[dict]) -> None:
        features = []
        for p in points:
            geometry = p.get("geometry")
            if not geometry:
                continue
            lng, lat = geometry["coordinates"][0], geometry["coordinates"][1]
            features.append(
                {
                    "id": p.get("id"),
                    "type": "Point",
                    "geometry": [project_x(lng), project_y(lat)],
                    "tags": p.get("properties"),
                    "minX": 0.0,
                    "minY": 0.0,
                    "maxX": 0.0,
                    "maxY": 0.0,
                }
            )
        self._create_index(features)

    def initialize(self, features: list[dict]) -> None:
        self._create_index([f for f in features if f["type"] == "Point"])

    def _create_index(self, points: list[dict]) -> None:
        options = self.options
        self.points = points
        data: list[float] = []
        for i, p in enumerate(points):
            if not p.get("geometry") and p.get("geometry") != 0:
                continue
            x = _fround(p["geometry"][0])
            y = _fround(p["geometry"][1])
            data.extend((x, y, INF, float(i), -1.0, 1.0))
            if options.reduce:
                data.append(0.0)
        tree = self._create_tree(data)
        self.trees[options.max_zoom + 1] = tree
        for z in range(options.max_zoom, options.min_zoom - 1, -1):
            tree = self._create_tree(self._cluster(tree, z))
            self.trees[z] = tree

    def _create_tree(self, data: list[float]) -> _Tree:
        kd = KDBush(int(len(data) / self.stride), self.options.node_size)
        for i in range(0, len(data), self.stride):
            kd.add(data[i], data[i + 1])
        kd.finish()
        return _Tree(kd, data)

    # -- clustering ----------------------------------------------------------

    def _cluster(self, tree: _Tree, zoom: int) -> list[float]:
        options = self.options
        r = options.radius / (options.extent * math.pow(2, zoom))
        data = tree.flat_data
        stride = self.stride
        reduce = options.reduce
        next_data: list[float] = []

        for i in range(0, len(data), stride):
            if data[i + OFF_ZOOM] <= zoom:
                continue
            data[i + OFF_ZOOM] = zoom

            x = data[i]
            y = data[i + 1]
            neighbor_ids = tree.within(data[i], data[i + 1], r)

            num_points_origin = data[i + OFF_NUM]
            num_points = num_points_origin

            for nid in neighbor_ids:
                k = nid * stride
                if data[k + OFF_ZOOM] > zoom:
                    num_points += data[k + OFF_NUM]

            if num_points > num_points_origin and num_points >= options.min_points:
                wx = x * num_points_origin
                wy = y * num_points_origin
                cluster_properties = None
                cluster_prop_index = -1

                cid = ((i // stride) << 5) + (zoom + 1) + len(self.points)

                for nid in neighbor_ids:
                    k = nid * stride
                    if data[k + OFF_ZOOM] <= zoom:
                        continue
                    data[k + OFF_ZOOM] = zoom

                    n2 = data[k + OFF_NUM]
                    wx += data[k] * n2
                    wy += data[k + 1] * n2
                    data[k + OFF_PARENT] = cid

                    if reduce:
                        if cluster_properties is None:
                            cluster_properties = self._map(data, i, True)
                            cluster_prop_index = len(self.cluster_props)
                            self.cluster_props.append(cluster_properties)
                        reduce(cluster_properties, self._map(data, k))

                data[i + OFF_PARENT] = cid
                next_data.extend((wx / num_points, wy / num_points, INF, float(cid), -1.0, num_points))
                if reduce:
                    next_data.append(float(cluster_prop_index))
            else:
                for j in range(stride):
                    next_data.append(data[i + j])
                if num_points > 1:
                    for nid in neighbor_ids:
                        k = nid * stride
                        if data[k + OFF_ZOOM] <= zoom:
                            continue
                        data[k + OFF_ZOOM] = zoom
                        for j in range(stride):
                            next_data.append(data[k + j])

        return next_data

    def _map(self, data: list[float], i: int, clone: bool = False) -> dict:
        if data[i + OFF_NUM] > 1:
            props = self.cluster_props[int(data[i + OFF_PROP])]
            return dict(props) if clone else props
        original = self.points[int(data[i + OFF_ID])]["tags"]
        mapper = self.options.map
        result = mapper(original) if mapper else original
        if clone and result is original:
            return dict(result) if result else {}
        return result

    # -- queries -------------------------------------------------------------

    def _limit_zoom(self, z: float) -> int:
        return max(self.options.min_zoom, min(int(math.floor(float(z))), self.options.max_zoom + 1))

    def get_clusters(self, bbox: list[float], zoom: float) -> list[dict]:
        return [feature_to_geojson(f) for f in self._get_clusters_internal(bbox, zoom)]

    def _get_clusters_internal(self, bbox: list[float], zoom: float) -> list[dict]:
        min_lng = ((bbox[0] + 180) % 360 + 360) % 360 - 180
        min_lat = max(-90.0, min(90.0, bbox[1]))
        max_lng = 180.0 if bbox[2] == 180 else ((bbox[2] + 180) % 360 + 360) % 360 - 180
        max_lat = max(-90.0, min(90.0, bbox[3]))

        if bbox[2] - bbox[0] >= 360:
            min_lng, max_lng = -180.0, 180.0
        elif min_lng > max_lng:
            east = self._get_clusters_internal([min_lng, min_lat, 180, max_lat], zoom)
            west = self._get_clusters_internal([-180, min_lat, max_lng, max_lat], zoom)
            return east + west

        tree = self.trees[self._limit_zoom(zoom)]
        ids = tree.range(project_x(min_lng), project_y(max_lat), project_x(max_lng), project_y(min_lat))
        data = tree.flat_data
        out = []
        for tid in ids:
            k = self.stride * tid
            if data[k + OFF_NUM] > 1:
                out.append(_cluster_feature_internal(data, k, self.stride, self.cluster_props))
            else:
                out.append(self.points[int(data[k + OFF_ID])])
        return out

    def get_children(self, cluster_id: int) -> list[dict]:
        origin_id = self._origin_id(cluster_id)
        origin_zoom = self._origin_zoom(cluster_id)
        err = ValueError(f"No cluster with the specified id: {cluster_id}")

        tree = self.trees.get(origin_zoom)
        if tree is None:
            raise err
        data = tree.flat_data
        if origin_id * self.stride >= len(data):
            raise err

        r = self.options.radius / (self.options.extent * math.pow(2, origin_zoom - 1))
        x = data[origin_id * self.stride]
        y = data[origin_id * self.stride + 1]
        ids = tree.within(x, y, r)
        children = []
        for tid in ids:
            k = tid * self.stride
            if data[k + OFF_PARENT] == cluster_id:
                if data[k + OFF_NUM] > 1:
                    children.append(_cluster_geojson(data, k, self.cluster_props, self.stride))
                else:
                    children.append(feature_to_geojson(self.points[int(data[k + OFF_ID])]))
        if not children:
            raise err
        return children

    def get_leaves(self, cluster_id: int, limit: int = 10, offset: int = 0) -> list[dict]:
        limit = limit or 10
        offset = offset or 0
        leaves: list[dict] = []
        self._append_leaves(leaves, cluster_id, limit, offset, 0)
        return leaves

    def _append_leaves(self, result: list[dict], cluster_id: int, limit: int, offset: int, skipped: int) -> int:
        for child in self.get_children(cluster_id):
            props = child.get("properties")
            if props and props.get("cluster"):
                if skipped + props["point_count"] <= offset:
                    skipped += props["point_count"]
                else:
                    skipped = self._append_leaves(result, props["cluster_id"], limit, offset, skipped)
            elif skipped < offset:
                skipped += 1
            else:
                result.append(child)
            if len(result) == limit:
                break
        return skipped

    def get_cluster_expansion_zoom(self, cluster_id: int) -> int:
        return self._origin_zoom(cluster_id)

    def get_tile(self, z: float, x: int, y: int) -> Optional[dict]:
        tree = self.trees.get(self._limit_zoom(z))
        if tree is None:
            return None
        z2 = math.pow(2, z)
        options = self.options
        p = options.radius / options.extent
        top = (y - p) / z2
        bottom = (y + 1 + p) / z2

        tile = {"z": int(z), "x": x, "y": y, "features": [], "transformed": True, "source": None}
        self._add_tile_features(
            tree.range((x - p) / z2, top, (x + 1 + p) / z2, bottom), tree.flat_data, x, y, z2, tile
        )
        if x == 0:
            self._add_tile_features(
                tree.range(1 - p / z2, top, 1, bottom), tree.flat_data, z2, y, z2, tile
            )
        if x == z2 - 1:
            self._add_tile_features(
                tree.range(0, top, p / z2, bottom), tree.flat_data, -1, y, z2, tile
            )
        return tile

    def _add_tile_features(self, ids: list[int], data: list[float], x, y, z2, tile: dict) -> None:
        options = self.options
        for i in ids:
            k = i * self.stride
            is_cluster = data[k + OFF_NUM] > 1
            if is_cluster:
                tags = _cluster_properties(data, k, self.cluster_props, self.stride)
                px = data[k]
                py = data[k + 1]
            else:
                p = self.points[int(data[k + OFF_ID])]
                tags = p["tags"]
                px, py = p["geometry"][0], p["geometry"][1]

            f = {
                "type": 1,
                "geometry": [
                    [
                        int(math.floor(options.extent * (px * z2 - x) + 0.5)),
                        int(math.floor(options.extent * (py * z2 - y) + 0.5)),
                    ]
                ],
                "tags": tags,
            }
            if is_cluster or options.generate_id:
                fid: Any = int(data[k + OFF_ID])
            else:
                fid = self.points[int(data[k + OFF_ID])]["id"]
            if fid is not None:
                f["id"] = fid
            tile["features"].append(f)

    def _origin_id(self, cluster_id: int) -> int:
        return (cluster_id - len(self.points)) >> 5

    def _origin_zoom(self, cluster_id: int) -> int:
        return (cluster_id - len(self.points)) % 32


def _cluster_feature_internal(data: list[float], i: int, stride: int, cluster_props: list[dict]) -> dict:
    return {
        "id": int(data[i + OFF_ID]),
        "type": "Point",
        "tags": _cluster_properties(data, i, cluster_props, stride),
        "geometry": [data[i], data[i + 1]],
        "minX": data[i],
        "minY": data[i + 1],
        "maxX": data[i],
        "maxY": data[i + 1],
    }


def _cluster_geojson(data: list[float], i: int, cluster_props: list[dict], stride: int = 6) -> dict:
    return {
        "type": "Feature",
        "id": int(data[i + OFF_ID]),
        "properties": _cluster_properties(data, i, cluster_props, stride),
        "geometry": {
            "type": "Point",
            "coordinates": [unproject_x(data[i]), unproject_y(data[i + 1])],
        },
    }


def _js_round(v: float) -> int:
    return int(math.floor(v + 0.5))


def _js_num(v: float) -> Any:
    return int(v) if v == int(v) else v


def cluster_tags(cluster_id: int, count: int) -> dict:
    """The reference's cluster feature properties for a (cluster_id, count)
    pair — the single source of the point_count abbreviation rules
    (`src/cluster-tile-index.ts:502-516`), shared with the distributed
    cascade's getTile."""
    if count >= 10000:
        abbrev: Any = f"{_js_round(count / 1000)}k"
    elif count >= 1000:
        abbrev = f"{_js_num(_js_round(count / 100) / 10)}k"
    else:
        abbrev = count
    return {
        "cluster": True,
        "cluster_id": cluster_id,
        "point_count": count,
        "point_count_abbreviated": abbrev,
    }


def _cluster_properties(
    data: list[float], i: int, cluster_props: list[dict], stride: int = 6
) -> dict:
    count = int(data[i + OFF_NUM])
    # stride-6 rows carry no prop slot (reduce off) → empty base properties
    prop_index = int(data[i + OFF_PROP]) if stride == 7 else -1
    in_range = 0 <= prop_index < len(cluster_props)
    properties = dict(cluster_props[prop_index]) if (prop_index != -1 and in_range) else {}
    properties.update(cluster_tags(int(data[i + OFF_ID]), count))
    return properties
