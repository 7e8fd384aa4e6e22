"""Clustering as a Ray stage.

Exact mode: the reference algorithm is greedy and order-dependent
(`src/cluster-tile-index.ts:378-458` — iteration in index order, sequential
zoom cascade), so bit-parity requires a single holder of the full point set:
``repartition(1)`` + one map_batches call over the whole block (an actor-pool
of size 1). That caps exact mode at points-that-fit-one-node — the same cap
the reference has.

Scale mode (``grid_cluster_tiles``): a documented deviation — greedy
clustering runs per grid cell of side ``4r`` via ``groupby(cell)``, with
points within ``r`` of a cell border handled by assigning clusters to the
cell of their seed point. Cluster counts/centroids match the reference
closely but not bit-exactly; use it when the point set outgrows one node.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np
import pyarrow as pa

import ray.data

from ..options import ClusterOptions


def cluster_tiles_exact(
    points: "ray.data.Dataset",
    options: Optional[ClusterOptions] = None,
    zoom: int = 0,
) -> "ray.data.Dataset":
    """Cluster phash-georeferenced image points and emit all zoom-``zoom``
    cluster-tile rows (cluster_id, point_count, tile x/y, px, py)."""
    options = options or ClusterOptions()

    def run(batch: pa.Table) -> pa.Table:
        from ..cluster import ClusterIndex
        from ..datagen.images import mercator_xy

        mx, my = mercator_xy(batch.column("phash").to_numpy())
        ids = batch.column("image_id").to_pylist()
        feats = [
            {
                "id": ids[i],
                "type": "Point",
                "geometry": [float(mx[i]), float(my[i])],
                "tags": None,
                "minX": 0.0,
                "minY": 0.0,
                "maxX": 0.0,
                "maxY": 0.0,
            }
            for i in range(len(ids))
        ]
        index = ClusterIndex(options)
        index.initialize(feats)

        out = {
            "x": [], "y": [], "cluster_id": [], "point_count": [], "px": [], "py": [],
        }
        z2 = 1 << zoom
        for ty in range(z2):
            for tx in range(z2):
                tile = index.get_tile(zoom, tx, ty)
                if not tile:
                    continue
                for f in tile["features"]:
                    tags = f["tags"] or {}
                    out["x"].append(tx)
                    out["y"].append(ty)
                    out["cluster_id"].append(int(f.get("id", -1)) if tags.get("cluster") else -1)
                    out["point_count"].append(int(tags.get("point_count", 1)))
                    out["px"].append(f["geometry"][0][0])
                    out["py"].append(f["geometry"][0][1])
        return pa.table(
            {
                "x": pa.array(out["x"], pa.int32()),
                "y": pa.array(out["y"], pa.int32()),
                "cluster_id": pa.array(out["cluster_id"], pa.int64()),
                "point_count": pa.array(out["point_count"], pa.int64()),
                "px": pa.array(out["px"], pa.int64()),
                "py": pa.array(out["py"], pa.int64()),
            }
        )

    return points.repartition(1).map_batches(
        run, batch_format="pyarrow", batch_size=None, concurrency=1
    )


def grid_cluster_tiles(
    points: "ray.data.Dataset",
    options: Optional[ClusterOptions] = None,
    zoom: int = 0,
    cell_cap: int = 65536,
) -> "ray.data.Dataset":
    """Scale-out greedy clustering per grid cell (deviation documented above).

    Cell side = 4r at the target zoom; each cell clusters its own points
    greedily in (cell-local) index order. Border effects are bounded by r.

    Skew guard: a cell holding more than ``cell_cap`` points (a degenerate
    all-in-one-spot corpus) splits round-robin into ceil(n/cap) sub-chunks
    clustered independently — no task runs the O(n²)-per-cell greedy over
    more than ~cap points. An over-cap cell then emits up to one cluster
    per (true cluster × chunk); point_count totals are preserved (the
    approximation error is bounded and this path is already the documented
    non-bit-exact variant).
    """
    options = options or ClusterOptions()
    r = options.radius / (options.extent * math.pow(2, zoom))
    cell = 4 * r

    import ray as _ray

    from .blocking import assign_chunks, chunk_counts_for, monster_chunks

    def _cells_of(batch: pa.Table) -> np.ndarray:
        from ..datagen.images import mercator_xy

        mx, my = mercator_xy(batch.column("phash").to_numpy())
        cx = np.floor(mx / cell).astype(np.int64)
        cy = np.floor(my / cell).astype(np.int64)
        return cx * 1_000_003 + cy

    monster_tbl = (
        points.map_batches(
            lambda b: pa.table({"cell": pa.array(_cells_of(b))}), batch_format="pyarrow"
        )
        .groupby("cell")
        .count()
        .filter(lambda row: row["count()"] > cell_cap)
        .to_pandas()
    )
    monsters = monster_chunks(monster_tbl, ["cell"], cell_cap)
    monsters_ref = _ray.put(monsters)

    def assign(batch: pa.Table) -> pa.Table:
        from ..datagen.images import mercator_xy

        mx, my = mercator_xy(batch.column("phash").to_numpy())
        key = _cells_of(batch)
        mons = _ray.get(monsters_ref)
        if mons:
            pchunk = assign_chunks(chunk_counts_for(key, mons), key).astype(np.int32)
        else:
            pchunk = np.zeros(len(key), dtype=np.int32)
        return pa.table(
            {
                "cell": pa.array(key),
                "pchunk": pa.array(pchunk),
                "mx": pa.array(mx),
                "my": pa.array(my),
                "image_id": batch.column("image_id"),
            }
        )

    def cluster_cell(g: pa.Table) -> pa.Table:
        xs = g.column("mx").to_numpy()
        ys = g.column("my").to_numpy()
        n = len(xs)
        visited = np.zeros(n, dtype=bool)
        px: list[float] = []
        py: list[float] = []
        counts: list[int] = []
        for i in range(n):
            if visited[i]:
                continue
            visited[i] = True
            d2 = (xs - xs[i]) ** 2 + (ys - ys[i]) ** 2
            members = np.nonzero((~visited) & (d2 <= r * r))[0]
            count = 1 + len(members)
            if count >= options.min_points and len(members) > 0:
                visited[members] = True
                px.append((xs[i] + xs[members].sum()) / count)
                py.append((ys[i] + ys[members].sum()) / count)
                counts.append(count)
            else:
                px.append(xs[i])
                py.append(ys[i])
                counts.append(1)
        return pa.table(
            {
                "px": pa.array(np.asarray(px, dtype=np.float64)),
                "py": pa.array(np.asarray(py, dtype=np.float64)),
                "point_count": pa.array(np.asarray(counts, dtype=np.int64)),
            }
        )

    cells = points.map_batches(assign, batch_format="pyarrow")
    return cells.groupby(["cell", "pchunk"]).map_groups(cluster_cell, batch_format="pyarrow")


def cluster_tiles(
    points: "ray.data.Dataset",
    options: Optional[ClusterOptions] = None,
    zoom: int = 0,
    exact_max_points: int = 2_000_000,
) -> "ray.data.Dataset":
    """Size-dispatching cluster stage.

    At or below ``exact_max_points`` the bit-exact single-holder greedy runs
    (`cluster_tiles_exact` — same one-process cap the reference has,
    `src/cluster-tile-index.ts:378-458`); above it the grid-cell scale-out
    variant runs (documented deviation — the reference cannot process such
    inputs at all, so there is no bit-parity contract to preserve there).

    Note: the size probe is a ``count()`` — cheap on materialized inputs,
    one extra pass on lazy ones.
    """
    if points.count() <= exact_max_points:
        return cluster_tiles_exact(points, options, zoom)
    return grid_cluster_tiles(points, options, zoom)
