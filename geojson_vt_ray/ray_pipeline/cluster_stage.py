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

import json
import math
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

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

        # Ray Data does not preserve block order by default
        # (preserve_order=False): the greedy is order-dependent, so the
        # single holder defines input order as ascending image_id — the
        # image table's zero-padded ids make that the ingest order
        order = pc.sort_indices(batch.column("image_id"))
        batch = batch.take(order)
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


def _greedy_cluster(xs, ys, weights, r: float, min_points: int):
    """The per-cell greedy radius clustering shared by the single-zoom grid
    variant (unit weights) and the weighted cascade levels: returns
    (px, py, count, seed_index) per output cluster/point, iterating seeds
    in row order like the reference greedy."""
    n = len(xs)
    visited = np.zeros(n, dtype=bool)
    px: list[float] = []
    py: list[float] = []
    counts: list[int] = []
    seeds: list[int] = []
    for i in range(n):
        if visited[i]:
            continue
        visited[i] = True
        d2 = (xs - xs[i]) ** 2 + (ys - ys[i]) ** 2
        members = np.nonzero((~visited) & (d2 <= r * r))[0]
        total = int(weights[i] + weights[members].sum())
        if total >= min_points and len(members) > 0:
            visited[members] = True
            px.append((xs[i] * weights[i] + (xs[members] * weights[members]).sum()) / total)
            py.append((ys[i] * weights[i] + (ys[members] * weights[members]).sum()) / total)
            counts.append(total)
        else:
            px.append(float(xs[i]))
            py.append(float(ys[i]))
            counts.append(int(weights[i]))
        seeds.append(i)
    return px, py, counts, seeds


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

    from .blocking import assign_chunks, chunk_counts_for, scan_monsters

    def _mx_my_cells(batch: pa.Table):
        from ..datagen.images import mercator_xy

        mx, my = mercator_xy(batch.column("phash").to_numpy())
        cx = np.floor(mx / cell).astype(np.int64)
        cy = np.floor(my / cell).astype(np.int64)
        return mx, my, cx * 1_000_003 + cy

    monsters = scan_monsters(
        points.map_batches(
            lambda b: pa.table({"cell": pa.array(_mx_my_cells(b)[2])}),
            batch_format="pyarrow",
        ),
        ["cell"],
        cell_cap,
    )
    monsters_ref = _ray.put(monsters)

    def assign(batch: pa.Table) -> pa.Table:
        mx, my, key = _mx_my_cells(batch)
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
        px, py, counts, _ = _greedy_cluster(
            xs, ys, np.ones(len(xs), dtype=np.int64), r, options.min_points
        )
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


# ------------------------------------------------- all-zooms cluster cascade

# px/py: the tree (fround'd) coordinates every range query runs on;
# opx/opy: the coordinates a consumer surfaces — the ORIGINAL source
# geometry for singleton points (reference getClusters returns the source
# feature, not its fround'd tree copy) and == px/py for cluster rows.
_CASCADE_SCHEMA = {
    "zoom": pa.int32(),
    "cluster_id": pa.int64(),
    "point_id": pa.string(),
    "point_count": pa.int64(),
    "px": pa.float64(),
    "py": pa.float64(),
    "opx": pa.float64(),
    "opy": pa.float64(),
    # original feature tags for singletons (JSON; "null" when absent),
    # "" for cluster rows — cluster tags derive from count + id
    "tags_json": pa.string(),
    # drill-down linkage (exact cascade only; -1 in the grid variant):
    # parent_cid = the cluster at the next-shallower zoom that absorbed
    # this row (reference OFF_PARENT, set while level z-1 consumes level
    # z); child_seq = this row's position in its parent's children as the
    # reference enumerates them (tree.within order at the origin zoom) —
    # together they make getChildren/getLeaves pure filters over the
    # persisted cascade
    "parent_cid": pa.int64(),
    "child_seq": pa.int32(),
}


def _cascade_table(cols: dict) -> pa.Table:
    return pa.table({k: pa.array(cols[k], t) for k, t in _CASCADE_SCHEMA.items()})


def mercator_points(points: "ray.data.Dataset") -> "ray.data.Dataset":
    """(image_id, phash) rows → (pid, px, py) mercator point rows (the
    cascade input shape, so non-phash sources can feed the same stages)."""

    def fn(batch: pa.Table) -> pa.Table:
        from ..datagen.images import mercator_xy

        mx, my = mercator_xy(batch.column("phash").to_numpy())
        return pa.table(
            {
                "pid": batch.column("image_id").cast(pa.string()),
                "px": pa.array(mx),
                "py": pa.array(my),
            }
        )

    return points.map_batches(fn, batch_format="pyarrow")


def cluster_cascade_exact(
    points: "ray.data.Dataset", options: Optional[ClusterOptions] = None
) -> "ray.data.Dataset":
    """The reference's full minZoom→maxZoom cluster cascade in one Ray pass
    (`src/cluster-tile-index.ts:109-156`): level z clusters level z+1's
    output; every zoom's clusters (plus the raw maxZoom+1 level) emit as
    rows (zoom, cluster_id, point_id, point_count, px, py).

    Bit-exact single-holder path (the greedy is order-dependent, same
    one-node cap as the reference); `cluster_cascade_grid` is the scale-out
    variant. Input: (pid, px, py) mercator point rows (`mercator_points`).

    Input-order contract: Ray does not preserve block order
    (preserve_order=False), so the holder defines processing order as
    ascending pid STRING order. To reproduce a specific ingest order, feed
    well-ordered pids (the image table's zero-padded image_id qualifies;
    bare numeric strings sort "10" < "2" and will NOT match an index built
    in numeric order).
    """
    options = options or ClusterOptions()

    def run(batch: pa.Table) -> pa.Table:
        from ..cluster import ClusterIndex
        from ..cluster.index import OFF_ID, OFF_NUM, OFF_PARENT

        # deterministic input order (see cluster_tiles_exact): ascending pid
        batch = batch.take(pc.sort_indices(batch.column("pid")))
        pids = batch.column("pid").to_pylist()
        px = batch.column("px").to_numpy()
        py = batch.column("py").to_numpy()
        # optional original-feature tags (JSON strings) ride through to the
        # cascade's singleton rows, so getLeaves surfaces real properties
        tags_in = (
            [json.loads(t) if t else None for t in batch.column("tags_json").to_pylist()]
            if "tags_json" in batch.column_names
            else [None] * len(pids)
        )
        feats = [
            {
                "id": pids[i],
                "type": "Point",
                "geometry": [float(px[i]), float(py[i])],
                "tags": tags_in[i],
                "minX": 0.0, "minY": 0.0, "maxX": 0.0, "maxY": 0.0,
            }
            for i in range(len(pids))
        ]
        index = ClusterIndex(options)
        index.initialize(feats)
        stride = index.stride
        n_pts = len(index.points)

        # child ordinals: for every parent cluster, enumerate its children
        # exactly as the reference getChildren does (tree.within at the
        # origin zoom around the SEED row's coords, keep parent matches in
        # traversal order) — persisting the ordinal makes the distributed
        # getLeaves pagination bit-identical to the local walk
        child_rank: dict[tuple[int, int], int] = {}
        for z, tree in index.trees.items():
            data = tree.flat_data
            parent_ids = {
                int(data[i + OFF_PARENT])
                for i in range(0, len(data), stride)
                if data[i + OFF_PARENT] != -1
            }
            for cid in parent_ids:
                origin_zoom = (cid - n_pts) % 32
                origin_id = (cid - n_pts) >> 5
                x = data[origin_id * stride]
                y = data[origin_id * stride + 1]
                r = options.radius / (options.extent * math.pow(2, origin_zoom - 1))
                seq = 0
                for tid in tree.within(x, y, r):
                    if data[tid * stride + OFF_PARENT] == cid:
                        child_rank[(z, tid)] = seq
                        seq += 1

        out = {k: [] for k in _CASCADE_SCHEMA}
        for z in range(options.min_zoom, options.max_zoom + 2):
            data = index.trees[z].flat_data
            for i in range(0, len(data), stride):
                is_cluster = data[i + OFF_NUM] > 1
                out["zoom"].append(z)
                out["cluster_id"].append(int(data[i + OFF_ID]) if is_cluster else -1)
                out["px"].append(data[i])
                out["py"].append(data[i + 1])
                if is_cluster:
                    out["point_id"].append("")
                    out["opx"].append(data[i])
                    out["opy"].append(data[i + 1])
                    out["tags_json"].append("")
                else:
                    p = index.points[int(data[i + OFF_ID])]
                    out["point_id"].append(str(p["id"]))
                    out["opx"].append(float(p["geometry"][0]))
                    out["opy"].append(float(p["geometry"][1]))
                    out["tags_json"].append(json.dumps(p.get("tags")))
                out["point_count"].append(int(data[i + OFF_NUM]))
                out["parent_cid"].append(int(data[i + OFF_PARENT]))
                out["child_seq"].append(child_rank.get((z, i // stride), -1))
        return _cascade_table(out)

    return points.repartition(1).map_batches(
        run, batch_format="pyarrow", batch_size=None, concurrency=1
    )


def cluster_cascade_grid(
    points: "ray.data.Dataset",
    options: Optional[ClusterOptions] = None,
    cell_cap: int = 65536,
) -> "ray.data.Dataset":
    """Scale-out all-zooms cascade: level z greedy-grid-clusters level z+1's
    output (weighted centroids, point_count-weighted min_points), exactly
    the reference's level-feeds-level structure but with the per-cell
    documented deviation of `grid_cluster_tiles` at every level.

    Each level materializes before feeding the next (the level outputs
    shrink geometrically; the reference likewise holds every zoom's tree in
    memory) — without it, level z's lineage would recompute all deeper
    levels per consumer. Hot cells chunk via the shared blocking pattern.
    """
    import ray as _ray

    from .blocking import assign_chunks, chunk_counts_for, scan_monsters

    options = options or ClusterOptions()

    def to_level(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        px = batch.column("px").to_numpy()
        py = batch.column("py").to_numpy()
        return _cascade_table(
            {
                "zoom": np.full(n, options.max_zoom + 1, dtype=np.int32),
                "cluster_id": np.full(n, -1, dtype=np.int64),
                "point_id": batch.column("pid").to_pylist(),
                "point_count": np.ones(n, dtype=np.int64),
                "px": px,
                "py": py,
                "opx": px,
                "opy": py,
                "tags_json": ["null"] * n,
                # the grid variant carries no drill linkage (documented
                # deviation — its cluster ids are synthetic labels)
                "parent_cid": np.full(n, -1, dtype=np.int64),
                "child_seq": np.full(n, -1, dtype=np.int32),
            }
        )

    level = points.map_batches(to_level, batch_format="pyarrow").materialize()
    levels = [level]

    for z in range(options.max_zoom, options.min_zoom - 1, -1):
        r = options.radius / (options.extent * math.pow(2, z))
        cell = 4 * r

        def cells_of(batch: pa.Table) -> np.ndarray:
            cx = np.floor(batch.column("px").to_numpy() / cell).astype(np.int64)
            cy = np.floor(batch.column("py").to_numpy() / cell).astype(np.int64)
            return cx * 1_000_003 + cy

        monsters = scan_monsters(
            level.map_batches(
                lambda b: pa.table({"cell": pa.array(cells_of(b))}),
                batch_format="pyarrow",
            ),
            ["cell"],
            cell_cap,
        )
        monsters_ref = _ray.put(monsters)

        def assign(batch: pa.Table) -> pa.Table:
            key = cells_of(batch)
            mons = _ray.get(monsters_ref)
            if mons:
                pchunk = assign_chunks(chunk_counts_for(key, mons), key).astype(np.int32)
            else:
                pchunk = np.zeros(len(key), dtype=np.int32)
            return batch.append_column("cell", pa.array(key)).append_column(
                "pchunk", pa.array(pchunk)
            )

        zc, rc, min_pts = z, r, options.min_points

        def cluster_cell(g: pa.Table) -> pa.Table:
            xs = g.column("px").to_numpy()
            ys = g.column("py").to_numpy()
            opxs = g.column("opx").to_numpy()
            opys = g.column("opy").to_numpy()
            cnt = g.column("point_count").to_numpy()
            pids = g.column("point_id")
            tjs = g.column("tags_json")
            cids = g.column("cluster_id").to_numpy()
            out = {k: [] for k in _CASCADE_SCHEMA}
            # deterministic synthetic cluster id: splitmix64-style mix of
            # (zoom, cell, chunk, ordinal), folded into non-negative int63.
            # Structured bit-packing would collide deterministically once a
            # field overflows its slot (fine cells, >16 chunks); the mix is
            # collision-resistant (~n²/2^63) for any realistic cluster count
            # and these labels are only identity tags in the grid
            # (non-bit-exact) path.
            cell_key = int(g.column("cell")[0].as_py())
            chunk_key = int(g.column("pchunk")[0].as_py())
            m64 = (1 << 64) - 1
            seed = zc & 0xFFFF
            for part in (cell_key, chunk_key):
                seed = ((seed ^ (part & m64)) * 0x9E3779B97F4A7C15) & m64
            cpx, cpy, totals, seeds = _greedy_cluster(xs, ys, cnt, rc, min_pts)
            local = 0
            for j, i in enumerate(seeds):
                out["zoom"].append(zc)
                if totals[j] > cnt[i]:  # merged a cluster (weights >= 1)
                    h = ((seed ^ local) * 0xBF58476D1CE4E5B9) & m64
                    h ^= h >> 31
                    out["cluster_id"].append(h >> 1)
                    out["point_id"].append("")
                    out["point_count"].append(totals[j])
                    out["px"].append(cpx[j])
                    out["py"].append(cpy[j])
                    out["opx"].append(cpx[j])
                    out["opy"].append(cpy[j])
                    out["tags_json"].append("")
                    local += 1
                else:
                    out["cluster_id"].append(int(cids[i]))
                    out["point_id"].append(pids[i].as_py())
                    out["point_count"].append(int(cnt[i]))
                    out["px"].append(xs[i])
                    out["py"].append(ys[i])
                    out["opx"].append(opxs[i])
                    out["opy"].append(opys[i])
                    out["tags_json"].append(tjs[i].as_py())
                out["parent_cid"].append(-1)
                out["child_seq"].append(-1)
            return _cascade_table(out)

        level = (
            level.map_batches(assign, batch_format="pyarrow")
            .groupby(["cell", "pchunk"])
            .map_groups(cluster_cell, batch_format="pyarrow")
            .materialize()
        )
        levels.append(level)

    out = levels[0]
    for lv in levels[1:]:
        out = out.union(lv)
    return out


def get_clusters_bbox(
    cascade: "ray.data.Dataset",
    bbox: list,
    zoom: int,
    options: Optional[ClusterOptions] = None,
) -> "ray.data.Dataset":
    """`getClusters(bbox, zoom)` over an all-zooms cascade Dataset —
    reference semantics (`src/cluster-tile-index.ts:163-192`): lng
    normalization, antimeridian split, inclusive mercator range at
    limitZoom(zoom). Vectorized filter; no driver materialization."""
    from ..kernels.project import project_x, project_y

    options = options or ClusterOptions()
    zq = max(options.min_zoom, min(int(math.floor(float(zoom))), options.max_zoom + 1))

    min_lng = ((bbox[0] + 180) % 360 + 360) % 360 - 180
    min_lat = max(-90.0, min(90.0, bbox[1]))
    max_lng = 180.0 if bbox[2] == 180 else ((bbox[2] + 180) % 360 + 360) % 360 - 180
    max_lat = max(-90.0, min(90.0, bbox[3]))
    if bbox[2] - bbox[0] >= 360:
        min_lng, max_lng = -180.0, 180.0

    ranges = (
        [(min_lng, 180.0), (-180.0, max_lng)] if min_lng > max_lng else [(min_lng, max_lng)]
    )
    xr = [(project_x(a), project_x(b)) for a, b in ranges]
    y0, y1 = project_y(max_lat), project_y(min_lat)

    def filt(batch: pa.Table) -> pa.Table:
        z = batch.column("zoom").to_numpy()
        px = batch.column("px").to_numpy()
        py = batch.column("py").to_numpy()
        keep = np.zeros(len(z), dtype=bool)
        for x0, x1 in xr:
            keep |= (px >= x0) & (px <= x1)
        keep &= (z == zq) & (py >= y0) & (py <= y1)
        return batch.filter(pa.array(keep))

    return cascade.map_batches(filt, batch_format="pyarrow")


def write_cluster_cascade(cascade: "ray.data.Dataset", out_dir: str) -> dict:
    """Persist an all-zooms cascade as zoom-partitioned Parquet
    (``out/zoom=<z>/``): a map client reads one zoom's directory per view.
    Reruns OVERWRITE the directory (append would silently double every
    previously-written partition). Returns per-zoom row counts — counted
    with local glob, so the count verification only works for local paths
    (the sandbox storage shape); remote URIs write fine but report 0."""
    cascade.write_parquet(out_dir, partition_cols=["zoom"], mode="overwrite")
    import glob
    import os

    import pyarrow.parquet as _pq

    counts: dict[int, int] = {}
    for d in sorted(glob.glob(os.path.join(out_dir, "zoom=*"))):
        z = int(os.path.basename(d).split("=")[1])
        counts[z] = sum(
            _pq.ParquetFile(p).metadata.num_rows
            for p in glob.glob(os.path.join(d, "*.parquet"))
        )
    return {"zooms": counts, "rows": sum(counts.values())}


def read_cluster_cascade(out_dir: str, zoom: int | None = None) -> "ray.data.Dataset":
    """Read a written cascade back as a Dataset; ``zoom`` prunes to one
    partition directory (only that zoom's files are touched)."""
    import os

    path = os.path.join(out_dir, f"zoom={zoom}") if zoom is not None else out_dir
    ds = ray.data.read_parquet(path)

    def fix_zoom(batch: pa.Table) -> pa.Table:
        # hive partitioning surfaces the partition value as a string (or
        # drops it when reading one directory); restore the int32 column
        if "zoom" in batch.column_names:
            idx = batch.column_names.index("zoom")
            return batch.set_column(
                idx, "zoom", batch.column("zoom").cast(pa.int32())
            )
        return batch.append_column(
            "zoom", pa.array(np.full(batch.num_rows, zoom, dtype=np.int32))
        )

    return ds.map_batches(fix_zoom, batch_format="pyarrow")


def get_cluster_tile(
    cascade: "ray.data.Dataset",
    z: int,
    x: int,
    y: int,
    options: Optional[ClusterOptions] = None,
):
    """`getTile(z, x, y)` over an all-zooms cascade Dataset — reference
    semantics (`src/cluster-tile-index.ts:248-284`): radius-padded inclusive
    range query at limitZoom(z) over the tree coordinates, plus the x-edge
    neighbor pulls that wrap dateline clusters into x==0 / x==2^z-1 tiles.
    Returns the reference tile dict (`{z, x, y, features, ...}`, extent
    coords via the JS round); an in-range tile with no matching rows is an
    empty-features tile, never None, matching the reference's
    tree-exists-but-empty behavior. The range filter runs distributed and
    only the tile's own features reach the driver.

    Notes vs the local `ClusterIndex.get_tile`: singleton feature ids
    surface as the cascade's strings; `generate_id` and cluster
    `map`/`reduce` extra properties are not carried by the cascade rows
    (use the exact local index for those).
    """
    options = options or ClusterOptions()
    zq = max(options.min_zoom, min(int(math.floor(float(z))), options.max_zoom + 1))
    z2 = float(2**z)
    p = options.radius / options.extent

    # (x_query_lo, x_query_hi, x_transform) per range pull
    pulls = [((x - p) / z2, (x + 1 + p) / z2, float(x))]
    if x == 0:
        pulls.append((1 - p / z2, 1.0, z2))
    if x == z2 - 1:
        pulls.append((0.0, p / z2, -1.0))
    y0, y1 = (y - p) / z2, (y + 1 + p) / z2

    def filt(batch: pa.Table) -> pa.Table:
        zc = batch.column("zoom").to_numpy()
        px = batch.column("px").to_numpy()
        py = batch.column("py").to_numpy()
        base = (zc == zq) & (py >= y0) & (py <= y1)
        keep_parts = []
        xoff = []
        for lo, hi, xt in pulls:
            m = base & (px >= lo) & (px <= hi)
            keep_parts.append(np.nonzero(m)[0])
            xoff.append(np.full(int(m.sum()), xt))
        idx = np.concatenate(keep_parts)
        sub = batch.take(pa.array(idx))
        return sub.append_column(
            "tile_x", pa.array(np.concatenate(xoff) if len(idx) else np.array([], dtype=np.float64))
        )

    rows = cascade.map_batches(filt, batch_format="pyarrow").take_all()
    if not rows:
        # the reference getTile returns a tile with an empty feature list
        # whenever the zoom's tree exists (cluster-tile-index.ts:248-284) —
        # zq is clamped into the cascade's zoom range above, so an empty
        # range query is an EMPTY TILE, not a missing one
        return {
            "z": int(z), "x": x, "y": y,
            "features": [], "transformed": True, "source": None,
        }

    from ..cluster.index import _js_round as js_round
    from ..cluster.index import cluster_tags

    features = []
    for r in rows:
        is_cluster = r["point_count"] > 1
        if is_cluster:
            tags = cluster_tags(int(r["cluster_id"]), int(r["point_count"]))
            px_out, py_out = r["px"], r["py"]
        else:
            tags = json.loads(r["tags_json"]) if r["tags_json"] else None
            px_out, py_out = r["opx"], r["opy"]
        f = {
            "type": 1,
            "geometry": [
                [
                    js_round(options.extent * (px_out * z2 - r["tile_x"])),
                    js_round(options.extent * (py_out * z2 - y)),
                ]
            ],
            "tags": tags,
        }
        fid = int(r["cluster_id"]) if is_cluster else (r["point_id"] or None)
        if fid is not None:
            f["id"] = fid
        features.append(f)
    return {"z": int(z), "x": x, "y": y, "features": features, "transformed": True, "source": None}


# ------------------------------------------------ distributed drill-down APIs

def cascade_num_points(
    cascade: "ray.data.Dataset", options: Optional[ClusterOptions] = None
) -> int:
    """The original point count of a cascade — the cluster-id offset every
    drill API needs (reference ids encode ``(index << 5) + zoom + n_points``,
    `src/cluster-tile-index.ts:430`). One distributed partial-count pass over
    the raw (maxZoom+1) level; no rows reach the driver."""
    options = options or ClusterOptions()
    raw_z = options.max_zoom + 1

    def partial(batch: pa.Table) -> pa.Table:
        n = int(pc.sum(pc.equal(batch.column("zoom"), raw_z)).as_py() or 0)
        return pa.table({"n": pa.array([n], pa.int64())})

    total = cascade.map_batches(partial, batch_format="pyarrow").sum("n")
    return int(total or 0)


def _origin_zoom_of(cluster_id: int, n_points: int) -> int:
    return (cluster_id - n_points) % 32


def _cascade_point_feature(row: dict) -> dict:
    """Singleton cascade row → GeoJSON Feature (the shape
    `kernels.deconvert.feature_to_geojson` produces for a source point).
    Ids surface as the cascade's strings (same note as `get_cluster_tile`)."""
    from ..kernels.project import unproject_x, unproject_y

    out = {
        "type": "Feature",
        "geometry": {
            "type": "Point",
            "coordinates": [unproject_x(row["opx"]), unproject_y(row["opy"])],
        },
        "properties": json.loads(row["tags_json"]) if row["tags_json"] else None,
    }
    if row["point_id"]:
        out["id"] = row["point_id"]
    return out


def _cascade_cluster_feature(row: dict) -> dict:
    """Cluster cascade row → GeoJSON Feature (reference clusterToGeoJSON;
    `map`/`reduce` extra properties are not carried by cascade rows — use
    the exact local index for those)."""
    from ..cluster.index import cluster_tags
    from ..kernels.project import unproject_x, unproject_y

    return {
        "type": "Feature",
        "id": int(row["cluster_id"]),
        "properties": cluster_tags(int(row["cluster_id"]), int(row["point_count"])),
        "geometry": {
            "type": "Point",
            "coordinates": [unproject_x(row["px"]), unproject_y(row["py"])],
        },
    }


def _fetch_children_rows(
    cascade: "ray.data.Dataset", cluster_ids: set, n_points: int
) -> dict[int, list[dict]]:
    """Children rows for a SET of clusters in one distributed scan: filter
    on (zoom ∈ origin zooms, parent_cid ∈ ids) — vectorized np.isin per
    batch, only matching rows reach the driver (bounded by the requested
    clusters' child counts). Returns {cluster_id: rows sorted by child_seq}."""
    cid_arr = np.fromiter(cluster_ids, dtype=np.int64, count=len(cluster_ids))
    z_arr = np.unique((cid_arr - n_points) % 32)

    def filt(batch: pa.Table) -> pa.Table:
        keep = np.isin(batch.column("zoom").to_numpy(), z_arr) & np.isin(
            batch.column("parent_cid").to_numpy(), cid_arr
        )
        return batch.filter(pa.array(keep))

    rows = cascade.map_batches(filt, batch_format="pyarrow").take_all()
    out: dict[int, list[dict]] = {int(c): [] for c in cid_arr}
    for r in rows:
        # a parent's children live exactly at its origin zoom; the id-space
        # makes (zoom, parent_cid) collisions across requested ids impossible
        out[int(r["parent_cid"])].append(r)
    for v in out.values():
        v.sort(key=lambda r: r["child_seq"])
    return out


def get_cluster_children(
    cascade: "ray.data.Dataset",
    cluster_id: int,
    n_points: int,
    options: Optional[ClusterOptions] = None,
) -> list[dict]:
    """`getChildren(clusterId)` over a persisted exact cascade — reference
    semantics (`src/cluster-tile-index.ts:198-213`): the rows at the
    cluster's origin zoom whose ``parent_cid`` matches, in the reference's
    enumeration order (persisted ``child_seq``). One distributed filter;
    only the children reach the driver. Raises ValueError for unknown ids,
    like the local `ClusterIndex.get_children`."""
    kids = _fetch_children_rows(cascade, {int(cluster_id)}, n_points)[int(cluster_id)]
    if not kids:
        raise ValueError(f"No cluster with the specified id: {cluster_id}")
    return [
        _cascade_cluster_feature(r) if r["point_count"] > 1 else _cascade_point_feature(r)
        for r in kids
    ]


def get_cluster_expansion_zoom(cluster_id: int, n_points: int) -> int:
    """`getClusterExpansionZoom(clusterId)` — pure id arithmetic (the id
    encodes its origin zoom), matching the local
    `ClusterIndex.get_cluster_expansion_zoom`."""
    return _origin_zoom_of(int(cluster_id), n_points)


def get_cluster_leaves(
    cascade: "ray.data.Dataset",
    cluster_id: int,
    n_points: int,
    limit: int = 10,
    offset: int = 0,
    options: Optional[ClusterOptions] = None,
) -> list[dict]:
    """`getLeaves(clusterId, limit, offset)` over a persisted exact cascade —
    the reference's depth-first paginated walk
    (`src/cluster-tile-index.ts:215-240, 294-320`) with the same
    skip-by-point_count subtree pruning, executed as BATCHED distributed
    fetches: each round expands every cluster the walk still needs in ONE
    cascade scan (`_fetch_children_rows`), so the number of distributed
    queries is bounded by the walk's depth (≤ 32 zooms), not its fan-out,
    and only rows inside the pagination window's subtrees ever reach the
    driver. Leaf order and pagination are identical to the local
    `ClusterIndex.get_leaves` (pinned by the parity test)."""
    limit = limit or 10
    offset = offset or 0
    children_map: dict[int, list[dict]] = {}

    def walk(cid: int, taken: int, skipped: int, missing: set, out: list):
        """The reference _appendLeaves accounting over whatever children are
        already fetched; a cluster child whose subtree intersects the
        window but isn't fetched yet goes to ``missing`` and is accounted
        exactly (its subtree holds point_count leaves, consumed in order),
        so later siblings' windows stay correct while rounds proceed."""
        for r in children_map[cid]:
            if taken >= limit:
                break
            n_leaves = int(r["point_count"])
            if n_leaves > 1:
                if skipped + n_leaves <= offset:
                    skipped += n_leaves  # prune: window is past this subtree
                else:
                    child = int(r["cluster_id"])
                    if child in children_map:
                        taken, skipped = walk(child, taken, skipped, missing, out)
                    else:
                        missing.add(child)
                        skip_in = max(0, offset - skipped)
                        take = min(n_leaves - skip_in, limit - taken)
                        skipped += skip_in
                        taken += take
            elif skipped < offset:
                skipped += 1
            else:
                out.append(r)
                taken += 1
        return taken, skipped

    need = {int(cluster_id)}
    while need:
        children_map.update(_fetch_children_rows(cascade, need, n_points))
        if not children_map[int(cluster_id)]:
            raise ValueError(f"No cluster with the specified id: {cluster_id}")
        missing: set = set()
        rows: list[dict] = []
        walk(int(cluster_id), 0, 0, missing, rows)
        need = missing - set(children_map)
        if not missing:
            return [_cascade_point_feature(r) for r in rows]
    return []
