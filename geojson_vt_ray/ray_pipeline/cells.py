"""Cell-index spatial stages: curve-cell assignment and co-partitioned
per-cell joins (the "both sides large" scale path).

`knn_join` (spatial.py) broadcasts the query side — right when queries
are a handful. When BOTH sides are large (the north-rule regime: every
image row queries its neighborhood at 10^12 rows), nothing may be
broadcast: both sides hash-partition by curve cell and each cell joins
locally against a 3×3 halo. Exactness contract: with `radius ≤ 1/2^level`
(one cell side), every true neighbor within `radius` lies in the 3×3
halo, so the per-cell join is exhaustive — no recall loss, unlike
LSH-style candidate generation.

At 100 TB the groupby key is the hilbert id: contiguous key ranges are
spatially compact, so range-partitioned shards keep halo traffic local.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..kernels.cells import (
    cell_neighbors,
    hilbert_encode,
    morton_encode,
)


def with_cell_id(
    ds: "ray.data.Dataset", level: int, curve: str = "hilbert"
) -> "ray.data.Dataset":
    """Add grid coords (cx, cy) and the curve cell id at `level` to a
    phash-georeferenced dataset. curve ∈ {"hilbert", "morton"}."""
    from ..datagen.images import tile_xy

    if curve not in ("hilbert", "morton"):
        raise ValueError(f"unknown curve {curve!r}")

    def fn(batch: pa.Table) -> pa.Table:
        cx, cy = tile_xy(batch.column("phash").to_numpy(), level)
        if curve == "hilbert":
            cid = hilbert_encode(cx, cy, level)
        else:
            cid = morton_encode(cx, cy)
        return batch.append_column("cx", pa.array(cx)).append_column(
            "cy", pa.array(cy)
        ).append_column("cell", pa.array(cid.astype(np.int64)))

    return ds.map_batches(fn, batch_format="pyarrow")


def with_s2_cell_id(ds: "ray.data.Dataset", level: int) -> "ray.data.Dataset":
    """Add the spherical S2-style cell id (kernels/s2.py: cube face +
    quadratic ST + orientation-chained Hilbert curve, 64-bit S2CellId
    layout) to a phash-georeferenced dataset. Emitted as int64 (two's
    complement of the uint64 id) so it round-trips through Arrow/SQL.

    This is the planet-scale shuffle key the north rule names: unlike the
    flat mercator curve ids, contiguous s2 id ranges stay compact across
    face boundaries and have no polar distortion blowup."""
    from ..datagen.images import mercator_xy
    from ..kernels.s2 import s2_cell_id

    def fn(batch: pa.Table) -> pa.Table:
        mx, my = mercator_xy(batch.column("phash").to_numpy())
        cid = s2_cell_id(mx, my, level).astype(np.int64)
        return batch.append_column("s2_cell", pa.array(cid))

    return ds.map_batches(fn, batch_format="pyarrow")


def s2_cell_counts(ds: "ray.data.Dataset", level: int) -> "ray.data.Dataset":
    """Rows per S2 cell. Bounded-dispatch count (`blocking.bounded_counts`):
    occupied-cell cardinality is caller-chosen (level >= 15 over global
    data means millions of cells), so the count must never dispatch per
    distinct cell."""
    from .blocking import bounded_counts

    tagged = with_s2_cell_id(ds, level).select_columns(["s2_cell"])
    return bounded_counts(tagged, "s2_cell")


def with_hex_cell(ds: "ray.data.Dataset", res: int) -> "ray.data.Dataset":
    """Add the H3-style hex cell id (kernels/hex.py: pointy-top axial
    grid + cube rounding, packed int64) to a phash-georeferenced
    dataset. Hex halos are isotropic (all 6 neighbors equidistant),
    which is what makes this the right cell for radius queries and
    density smoothing; the quadtree/s2 ids remain the range-partition
    keys."""
    from ..datagen.images import mercator_xy
    from ..kernels.hex import hex_cell

    def fn(batch: pa.Table) -> pa.Table:
        mx, my = mercator_xy(batch.column("phash").to_numpy())
        return batch.append_column("hex_cell", pa.array(hex_cell(mx, my, res)))

    return ds.map_batches(fn, batch_format="pyarrow")


def hex_cell_counts(ds: "ray.data.Dataset", res: int) -> "ray.data.Dataset":
    """Rows per hex cell (bounded-dispatch count; see `s2_cell_counts`)."""
    from .blocking import bounded_counts

    tagged = with_hex_cell(ds, res).select_columns(["hex_cell"])
    return bounded_counts(tagged, "hex_cell")


def hex_smoothed_density(ds: "ray.data.Dataset", res: int, k: int = 1) -> "ray.data.Dataset":
    """k-ring smoothed occupancy: each cell's count plus its hex-disk
    neighbors' counts — the H3 idiom for density surfaces. Shape: count
    per cell first (tiny), then each cell's count replicates into its
    disk (1+3k(k+1) rows) and a second groupby sums; only (cell, count)
    pairs ever shuffle, never the input rows."""
    from ..kernels.hex import hex_disk

    counts = hex_cell_counts(ds, res)

    def scatter(batch: pa.Table) -> pa.Table:
        cells = batch.column("hex_cell").to_numpy()
        n = batch.column("count()").to_numpy()
        disk = hex_disk(cells, k)  # (rows, m)
        m = disk.shape[1]
        return pa.table(
            {
                "hex_cell": pa.array(disk.ravel()),
                "n": pa.array(np.repeat(n, m)),
            }
        )

    from ray.data.aggregate import Sum

    return (
        counts.map_batches(scatter, batch_format="pyarrow")
        .groupby("hex_cell")
        .aggregate(Sum("n", alias_name="smoothed"))
    )


def cell_counts(
    ds: "ray.data.Dataset", level: int, curve: str = "morton"
) -> "ray.data.Dataset":
    """Rows per curve cell at `level` (bounded-dispatch count; see
    `s2_cell_counts`)."""
    from .blocking import bounded_counts

    tagged = with_cell_id(ds, level, curve).select_columns(["cell"])
    return bounded_counts(tagged, "cell")


def knn_radius_join_cells(
    points: "ray.data.Dataset",
    queries: "ray.data.Dataset",
    radius: float,
    k: int,
    level: int | None = None,
    exclude_self: bool = True,
    cell_cap: int = 65536,
) -> "ray.data.Dataset":
    """Exact radius-bounded kNN with BOTH sides distributed.

    points:  (image_id: string, phash: int64) — the searched corpus.
    queries: (query_id: int64, phash: int64) — one row per query point.
    Result:  per query, the ≤ k nearest points with d² ≤ radius², ordered
             by (d², neighbor_id) — same tie rule as `knn_join`.

    Shape: points tag into their own cell (1 row each); queries replicate
    into their 3×3 halo (≤ 9 rows each); one groupby(cell) co-partitions
    both sides; each group brute-forces its Q_g × P_g block vectorized;
    only (query_id, neighbor_id, d²) survivor rows — already filtered to
    the radius — reach the tiny per-query top-k merge. No broadcast, no
    driver materialization; cost scales with occupancy density, not n².
    """
    from ..datagen.images import mercator_xy, tile_xy

    if level is None:
        # largest (finest) grid whose cell side still covers the radius,
        # so the 3x3 halo is a superset of every radius ball
        level = max(0, int(np.floor(np.log2(1.0 / radius))))
    if radius > 1.0 / (1 << level):
        raise ValueError(
            f"radius {radius} exceeds cell side at level {level}; halo would miss neighbors"
        )

    def tag_points(batch: pa.Table) -> pa.Table:
        ph = batch.column("phash").to_numpy()
        cx, cy = tile_xy(ph, level)
        mx, my = mercator_xy(ph)
        key = hilbert_encode(cx, cy, level).astype(np.int64)
        n = len(key)
        return pa.table(
            {
                "cell": pa.array(key),
                "is_query": pa.array(np.zeros(n, dtype=bool)),
                "image_id": batch.column("image_id"),
                "query_id": pa.array(np.full(n, -1, dtype=np.int64)),
                "mx": pa.array(mx),
                "my": pa.array(my),
            }
        )

    def tag_queries(batch: pa.Table) -> pa.Table:
        ph = batch.column("phash").to_numpy()
        qid = batch.column("query_id").to_numpy()
        cx, cy = tile_xy(ph, level)
        mx, my = mercator_xy(ph)
        idx, nx, ny = cell_neighbors(cx, cy, level, include_self=True)
        key = hilbert_encode(nx, ny, level).astype(np.int64)
        n = len(idx)
        return pa.table(
            {
                "cell": pa.array(key),
                "is_query": pa.array(np.ones(n, dtype=bool)),
                "image_id": pa.array([""] * n, pa.string()),
                "query_id": pa.array(qid[idx]),
                "mx": pa.array(mx[idx]),
                "my": pa.array(my[idx]),
            }
        )

    return _blocked_cell_join(
        points.map_batches(tag_points, batch_format="pyarrow"),
        queries.map_batches(tag_queries, batch_format="pyarrow"),
        radius * radius,
        k,
        exclude_self,
        cell_cap,
    )


def _radius_join_group(r2: float):
    """Per-cell brute-force radius join over a co-partitioned group of
    tagged point rows (is_query=False) and halo-replicated query rows
    (is_query=True); emits only (query_id, neighbor_id, d²) survivors."""

    def join_group(g: pa.Table) -> pa.Table:
        is_q = g.column("is_query").to_numpy(zero_copy_only=False)
        empty = pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "neighbor_id": pa.array([], pa.string()),
                "d2": pa.array([], pa.float64()),
            }
        )
        if is_q.all() or not is_q.any():
            return empty
        mx = g.column("mx").to_numpy()
        my = g.column("my").to_numpy()
        q_idx = np.nonzero(is_q)[0]
        p_idx = np.nonzero(~is_q)[0]
        dx = mx[q_idx][:, None] - mx[p_idx][None, :]
        dy = my[q_idx][:, None] - my[p_idx][None, :]
        d2 = dx * dx + dy * dy
        qi, pi = np.nonzero(d2 <= r2)
        if len(qi) == 0:
            return empty
        qids = g.column("query_id").to_numpy()[q_idx[qi]]
        ids_arr = g.column("image_id")
        if isinstance(ids_arr, pa.ChunkedArray):
            ids_arr = ids_arr.combine_chunks()
        return pa.table(
            {
                "query_id": pa.array(qids, pa.int64()),
                "neighbor_id": ids_arr.take(pa.array(p_idx[pi])),
                "d2": pa.array(d2[qi, pi], pa.float64()),
            }
        )

    return join_group


def _radius_topk(k: int, exclude_self: bool):
    import pyarrow.compute as pc

    def topk(g: pa.Table) -> pa.Table:
        if exclude_self:
            qid = int(g.column("query_id")[0].as_py())
            g = g.filter(pc.not_equal(g.column("neighbor_id"), f"img-{qid:012d}"))
        idx = pc.sort_indices(
            g, sort_keys=[("d2", "ascending"), ("neighbor_id", "ascending")]
        )
        return g.take(idx[:k])

    return topk


def _blocked_cell_join(
    pts_tagged: "ray.data.Dataset",
    qry_tagged: "ray.data.Dataset",
    r2: float,
    k: int,
    exclude_self: bool,
    cell_cap: int,
) -> "ray.data.Dataset":
    """Co-partitioned radius join with a hot-cell skew guard.

    A cell whose POINT count exceeds ``cell_cap`` splits its points into
    round-robin chunks (per-bucket running rank — a key hash would put
    duplicate coordinates in ONE chunk, defeating the guard in exactly
    its target case); the cell's halo queries replicate once per chunk, the join
    key becomes the column pair (cell, pchunk) — no arithmetic packing,
    so fine-resolution cell ids can't overflow — and no task brute-forces
    more than ~cap points against a cell's queries. The per-query top-k
    merge downstream combines survivors across groups, so chunking is
    invisible to the result (pinned by equality tests).

    Cost note: the cell-count scan re-executes the tag stage once (a
    cheap 2-column read + integer math); the tagged table is NOT pinned
    because at 10^12 rows it is the big side of the join.
    """
    from .blocking import assign_chunks, chunk_counts_for, replicate_all, scan_monsters

    monsters = scan_monsters(pts_tagged, ["cell"], cell_cap)
    monsters_ref = ray.put(monsters)

    def _with_pchunk(batch: pa.Table, chunk: np.ndarray) -> pa.Table:
        # int32: chunk counts are ceil(size/cap); 8 bytes/row on the big
        # side of a 10^12-row shuffle would be ~4 TB of dead weight
        return batch.append_column("pchunk", pa.array(chunk.astype(np.int32)))

    def block_points(batch: pa.Table) -> pa.Table:
        mons = ray.get(monsters_ref)
        cells = batch.column("cell").to_numpy()
        if not mons:
            return _with_pchunk(batch, np.zeros(len(cells), dtype=np.int32))
        nc = chunk_counts_for(cells, mons)
        return _with_pchunk(batch, assign_chunks(nc, cells))

    def block_queries(batch: pa.Table) -> pa.Table:
        mons = ray.get(monsters_ref)
        cells = batch.column("cell").to_numpy()
        if not mons:
            return _with_pchunk(batch, np.zeros(len(cells), dtype=np.int32))
        nc = chunk_counts_for(cells, mons)
        idx, chunk = replicate_all(nc)
        return _with_pchunk(batch.take(pa.array(idx)), chunk)

    tagged = pts_tagged.map_batches(block_points, batch_format="pyarrow").union(
        qry_tagged.map_batches(block_queries, batch_format="pyarrow")
    )
    # pin between the two sort barriers — the query_id-sort would otherwise
    # re-execute the whole cell-sort + radius join (Ray's sort-based groupby
    # re-runs an un-materialized input; see text.verify_jaccard_distributed's
    # barrier note). Pinned rows are the radius survivors: O(matches).
    survivors = tagged.groupby(["cell", "pchunk"]).map_groups(
        _radius_join_group(r2), batch_format="pyarrow"
    ).materialize()
    return survivors.groupby("query_id").map_groups(
        _radius_topk(k, exclude_self), batch_format="pyarrow"
    )


def hex_radius_knn_join(
    points: "ray.data.Dataset",
    queries: "ray.data.Dataset",
    radius: float,
    k: int,
    res: int | None = None,
    exclude_self: bool = True,
    cell_cap: int = 65536,
) -> "ray.data.Dataset":
    """Exact radius-bounded kNN co-partitioned by HEX cell — same
    contract and shape as `knn_radius_join_cells`, but the halo is the
    isotropic 7-cell hex disk instead of the 3×3 square (7 halo rows per
    query vs 9: ~22% less query replication for the same guarantee).

    Exactness: every point within `radius` of a query lies in the
    query's disk-1 halo when `radius <= apothem` (= size·√3/2, the
    center-to-edge distance). The minimum boundary gap between two
    NON-adjacent hexes is the circumradius `size` (attained by diagonal
    distance-2 pairs; straight-line pairs are √3·size apart), so a
    radius ball with radius ≤ apothem < size can only reach
    edge-adjacent cells. Verified against a brute-force all-pairs
    reference in tests."""
    from ..datagen.images import mercator_xy
    from ..kernels.hex import MAX_RES, hex_cell, hex_disk, hex_size

    if res is None:
        # finest resolution whose apothem still covers the radius
        res = 0
        while res < MAX_RES and hex_size(res + 1) * np.sqrt(3.0) / 2.0 >= radius:
            res += 1
    apothem = hex_size(res) * np.sqrt(3.0) / 2.0
    if radius > apothem:
        raise ValueError(
            f"radius {radius} exceeds hex apothem {apothem} at res {res}; "
            "disk-1 halo would miss neighbors"
        )

    def tag_points(batch: pa.Table) -> pa.Table:
        ph = batch.column("phash").to_numpy()
        mx, my = mercator_xy(ph)
        key = hex_cell(mx, my, res)
        n = len(key)
        return pa.table(
            {
                "cell": pa.array(key),
                "is_query": pa.array(np.zeros(n, dtype=bool)),
                "image_id": batch.column("image_id"),
                "query_id": pa.array(np.full(n, -1, dtype=np.int64)),
                "mx": pa.array(mx),
                "my": pa.array(my),
            }
        )

    def tag_queries(batch: pa.Table) -> pa.Table:
        ph = batch.column("phash").to_numpy()
        qid = batch.column("query_id").to_numpy()
        mx, my = mercator_xy(ph)
        disk = hex_disk(hex_cell(mx, my, res), 1)  # (n, 7)
        m = disk.shape[1]
        n = disk.size
        return pa.table(
            {
                "cell": pa.array(disk.ravel()),
                "is_query": pa.array(np.ones(n, dtype=bool)),
                "image_id": pa.array([""] * n, pa.string()),
                "query_id": pa.array(np.repeat(qid, m)),
                "mx": pa.array(np.repeat(mx, m)),
                "my": pa.array(np.repeat(my, m)),
            }
        )

    return _blocked_cell_join(
        points.map_batches(tag_points, batch_format="pyarrow"),
        queries.map_batches(tag_queries, batch_format="pyarrow"),
        radius * radius,
        k,
        exclude_self,
        cell_cap,
    )


def geo_knn_join(
    points: "ray.data.Dataset",
    query_phash: np.ndarray,
    query_ids: np.ndarray,
    k: int,
    exclude_self: bool = True,
) -> "ray.data.Dataset":
    """Exact GEODESIC kNN: brute-force against the full point set,
    ordered by great-circle distance on the unit sphere.

    Distances are compared as squared chord length |p-q|² of the
    exp-based sphere projection (`kernels.s2.mercator_to_xyz`): chord is
    strictly monotone in great-circle angle, so the top-k and its order
    are exactly the geodesic ones with NO trig beyond the projection —
    which keeps the DuckDB oracle bit-equal (same float64 expression
    tree). Planar-mercator kNN (`spatial.knn_join`) distorts near the
    poles; this is the geodesically-correct variant. Same shape: batch
    partial top-k (boundary ties widened) + tiny per-query merge."""
    from ..kernels.s2 import mercator_to_xyz
    from ..datagen.images import mercator_xy

    qmx, qmy = mercator_xy(np.asarray(query_phash))
    qx, qy, qz = mercator_to_xyz(qmx, qmy)
    refs = ray.put((qx, qy, qz, np.asarray(query_ids)))

    def partial_fn(batch: pa.Table) -> pa.Table:
        qx_l, qy_l, qz_l, qids = ray.get(refs)
        mx, my = mercator_xy(batch.column("phash").to_numpy())
        x, y, z = mercator_to_xyz(mx, my)
        dx = x[None, :] - qx_l[:, None]
        dy = y[None, :] - qy_l[:, None]
        dz = z[None, :] - qz_l[:, None]
        d2 = dx * dx + dy * dy + dz * dz  # (Q, B) squared chord
        ids_arr = batch.column("image_id")
        if isinstance(ids_arr, pa.ChunkedArray):
            ids_arr = ids_arr.combine_chunks()
        kk = min(k + 1 if exclude_self else k, d2.shape[1])
        if kk < d2.shape[1]:
            part = np.argpartition(d2, kk - 1, axis=1)[:, :kk]
            thresh = np.take_along_axis(d2, part, axis=1).max(axis=1)
            qi, pi = np.nonzero(d2 <= thresh[:, None])  # widen boundary ties
        else:
            qi, pi = np.divmod(np.arange(d2.size), d2.shape[1])
        return pa.table(
            {
                "query_id": pa.array(np.asarray(qids)[qi].astype(np.int64), pa.int64()),
                "neighbor_id": ids_arr.take(pa.array(pi)),
                "chord2": pa.array(d2[qi, pi], pa.float64()),
            }
        )

    partial = points.map_batches(partial_fn, batch_format="pyarrow")

    import pyarrow.compute as pc

    def merge(g: pa.Table) -> pa.Table:
        if exclude_self:
            qid = int(g.column("query_id")[0].as_py())
            g = g.filter(pc.not_equal(g.column("neighbor_id"), f"img-{qid:012d}"))
        idx = pc.sort_indices(
            g, sort_keys=[("chord2", "ascending"), ("neighbor_id", "ascending")]
        )
        top = g.take(idx[:k])
        # rank column: the hash-stable face of the result (the raw chord²
        # floats can differ from a SQL oracle by 1 ulp — numpy's SIMD
        # cos/sin vs libm — without changing the order)
        return top.append_column(
            "rank", pa.array(np.arange(1, top.num_rows + 1, dtype=np.int64))
        )

    return partial.groupby("query_id").map_groups(merge, batch_format="pyarrow")


def hilbert_bbox_ranges(
    x0: float, y0: float, x1: float, y1: float, level: int
) -> tuple[np.ndarray, np.ndarray]:
    """Decompose a mercator-aligned bbox into contiguous HILBERT id
    ranges at `level` — the classic space-filling-curve index read:
    because the curve is locality-preserving, a compact bbox covers few
    contiguous ranges (O(perimeter), not O(area) — asserted in tests),
    so a sorted-by-cell table serves the bbox with few range scans.

    Returns (starts, ends), inclusive, sorted.

    Implementation is a quadtree descent, never the cell grid: only nodes
    CROSSING the bbox boundary recurse (a node fully inside emits its whole
    contiguous Hilbert subtree range [h·4^(level-d), (h+1)·4^(level-d)-1] —
    the curve is hierarchical, each parent covers a contiguous id block),
    so work is O(perimeter · level) even for a wide bbox at a fine level."""
    n = 1 << level
    cx0 = max(0, min(n - 1, int(np.floor(x0 * n))))
    cy0 = max(0, min(n - 1, int(np.floor(y0 * n))))
    cx1 = max(0, min(n - 1, int(np.floor(x1 * n))))
    cy1 = max(0, min(n - 1, int(np.floor(y1 * n))))
    starts_l: list[np.ndarray] = []
    ends_l: list[np.ndarray] = []
    fx = np.zeros(1, dtype=np.uint64)
    fy = np.zeros(1, dtype=np.uint64)
    for d in range(level + 1):
        side = np.uint64(level - d)  # node covers 2^side level-cells per axis
        lo_x = fx << side
        hi_x = ((fx + np.uint64(1)) << side) - np.uint64(1)
        lo_y = fy << side
        hi_y = ((fy + np.uint64(1)) << side) - np.uint64(1)
        overlap = (hi_x >= cx0) & (lo_x <= cx1) & (hi_y >= cy0) & (lo_y <= cy1)
        full = (
            overlap & (lo_x >= cx0) & (hi_x <= cx1) & (lo_y >= cy0) & (hi_y <= cy1)
        )
        if full.any():
            h = hilbert_encode(fx[full], fy[full], d).astype(np.uint64)
            starts_l.append(h << (np.uint64(2) * side))
            ends_l.append(((h + np.uint64(1)) << (np.uint64(2) * side)) - np.uint64(1))
        part = overlap & ~full  # at d == level, full == overlap → part empties
        if not part.any():
            break
        px, py = fx[part], fy[part]
        fx = np.repeat(px << np.uint64(1), 4) + np.tile(
            np.array([0, 1, 0, 1], dtype=np.uint64), len(px)
        )
        fy = np.repeat(py << np.uint64(1), 4) + np.tile(
            np.array([0, 0, 1, 1], dtype=np.uint64), len(py)
        )
    starts = np.concatenate(starts_l)
    ends = np.concatenate(ends_l)
    order = np.argsort(starts)
    starts, ends = starts[order], ends[order]
    # merge ranges made adjacent across subtree boundaries
    if len(starts) > 1:
        gap = starts[1:] > ends[:-1] + np.uint64(1)
        keep_s = np.concatenate([[True], gap])
        keep_e = np.concatenate([gap, [True]])
        starts, ends = starts[keep_s], ends[keep_e]
    return starts.astype(np.int64), ends.astype(np.int64)


def range_query_bbox(
    points: "ray.data.Dataset",
    bbox: tuple[float, float, float, float],
    level: int = 8,
) -> "ray.data.Dataset":
    """Exact bbox query served through the hilbert-cell index: each batch
    first prunes by curve-range membership (two searchsorted lookups per
    row against the broadcast range table — the analogue of row-group
    pruning on a cell-sorted table), then applies the exact coordinate
    post-filter. Output: (image_id, mx, my) inside [x0,x1) × [y0,y1)."""
    from ..datagen.images import mercator_xy, tile_xy

    x0, y0, x1, y1 = bbox
    starts, ends = hilbert_bbox_ranges(x0, y0, x1, y1, level)
    refs = ray.put((starts, ends))

    def fn(batch: pa.Table) -> pa.Table:
        starts_l, ends_l = ray.get(refs)
        ph = batch.column("phash").to_numpy()
        cx, cy = tile_xy(ph, level)
        cid = hilbert_encode(cx, cy, level).astype(np.int64)
        # prune: id falls in some [start, end] range
        pos = np.searchsorted(starts_l, cid, side="right") - 1
        cand = (pos >= 0) & (cid <= ends_l[np.clip(pos, 0, len(ends_l) - 1)])
        mx, my = mercator_xy(ph)
        keep = cand & (mx >= x0) & (mx < x1) & (my >= y0) & (my < y1)
        ids_arr = batch.column("image_id")
        if isinstance(ids_arr, pa.ChunkedArray):
            ids_arr = ids_arr.combine_chunks()
        sel = np.nonzero(keep)[0]
        return pa.table(
            {
                "image_id": ids_arr.take(pa.array(sel)),
                "mx": pa.array(mx[sel]),
                "my": pa.array(my[sel]),
            }
        )

    return points.map_batches(fn, batch_format="pyarrow")
