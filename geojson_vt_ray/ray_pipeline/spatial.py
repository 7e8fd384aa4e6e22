"""Spatial-join stages: cell/tile assignment, rectangle containment join,
kNN, and point-in-polygon against sliced vector tiles.

Patterns (SURVEY.md §2.8, §7 step 5):
* tile/cell assignment — stateless vectorized ``map_batches`` (pure integer
  bit arithmetic on the phash georeference; no float rounding).
* small-side joins (rect layer, query points, polygon tile dict) — broadcast
  once via ``ray.put``, read per actor/task inside ``map_batches``; no
  shuffle.
* kNN — per-batch vectorized partial top-k against the broadcast query
  matrix, then a tiny ``groupby(query).map_groups`` merge: the shuffle moves
  only k·Q·batches candidate rows, never the full point set.
* PIP — polygons sliced to a fixed zoom by the tiler (tolerance=0 so
  membership is unsimplified), grouped into a per-tile lookup, broadcast;
  points ray-cast in tile space per batch. The like-keyed ``groupby``
  co-partition variant applies when the polygon side outgrows broadcast.
"""

from __future__ import annotations

import json
from typing import Optional

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..datagen.images import tile_xy

_BCAST_CACHE: dict[bytes, object] = {}


def _cached_get(ref):
    """Per-worker-process cache of broadcast objects (ray.get is cheap for
    local plasma objects but deserialization of dict-heavy payloads is not)."""
    key = ref.binary()
    if key not in _BCAST_CACHE:
        _BCAST_CACHE.clear()  # keep at most one broadcast resident per stage
        _BCAST_CACHE[key] = ray.get(ref)
    return _BCAST_CACHE[key]


def with_tile_xy(images: "ray.data.Dataset", z: int) -> "ray.data.Dataset":
    """Exact integer tile assignment at zoom z from the phash bits."""

    def fn(batch: pa.Table) -> pa.Table:
        x, y = tile_xy(batch.column("phash").to_numpy(), z)
        return batch.append_column("x", pa.array(x)).append_column("y", pa.array(y))

    return images.map_batches(fn, batch_format="pyarrow")


def _build_rect_grid(rects: dict[str, np.ndarray], grid: int) -> dict[str, np.ndarray]:
    """Driver-side x-interval grid over the rectangle layer, as flat primitive
    arrays (vectorized span expansion — no per-rect Python loop) so the
    broadcast hydrates as zero-copy plasma views in every task."""
    rect_id = np.asarray(rects["rect_id"], dtype=np.int64)
    x0 = np.asarray(rects["x0"], dtype=np.float64)
    x1 = np.asarray(rects["x1"], dtype=np.float64)
    c0 = np.clip((x0 * grid).astype(np.int64), 0, grid - 1)
    c1 = np.clip((x1 * grid).astype(np.int64), 0, grid - 1)
    span = c1 - c0 + 1
    total = int(span.sum())
    # entry j appears once per covered cell: cell_of = c0[j] .. c1[j]
    owner = np.repeat(np.arange(len(rect_id), dtype=np.int64), span)
    start_rep = np.repeat(c0, span)
    base = np.repeat(np.concatenate(([0], np.cumsum(span)[:-1])), span)
    cell_of = start_rep + (np.arange(total, dtype=np.int64) - base)
    order = np.argsort(cell_of, kind="stable")
    counts = np.bincount(cell_of, minlength=grid)
    return {
        "rect_id": rect_id,
        "x0": x0,
        "x1": x1,
        "y0": np.asarray(rects["y0"], dtype=np.float64),
        "y1": np.asarray(rects["y1"], dtype=np.float64),
        "cell_offsets": np.concatenate(([0], np.cumsum(counts))),
        "cell_rects": owner[order],
    }


def rect_contain_join(
    points: "ray.data.Dataset", rects: dict[str, np.ndarray], grid: int = 512
) -> "ray.data.Dataset":
    """images × rectangle layer containment join (broadcast small side).

    Emits (image_id, rect_id) pairs where the image's mercator point lies in
    [x0, x1) × [y0, y1). The x-axis interval grid over the rectangles is
    built ONCE driver-side (`_build_rect_grid`) and broadcast as flat
    primitive arrays; tasks hydrate it via `_cached_get` (zero-copy plasma
    views). Task-based — parallelism follows the cluster immediately
    instead of paying the actor-pool's lazy ramp-up. Each point only tests
    the rects registered in its grid cell (identical comparisons on a
    pruned candidate set), so the per-batch work is
    O(points × rects-per-cell) instead of O(points × rects).
    """
    index_ref = ray.put(_build_rect_grid(rects, grid))

    def stage(batch: pa.Table) -> pa.Table:
        from ..datagen.images import mercator_xy

        idx = _cached_get(index_ref)
        rect_id = idx["rect_id"]
        x0, x1, y0, y1 = idx["x0"], idx["x1"], idx["y0"], idx["y1"]
        cell_offsets, cell_rects = idx["cell_offsets"], idx["cell_rects"]
        mx, my = mercator_xy(batch.column("phash").to_numpy())
        ids = batch.column("image_id")
        cells = np.clip((mx * grid).astype(np.int64), 0, grid - 1)
        order = np.argsort(cells, kind="stable")
        sc = cells[order]
        starts = np.nonzero(np.concatenate(([True], sc[1:] != sc[:-1])))[0]
        starts = np.append(starts, len(sc))
        out_idx: list[np.ndarray] = []
        out_rect: list[np.ndarray] = []
        for bi in range(len(starts) - 1):
            sl = order[starts[bi] : starts[bi + 1]]
            c = sc[starts[bi]]
            cand = cell_rects[cell_offsets[c] : cell_offsets[c + 1]]
            if not len(cand):
                continue
            pxc = mx[sl][:, None]
            pyc = my[sl][:, None]
            mask = (
                (pxc >= x0[cand][None, :])
                & (pxc < x1[cand][None, :])
                & (pyc >= y0[cand][None, :])
                & (pyc < y1[cand][None, :])
            )
            pi, pj = np.nonzero(mask)
            if len(pi):
                out_idx.append(sl[pi])
                out_rect.append(rect_id[cand[pj]])
        if not out_idx:
            return pa.table(
                {"image_id": pa.array([], pa.string()), "rect_id": pa.array([], pa.int64())}
            )
        col = ids.take(pa.array(np.concatenate(out_idx)))
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return pa.table(
            {"image_id": col, "rect_id": pa.array(np.concatenate(out_rect))}
        )

    return points.map_batches(stage, batch_format="pyarrow")


def knn_join(
    points: "ray.data.Dataset",
    query_phash: np.ndarray,
    query_ids: np.ndarray,
    k: int,
    exclude_self: bool = True,
) -> "ray.data.Dataset":
    """Brute-force exact kNN of every query against the full point set.

    Each batch emits its local top-k per query (distance², exact dyadic
    arithmetic); a per-query merge keeps the global top-k ordered by
    (distance², neighbor_id) for deterministic ties.
    """
    from ..datagen.images import mercator_xy

    qmx, qmy = mercator_xy(query_phash)
    refs = ray.put((qmx, qmy, np.asarray(query_ids)))

    def partial_knn(batch: pa.Table) -> pa.Table:
        # task-based with a per-worker cached broadcast (`_cached_get`):
        # parallelism follows the cluster from the first batch instead of
        # the actor pool's lazy ramp-up.
        bqmx, bqmy, bqids = _cached_get(refs)
        mx, my = mercator_xy(batch.column("phash").to_numpy())
        dx = mx[None, :] - bqmx[:, None]
        dy = my[None, :] - bqmy[:, None]
        d2 = dx * dx + dy * dy  # (Q, B)
        ids_arr = batch.column("image_id")
        if isinstance(ids_arr, pa.ChunkedArray):
            ids_arr = ids_arr.combine_chunks()
        out_q: list[np.ndarray] = []
        out_n: list[pa.Array] = []
        out_d: list[np.ndarray] = []
        kk = min(k + 1 if exclude_self else k, d2.shape[1])
        for qi in range(d2.shape[0]):
            if kk < d2.shape[1]:
                part = np.argpartition(d2[qi], kk - 1)[:kk]
                # widen to all boundary ties so batch-local selection is
                # deterministic (the global merge breaks ties by id)
                thresh = d2[qi, part].max()
                part = np.nonzero(d2[qi] <= thresh)[0]
            else:
                part = np.arange(d2.shape[1])
            out_q.append(np.full(len(part), bqids[qi], dtype=np.int64))
            out_n.append(ids_arr.take(pa.array(part)))
            out_d.append(d2[qi, part])
        if not out_q:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "neighbor_id": pa.array([], pa.string()),
                    "d2": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "neighbor_id": pa.concat_arrays(out_n),
                "d2": pa.array(np.concatenate(out_d), pa.float64()),
            }
        )

    partial = points.map_batches(partial_knn, batch_format="pyarrow")

    import pyarrow.compute as pc

    def merge(g: pa.Table) -> pa.Table:
        if exclude_self:
            qid = int(g.column("query_id")[0].as_py())
            g = g.filter(pc.not_equal(g.column("neighbor_id"), f"img-{qid:012d}"))
        idx = pc.sort_indices(g, sort_keys=[("d2", "ascending"), ("neighbor_id", "ascending")])
        return g.take(idx[:k])

    return partial.groupby("query_id").map_groups(merge, batch_format="pyarrow")


class TilePolygonIndex:
    """Per-tile polygon lookup built from sliced vector tiles (type-3 tile
    features in integer tile coordinates)."""

    def __init__(self, tile_rows: list[dict], z: int, extent: int):
        self.z = z
        self.extent = extent
        self.tiles: dict[tuple[int, int], list[tuple[object, list[np.ndarray]]]] = {}
        for row in tile_rows:
            if row["z"] != z:
                continue
            feats = json.loads(row["features_json"])
            polys = []
            for f in feats:
                if f["type"] != 3:
                    continue
                rings = [np.asarray(r, dtype=np.float64) for r in f["geometry"] if len(r) >= 3]
                if rings:
                    polys.append((f.get("id"), rings))
            if polys:
                self.tiles[(row["x"], row["y"])] = polys



def slice_polygons_to_tiles(features: list[dict], z: int, extent: int = 4096) -> dict:
    """Slice a (small) internal polygon layer to zoom-z tiles and return the
    per-tile *untransformed* polygon lookup ``{(x,y): [(id, rings)]}`` with
    rings as (n,2) world-coordinate arrays. Edge-exact: no integer rounding.

    Driver-side (the polygon layer is the broadcast-small join side); the
    large-side variant runs the same clip cascade distributed via the tiler.
    """
    from ..engine.local_index import LocalTileIndex
    from ..options import TilerOptions

    opts = TilerOptions(
        max_zoom=z, index_max_zoom=z, index_max_points=0, tolerance=0.0, extent=extent
    )
    index = LocalTileIndex(opts)
    if features:
        index.initialize(features)
    tiles: dict[tuple[int, int], list] = {}
    for (tz, tx, ty) in index.tile_coords:
        if tz != z:
            continue
        tile = index.tiles[((1 << tz) * ty + tx) * 32 + tz]
        polys = []
        for f in tile["features"]:
            if f["type"] != 3:
                continue
            rings = [
                np.asarray(r, dtype=np.float64).reshape(-1, 2)
                for r in f["geometry"]
                if len(r) >= 6
            ]
            if rings:
                polys.append((f.get("id"), rings))
        if polys:
            tiles[(tx, ty)] = polys
    return tiles


def build_pip_edge_index(tile_polys: dict) -> dict[str, np.ndarray]:
    """Flatten the per-tile polygon lookup into ONE set of flat numpy arrays
    — the broadcast-friendly form of the PIP edge tables.

    Built once on the driver; every edge of every ring of every polygon of
    every tile lands in four contiguous float64 arrays (with the edge slope
    dx/dy precomputed so the division leaves the per-point hot loop), plus
    int64 offset arrays mapping sorted tile keys → edge spans → polygons.
    `ray.put` of this dict ships a handful of large primitive arrays, so
    worker-side `ray.get` is a zero-copy plasma view — no per-worker
    reconstruction of a dict-of-lists-of-arrays pickle graph and no
    per-tile edge-table rebuild (both of which dominated the old path's
    cold cost: ~4.6 s of the 8.4 s first run at 32 CPUs).

    Per-tile edge ORDER is identical to the old per-worker build (polygon
    list order, ring order, vertex order), so crossing sums — and therefore
    results — are bit-identical.
    """
    items = sorted(
        tile_polys.items(),
        key=lambda kv: (int(kv[0][1]) << 32) | int(kv[0][0]),
    )
    tkeys = np.empty(len(items), dtype=np.uint64)
    edge_off = [0]
    poly_off = [0]
    xs_l, ys_l, y1_l, dxdy_l = [], [], [], []
    poly_edge_off: list[int] = []
    pids: list[int] = []
    n_edges_total = 0
    for ti, ((tx, ty), polys) in enumerate(items):
        tkeys[ti] = (np.uint64(ty) << np.uint64(32)) | np.uint64(tx)
        for pid, rings in polys:
            poly_edge_off.append(n_edges_total)
            pids.append(int(pid))
            for ring in rings:
                xs = ring[:-1, 0]
                ys = ring[:-1, 1]
                x1 = ring[1:, 0]
                y1 = ring[1:, 1]
                with np.errstate(divide="ignore", invalid="ignore"):
                    dxdy = (x1 - xs) / (y1 - ys)
                xs_l.append(xs)
                ys_l.append(ys)
                y1_l.append(y1)
                dxdy_l.append(dxdy)
                n_edges_total += len(xs)
        edge_off.append(n_edges_total)
        poly_off.append(len(pids))
    empty = np.empty(0, dtype=np.float64)
    return {
        "tkeys": tkeys,
        "edge_off": np.asarray(edge_off, dtype=np.int64),
        "poly_off": np.asarray(poly_off, dtype=np.int64),
        "xs": np.concatenate(xs_l) if xs_l else empty,
        "ys": np.concatenate(ys_l) if ys_l else empty,
        "y1": np.concatenate(y1_l) if y1_l else empty,
        "dxdy": np.concatenate(dxdy_l) if dxdy_l else empty,
        "poly_edge_off": np.asarray(poly_edge_off, dtype=np.int64),
        "pids": np.asarray(pids, dtype=np.int64),
    }


def pip_join_world(
    points: "ray.data.Dataset", tile_polys: dict, z: int
) -> "ray.data.Dataset":
    """PIP join in world coordinates against an untransformed per-tile polygon
    lookup (edge-exact; oracle-comparable).

    Task-based broadcast (`ray.put` once, `ray.get` per task — local
    zero-copy) so parallelism follows the cluster, not a pool size. The
    polygon side is flattened driver-side into ONE set of primitive arrays
    (`build_pip_edge_index`), so the broadcast hydrates as zero-copy plasma
    views instead of a per-worker pickle reconstruction; the ray-cast runs
    ONE vectorized pass per tile over sliced views of the global edge table
    (slopes precomputed — no division per point), with a segmented
    reduction assigning crossing parity per polygon. Axis-aligned (rect)
    edges produce bit-identical results to the per-ring formulation:
    vertical edges contribute dxdy = 0 exactly and horizontal edges never
    pass the span test.
    """
    index_ref = ray.put(build_pip_edge_index(tile_polys))

    def stage(batch: pa.Table) -> pa.Table:
        from ..datagen.images import mercator_xy

        idx = _cached_get(index_ref)
        tile_tkeys = idx["tkeys"]
        edge_off = idx["edge_off"]
        poly_off = idx["poly_off"]
        g_xs, g_ys, g_y1, g_dxdy = idx["xs"], idx["ys"], idx["y1"], idx["dxdy"]
        g_poly_edge_off, g_pids = idx["poly_edge_off"], idx["pids"]
        phash = batch.column("phash").to_numpy()
        mx, my = mercator_xy(phash)
        tx, ty = tile_xy(phash, z)
        ids = batch.column("image_id")
        tkey = (ty.astype(np.uint64) << np.uint64(32)) | tx.astype(np.uint64)

        order = np.argsort(tkey, kind="stable")
        sorted_keys = tkey[order]
        bounds = np.nonzero(np.concatenate(([True], sorted_keys[1:] != sorted_keys[:-1])))[0]
        bounds = np.append(bounds, len(sorted_keys))

        out_idx: list[np.ndarray] = []
        out_rect: list[np.ndarray] = []
        for bi in range(len(bounds) - 1):
            sl = order[bounds[bi] : bounds[bi + 1]]
            key = sorted_keys[bounds[bi]]
            ti = int(np.searchsorted(tile_tkeys, key))
            if ti >= len(tile_tkeys) or tile_tkeys[ti] != key:
                continue
            e0, e1 = int(edge_off[ti]), int(edge_off[ti + 1])
            p0, p1 = int(poly_off[ti]), int(poly_off[ti + 1])
            if e1 == e0:
                continue
            xs = g_xs[e0:e1]
            ys = g_ys[e0:e1]
            y1 = g_y1[e0:e1]
            dxdy = g_dxdy[e0:e1]
            offsets = g_poly_edge_off[p0:p1] - e0
            pids = g_pids[p0:p1]
            pyc = my[sl][:, None]
            pxc = mx[sl][:, None]
            # span test first; NaN/inf from degenerate slopes compare False
            cross = ((ys[None, :] > pyc) != (y1[None, :] > pyc)) & (
                pxc < dxdy[None, :] * (pyc - ys[None, :]) + xs[None, :]
            )
            crossings = np.add.reduceat(cross.astype(np.int32), offsets, axis=1)
            pi, pj = np.nonzero(crossings & 1)
            if len(pi):
                out_idx.append(sl[pi])
                out_rect.append(pids[pj])
        if not out_idx:
            return pa.table(
                {"image_id": pa.array([], pa.string()), "rect_id": pa.array([], pa.int64())}
            )
        idx = np.concatenate(out_idx)
        col = ids.take(pa.array(idx))
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return pa.table(
            {"image_id": col, "rect_id": pa.array(np.concatenate(out_rect))}
        )

    return points.map_batches(stage, batch_format="pyarrow")


def pip_join_copartitioned(
    points: "ray.data.Dataset",
    polygon_tiles: "ray.data.Dataset",
    z: int,
    tile_cap: int = 65536,
) -> "ray.data.Dataset":
    """Both-sides-large PIP join: points and sliced polygon tiles are
    co-partitioned on the zoom-z tile key and joined per group — no
    broadcast, no full scan of either side.

    Partitioning assumption (documented per SURVEY.md §2.8): the polygon
    side is the tiler's tile output at zoom z, sliced with ``tolerance=0``;
    membership is tested in integer tile space, so results quantize at
    1/extent of a tile — identical to `pip_join` (broadcast variant); use
    `pip_join_world` for bit-exact dyadic membership when the polygon side
    fits a broadcast.

    Skew guard: a tile whose POINT count exceeds ``tile_cap`` (a dense
    metro tile at low z) splits its points into round-robin chunks and
    replicates the tile's polygon rows per chunk (`blocking.py` bipartite
    pattern), so no single `map_groups` task tests more than ~cap points;
    the join key becomes the column pair (tkey, pchunk). Each point lands
    in exactly one chunk, so the output pair set is chunking-invisible
    (pinned by the blocked==unblocked equality test).

    Both sides share one string column ``sval`` (image_id for points,
    features_json for polygon rows) so neither side ships a dead payload
    column through the shuffle.
    """
    import pyarrow.compute as pc

    from .blocking import assign_chunks, chunk_counts_for, replicate_all, scan_monsters

    extent_default = 4096

    def _point_tkeys(batch: pa.Table) -> pa.Table:
        phash = batch.column("phash").to_numpy()
        tx, ty = tile_xy(phash, z)
        tkey = (ty.astype(np.int64) << 32) | tx.astype(np.int64)
        return pa.table({"tkey": pa.array(tkey)})

    monsters = scan_monsters(
        points.map_batches(_point_tkeys, batch_format="pyarrow"), ["tkey"], tile_cap
    )
    monsters_ref = ray.put(monsters)

    def tag_points(batch: pa.Table) -> pa.Table:
        phash = batch.column("phash").to_numpy()
        tx, ty = tile_xy(phash, z)
        tkey = (ty.astype(np.int64) << 32) | tx.astype(np.int64)
        mons = ray.get(monsters_ref)
        if mons:
            pchunk = assign_chunks(chunk_counts_for(tkey, mons), tkey).astype(np.int32)
        else:
            pchunk = np.zeros(len(tkey), dtype=np.int32)
        return pa.table(
            {
                "tkey": pa.array(tkey),
                "pchunk": pa.array(pchunk),
                "side": pa.array(np.zeros(len(tkey), dtype=np.int8)),
                "sval": batch.column("image_id").cast(pa.string()),
                "phash": batch.column("phash"),
            }
        )

    def tag_polys(batch: pa.Table) -> pa.Table:
        mask = pc.equal(batch.column("z"), pa.scalar(z, batch.column("z").type))
        batch = batch.filter(mask)
        xs = batch.column("x").to_numpy().astype(np.int64)
        ys = batch.column("y").to_numpy().astype(np.int64)
        tkey = (ys << 32) | xs
        mons = ray.get(monsters_ref)
        if mons:
            idx, chunk = replicate_all(chunk_counts_for(tkey, mons))
            batch = batch.take(pa.array(idx))
            tkey = tkey[idx]
            pchunk = chunk.astype(np.int32)
        else:
            pchunk = np.zeros(len(tkey), dtype=np.int32)
        n = len(tkey)
        return pa.table(
            {
                "tkey": pa.array(tkey),
                "pchunk": pa.array(pchunk),
                "side": pa.array(np.ones(n, dtype=np.int8)),
                "sval": batch.column("features_json").cast(pa.string()),
                "phash": pa.array(np.zeros(n, dtype=np.int64)),
            }
        )

    tagged = points.map_batches(tag_points, batch_format="pyarrow").union(
        polygon_tiles.map_batches(tag_polys, batch_format="pyarrow")
    )

    def join_group(group: pa.Table) -> pa.Table:
        from ..datagen.images import mercator_xy

        sides = group.column("side").to_numpy()
        poly_rows = [group.column("sval")[i].as_py() for i in np.nonzero(sides == 1)[0]]
        if not poly_rows:
            return pa.table(
                {"image_id": pa.array([], pa.string()), "poly_id": pa.array([], pa.string())}
            )
        pt_idx = np.nonzero(sides == 0)[0]
        if not len(pt_idx):
            return pa.table(
                {"image_id": pa.array([], pa.string()), "poly_id": pa.array([], pa.string())}
            )
        tkey = int(group.column("tkey")[0].as_py())
        tx = tkey & 0xFFFFFFFF
        ty = tkey >> 32
        phash = group.column("phash").to_numpy()[pt_idx]
        ids = group.column("sval").take(pa.array(pt_idx)).to_pylist()
        mx, my = mercator_xy(phash)
        z2 = 1 << z
        px = (mx * z2 - tx) * extent_default
        py = (my * z2 - ty) * extent_default

        out_img: list[str] = []
        out_poly: list[str] = []
        for fj in poly_rows:
            for f in json.loads(fj):
                if f["type"] != 3:
                    continue
                rings = [np.asarray(r, dtype=np.float64) for r in f["geometry"] if len(r) >= 3]
                if not rings:
                    continue
                inside = np.zeros(len(px), dtype=bool)
                for ring in rings:
                    xs = ring[:, 0][None, :]
                    ys = ring[:, 1][None, :]
                    x1 = np.roll(ring[:, 0], -1)[None, :]
                    y1 = np.roll(ring[:, 1], -1)[None, :]
                    with np.errstate(divide="ignore", invalid="ignore"):
                        cross = ((ys > py[:, None]) != (y1 > py[:, None])) & (
                            px[:, None] < (x1 - xs) * (py[:, None] - ys) / (y1 - ys) + xs
                        )
                    inside ^= (cross.sum(axis=1) % 2).astype(bool)
                for i in np.nonzero(inside)[0]:
                    out_img.append(ids[i])
                    out_poly.append(str(f.get("id")))
        return pa.table(
            {
                "image_id": pa.array(out_img, pa.string()),
                "poly_id": pa.array(out_poly, pa.string()),
            }
        )

    return tagged.groupby(["tkey", "pchunk"]).map_groups(join_group, batch_format="pyarrow")


def pip_join(
    points: "ray.data.Dataset",
    polygon_tiles: list[dict],
    z: int,
    extent: int = 4096,
) -> "ray.data.Dataset":
    """Point-in-polygon join: phash-georeferenced points × polygons sliced to
    zoom-z tiles (integer tile space). Polygon side broadcast (small); points
    never shuffle. Vectorized like `pip_join_world`: the batch is sorted by
    tile key and each (tile, polygon) pair ray-casts all of the batch's
    points in that tile at once."""
    index_ref = ray.put(TilePolygonIndex(polygon_tiles, z, extent))

    def stage(batch: pa.Table) -> pa.Table:
        from ..datagen.images import mercator_xy

        index: TilePolygonIndex = _cached_get(index_ref)
        phash = batch.column("phash").to_numpy()
        mx, my = mercator_xy(phash)
        tx, ty = tile_xy(phash, z)
        ids = batch.column("image_id")
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        z2 = 1 << z
        tkey = (ty.astype(np.uint64) << np.uint64(32)) | tx.astype(np.uint64)

        order = np.argsort(tkey, kind="stable")
        sorted_keys = tkey[order]
        bounds = np.nonzero(np.concatenate(([True], sorted_keys[1:] != sorted_keys[:-1])))[0]
        bounds = np.append(bounds, len(sorted_keys))

        out_idx: list[np.ndarray] = []
        out_poly: list[np.ndarray] = []
        for bi in range(len(bounds) - 1):
            sl = order[bounds[bi] : bounds[bi + 1]]
            key = sorted_keys[bounds[bi]]
            cx = int(key & np.uint64(0xFFFFFFFF))
            cy = int(key >> np.uint64(32))
            polys = index.tiles.get((cx, cy))
            if not polys:
                continue
            px = (mx[sl] * z2 - cx) * extent
            py = (my[sl] * z2 - cy) * extent
            for pid, rings in polys:
                inside = np.zeros(len(sl), dtype=bool)
                for ring in rings:
                    xs = ring[:, 0][None, :]
                    ys = ring[:, 1][None, :]
                    x1 = np.roll(ring[:, 0], -1)[None, :]
                    y1 = np.roll(ring[:, 1], -1)[None, :]
                    with np.errstate(divide="ignore", invalid="ignore"):
                        cross = ((ys > py[:, None]) != (y1 > py[:, None])) & (
                            px[:, None] < (x1 - xs) * (py[:, None] - ys) / (y1 - ys) + xs
                        )
                    inside ^= (cross.sum(axis=1) % 2).astype(bool)
                hit = np.nonzero(inside)[0]
                if len(hit):
                    out_idx.append(sl[hit])
                    out_poly.append(np.full(len(hit), str(pid), dtype=object))
        if not out_idx:
            return pa.table(
                {"image_id": pa.array([], pa.string()), "poly_id": pa.array([], pa.string())}
            )
        idx = np.concatenate(out_idx)
        col = ids.take(pa.array(idx))
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return pa.table(
            {"image_id": col, "poly_id": pa.array(np.concatenate(out_poly), pa.string())}
        )

    return points.map_batches(stage, batch_format="pyarrow")
