"""Raster tiles from vector tiles: per-tile scanline polygon fill + line draw.

A stateless ``map_batches`` stage over assembled tile rows: decode the tile's
features (integer tile coordinates), rasterize into a single-channel uint8
grid (even-odd scanline fill for polygons, Bresenham-ish stroking for lines,
point stamps), and emit the raster as a zlib-compressed binary column using
the same from-scratch codec header as the image table.

Correctness oracle (tests): dense per-pixel point-in-polygon evaluation at
pixel centers must match the scanline fill exactly.
"""

from __future__ import annotations

import json
import zlib

import numpy as np
import pyarrow as pa

import ray.data

MAGIC_RASTER = b"GVT1"


def rasterize_features(features: list[dict], extent: int, size: int) -> np.ndarray:
    """Rasterize one tile's features into a (size, size) uint8 mask.

    Pixel (r, c) covers tile-space square [c*s, (c+1)*s) x [r*s, (r+1)*s),
    s = extent/size; polygon membership sampled at pixel centers (even-odd).
    """
    img = np.zeros((size, size), dtype=np.uint8)
    scale = extent / size

    for f in features:
        geom = f["geometry"]
        if f["type"] == 1:  # points
            for px, py in geom:
                c = int(px // scale)
                r = int(py // scale)
                if 0 <= r < size and 0 <= c < size:
                    img[r, c] = 255
        elif f["type"] == 2:  # lines
            for ring in geom:
                _stroke(img, np.asarray(ring, dtype=np.float64) / scale)
        else:  # polygons: even-odd scanline fill over all rings together
            rings = [np.asarray(r, dtype=np.float64) / scale for r in geom if len(r) >= 3]
            if rings:
                _fill_even_odd(img, rings)
    return img


def _fill_even_odd(img: np.ndarray, rings: list[np.ndarray]) -> None:
    size = img.shape[0]
    # gather all edges (x0,y0,x1,y1), skipping horizontals
    edges = []
    for ring in rings:
        a = ring
        b = np.roll(ring, -1, axis=0)
        keep = a[:, 1] != b[:, 1]
        if keep.any():
            edges.append(np.hstack([a[keep], b[keep]]))
    if not edges:
        return
    e = np.vstack(edges)
    x0, y0, x1, y1 = e[:, 0], e[:, 1], e[:, 2], e[:, 3]

    ys = np.arange(size) + 0.5  # pixel-center sample rows
    for r, y in enumerate(ys):
        # same half-open crossing rule as the even-odd ray cast:
        # edge crosses iff (y0 > y) != (y1 > y); inside = [x_a, x_b)
        m = (y0 > y) != (y1 > y)
        if not m.any():
            continue
        t = (y - y0[m]) / (y1[m] - y0[m])
        xs = x0[m] + (x1[m] - x0[m]) * t
        xs.sort()
        for i in range(0, len(xs) - 1, 2):
            c0 = int(np.ceil(xs[i] - 0.5))  # c + 0.5 >= x_a (inclusive)
            c1 = int(np.ceil(xs[i + 1] - 0.5)) - 1  # c + 0.5 < x_b (exclusive)
            if c1 >= c0:
                img[r, max(0, c0) : min(size, c1 + 1)] = 255


def _stroke(img: np.ndarray, pts: np.ndarray) -> None:
    size = img.shape[0]
    for i in range(len(pts) - 1):
        x0, y0 = pts[i]
        x1, y1 = pts[i + 1]
        n = int(max(abs(x1 - x0), abs(y1 - y0))) + 1
        t = np.linspace(0.0, 1.0, n + 1)
        xs = (x0 + (x1 - x0) * t).astype(np.int64)
        ys = (y0 + (y1 - y0) * t).astype(np.int64)
        m = (xs >= 0) & (xs < size) & (ys >= 0) & (ys < size)
        img[ys[m], xs[m]] = 255


def encode_raster(img: np.ndarray) -> bytes:
    h, w = img.shape
    header = np.array([w, h, 1], dtype="<u2").tobytes()
    return MAGIC_RASTER + header + zlib.compress(img.tobytes(), 1)


def decode_raster(data: bytes) -> np.ndarray:
    if data[:4] != MAGIC_RASTER:
        raise ValueError("bad raster magic")
    w, h, _c = np.frombuffer(data[4:10], dtype="<u2")
    return np.frombuffer(zlib.decompress(data[10:]), dtype=np.uint8).reshape(int(h), int(w))


def rasterize_tiles(
    tiles: "ray.data.Dataset", extent: int = 4096, size: int = 256
) -> "ray.data.Dataset":
    """Vector tile rows → raster tile rows (z, x, y, raster binary, coverage)."""

    def fn(batch: pa.Table) -> pa.Table:
        feats_col = batch.column("features_json").to_pylist()
        rasters = []
        coverage = np.empty(len(feats_col), dtype=np.float64)
        for i, fj in enumerate(feats_col):
            img = rasterize_features(json.loads(fj), extent, size)
            rasters.append(encode_raster(img))
            coverage[i] = float(np.count_nonzero(img)) / img.size
        return pa.table(
            {
                "z": batch.column("z"),
                "x": batch.column("x"),
                "y": batch.column("y"),
                "raster": pa.array(rasters, pa.binary()),
                "coverage": pa.array(coverage),
            }
        )

    return tiles.map_batches(fn, batch_format="pyarrow")


def vectorize_mask(img: np.ndarray) -> list[list[list[float]]]:
    """Polygonize a binary mask into pixel-corner rings (raster → vector).

    Emits the exact boundary between filled and empty pixels as closed rings
    with vertices at integer pixel corners. Contract (tested): re-rasterizing
    the rings with `_fill_even_odd` at pixel centers reproduces the mask
    bit-for-bit, for ANY mask — including checkerboards and corner-touching
    regions. This holds because even-odd parity depends only on the union of
    boundary edges, not on how they are partitioned into rings, so the walk
    may pick any successor at ambiguous (diagonal-touch) corners.

    Edge extraction is vectorized (numpy diffs of the padded mask); ring
    stitching is a Python walk over O(boundary) edges — boundary length is
    tiny next to pixel count for real tiles.
    """
    filled = (img != 0)
    size_r, size_c = filled.shape
    pad = np.zeros((size_r + 2, size_c + 2), dtype=bool)
    pad[1:-1, 1:-1] = filled

    # boundary unit edges, oriented so the filled pixel is to the right of
    # travel (screen coords, y down): consistent, but any orientation works
    # for even-odd round-trip
    up = filled & ~pad[:-2, 1:-1]     # empty above → edge (c,r)->(c+1,r)
    dn = filled & ~pad[2:, 1:-1]      # empty below → edge (c+1,r+1)->(c,r+1)
    lf = filled & ~pad[1:-1, :-2]     # empty left  → edge (c,r+1)->(c,r)
    rt = filled & ~pad[1:-1, 2:]      # empty right → edge (c+1,r)->(c+1,r+1)

    succ: dict[tuple[int, int], list[tuple[int, int]]] = {}

    def add(mask: np.ndarray, f0, f1, t0, t1) -> None:
        rr, cc = np.nonzero(mask)
        for r, c in zip(rr.tolist(), cc.tolist()):
            succ.setdefault((c + f0, r + f1), []).append((c + t0, r + t1))

    add(up, 0, 0, 1, 0)
    add(dn, 1, 1, 0, 1)
    add(lf, 0, 1, 0, 0)
    add(rt, 1, 0, 1, 1)

    rings: list[list[list[float]]] = []
    while succ:
        start = next(iter(succ))
        ring: list[list[float]] = [[float(start[0]), float(start[1])]]
        cur = start
        prev_dir: tuple[int, int] | None = None
        while True:
            outs = succ[cur]
            nxt = outs.pop()
            if not outs:
                del succ[cur]
            d = (nxt[0] - cur[0], nxt[1] - cur[1])
            if d == prev_dir:
                ring[-1] = [float(nxt[0]), float(nxt[1])]  # extend collinear run
            else:
                ring.append([float(nxt[0]), float(nxt[1])])
                prev_dir = d
            cur = nxt
            if cur == start:
                break
        # drop the duplicated closing vertex if the last run merged into it,
        # then re-close explicitly (rasterizer rolls rings, so closure is
        # implicit; keep first == last for GeoJSON-style ring convention)
        if ring[0] == ring[-1]:
            ring.pop()
        ring.append(list(ring[0]))
        rings.append(ring)
    return rings


def vectorize_tiles(
    rasters: "ray.data.Dataset", extent: int = 4096, size: int = 256
) -> "ray.data.Dataset":
    """Raster tile rows → vector polygon tile rows (the inverse of
    `rasterize_tiles`; together they complete the raster↔vector pair).

    Output rows carry one type-3 (polygon) feature per tile whose rings are
    the filled-region boundaries in tile coordinates; `num_rings` /
    `num_vertices` summarize complexity. Stateless map_batches stage."""
    scale = extent / size

    def fn(batch: pa.Table) -> pa.Table:
        feats = []
        n_rings = np.empty(batch.num_rows, dtype=np.int64)
        n_verts = np.empty(batch.num_rows, dtype=np.int64)
        for i, blob in enumerate(batch.column("raster").to_pylist()):
            img = decode_raster(blob)
            rings = vectorize_mask(img)
            scaled = [[[x * scale, y * scale] for x, y in ring] for ring in rings]
            n_rings[i] = len(rings)
            n_verts[i] = sum(len(r) for r in rings)
            feats.append(
                json.dumps(
                    [{"type": 3, "geometry": scaled, "tags": {}}] if rings else []
                )
            )
        cols = {
            "z": batch.column("z"),
            "x": batch.column("x"),
            "y": batch.column("y"),
            "features_json": pa.array(feats, pa.string()),
            "num_rings": pa.array(n_rings),
            "num_vertices": pa.array(n_verts),
        }
        if "coverage" in batch.column_names:
            # pass the raster-side coverage through so a round-trip pipeline
            # surfaces both directions' metrics in one row
            cols["coverage"] = batch.column("coverage")
        return pa.table(cols)

    return rasters.map_batches(fn, batch_format="pyarrow")
