"""Cross-ring / cross-feature batched subtree drill.

Bit-exact array reformulation of the per-feature drill loop
(`ray_pipeline/cascade._drill_subtree`): the whole working set of one
subtree level — every ring of every feature of every live tile — lives in
flat numpy arrays, and each level applies the 4-way buffered clip
(reference `src/clip.ts:166-241`, `src/tile-index.ts:197-226`), tile
assembly (`src/tile.ts:88-184`) and tile-space transform
(`src/transform.ts:10-29`) as whole-array kernels instead of per-ring
Python calls.

Exactness notes (everything the scalar kernels do in float64, elementwise,
in the same expression order):
  - slab bounds (x - k1)/z2 etc. match `clip()`'s ``start /= scale``;
  - intersection t and point expressions are copied verbatim;
  - the rewind area sum is an order-sensitive sequential float
    accumulation, reproduced by column-stepped accumulation over a
    zero-padded (rings x max_len) matrix — adding 0.0 is exact and only
    the sign is consumed (`src/tile.ts:166-184`);
  - JS Math.round is floor(v + 0.5) elementwise.

Line-metrics mode is not expressible in this layout (per-slice cumulative
lengths feed emitted tags) and falls back to the scalar drill.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..options import TilerOptions
from .tile import tile_tolerance

CLASS_POINTS = 0
CLASS_LINES = 1
CLASS_POLYS = 2
_MVT_CODE = (1, 2, 3)  # per class

_CLASS_OF_TYPE = {
    "Point": CLASS_POINTS,
    "MultiPoint": CLASS_POINTS,
    "LineString": CLASS_LINES,
    "MultiLineString": CLASS_LINES,
    "Polygon": CLASS_POLYS,
    "MultiPolygon": CLASS_POLYS,
}

# ring clip modes
_COPY = 0  # feature trivially accepted: points pass through
_CLIP = 1  # line/poly ring: segment clip with intersections
_CPTS = 2  # point-class ring: inside-filter only


class WorkingSet:
    """One drill level: struct-of-arrays over (tile, feature, part, ring).

    ``pts`` is (N, 3) float64 (x, y, simplification marker); rings index
    points, parts index rings (a part is one polygon's ring group, or the
    flat slice list of a line feature), features index parts. ``meta`` is
    static per-root-feature data (seq / id / tags) shared by reference.
    """

    __slots__ = (
        "pts", "ring_off", "ring_size", "part_off", "feat_off",
        "feat_class", "feat_meta", "feat_tile",
        "fminx", "fminy", "fmaxx", "fmaxy",
    )

    def __init__(self, pts, ring_off, ring_size, part_off, feat_off,
                 feat_class, feat_meta, feat_tile, fminx, fminy, fmaxx, fmaxy):
        self.pts = pts
        self.ring_off = ring_off
        self.ring_size = ring_size
        self.part_off = part_off
        self.feat_off = feat_off
        self.feat_class = feat_class
        self.feat_meta = feat_meta
        self.feat_tile = feat_tile
        self.fminx = fminx
        self.fminy = fminy
        self.fmaxx = fmaxx
        self.fmaxy = fmaxy

    @property
    def num_features(self) -> int:
        return len(self.feat_class)

    def ring_feat(self) -> np.ndarray:
        rpf = self.part_off[self.feat_off[1:]] - self.part_off[self.feat_off[:-1]]
        return np.repeat(np.arange(self.num_features, dtype=np.int64), rpf)


def build_working_set(features: list, tile_idx: int = 0) -> tuple[WorkingSet, list]:
    """Flatten decoded (seq, feature-dict) pairs into a WorkingSet.

    Returns (ws, meta) where meta[i] = (seq, fid, tags, has_id)."""
    pts_chunks: list[np.ndarray] = []
    ring_len: list[int] = []
    ring_size: list[float] = []
    part_off: list[int] = [0]
    feat_off: list[int] = [0]
    feat_class: list[int] = []
    fb = []  # bboxes
    meta = []

    for seq, f in features:
        cls = _CLASS_OF_TYPE[f["type"]]
        geom = f["geometry"]
        if cls == CLASS_POINTS:
            arr = np.asarray(geom, dtype=np.float64)
            pts_chunks.append(arr)
            ring_len.append(len(arr) // 3)
            ring_size.append(0.0)
            part_off.append(part_off[-1] + 1)
        elif cls == CLASS_LINES:
            lines = [geom] if f["type"] == "LineString" else geom
            for sl in lines:
                arr = np.asarray(sl.points, dtype=np.float64)
                pts_chunks.append(arr)
                ring_len.append(len(arr) // 3)
                ring_size.append(sl.size)
            part_off.append(part_off[-1] + len(lines))
        else:
            polys = [geom] if f["type"] == "Polygon" else geom
            for poly in polys:
                for sl in poly:
                    arr = np.asarray(sl.points, dtype=np.float64)
                    pts_chunks.append(arr)
                    ring_len.append(len(arr) // 3)
                    ring_size.append(sl.size)
                part_off.append(part_off[-1] + len(poly))
        feat_off.append(len(part_off) - 1)
        feat_class.append(cls)
        fb.append((f["minX"], f["minY"], f["maxX"], f["maxY"]))
        fid = f["id"]
        meta.append(
            (
                seq,
                '{"type": %d, "tags": %s, "geometry": '
                % (_MVT_CODE[cls], json.dumps(f["tags"])),
                "}" if fid is None else ', "id": %s}' % json.dumps(fid),
            )
        )

    pts = (
        np.concatenate(pts_chunks).reshape(-1, 3)
        if pts_chunks
        else np.empty((0, 3), dtype=np.float64)
    )
    F = len(feat_class)
    fbx = np.array(fb, dtype=np.float64).reshape(F, 4)
    ws = WorkingSet(
        pts,
        np.concatenate(([0], np.cumsum(np.asarray(ring_len, dtype=np.int64)))),
        np.asarray(ring_size, dtype=np.float64),
        np.asarray(part_off, dtype=np.int64),
        np.asarray(feat_off, dtype=np.int64),
        np.asarray(feat_class, dtype=np.int8),
        np.arange(F, dtype=np.int64),
        np.full(F, tile_idx, dtype=np.int64),
        fbx[:, 0], fbx[:, 1], fbx[:, 2], fbx[:, 3],
    )
    return ws, meta


def _rewind_decisions(ring_pts: np.ndarray, ring_off: np.ndarray) -> np.ndarray:
    """Per-ring scalar-identical rewind test: sequential left-to-right sum of
    (x_i - x_j)(y_i + y_j), j = previous point cyclically, j0 = last point.
    Returns area > 0 per ring."""
    R = len(ring_off) - 1
    if R == 0:
        return np.zeros(0, dtype=bool)
    rlen = np.diff(ring_off)
    n = len(ring_pts)
    x = ring_pts[:, 0]
    y = ring_pts[:, 1]
    # previous index cyclic per ring
    prev = np.arange(n, dtype=np.int64) - 1
    starts = ring_off[:-1][rlen > 0]
    ends = ring_off[1:][rlen > 0]
    prev[starts] = ends - 1
    terms = (x - x[prev]) * (y + y[prev])
    max_len = int(rlen.max()) if R else 0
    # column-stepped accumulation: exact sequential order per ring
    area = np.zeros(R, dtype=np.float64)
    pos = ring_off[:-1].copy()
    for col in range(max_len):
        live = rlen > col
        if not live.any():
            break
        idx = pos[live] + col
        a = area[live]
        area[live] = a + terms[idx]
    return area > 0


def _emit_level(
    out,
    ws: WorkingSet,
    meta: list,
    z: int,
    tiles_xy: np.ndarray,
    options: TilerOptions,
    empty_tiles_xy: np.ndarray,
) -> None:
    """Assemble + transform + serialize every tile of this level
    (scalar counterparts: `create_tile`, `transform_tile_features`)."""
    extent = options.extent
    tol = tile_tolerance(z, options)
    sq = tol * tol
    T = len(tiles_xy)

    F = ws.num_features
    rf = ws.ring_feat()
    rlen = np.diff(ws.ring_off)
    R = len(rlen)
    ring_cls = ws.feat_class[rf] if R else np.zeros(0, dtype=np.int8)
    ring_tile = ws.feat_tile[rf] if R else np.zeros(0, dtype=np.int64)

    tiny = (
        (tol > 0)
        & (
            ((ring_cls == CLASS_POLYS) & (ws.ring_size < sq))
            | ((ring_cls == CLASS_LINES) & (ws.ring_size < tol))
        )
        if R
        else np.zeros(0, dtype=bool)
    )

    point_ring = np.repeat(np.arange(R, dtype=np.int64), rlen)
    point_tile = ring_tile[point_ring]
    pz = ws.pts[:, 2]
    keep = (~tiny[point_ring]) & (
        (ring_cls[point_ring] == CLASS_POINTS) | (tol == 0) | (pz > sq)
    )

    num_points = np.bincount(point_tile, minlength=T)
    num_simplified = np.bincount(point_tile[keep], minlength=T)
    num_features = np.bincount(ws.feat_tile, minlength=T)

    # kept geometry (simplified rings; empty simplified rings stay)
    kept_per_ring = np.bincount(point_ring[keep], minlength=R)
    surv = ~tiny  # rings present in output geometry
    kx = ws.pts[keep, 0]
    ky = ws.pts[keep, 1]
    kept_off = np.concatenate(([0], np.cumsum(kept_per_ring)))

    # rewind: polygon surviving rings, on simplified mercator coords
    poly_rings = np.nonzero(surv & (ring_cls == CLASS_POLYS))[0] if R else np.array([], dtype=np.int64)
    reverse_ring = np.zeros(R, dtype=bool)
    if len(poly_rings):
        # gather kept points of those rings contiguously
        pr_len = kept_per_ring[poly_rings]
        pr_off = np.concatenate(([0], np.cumsum(pr_len)))
        gather = _span_gather(kept_off[poly_rings], pr_len)
        sub = np.empty((int(pr_off[-1]), 2), dtype=np.float64)
        sub[:, 0] = kx[gather]
        sub[:, 1] = ky[gather]
        cw = _rewind_decisions(sub, pr_off)
        # is_outer = ring index 0 within its part (scalar passes i == 0 over
        # the part's CURRENT ring list, before tiny-dropping)
        is_outer_all = np.zeros(R, dtype=bool)
        is_outer_all[ws.part_off[:-1][np.diff(ws.part_off) > 0]] = True
        is_outer = is_outer_all[poly_rings]
        # scalar `_rewind`: keep when (area>0) != clockwise, else reverse
        reverse_ring[poly_rings] = cw == is_outer

    # transform to integer tile coords: floor(extent*(x*z2 - tx) + 0.5)
    z2 = float(1 << (z & 31))
    txs = tiles_xy[:, 0].astype(np.float64)
    tys = tiles_xy[:, 1].astype(np.float64)
    ptx = txs[point_tile[keep]]
    pty = tys[point_tile[keep]]
    ix = np.floor(extent * (kx * z2 - ptx) + 0.5).astype(np.int64)
    iy = np.floor(extent * (ky * z2 - pty) + 0.5).astype(np.int64)

    # apply ring reversals on the integer pairs (exact, commutes with round)
    if reverse_ring.any():
        rev_rings = np.nonzero(reverse_ring)[0]
        rl = kept_per_ring[rev_rings]
        ro = kept_off[rev_rings]
        fwd = _span_gather(ro, rl)
        bwd = _span_gather_rev(ro, rl)
        ix[fwd] = ix[bwd].copy()
        iy[fwd] = iy[bwd].copy()

    # per-feature emission: feature kept if any surviving ring (any point for
    # points class — their single ring always survives and must be non-empty)
    feat_rings_start = ws.part_off[ws.feat_off[:-1]]

    # vectorized string assembly: per-feature prefix/suffix (type+tags / id)
    # are static and pre-serialized in meta; only geometry JSON varies per
    # tile, and it is pure int lists, so every string builds with Arrow C++
    # casts and joins. Concatenation reproduces json.dumps (default
    # separators render ints identically) byte-for-byte; the former
    # per-feature dumps loop profiled at ~55% of drill wall time.
    ftile = ws.feat_tile
    fmeta = ws.feat_meta
    pts_str = pc.binary_join_element_wise(
        "[", pc.cast(pa.array(ix), pa.string()), ", ",
        pc.cast(pa.array(iy), pa.string()), "]", "",
    )
    ring_str = pc.binary_join_element_wise(
        "[",
        pc.binary_join(
            pa.LargeListArray.from_arrays(
                pa.array(kept_off, type=pa.int64()), pts_str
            ),
            ", ",
        ),
        "]", "",
    )

    # lines/polys: surviving rings join per feature (ring storage is
    # feature-contiguous, so emission order is preserved — empty simplified
    # rings stay as "[]"); points take their single ring's string directly
    surv_idx = np.flatnonzero(surv)
    nsurv = np.bincount(rf[surv_idx], minlength=F) if R else np.zeros(F, dtype=np.int64)
    geom_multi = pc.binary_join_element_wise(
        "[",
        pc.binary_join(
            pa.LargeListArray.from_arrays(
                pa.array(np.concatenate(([0], np.cumsum(nsurv))), type=pa.int64()),
                pc.take(ring_str, pa.array(surv_idx)),
            ),
            ", ",
        ),
        "]", "",
    )
    points_mask = ws.feat_class == CLASS_POINTS
    r0c = np.minimum(feat_rings_start, max(R - 1, 0))
    if R:
        geom = pc.if_else(
            pa.array(points_mask), pc.take(ring_str, pa.array(r0c)), geom_multi
        )
        kept_feat = np.where(points_mask, kept_per_ring[r0c] > 0, nsurv > 0)
    else:
        geom = geom_multi
        kept_feat = np.zeros(F, dtype=bool)

    meta_prefix = pa.array([m[1] for m in meta], pa.string())
    meta_suffix = pa.array([m[2] for m in meta], pa.string())
    fmeta_pa = pa.array(fmeta)
    feat_str = pc.binary_join_element_wise(
        pc.take(meta_prefix, fmeta_pa), geom, pc.take(meta_suffix, fmeta_pa), "",
    )

    # per-tile assembly: kept features stably sorted by tile keep the scalar
    # loop's append order (feature index ascending within a tile)
    kidx = np.flatnonzero(kept_feat)
    korder = kidx[np.argsort(ftile[kidx], kind="stable")]
    t_off = np.concatenate(([0], np.cumsum(np.bincount(ftile[kidx], minlength=T))))
    fj_arr = pc.binary_join_element_wise(
        "[",
        pc.binary_join(
            pa.LargeListArray.from_arrays(
                pa.array(t_off, type=pa.int64()), pc.take(feat_str, pa.array(korder))
            ),
            ", ",
        ),
        "]", "",
    )

    # min/max seq per tile replicate the scalar loop exactly: min = first
    # truthy seq in feature order (skipped-geometry features included),
    # max = the last feature's seq unconditionally
    min_seq = [b""] * T
    max_seq = [b""] * T
    if F:
        seq_of = [meta[m][0] for m in fmeta.tolist()]
        order_all = np.argsort(ftile, kind="stable")
        st = ftile[order_all]
        gstart = np.flatnonzero(np.concatenate(([True], st[1:] != st[:-1])))
        gend = np.concatenate((gstart[1:], [len(st)]))
        for gi in range(len(gstart)):
            seg = order_all[gstart[gi] : gend[gi]]
            ti = int(st[gstart[gi]])
            max_seq[ti] = seq_of[seg[-1]]
            for fi in seg.tolist():
                s = seq_of[fi]
                if s:
                    min_seq[ti] = s
                    break

    # optional in-drill MVT emission (byte-identical to features_json →
    # mvt_sink.mvt_tiles, but geometry bytes come straight from the level's
    # integer arrays — no JSON round trip): one vectorized command-buffer
    # pass per level plus a cheap per-feature assembly over the kept order.
    mvt_cfg = getattr(out, "mvt_cfg", None)
    mvt_blobs = None
    empty_mvt = None
    if mvt_cfg is not None:
        from .mvt_fast import assemble_tile_mvt, level_mvt_geometry, mvt_static_from_meta

        gbuf, fgs, fge = level_mvt_geometry(
            ix, iy, kept_off, kept_per_ring, surv, ring_cls, rf,
            F, CLASS_POINTS, CLASS_POLYS,
        )
        fgs_l = fgs.tolist()
        fge_l = fge.tolist()
        mvt_cache = out.mvt_meta_cache
        tile_mvt: list[list] = [[] for _ in range(T)]
        ftile_l = ftile.tolist()
        fmeta_l = fmeta.tolist()
        for fi in korder.tolist():
            _, prefix, suffix = meta[fmeta_l[fi]]
            ck = (prefix, suffix)
            static = mvt_cache.get(ck)
            if static is None:
                static = mvt_cache[ck] = mvt_static_from_meta(prefix, suffix)
            tile_mvt[ftile_l[fi]].append((static, fgs_l[fi], fge_l[fi]))
        layer_bytes, extent_ = out.mvt_layer_bytes, mvt_cfg[1]
        empty_mvt = out.mvt_empty_blob
        mvt_blobs = [
            assemble_tile_mvt(entries, gbuf, layer_bytes, extent_)
            if entries
            else empty_mvt
            for entries in tile_mvt
        ]

    xs_l = tiles_xy[:, 0].tolist()
    ys_l = tiles_xy[:, 1].tolist()
    tkeys = (
        ((np.int64(1) << z) * tiles_xy[:, 1] + tiles_xy[:, 0]) * 32 + z
    ).tolist()
    fj = fj_arr.to_pylist()
    out.add_tiles_bulk(
        z, xs_l, ys_l, tkeys, fj,
        num_points.tolist(), num_simplified.tolist(), num_features.tolist(),
        min_seq, max_seq, mvt_blobs,
    )
    if len(empty_tiles_xy):
        ne = len(empty_tiles_xy)
        etk = (
            ((np.int64(1) << z) * empty_tiles_xy[:, 1] + empty_tiles_xy[:, 0]) * 32 + z
        ).tolist()
        out.add_tiles_bulk(
            z, empty_tiles_xy[:, 0].tolist(), empty_tiles_xy[:, 1].tolist(), etk,
            ["[]"] * ne, [0] * ne, [0] * ne, [0] * ne, [b""] * ne, [b""] * ne,
            None if empty_mvt is None else [empty_mvt] * ne,
        )


def _span_gather(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Concatenate ranges [starts[i], starts[i]+lens[i]) as one index array."""
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    off = np.concatenate(([0], np.cumsum(lens)))
    idx = np.arange(total, dtype=np.int64)
    ring = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    return starts[ring] + (idx - off[ring])


def _span_gather_rev(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Like _span_gather but each range reversed (for ring rewinds)."""
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    off = np.concatenate(([0], np.cumsum(lens)))
    idx = np.arange(total, dtype=np.int64)
    ring = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    return starts[ring] + (lens[ring] - 1 - (idx - off[ring]))


def _clip_pass(
    ws: WorkingSet, z: int, k_lo: float, k_hi: float, axis: int, tvals: np.ndarray
) -> WorkingSet:
    """One slab clip of the whole working set (scalar counterpart `clip()`).

    ``tvals``: per-tile x (axis 0) or y (axis 1); slab = [(t+k_lo)/z2,
    (t+k_hi)/z2) with the scalar's exact accept/reject/intersect semantics.
    """
    z2 = float(1 << z)
    lo_t = (tvals + k_lo) / z2
    hi_t = (tvals + k_hi) / z2

    F = ws.num_features
    flo = lo_t[ws.feat_tile]
    fhi = hi_t[ws.feat_tile]
    fmin = ws.fminx if axis == 0 else ws.fminy
    fmax = ws.fmaxx if axis == 0 else ws.fmaxy
    facc = (fmin >= flo) & (fmax < fhi)
    frej = (fmax < flo) | (fmin >= fhi)
    fmode = np.where(facc, _COPY, np.where(frej, -1, _CLIP)).astype(np.int8)

    rf = ws.ring_feat()
    rlen = np.diff(ws.ring_off)
    R = len(rlen)
    ring_cls = ws.feat_class[rf] if R else np.zeros(0, dtype=np.int8)
    rmode = fmode[rf] if R else np.zeros(0, dtype=np.int8)
    rmode = np.where(
        (rmode == _CLIP) & (ring_cls == CLASS_POINTS), _CPTS, rmode
    ).astype(np.int8)

    live_ring = rmode >= 0
    point_ring = np.repeat(np.arange(R, dtype=np.int64), rlen)

    n = len(ws.pts)
    v = ws.pts[:, axis]
    plo = flo[rf][point_ring] if R else np.empty(0)
    phi = fhi[rf][point_ring] if R else np.empty(0)
    pmode = rmode[point_ring] if R else np.empty(0, dtype=np.int8)

    # last point of each ring
    is_last = np.zeros(n, dtype=bool)
    if R:
        nz = rlen > 0
        is_last[ws.ring_off[1:][nz] - 1] = True

    # segment values (valid for non-last points of _CLIP rings)
    nxt = np.minimum(np.arange(n, dtype=np.int64) + 1, max(n - 1, 0))
    b = v[nxt]
    seg = (~is_last) & (pmode == _CLIP)
    a_lo = v < plo
    a_hi = v > phi
    a_in = ~a_lo & ~a_hi
    m_in = seg & a_in
    m_enter_lo = seg & a_lo & (b > plo)
    m_enter_hi = seg & a_hi & (b < phi)
    m_exit_lo = seg & (b < plo) & ~a_lo
    m_exit_hi = seg & (b > phi) & ~a_hi
    e1 = m_in | m_enter_lo | m_enter_hi
    e2 = m_exit_lo | m_exit_hi

    counts = np.zeros(n, dtype=np.int64)
    counts[pmode == _COPY] = 1
    counts[pmode == _CPTS] = a_in[pmode == _CPTS]
    counts[seg] = e1[seg].astype(np.int64) + e2[seg].astype(np.int64)
    tail = is_last & (pmode == _CLIP)
    counts[tail] = a_in[tail]

    off = np.concatenate(([0], np.cumsum(counts)))
    total = int(off[-1])
    opts_arr = np.empty((total, 3), dtype=np.float64)

    # pass-throughs: COPY points, CPTS inside points, m_in seg starts, tails in
    passthru = (
        (pmode == _COPY)
        | ((pmode == _CPTS) & a_in)
        | m_in
        | (tail & a_in)
    )
    opts_arr[off[:-1][passthru]] = ws.pts[passthru]

    px = ws.pts[:, 0]
    py = ws.pts[:, 1]
    pxn = px[nxt]
    pyn = py[nxt]

    def fill(mask, bound, pos):
        if not mask.any():
            return
        o = pos[mask]
        vx = bound[mask]
        if axis == 0:
            t = (vx - px[mask]) / (pxn[mask] - px[mask])
            opts_arr[o, 0] = vx
            opts_arr[o, 1] = py[mask] + (pyn[mask] - py[mask]) * t
        else:
            t = (vx - py[mask]) / (pyn[mask] - py[mask])
            opts_arr[o, 0] = px[mask] + (pxn[mask] - px[mask]) * t
            opts_arr[o, 1] = vx
        opts_arr[o, 2] = 1.0

    pos1 = off[:-1]
    fill(m_enter_lo, plo, pos1)
    fill(m_enter_hi, phi, pos1)
    pos2 = off[:-1] + e1.astype(np.int64)
    fill(m_exit_lo, plo, pos2)
    fill(m_exit_hi, phi, pos2)

    # ---- output ring table -------------------------------------------------
    ring_out_start = off[ws.ring_off[:-1]] if R else np.empty(0, dtype=np.int64)
    ring_out_end = off[ws.ring_off[1:]] if R else np.empty(0, dtype=np.int64)
    ring_out_len = ring_out_end - ring_out_start

    out_rings_start: list = []
    out_rings_len: list = []
    out_ring_src: list = []  # source ring index
    close_flag: list = []

    is_line_clip = (rmode == _CLIP) & (ring_cls == CLASS_LINES)
    if is_line_clip.any():
        exit_out_pos = pos2[e2]  # global emission order
        exit_ring = point_ring[e2]
    else:
        exit_out_pos = np.empty(0, dtype=np.int64)
        exit_ring = np.empty(0, dtype=np.int64)

    simple = live_ring & ~is_line_clip & (ring_out_len > 0)
    # polygon clip rings may need closing: first != last (x or y)
    need_close = np.zeros(R, dtype=bool)
    pc_mask = simple & (rmode == _CLIP) & (ring_cls == CLASS_POLYS) & (ring_out_len >= 2)
    if pc_mask.any():
        s_idx = ring_out_start[pc_mask]
        l_idx = ring_out_end[pc_mask] - 1
        need_close[pc_mask] = (opts_arr[s_idx, 0] != opts_arr[l_idx, 0]) | (
            opts_arr[s_idx, 1] != opts_arr[l_idx, 1]
        )

    # line-clip rings: split at each exit emission (+1), drop empty pieces
    lc_idx = np.nonzero(is_line_clip & (ring_out_len > 0))[0]
    if len(lc_idx) == 0:
        # fast path (no line splits): surviving rings pass through in order
        keep_mask = simple
        out_start = ring_out_start[keep_mask]
        out_len = ring_out_len[keep_mask]
        out_src = np.nonzero(keep_mask)[0]
        out_close = need_close[keep_mask]
    else:
        # general path: per-ring piece construction (python over rings, but
        # only boundary bookkeeping — point data stays in numpy)
        cuts_by_ring: dict[int, list] = {}
        for rpos, rid in zip(exit_out_pos.tolist(), exit_ring.tolist()):
            cuts_by_ring.setdefault(rid, []).append(rpos + 1)
        starts_l: list = []
        lens_l: list = []
        src_l: list = []
        close_l: list = []
        ros = ring_out_start.tolist()
        roe = ring_out_end.tolist()
        nc = need_close.tolist()
        for rid in range(R):
            if not live_ring[rid]:
                continue
            s0 = ros[rid]
            e0 = roe[rid]
            if e0 <= s0:
                continue
            if is_line_clip[rid]:
                bounds = [s0] + cuts_by_ring.get(rid, []) + [e0]
                for bi in range(len(bounds) - 1):
                    ln = bounds[bi + 1] - bounds[bi]
                    if ln > 0:
                        starts_l.append(bounds[bi])
                        lens_l.append(ln)
                        src_l.append(rid)
                        close_l.append(False)
            else:
                starts_l.append(s0)
                lens_l.append(e0 - s0)
                src_l.append(rid)
                close_l.append(nc[rid])
        out_start = np.asarray(starts_l, dtype=np.int64)
        out_len = np.asarray(lens_l, dtype=np.int64)
        out_src = np.asarray(src_l, dtype=np.int64)
        out_close = np.asarray(close_l, dtype=bool)

    # materialize output points with closure expansion
    final_len = out_len + out_close
    final_off = np.concatenate(([0], np.cumsum(final_len)))
    gather = _span_gather(out_start, out_len)
    new_pts = np.empty((int(final_off[-1]), 3), dtype=np.float64)
    body_idx = _span_gather(final_off[:-1], out_len)
    new_pts[body_idx] = opts_arr[gather]
    if out_close.any():
        ci = final_off[1:][out_close] - 1
        si = out_start[out_close]
        new_pts[ci] = opts_arr[si]

    # ---- rebuild part / feature structure ---------------------------------
    OR = len(out_src)
    part_of_ring = np.repeat(
        np.arange(len(ws.part_off) - 1, dtype=np.int64), np.diff(ws.part_off)
    )
    out_part = part_of_ring[out_src] if OR else np.empty(0, dtype=np.int64)
    P = len(ws.part_off) - 1
    rings_per_part = np.bincount(out_part, minlength=P) if OR else np.zeros(P, dtype=np.int64)
    part_alive = rings_per_part > 0
    feat_of_part = np.repeat(np.arange(F, dtype=np.int64), np.diff(ws.feat_off))
    parts_per_feat = (
        np.bincount(feat_of_part[part_alive], minlength=F)
        if part_alive.any()
        else np.zeros(F, dtype=np.int64)
    )
    feat_alive = parts_per_feat > 0

    new_feat_idx = np.cumsum(feat_alive) - 1  # old feat -> new feat id
    NF = int(feat_alive.sum())
    new_part_off = np.concatenate(([0], np.cumsum(rings_per_part[part_alive])))
    new_feat_off = np.concatenate(([0], np.cumsum(parts_per_feat[feat_alive])))

    # new ring offsets follow final_off directly (rings already ordered)
    new_ring_off = final_off
    new_ring_size = ws.ring_size[out_src] if OR else np.empty(0, dtype=np.float64)

    # ---- recompute bboxes for clipped features, copy for accepted ----------
    nfminx = np.empty(NF, dtype=np.float64)
    nfminy = np.empty(NF, dtype=np.float64)
    nfmaxx = np.empty(NF, dtype=np.float64)
    nfmaxy = np.empty(NF, dtype=np.float64)
    alive_old = np.nonzero(feat_alive)[0]
    acc_alive = facc[alive_old]
    nfminx[acc_alive] = ws.fminx[alive_old[acc_alive]]
    nfminy[acc_alive] = ws.fminy[alive_old[acc_alive]]
    nfmaxx[acc_alive] = ws.fmaxx[alive_old[acc_alive]]
    nfmaxy[acc_alive] = ws.fmaxy[alive_old[acc_alive]]

    clip_new = np.nonzero(~acc_alive)[0]
    if len(clip_new):
        # per-output-ring min/max (rings non-empty)
        rminx = np.minimum.reduceat(new_pts[:, 0], new_ring_off[:-1]) if OR else np.empty(0)
        rminy = np.minimum.reduceat(new_pts[:, 1], new_ring_off[:-1]) if OR else np.empty(0)
        rmaxx = np.maximum.reduceat(new_pts[:, 0], new_ring_off[:-1]) if OR else np.empty(0)
        rmaxy = np.maximum.reduceat(new_pts[:, 1], new_ring_off[:-1]) if OR else np.empty(0)
        out_feat = new_feat_idx[feat_of_part[out_part]] if OR else np.empty(0, dtype=np.int64)
        # bbox rings: outer rings only for polygons (first ring of each new
        # part), all rings for lines/points (`src/feature.ts:46-47`)
        new_cls = ws.feat_class[alive_old]
        first_of_part = np.zeros(OR, dtype=bool)
        first_of_part[new_part_off[:-1]] = True
        ring_sel = (new_cls[out_feat] != CLASS_POLYS) | first_of_part
        clip_set = np.zeros(NF, dtype=bool)
        clip_set[clip_new] = True
        ring_sel &= clip_set[out_feat]
        sel = np.nonzero(ring_sel)[0]
        sf = out_feat[sel]
        nfminx[clip_new] = np.inf
        nfminy[clip_new] = np.inf
        nfmaxx[clip_new] = -np.inf
        nfmaxy[clip_new] = -np.inf
        np.minimum.at(nfminx, sf, rminx[sel])
        np.minimum.at(nfminy, sf, rminy[sel])
        np.maximum.at(nfmaxx, sf, rmaxx[sel])
        np.maximum.at(nfmaxy, sf, rmaxy[sel])

    return WorkingSet(
        new_pts,
        new_ring_off,
        new_ring_size,
        new_part_off,
        new_feat_off,
        ws.feat_class[alive_old],
        ws.feat_meta[alive_old],
        ws.feat_tile[alive_old],
        nfminx, nfminy, nfmaxx, nfmaxy,
    )


def drill_subtree_vec(
    out, features: list, z: int, x: int, y: int, options: TilerOptions,
    emit_root: bool = False,
    allowed: "set | None" = None,
) -> None:
    """Whole-subtree drill of (z, x, y): batched equivalent of
    `cascade._drill_subtree` (+ the root tile when ``emit_root``).

    ``features`` are decoded (seq, feature) pairs in reference order.
    ``allowed``: optional ancestry-closed (z, x, y) cone; descendants
    outside it are pruned (incremental-update drills).
    """
    drill_forest_vec(
        out, [(features, z, x, y)], options, emit_roots=emit_root, allowed=allowed
    )


def drill_forest_vec(
    out, roots: list, options: TilerOptions, emit_roots: bool = True,
    allowed: "set | None" = None,
) -> None:
    """Level-synchronous drill of a FOREST of subtrees (one drill bin).

    ``roots`` = [(features, z, x, y)] at possibly mixed zooms. All live
    tiles across every subtree share one working set per level, so each
    level costs one set of array kernels regardless of how many subtrees
    the bin holds — per-subtree numpy dispatch overhead (the dominant cost
    once DeepenHeavy splits bins into many small subtrees) amortizes away.
    Subtrees are spatially disjoint, so the per-tile slab bounds and
    emission are unchanged; output rows are identical to drilling each
    root alone.
    """
    cohorts: dict[int, list] = {}
    for features, z, x, y in roots:
        cohorts.setdefault(z, []).append((features, x, y))
    z_cur = min(cohorts)
    max_pending = max(cohorts)

    ws, meta = _concat_ws([], [])
    tiles = np.empty((0, 2), dtype=np.int64)

    k1 = 0.5 * options.buffer / options.extent
    k2 = 0.5 - k1
    k3 = 0.5 + k1
    k4 = 1 + k1

    cz = z_cur
    while True:
        cohort = cohorts.pop(cz, None)
        if cohort:
            sets = [ws] if ws.num_features else []
            new_tiles = tiles.tolist()
            root_empty = []
            for features, x, y in cohort:
                if not features:
                    root_empty.append((x, y))
                    continue
                cws, cmeta = build_working_set(features, tile_idx=len(new_tiles))
                cws.feat_meta = cws.feat_meta + len(meta)
                meta = meta + cmeta
                new_tiles.append((x, y))
                sets.append(cws)
            ws, meta = _concat_ws(sets, meta)
            cohort_n = len(cohort) - len(root_empty)
            tiles = (
                np.asarray(new_tiles, dtype=np.int64).reshape(-1, 2)
                if new_tiles
                else np.empty((0, 2), dtype=np.int64)
            )
            if emit_roots:
                # emit just-joined roots (the pre-existing tiles were
                # emitted when they joined or as children)
                first = len(new_tiles) - cohort_n
                _emit_level(
                    out,
                    _tile_slice_view(ws, first),
                    meta,
                    cz,
                    tiles[first:],
                    options,
                    np.asarray(root_empty, dtype=np.int64).reshape(-1, 2),
                )
        if cz >= options.max_zoom or (ws.num_features == 0 and cz >= max_pending):
            break
        if ws.num_features == 0:
            cz += 1
            continue
        _step = _forest_level_step(
            out, ws, meta, tiles, cz, options, k1, k2, k3, k4, allowed
        )
        ws, meta, tiles = _step
        cz += 1


def _tile_slice_view(ws: WorkingSet, first_tile: int) -> WorkingSet:
    """Features of tiles >= first_tile (a just-joined cohort): features are
    tile-sorted, so this is a suffix slice of every array."""
    f0 = int(np.searchsorted(ws.feat_tile, first_tile, side="left"))
    p0 = int(ws.feat_off[f0])
    r0 = int(ws.part_off[p0])
    n0 = int(ws.ring_off[r0])
    return WorkingSet(
        ws.pts[n0:],
        ws.ring_off[r0:] - n0,
        ws.ring_size[r0:],
        ws.part_off[p0:] - r0,
        ws.feat_off[f0:] - p0,
        ws.feat_class[f0:],
        ws.feat_meta[f0:],
        ws.feat_tile[f0:] - first_tile,
        ws.fminx[f0:], ws.fminy[f0:], ws.fmaxx[f0:], ws.fmaxy[f0:],
    )


def _ws_take_features(ws: WorkingSet, keep, new_tile) -> WorkingSet:
    """WorkingSet restricted to the features where ``keep`` is True, with
    feat_tile replaced by ``new_tile`` (already remapped indices). Pure
    gather - used by the invalidation-cone pruning of update drills."""
    idx = np.nonzero(keep)[0]
    part_start = ws.feat_off[idx]
    part_len = ws.feat_off[idx + 1] - part_start
    part_gather = _span_gather(part_start, part_len)
    ring_start = ws.part_off[part_gather]
    ring_len = ws.part_off[part_gather + 1] - ring_start
    ring_gather = _span_gather(ring_start, ring_len)
    pt_start = ws.ring_off[ring_gather]
    pt_len = ws.ring_off[ring_gather + 1] - pt_start
    pt_gather = _span_gather(pt_start, pt_len)
    return WorkingSet(
        ws.pts[pt_gather],
        np.concatenate(([0], np.cumsum(pt_len))),
        ws.ring_size[ring_gather],
        np.concatenate(([0], np.cumsum(ring_len))),
        np.concatenate(([0], np.cumsum(part_len))),
        ws.feat_class[idx],
        ws.feat_meta[idx],
        new_tile,
        ws.fminx[idx], ws.fminy[idx], ws.fmaxx[idx], ws.fmaxy[idx],
    )


def _forest_level_step(out, ws, meta, tiles, cz, options, k1, k2, k3, k4,
                       allowed=None):
    """One descend step shared by the forest drill (body of the old
    per-subtree loop).

    ``allowed``: optional set of (z, x, y) - the invalidation cone of an
    incremental update (ancestry-closed by the buffered-bounds rule,
    `incremental.affected_tile_keys`); children outside it are pruned
    BEFORE clipping descends further, so an update drill costs
    O(invalidated tiles), not O(subtree)."""
    if True:
        txs = tiles[:, 0].astype(np.float64)
        tys = tiles[:, 1].astype(np.float64)
        left = _clip_pass(ws, cz, -k1, k3, 0, txs)
        right = _clip_pass(ws, cz, k2, k4, 0, txs)
        quads = []
        for qx, side in ((0, left), (1, right)):
            if side.num_features:
                tl = _clip_pass(side, cz, -k1, k3, 1, tys)
                bl = _clip_pass(side, cz, k2, k4, 1, tys)
            else:
                tl = side
                bl = side
            quads.append((qx, 0, tl))
            quads.append((qx, 1, bl))

        # next level: concatenate quadrant sets; a tile's features live in
        # exactly one set, so per-tile contiguity survives concatenation
        new_tiles: list = []
        sets: list = []
        empty: list = []
        present = np.zeros((len(tiles), 2, 2), dtype=bool)
        for qx, qy, qws in quads:
            if qws.num_features == 0:
                continue
            parents = np.unique(qws.feat_tile)
            present[parents, qx, qy] = True
            # renumber feat_tile into the global child tile list
            base = len(new_tiles)
            remap = np.full(len(tiles), -1, dtype=np.int64)
            remap[parents] = base + np.arange(len(parents), dtype=np.int64)
            for p in parents.tolist():
                new_tiles.append((2 * tiles[p, 0] + qx, 2 * tiles[p, 1] + qy))
            qws.feat_tile = remap[qws.feat_tile]
            sets.append(qws)
        for p in range(len(tiles)):
            for qx in (0, 1):
                for qy in (0, 1):
                    if not present[p, qx, qy]:
                        empty.append((2 * tiles[p, 0] + qx, 2 * tiles[p, 1] + qy))

        ws, meta = _concat_ws(sets, meta)
        tiles = (
            np.asarray(new_tiles, dtype=np.int64).reshape(-1, 2)
            if new_tiles
            else np.empty((0, 2), dtype=np.int64)
        )
        if allowed is not None:
            cz1 = cz + 1
            keep = np.fromiter(
                ((cz1, int(tx), int(ty)) in allowed for tx, ty in tiles),
                dtype=bool,
                count=len(tiles),
            )
            if not keep.all():
                remap = np.cumsum(keep) - 1
                if len(ws.feat_tile):
                    fkeep = keep[ws.feat_tile]
                    ws = _ws_take_features(ws, fkeep, remap[ws.feat_tile[fkeep]])
                tiles = tiles[keep]
            empty = [e for e in empty if (cz1, int(e[0]), int(e[1])) in allowed]
        _emit_level(
            out, ws, meta, cz + 1, tiles, options,
            np.asarray(empty, dtype=np.int64).reshape(-1, 2),
        )
        return ws, meta, tiles


def _concat_ws(sets: list, meta: list) -> tuple[WorkingSet, list]:
    if not sets:
        return (
            WorkingSet(
                np.empty((0, 3), dtype=np.float64),
                np.zeros(1, dtype=np.int64),
                np.empty(0, dtype=np.float64),
                np.zeros(1, dtype=np.int64),
                np.zeros(1, dtype=np.int64),
                np.empty(0, dtype=np.int8),
                np.empty(0, dtype=np.int64),
                np.empty(0, dtype=np.int64),
                np.empty(0), np.empty(0), np.empty(0), np.empty(0),
            ),
            meta,
        )
    if len(sets) == 1:
        return sets[0], meta
    pts = np.concatenate([s.pts for s in sets])
    ring_off = np.concatenate(
        [sets[0].ring_off]
        + [s.ring_off[1:] + off for s, off in zip(sets[1:], np.cumsum([len(s.pts) for s in sets[:-1]]))]
    )
    ring_size = np.concatenate([s.ring_size for s in sets])
    part_off = np.concatenate(
        [sets[0].part_off]
        + [
            s.part_off[1:] + off
            for s, off in zip(
                sets[1:], np.cumsum([len(s.ring_size) for s in sets[:-1]])
            )
        ]
    )
    feat_off = np.concatenate(
        [sets[0].feat_off]
        + [
            s.feat_off[1:] + off
            for s, off in zip(
                sets[1:], np.cumsum([len(s.part_off) - 1 for s in sets[:-1]])
            )
        ]
    )
    return (
        WorkingSet(
            pts, ring_off, ring_size, part_off, feat_off,
            np.concatenate([s.feat_class for s in sets]),
            np.concatenate([s.feat_meta for s in sets]),
            np.concatenate([s.feat_tile for s in sets]),
            np.concatenate([s.fminx for s in sets]),
            np.concatenate([s.fminy for s in sets]),
            np.concatenate([s.fmaxx for s in sets]),
            np.concatenate([s.fmaxy for s in sets]),
        ),
        meta,
    )
