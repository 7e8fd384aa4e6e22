"""Mapbox Vector Tile (MVT) binary encoding of transformed tiles.

Beyond-reference egress: the reference library returns tile objects and
its ecosystem serializes them with vt-pbf for MapLibre/Mapbox renderers
(`/root/reference/README.md` points users at vt-pbf + pbf). This module
implements that serialization natively — a pure-Python protobuf writer
for the MVT 2.1 spec (https://github.com/mapbox/vector-tile-spec), no
protobuf dependency — over the transformed tile features produced by
`kernels/tile.py::transform_tile` (integer extent coords, the exact
shape vt-pbf consumes).

Wire layout (MVT 2.1):
  Tile        = repeated Layer (field 3)
  Layer       = version=2 (15), name (1), repeated Feature (2),
                repeated keys (3), repeated Value (4), extent (5)
  Value       = oneof string(1) / float(2) / double(3) / int(4) /
                uint(5) / sint(6) / bool(7)
  Feature     = id (1), packed tags (2, key/value index pairs),
                type (3: 1 point / 2 line / 3 polygon),
                packed geometry (4, command integers)
  geometry    = CommandInteger (id & 7) | (count << 3); id 1 MoveTo,
                2 LineTo, 7 ClosePath; params are zigzag deltas from a
                cursor that persists across a feature's parts.

Encoding decisions (mirroring vt-pbf where the spec allows choice):
polygon rings arrive closed from the clipper and are encoded with the
final point dropped + ClosePath; feature ids are emitted only when they
are non-negative integers (MVT ids are uint64 — string/other ids stay
in tags only if the caller put them there); integer tag values use
int(4) when >= 0 and sint(6) when negative, floats use double(3);
null-valued tags are omitted (MVT has no null — tippecanoe semantics).

A decoder (`decode_tile`) is included for round-trip tests and for
consumers that want to inspect produced tiles without a JS stack.
"""

from __future__ import annotations

import numpy as np

_MOVE_TO = 1
_LINE_TO = 2
_CLOSE_PATH = 7


# ------------------------------------------------------------ varint writer

def _varint(buf: bytearray, v: int) -> None:
    while v > 0x7F:
        buf.append((v & 0x7F) | 0x80)
        v >>= 7
    buf.append(v)


def _tag(buf: bytearray, field: int, wire: int) -> None:
    _varint(buf, (field << 3) | wire)


def _bytes_field(buf: bytearray, field: int, payload: bytes) -> None:
    _tag(buf, field, 2)
    _varint(buf, len(payload))
    buf.extend(payload)


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63)


def _unzigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


# ------------------------------------------------------------ geometry

def _geometry_commands(feature_type: int, geometry: list) -> list[int]:
    """Command-integer sequence for one transformed feature geometry.

    Points: `geometry` is a flat list of [x, y] pairs. Lines/polygons:
    a list of parts, each a list of [x, y] pairs; polygon rings are
    closed (first == last) and the closing point is dropped in favor of
    ClosePath, per spec.
    """
    cmds: list[int] = []
    cx = cy = 0
    if feature_type == 1:
        pts = geometry
        cmds.append((_MOVE_TO & 7) | (len(pts) << 3))
        for x, y in pts:
            cmds.append(_zigzag(x - cx))
            cmds.append(_zigzag(y - cy))
            cx, cy = x, y
        return cmds
    for part in geometry:
        n = len(part) - 1 if feature_type == 3 else len(part)
        cmds.append((_MOVE_TO & 7) | (1 << 3))
        for i, (x, y) in enumerate(part[:n]):
            if i == 1:
                cmds.append((_LINE_TO & 7) | ((n - 1) << 3))
            cmds.append(_zigzag(x - cx))
            cmds.append(_zigzag(y - cy))
            cx, cy = x, y
        if feature_type == 3:
            cmds.append((_CLOSE_PATH & 7) | (1 << 3))
    return cmds


# ------------------------------------------------------------ values

def _encode_value(v) -> bytes:
    buf = bytearray()
    if isinstance(v, bool):
        _tag(buf, 7, 0)
        _varint(buf, int(v))
    elif isinstance(v, str):
        _bytes_field(buf, 1, v.encode("utf-8"))
    elif isinstance(v, (int, np.integer)):
        if v >= 0:
            _tag(buf, 4, 0)
            _varint(buf, int(v))
        else:
            _tag(buf, 6, 0)
            _varint(buf, _zigzag(int(v)))
    elif isinstance(v, (float, np.floating)):
        _tag(buf, 3, 1)
        buf.extend(np.float64(v).tobytes())
    else:  # nested structures — stringify deterministically
        _bytes_field(buf, 1, str(v).encode("utf-8"))
    return bytes(buf)


# ------------------------------------------------------------ encoder

def encode_layers(layers: dict[str, dict]) -> bytes:
    """Encode {layer_name: {"features": [...], "extent": int}} to MVT bytes.
    Features must be TRANSFORMED tile features (`transform_tile_features`):
    {"type": 1|2|3, "tags": dict, "geometry": ..., "id"?}."""
    tile = bytearray()
    for name, layer in layers.items():
        keys: dict[str, int] = {}
        values: dict[tuple, int] = {}
        value_blobs: list[bytes] = []
        feats = bytearray()
        for f in layer["features"]:
            fbuf = bytearray()
            fid = f.get("id")
            if isinstance(fid, (int, np.integer)) and not isinstance(fid, bool) and fid >= 0:
                _tag(fbuf, 1, 0)
                _varint(fbuf, int(fid))
            tags: list[int] = []
            for k, v in (f.get("tags") or {}).items():
                if v is None:
                    continue  # MVT has no null value type; omit (tippecanoe semantics)
                ki = keys.setdefault(k, len(keys))
                if isinstance(v, float):
                    vkey = ("float", v.hex())
                else:
                    try:
                        hash(v)
                        vkey = (type(v).__name__, v)
                    except TypeError:
                        # Unhashable (list/dict tag values — routine in GeoJSON
                        # properties): dedup on the stringified form, matching
                        # the _encode_value nested-structure branch exactly.
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
            gbuf = bytearray()
            for c in _geometry_commands(f["type"], f["geometry"]):
                _varint(gbuf, c)
            _bytes_field(fbuf, 4, bytes(gbuf))
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


def encode_tile(tile: dict, layer_name: str = "geojsonvt", extent: int = 4096) -> bytes:
    """Encode one TRANSFORMED tile dict (the `transform_tile` contract —
    `tile["features"]` in integer extent coords) as a single-layer MVT."""
    return encode_layers(
        {layer_name: {"features": tile["features"], "extent": extent}}
    )


# ------------------------------------------------------------ decoder

def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    out = 0
    shift = 0
    while True:
        b = data[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7


def _decode_value(data: bytes) -> object:
    pos = 0
    val: object = None
    while pos < len(data):
        key, pos = _read_varint(data, pos)
        field, wire = key >> 3, key & 7
        if wire == 2:
            ln, pos = _read_varint(data, pos)
            val = data[pos : pos + ln].decode("utf-8")
            pos += ln
        elif wire == 1:
            raw = data[pos : pos + 8]
            pos += 8
            val = float(np.frombuffer(raw, np.float64)[0])
        elif wire == 5:
            # spec Value.float_value (field 2) — 4-byte IEEE float; emitted
            # by external producers (e.g. tippecanoe); never by our encoder
            raw = data[pos : pos + 4]
            pos += 4
            val = float(np.frombuffer(raw, np.float32)[0])
        else:
            v, pos = _read_varint(data, pos)
            if field == 6:
                val = _unzigzag(v)
            elif field == 7:
                val = bool(v)
            else:
                val = v
    return val


def _decode_geometry(cmds: list[int], ftype: int):
    parts: list[list[list[int]]] = []
    cur: list[list[int]] = []
    cx = cy = 0
    i = 0
    while i < len(cmds):
        cmd = cmds[i]
        i += 1
        op, count = cmd & 7, cmd >> 3
        if op == _CLOSE_PATH:
            if cur:
                cur.append(list(cur[0]))  # reopen the ring for comparison
                parts.append(cur)
                cur = []
            continue
        if op == _MOVE_TO and cur:
            parts.append(cur)
            cur = []
        for _ in range(count):
            cx += _unzigzag(cmds[i])
            cy += _unzigzag(cmds[i + 1])
            i += 2
            cur.append([cx, cy])
    if cur:
        parts.append(cur)
    if ftype == 1:
        return [pt for part in parts for pt in part]
    return parts


def decode_tile(data: bytes) -> dict[str, dict]:
    """Decode MVT bytes back to {layer: {extent, features}} with absolute
    integer coords (polygon rings re-closed), the `transform_tile` shape."""
    layers: dict[str, dict] = {}
    pos = 0
    while pos < len(data):
        key, pos = _read_varint(data, pos)
        ln, pos = _read_varint(data, pos)
        payload = data[pos : pos + ln]
        pos += ln
        if key >> 3 != 3:
            continue
        name = ""
        extent = 4096
        keys: list[str] = []
        values: list[object] = []
        raw_feats: list[bytes] = []
        p = 0
        while p < len(payload):
            k, p = _read_varint(payload, p)
            field, wire = k >> 3, k & 7
            if wire == 2:
                fl, p = _read_varint(payload, p)
                blob = payload[p : p + fl]
                p += fl
                if field == 1:
                    name = blob.decode("utf-8")
                elif field == 2:
                    raw_feats.append(blob)
                elif field == 3:
                    keys.append(blob.decode("utf-8"))
                elif field == 4:
                    values.append(_decode_value(blob))
            elif wire == 1:
                p += 8  # skip fixed64 from foreign producers
            elif wire == 5:
                p += 4  # skip fixed32 from foreign producers
            else:
                v, p = _read_varint(payload, p)
                if field == 5:
                    extent = v
        feats = []
        for blob in raw_feats:
            f: dict = {"tags": {}}
            ftype = 0
            cmds: list[int] = []
            q = 0
            while q < len(blob):
                k, q = _read_varint(blob, q)
                field, wire = k >> 3, k & 7
                if wire == 2:
                    fl, q = _read_varint(blob, q)
                    sub = blob[q : q + fl]
                    q += fl
                    if field == 2:
                        s = 0
                        while s < len(sub):
                            ki, s = _read_varint(sub, s)
                            vi, s = _read_varint(sub, s)
                            f["tags"][keys[ki]] = values[vi]
                    elif field == 4:
                        s = 0
                        while s < len(sub):
                            c, s = _read_varint(sub, s)
                            cmds.append(c)
                elif wire == 1:
                    q += 8
                elif wire == 5:
                    q += 4
                else:
                    v, q = _read_varint(blob, q)
                    if field == 1:
                        f["id"] = v
                    elif field == 3:
                        ftype = v
            f["type"] = ftype
            f["geometry"] = _decode_geometry(cmds, ftype)
            feats.append(f)
        layers[name] = {"extent": extent, "features": feats}
    return layers
