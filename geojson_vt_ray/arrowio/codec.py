"""Arrow ⇄ internal-feature codec.

Internal features travel between Ray Data stages as columnar Arrow rows:
flat stride-3 coordinate buffers as ``list<float64>`` (zero-copy into numpy
via ``.values``), ring/polygon grouping as offset lists, per-ring size /
line-metrics columns, bbox columns, JSON-encoded id/tags (exact float
round-trip via shortest-repr), and a lexicographic binary ``seq`` key that
preserves reference feature order through shuffles and line-metrics splits
(SURVEY.md §1.6, §4).

Row kinds share one schema per pipeline level:
  kind 0 = feature row, kind 1 = empty-child marker (forces tile existence),
  kind 2 = assembled tile row.
"""

from __future__ import annotations

import json
import math
from typing import Any, Optional

import pyarrow as pa

from ..kernels.feature import Slice, create_feature

GEOM_TYPES = ("Point", "MultiPoint", "LineString", "MultiLineString", "Polygon", "MultiPolygon")
GEOM_CODE = {t: i for i, t in enumerate(GEOM_TYPES)}

KIND_FEATURE = 0
KIND_MARKER = 1
KIND_TILE = 2  # complete tile row
KIND_TILE_PARTIAL = 3  # mergeable tile shard (seqs ∥ features_json)

FEATURE_FIELDS = [
    ("kind", pa.int8()),
    ("tkey", pa.int64()),
    ("z", pa.int16()),
    ("x", pa.int32()),
    ("y", pa.int32()),
    ("seq", pa.binary()),
    ("gtype", pa.int8()),
    ("fid_json", pa.string()),
    ("tags_json", pa.string()),
    ("pts", pa.list_(pa.float64())),
    ("ring_lens", pa.list_(pa.int32())),
    ("poly_lens", pa.list_(pa.int32())),
    ("sizes", pa.list_(pa.float64())),
    ("starts", pa.list_(pa.float64())),
    ("ends", pa.list_(pa.float64())),
    ("minx", pa.float64()),
    ("miny", pa.float64()),
    ("maxx", pa.float64()),
    ("maxy", pa.float64()),
    ("features_json", pa.string()),
    ("seqs", pa.list_(pa.binary())),
    ("min_seq", pa.binary()),  # lineage: first/last input order key in this tile
    ("max_seq", pa.binary()),  # per-tile-feature order keys (partial tiles)
    ("num_points", pa.int64()),
    ("num_simplified", pa.int64()),
    ("num_features", pa.int64()),
    ("est", pa.float64()),  # marker rows: estimated leaf-tile drill cost
]

LEVEL_SCHEMA = pa.schema(FEATURE_FIELDS)

_NAN = float("nan")


def tile_key(z: int, x: int, y: int) -> int:
    """Packed shuffle key, same packing as the reference's toID
    (`src/tile-index.ts:308-310`)."""
    return ((1 << z) * y + x) * 32 + z


def _feature_rings(feature: dict) -> tuple[list[Slice], list[int]]:
    """Flatten a feature's geometry to (rings, rings-per-polygon)."""
    ftype = feature["type"]
    geometry = feature["geometry"]
    if ftype in ("Point", "MultiPoint"):
        s = Slice(geometry, _NAN, _NAN, _NAN)
        return [s], []
    if ftype == "LineString":
        return [geometry], []
    if ftype in ("MultiLineString", "Polygon"):
        return list(geometry), []
    # MultiPolygon
    rings: list[Slice] = []
    poly_lens: list[int] = []
    for poly in geometry:
        rings.extend(poly)
        poly_lens.append(len(poly))
    return rings, poly_lens


class LevelRowBuilder:
    """Accumulates mixed feature/marker/tile rows and emits one Arrow table."""

    def __init__(self) -> None:
        self.cols: dict[str, list] = {name: [] for name, _ in FEATURE_FIELDS}

    def add_feature(self, z: int, x: int, y: int, seq: bytes, feature: dict) -> None:
        rings, poly_lens = _feature_rings(feature)
        pts: list[float] = []
        ring_lens: list[int] = []
        sizes: list[float] = []
        starts: list[float] = []
        ends: list[float] = []
        for r in rings:
            rp = r.points
            pts.extend(rp.tolist() if hasattr(rp, "tolist") else rp)
            ring_lens.append(len(rp))
            sizes.append(r.size if r.size is not None else _NAN)
            starts.append(r.start if r.start is not None else _NAN)
            ends.append(r.end if r.end is not None else _NAN)
        c = self.cols
        c["kind"].append(KIND_FEATURE)
        c["tkey"].append(tile_key(z, x, y))
        c["z"].append(z)
        c["x"].append(x)
        c["y"].append(y)
        c["seq"].append(seq)
        c["gtype"].append(GEOM_CODE[feature["type"]])
        fid = feature["id"]
        c["fid_json"].append(None if fid is None else json.dumps(fid))
        tags = feature["tags"]
        c["tags_json"].append(None if tags is None else json.dumps(tags))
        c["pts"].append(pts)
        c["ring_lens"].append(ring_lens)
        c["poly_lens"].append(poly_lens)
        c["sizes"].append(sizes)
        c["starts"].append(starts)
        c["ends"].append(ends)
        c["minx"].append(feature["minX"])
        c["miny"].append(feature["minY"])
        c["maxx"].append(feature["maxX"])
        c["maxy"].append(feature["maxY"])
        c["features_json"].append(None)
        c["seqs"].append([])
        c["min_seq"].append(b"")
        c["max_seq"].append(b"")
        c["num_points"].append(0)
        c["num_simplified"].append(0)
        c["num_features"].append(0)
        c["est"].append(0.0)

    def add_marker(self, z: int, x: int, y: int, est: float = 0.0) -> None:
        self._add_stub(KIND_MARKER, z, x, y)
        self.cols["est"][-1] = est

    def add_tile(
        self,
        tile: dict,
        features_json: str,
        min_seq: bytes = b"",
        max_seq: bytes = b"",
        kind: int = KIND_TILE,
    ) -> None:
        self._add_stub(kind, tile["z"], tile["x"], tile["y"])
        c = self.cols
        c["features_json"][-1] = features_json
        c["min_seq"][-1] = min_seq
        c["max_seq"][-1] = max_seq
        c["num_points"][-1] = tile["numPoints"]
        c["num_simplified"][-1] = tile["numSimplified"]
        c["num_features"][-1] = tile["numFeatures"]

    def add_partial_tile(
        self,
        z: int,
        x: int,
        y: int,
        seqs: list[bytes],
        features_json: str,
        num_points: int,
        num_simplified: int,
        num_features: int,
    ) -> None:
        """Mergeable tile shard: `seqs` parallels the features_json array so a
        later merge can restore reference feature order."""
        self._add_stub(KIND_TILE_PARTIAL, z, x, y)
        c = self.cols
        c["features_json"][-1] = features_json
        c["seqs"][-1] = seqs
        c["num_points"][-1] = num_points
        c["num_simplified"][-1] = num_simplified
        c["num_features"][-1] = num_features

    def _add_stub(self, kind: int, z: int, x: int, y: int) -> None:
        c = self.cols
        c["kind"].append(kind)
        c["tkey"].append(tile_key(z, x, y))
        c["z"].append(z)
        c["x"].append(x)
        c["y"].append(y)
        c["seq"].append(b"")
        c["gtype"].append(-1)
        c["fid_json"].append(None)
        c["tags_json"].append(None)
        c["pts"].append([])
        c["ring_lens"].append([])
        c["poly_lens"].append([])
        c["sizes"].append([])
        c["starts"].append([])
        c["ends"].append([])
        c["minx"].append(_NAN)
        c["miny"].append(_NAN)
        c["maxx"].append(_NAN)
        c["maxy"].append(_NAN)
        c["features_json"].append(None)
        c["seqs"].append([])
        c["min_seq"].append(b"")
        c["max_seq"].append(b"")
        c["num_points"].append(0)
        c["num_simplified"].append(0)
        c["num_features"].append(0)
        c["est"].append(0.0)

    def table(self) -> pa.Table:
        arrays = [pa.array(self.cols[name], type=typ) for name, typ in FEATURE_FIELDS]
        return pa.Table.from_arrays(arrays, schema=LEVEL_SCHEMA)


def level_table(rows: Optional[LevelRowBuilder] = None) -> pa.Table:
    return (rows or LevelRowBuilder()).table()


def empty_level_table() -> pa.Table:
    return LevelRowBuilder().table()


def encode_feature_columns(
    features_with_seq: list[tuple[bytes, dict]], z: int, x: int, y: int
) -> pa.Table:
    b = LevelRowBuilder()
    for seq, f in features_with_seq:
        b.add_feature(z, x, y, seq, f)
    return b.table()


def _nan_to_none(v: float) -> Optional[float]:
    return None if v is None or (isinstance(v, float) and math.isnan(v)) else v


def decode_features(batch: pa.Table) -> list[tuple[bytes, dict]]:
    """Decode feature rows (kind 0) of a level table back to internal features.

    Returns (seq, feature) pairs in row order; markers/tiles are skipped.
    """
    out: list[tuple[bytes, dict]] = []
    kind = batch.column("kind").to_pylist()
    gtype = batch.column("gtype").to_pylist()
    seqs = batch.column("seq").to_pylist()
    fid_json = batch.column("fid_json").to_pylist()
    tags_json = batch.column("tags_json").to_pylist()
    pts_col = batch.column("pts").to_pylist()
    ring_lens_col = batch.column("ring_lens").to_pylist()
    poly_lens_col = batch.column("poly_lens").to_pylist()
    sizes_col = batch.column("sizes").to_pylist()
    starts_col = batch.column("starts").to_pylist()
    ends_col = batch.column("ends").to_pylist()
    minx = batch.column("minx").to_pylist()
    miny = batch.column("miny").to_pylist()
    maxx = batch.column("maxx").to_pylist()
    maxy = batch.column("maxy").to_pylist()

    for i in range(batch.num_rows):
        if kind[i] != KIND_FEATURE:
            continue
        ftype = GEOM_TYPES[gtype[i]]
        pts = pts_col[i]
        ring_lens = ring_lens_col[i]
        sizes = sizes_col[i]
        starts = starts_col[i]
        ends = ends_col[i]

        rings: list[Slice] = []
        off = 0
        for j, rl in enumerate(ring_lens):
            rings.append(
                Slice(pts[off : off + rl], sizes[j], _nan_to_none(starts[j]), _nan_to_none(ends[j]))
            )
            off += rl

        geometry: Any
        if ftype in ("Point", "MultiPoint"):
            geometry = rings[0].points if rings else []
        elif ftype == "LineString":
            geometry = rings[0]
        elif ftype in ("MultiLineString", "Polygon"):
            geometry = rings
        else:  # MultiPolygon
            geometry = []
            off2 = 0
            for pl in poly_lens_col[i]:
                geometry.append(rings[off2 : off2 + pl])
                off2 += pl

        fid = None if fid_json[i] is None else json.loads(fid_json[i])
        tags = None if tags_json[i] is None else json.loads(tags_json[i])
        feature = {
            "id": fid,
            "type": ftype,
            "geometry": geometry,
            "tags": tags,
            "minX": minx[i],
            "minY": miny[i],
            "maxX": maxx[i],
            "maxY": maxy[i],
        }
        out.append((seqs[i], feature))
    return out
