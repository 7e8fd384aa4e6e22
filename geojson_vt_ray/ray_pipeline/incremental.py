"""Incremental pyramid maintenance on Ray (reference `updateData` semantics
distributed, SURVEY.md §3.3).

The diff is small by construction (a batch of adds/removes/updates): it is
hashed and broadcast; the source feature Dataset is filtered/patched per
batch (anti-join by id + upsert of converted adds), and only the tile
subtrees whose buffered bounds intersect an affected feature are recomputed
— the untouched output partitions are kept.
"""

from __future__ import annotations

import json
from typing import Optional

import pyarrow as pa

import ray
import ray.data

from ..engine.difference import apply_source_diff, diff_to_hashed
from ..kernels.convert import convert_to_internal
from ..kernels.wrap import wrap
from ..options import TilerOptions


def affected_tile_keys(affected: list[dict], max_zoom: int, options: TilerOptions) -> set[tuple[int, int, int]]:
    """All (z, x, y) whose buffered tile bounds intersect any affected
    feature's bbox (the distributed analogue of the reference's
    invalidateTiles scan, `src/tile-index.ts:235-305`)."""
    k1 = options.buffer / options.extent
    out: set[tuple[int, int, int]] = set()
    for f in affected:
        for z in range(max_zoom + 1):
            z2 = 1 << z
            # invert the buffered-bounds test: tile x with (x - k1)/z2 <= maxX
            # and (x + 1 + k1)/z2 > minX
            x0 = int(f["minX"] * z2 - 1 - k1)
            x1 = int(f["maxX"] * z2 + k1) + 1
            y0 = int(f["minY"] * z2 - 1 - k1)
            y1 = int(f["maxY"] * z2 + k1) + 1
            for x in range(max(0, x0), min(z2 - 1, x1) + 1):
                if f["maxX"] < (x - k1) / z2 or f["minX"] >= (x + 1 + k1) / z2:
                    continue
                for y in range(max(0, y0), min(z2 - 1, y1) + 1):
                    if f["maxY"] < (y - k1) / z2 or f["minY"] >= (y + 1 + k1) / z2:
                        continue
                    out.add((z, x, y))
    return out


def fid_key_of(fid) -> str:
    """Canonical string encoding of a diff feature id (JSON literal, so
    int 1 and string "1" stay distinct and None encodes as 'null').

    Integral floats canonicalize to ints (JSON ``"id": 1.0`` and a diff
    ``remove: [1]`` are the same number in the reference's JS `===` world,
    and Python set membership treated them equal before keys existed)."""
    if isinstance(fid, float) and fid.is_integer():
        fid = int(fid)
    return json.dumps(fid, sort_keys=True, separators=(",", ":"))


def fid_key_column(options: Optional[TilerOptions]) -> str:
    """Name of the materialized id-key column for the given options. The
    extraction rule is part of the name (``fid_key`` for the native id,
    ``fid_key__promote_<prop>`` when promoting), so a dataset ingested
    under different options can never silently satisfy a diff's anti-join
    with stale keys — the shim recomputes instead."""
    if options is not None and options.promote_id:
        return f"fid_key__promote_{options.promote_id}"
    return "fid_key"


def _fid_key_for_column(f: dict, col: str) -> str:
    """The value a given id-key COLUMN holds for a raw feature — native
    ``id`` for ``fid_key``, ``properties[<prop>]`` for
    ``fid_key__promote_<prop>`` — so upsert rows can fill every key column
    their destination schema carries, consistently with what the shim
    would recompute from the JSON."""
    if col == "fid_key":
        return fid_key_of(f.get("id"))
    prop = col[len("fid_key__promote_"):]
    return fid_key_of((f.get("properties") or {}).get(prop))


def fid_key_of_feature(f: dict, options: Optional[TilerOptions]) -> str:
    """The diff id of a raw GeoJSON feature under the given options
    (``properties[promote_id]`` when promoting, else native ``id``) in
    `fid_key_of` canonical form — same extraction the per-feature converter
    performs (reference `src/convert.ts:30-38`)."""
    if options is not None and options.promote_id:
        fid = (f.get("properties") or {}).get(options.promote_id)
    else:
        fid = f.get("id")
    return fid_key_of(fid)


def with_fid_key(source_rows: "ray.data.Dataset", options: TilerOptions) -> "ray.data.Dataset":
    """Compat shim: materialize the options-matched id-key column for
    source datasets that don't carry it (or carry one built under OTHER
    options — the column name encodes the extraction rule, see
    `fid_key_column`). One JSON parse pass; new ingests
    (``dataset_from_geojson(..., options=...)``) carry the right column
    from the start so diffs never re-parse the corpus."""
    col = fid_key_column(options)
    if col in source_rows.schema().names:
        return source_rows

    def add_key(batch: pa.Table) -> pa.Table:
        keys = [
            fid_key_of_feature(json.loads(fj), options)
            for fj in batch.column("feature_json").to_pylist()
        ]
        return batch.append_column(col, pa.array(keys, pa.string()))

    return source_rows.map_batches(add_key, batch_format="pyarrow")


def apply_diff_dataset(
    source_rows: "ray.data.Dataset",
    diff: dict,
    options: TilerOptions,
) -> tuple["ray.data.Dataset", list[dict]]:
    """Apply a source diff to a Dataset of raw GeoJSON feature rows
    ``{feature_json, input_seq, fid_key}``.

    Returns (updated dataset, affected internal features). The diff is
    small by construction; its id set becomes a pyarrow value set and both
    the anti-join (drop rows being removed/replaced) and the affected-row
    scan are vectorized ``pc.is_in`` filters over the materialized
    ``fid_key`` column — no per-row JSON parse of the corpus. Only the
    matched (diff-sized) rows are parsed, to build the invalidation list.
    """
    import pyarrow.compute as pc

    source_rows = with_fid_key(source_rows, options)
    key_col = fid_key_column(options)
    hashed = diff_to_hashed(diff, options)
    drop_ids = hashed["remove"] | set(hashed["add"].keys()) | set(hashed["update"].keys())
    drop_keys = pa.array(sorted(fid_key_of(v) for v in drop_ids), pa.string())
    remove_all = bool(hashed["removeAll"])

    affected: list[dict] = []

    def patch(batch: pa.Table) -> pa.Table:
        if remove_all:
            return batch.slice(0, 0)
        hit = pc.is_in(batch.column(key_col), value_set=drop_keys)
        return batch.filter(pc.invert(hit))

    patched = source_rows.map_batches(patch, batch_format="pyarrow")

    # collect affected old rows (small: only ids in the diff) on the driver
    def affected_scan(batch: pa.Table) -> pa.Table:
        if remove_all:
            return batch.select(["feature_json"])
        hit = pc.is_in(batch.column(key_col), value_set=drop_keys)
        return batch.filter(hit).select(["feature_json"])

    # one bounded collect (matched rows are diff-sized by contract) instead
    # of iter_rows' per-row driver round trips; a pathological
    # touch-everything diff degrades to a full-source rebuild anyway, which
    # `incremental_update_pyramid` callers fall back to by rebuilding
    for row in source_rows.map_batches(affected_scan, batch_format="pyarrow").take_all():
        f = json.loads(row["feature_json"])
        affected.extend(wrap(convert_to_internal(f, options), options))

    # upsert rows must carry EVERY column of the (post-shim) source schema —
    # including id-key columns materialized under other options — or the
    # union emits schema-divergent blocks and a later diff double-appends
    all_cols = source_rows.schema().names
    key_cols = [c for c in all_cols if c.startswith("fid_key")]

    def _new_row(f: dict, seq: int) -> dict:
        row: dict = {}
        for c in all_cols:
            if c == "feature_json":
                row[c] = json.dumps(f)
            elif c == "input_seq":
                row[c] = seq
            elif c in key_cols:
                row[c] = _fid_key_for_column(f, c)
            else:
                row[c] = None  # unknown user column: explicit null
        return row

    new_rows = []
    next_seq = 1 << 40  # appended rows order after all existing rows
    for f in hashed["add"].values():
        new_rows.append(_new_row(f, next_seq))
        next_seq += 1
        affected.extend(wrap(convert_to_internal(f, options), options))
    for u in hashed["update"].values():
        if u.get("newGeometry"):
            nf = {
                "type": "Feature",
                "id": u["id"],
                "geometry": u["newGeometry"],
                "properties": {},
            }
            new_rows.append(_new_row(nf, next_seq))
            next_seq += 1
            affected.extend(wrap(convert_to_internal(nf, options), options))

    if new_rows:
        patched = patched.union(ray.data.from_items(new_rows))
    return patched, affected


def incremental_update_pyramid(
    source_rows: "ray.data.Dataset",
    diff: dict,
    options: TilerOptions,
    out_dir: str,
    **pyramid_kwargs,
) -> dict:
    """Recompute only the affected subtrees of a written pyramid.

    Pruning is subtree-granular at the hand-off zoom: any change invalidates
    every shallow ancestor down to z0, so shallow tiles (z ≤ z_handoff) are
    rebuilt by the cheap shuffle-free cascade pass over the patched source —
    but the expensive drill below the hand-off runs ONLY over the affected
    hand-off subtrees (`build_pyramid_fast(subtree_filter=...)`). Changed
    tiles land in ``out_dir/_updates/upd_<n>/``, which `TileServer` overlays
    over the base pyramid (newest wins), completing the reference's
    updateData → getTile loop (`src/tile-index.ts:235-305`,
    `test/update.test.ts:452`) without recomputing the world.
    """
    import glob
    import os

    from ..arrowio.codec import tile_key
    from .cascade import build_pyramid_fast

    patched, affected = apply_diff_dataset(source_rows, diff, options)
    keys = affected_tile_keys(affected, options.max_zoom, options)
    keys_ref = ray.put(keys)

    zh = min(pyramid_kwargs.get("z_handoff", 7), options.max_zoom)
    pyramid_kwargs["z_handoff"] = zh
    sub_keys = {tile_key(z, x, y) for (z, x, y) in keys if z == zh}

    tiles = build_pyramid_fast(
        patched, options, subtree_filter=sub_keys, **pyramid_kwargs
    )

    def only_affected(batch: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)
        mask = [
            (z, x, y) in ks
            for z, x, y in zip(
                batch.column("z").to_pylist(),
                batch.column("x").to_pylist(),
                batch.column("y").to_pylist(),
            )
        ]
        return batch.filter(pa.array(mask))

    changed = tiles.map_batches(only_affected, batch_format="pyarrow")
    seq = len(glob.glob(os.path.join(out_dir, "_updates", "upd_*")))
    target = os.path.join(out_dir, "_updates", f"upd_{seq:04d}")
    changed.write_parquet(target)

    # Tombstones: an affected key with no rebuilt tile means the tile ceased
    # to exist (e.g. every feature in it was removed). Without an explicit
    # marker the overlay would keep serving the stale base tile. Emitted as
    # num_features = -1 rows; TileServer drops the key, compaction drops the
    # base row. The scan reads only the written key columns (O(affected)).
    import pyarrow.parquet as _pq

    written: set[tuple[int, int, int]] = set()
    for p in glob.glob(os.path.join(target, "*.parquet")):
        t = _pq.read_table(p, columns=["z", "x", "y"])
        written.update(
            zip(*(t.column(c).to_pylist() for c in ("z", "x", "y")))
        )
    missing = sorted(keys - written)
    if missing:
        t = pa.table(
            {
                "z": pa.array([k[0] for k in missing], pa.int16()),
                "x": pa.array([k[1] for k in missing], pa.int32()),
                "y": pa.array([k[2] for k in missing], pa.int32()),
                "features_json": pa.array(["[]"] * len(missing), pa.string()),
                "num_points": pa.array([0] * len(missing), pa.int64()),
                "num_simplified": pa.array([0] * len(missing), pa.int64()),
                "num_features": pa.array([-1] * len(missing), pa.int64()),
                "min_seq": pa.array([b""] * len(missing), pa.binary()),
                "max_seq": pa.array([b""] * len(missing), pa.binary()),
            }
        )
        _pq.write_table(t, os.path.join(target, "tombstones.parquet"))
    return {
        "affected_tiles": len(keys),
        "affected_subtrees": len(sub_keys),
        "tombstones": len(missing),
        "update_dir": target,
    }
