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


def _write_update_overlay(
    tiles: "ray.data.Dataset", keys: set, out_dir: str
) -> tuple[str, int]:
    """Filter the rebuilt tiles to the invalidated keys, write them as the
    next ``_updates/upd_<n>`` overlay, and emit tombstones for invalidated
    keys that produced no tile (the tile ceased to exist)."""
    import glob
    import os

    import pyarrow.parquet as _pq

    keys_ref = ray.put(keys)

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
    return target, len(missing)


def _write_overlay_table(
    tiles_tbl: "Optional[pa.Table]", keys: set, out_dir: str
) -> tuple[str, int]:
    """Driver-side twin of `_write_update_overlay` for the small-state
    lane: same filtering, same tombstone rule, one parquet file."""
    import glob
    import os

    import pyarrow.parquet as _pq

    seq = len(glob.glob(os.path.join(out_dir, "_updates", "upd_*")))
    target = os.path.join(out_dir, "_updates", f"upd_{seq:04d}")
    os.makedirs(target, exist_ok=True)

    written: set[tuple[int, int, int]] = set()
    if tiles_tbl is not None and tiles_tbl.num_rows:
        zxy = list(
            zip(
                tiles_tbl.column("z").to_pylist(),
                tiles_tbl.column("x").to_pylist(),
                tiles_tbl.column("y").to_pylist(),
            )
        )
        mask = pa.array([k in keys for k in zxy])
        from .cascade import TILE_COLUMNS

        changed = tiles_tbl.filter(mask).select(TILE_COLUMNS)
        if changed.num_rows:
            _pq.write_table(changed, os.path.join(target, "update.parquet"))
            written = {k for k, m in zip(zxy, mask.to_pylist()) if m}
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
    return target, len(missing)


def _fast_update(
    source_rows: "ray.data.Dataset",
    diff: dict,
    options: TilerOptions,
    out_dir: str,
    pyramid_kwargs: dict,
) -> Optional[dict]:
    """O(affected) incremental update over a pyramid written with
    ``updateable=True`` (round-5 task 3).

    Instead of re-cascading the full patched source, this patches the
    PERSISTED per-feature cascade state (`cascade.CascadePerFeature`) by
    row algebra: drop rows whose ``src_seq`` belongs to removed/replaced
    features, cascade ONLY the diff's own features, union, and feed the
    result straight into the merge/drill with the invalidated-subtree
    filter. Reads touch only the tile-key BUCKETS holding invalidated
    tiles (`cascade.write_cascade_state` layout), so I/O and compute are
    both O(affected), not O(source). Each update appends its own state
    patch under ``_cascade/upd_<n>`` (new rows + a removal manifest), so
    sequential updates compose without rewriting the base state.

    Returns None when the fast path doesn't apply (no persisted state, or
    a removeAll diff — semantically a rebuild)."""
    import glob
    import os

    import pyarrow.compute as pc

    from ..arrowio.codec import KIND_FEATURE, KIND_MARKER, KIND_TILE_PARTIAL, tile_key
    from .cascade import (
        CASCADE_BUCKETS,
        CascadePerFeature,
        build_pyramid_fast,
        write_cascade_state,
    )
    from .tiler import ConvertWrap

    state_root = os.path.join(out_dir, "_cascade")
    meta_path = os.path.join(state_root, "meta.json")
    if not (
        os.path.exists(meta_path)
        and os.path.exists(os.path.join(state_root, "base.done"))
    ):
        return None
    hashed = diff_to_hashed(diff, options)
    if hashed["removeAll"]:
        return None  # a full rebuild by definition; take the slow path

    with open(meta_path) as f:
        meta = json.load(f)
    vopts = options.validate()
    zh = int(meta["z_handoff"])
    buckets = int(meta.get("buckets", CASCADE_BUCKETS))
    pyramid_kwargs = dict(pyramid_kwargs)
    pyramid_kwargs["z_handoff"] = zh

    chain = []
    chain_metas = []
    next_seq = int(meta.get("next_seq", 1 << 40))
    for d in sorted(glob.glob(os.path.join(state_root, "upd_*"))):
        mp = os.path.join(d, "meta.json")
        if not os.path.exists(mp):
            continue  # uncommitted patch of a killed update — ignored
        with open(mp) as f:
            m = json.load(f)
        chain.append(d)
        chain_metas.append(m)
        next_seq = max(next_seq, int(m["next_seq"]))
    removed_prior: set[int] = set()
    for m in chain_metas:
        removed_prior.update(int(s) for s in m["removed"])

    drop_ids = (
        hashed["remove"] | set(hashed["add"].keys()) | set(hashed["update"].keys())
    )
    drop_fid_keys = {fid_key_of(v) for v in drop_ids}

    # resolve removals + collect the OLD affected features (for
    # invalidation): chain patches first (features added by prior updates),
    # then one vectorized scan over the base source
    removed_now: set[int] = set()
    affected: list[dict] = []
    for m in chain_metas:
        for k in drop_fid_keys:
            s = m["added"].get(k)
            if s is None:
                continue
            s = int(s)
            removed_now.add(s)
            if s not in removed_prior:
                f = json.loads(m["added_json"][k])
                affected.extend(wrap(convert_to_internal(f, vopts), vopts))
    if drop_fid_keys:
        src = with_fid_key(source_rows, vopts)
        key_col = fid_key_column(vopts)
        vs = pa.array(sorted(drop_fid_keys), pa.string())

        def scan(batch: pa.Table) -> pa.Table:
            hit = pc.is_in(batch.column(key_col), value_set=vs)
            return batch.filter(hit).select(["feature_json", "input_seq"])

        for row in src.map_batches(scan, batch_format="pyarrow").take_all():
            s = int(row["input_seq"])
            removed_now.add(s)
            if s not in removed_prior:
                f = json.loads(row["feature_json"])
                affected.extend(wrap(convert_to_internal(f, vopts), vopts))

    # the diff's own rows (adds + geometry updates), appended after
    # everything with fresh seqs — same ordering rule as the slow path
    key_col = fid_key_column(vopts)
    new_rows: list[dict] = []
    added_map: dict[str, int] = {}
    added_json: dict[str, str] = {}

    def _append(f: dict) -> None:
        nonlocal next_seq
        k = fid_key_of_feature(f, vopts)
        fj = json.dumps(f)
        new_rows.append({"feature_json": fj, "input_seq": next_seq, key_col: k})
        added_map[k] = next_seq
        added_json[k] = fj
        next_seq += 1
        affected.extend(wrap(convert_to_internal(f, vopts), vopts))

    for f in hashed["add"].values():
        _append(f)
    for u in hashed["update"].values():
        if u.get("newGeometry"):
            _append(
                {
                    "type": "Feature",
                    "id": u["id"],
                    "geometry": u["newGeometry"],
                    "properties": {},
                }
            )

    keys = affected_tile_keys(affected, vopts.max_zoom, vopts)
    sub_keys = {tile_key(z, x, y) for (z, x, y) in keys if z == zh}
    shallow_keys = {tile_key(z, x, y) for (z, x, y) in keys if z < zh}
    all_state_keys = sub_keys | shallow_keys
    hit_buckets = {abs(k) % buckets for k in all_state_keys}

    # read ONLY the buckets that can hold affected rows, from base + chain
    state_dirs = []
    for root in [os.path.join(state_root, "base")] + chain:
        base = root if root.endswith("base") else os.path.join(root, "rows")
        for b in sorted(hit_buckets):
            d = os.path.join(base, f"ck={b}")
            if os.path.isdir(d):
                state_dirs.extend(sorted(glob.glob(os.path.join(d, "*.parquet"))))

    removed_all = removed_prior | removed_now
    removed_arr = pa.array(sorted(removed_all), pa.int64())
    shallow_arr = pa.array(sorted(shallow_keys), pa.int64())
    sub_arr = pa.array(sorted(sub_keys), pa.int64())

    def keep_rows(batch: pa.Table) -> pa.Table:
        kind = batch.column("kind")
        tk = batch.column("tkey")
        is_partial = pc.equal(kind, KIND_TILE_PARTIAL)
        is_front = pc.or_(pc.equal(kind, KIND_FEATURE), pc.equal(kind, KIND_MARKER))
        want = pc.or_(
            pc.and_(is_partial, pc.is_in(tk, value_set=shallow_arr)),
            pc.and_(is_front, pc.is_in(tk, value_set=sub_arr)),
        )
        if len(removed_arr):
            want = pc.and_(
                want, pc.invert(pc.is_in(batch.column("src_seq"), value_set=removed_arr))
            )
        return batch.filter(want)

    from ..arrowio.codec import LEVEL_SCHEMA

    if state_dirs:
        # prune to the level schema + attribution column (drops the ck
        # partition string Ray would otherwise re-infer from the path)
        kept = ray.data.read_parquet(
            state_dirs, columns=[f.name for f in LEVEL_SCHEMA] + ["src_seq"]
        ).map_batches(keep_rows, batch_format="pyarrow")
    else:
        kept = None

    # the diff is small by contract: cascade it DRIVER-side (two plain
    # function calls over in-memory tables — no Ray round trips) and write
    # the state patch with plain pyarrow
    new_cas_table = None
    pn = 0
    while os.path.exists(
        os.path.join(state_root, f"upd_{pn:04d}", "meta.json")
    ):
        pn += 1
    patch_dir = os.path.join(state_root, f"upd_{pn:04d}")
    import shutil as _shutil

    _shutil.rmtree(patch_dir, ignore_errors=True)  # clear an aborted patch
    if new_rows:
        key_arrays = {
            "feature_json": pa.array([r["feature_json"] for r in new_rows], pa.string()),
            "input_seq": pa.array([r["input_seq"] for r in new_rows], pa.int64()),
            key_col: pa.array([r[key_col] for r in new_rows], pa.string()),
        }
        new_cas_table = CascadePerFeature(vopts, zh)(
            ConvertWrap(vopts)(pa.table(key_arrays))
        )
        # persist this update's state patch BEFORE filtering: later diffs
        # may invalidate tiles this one didn't touch
        import pyarrow.parquet as _pq

        tk = new_cas_table.column("tkey").to_numpy()
        rows_dir = os.path.join(patch_dir, "rows")
        for b in sorted({abs(int(t)) % buckets for t in tk}):
            bdir = os.path.join(rows_dir, f"ck={b}")
            os.makedirs(bdir, exist_ok=True)
            mask = pa.array([abs(int(t)) % buckets == b for t in tk])
            _pq.write_table(
                new_cas_table.filter(mask), os.path.join(bdir, "patch.parquet")
            )
    os.makedirs(patch_dir, exist_ok=True)

    # small-state fast lane: when every affected bucket fits comfortably in
    # driver memory, skip Ray Data entirely — read the slices with plain
    # pyarrow and run the SAME drill callable in-process. The distributed
    # path below exists for updates whose affected subtrees are genuinely
    # big (dense regions at 10^12-row scale); both produce identical rows.
    small_bytes = int(os.environ.get("GRAFT_UPDATE_SMALL_STATE", 256 << 20))
    state_bytes = sum(os.path.getsize(p) for p in state_dirs)
    if state_bytes <= small_bytes:
        import pyarrow.parquet as _pq

        from .cascade import TILE_COLUMNS, UnifiedDrillOrMerge

        cols = [f.name for f in LEVEL_SCHEMA] + ["src_seq"]
        pieces = [
            keep_rows(_pq.read_table(p, columns=cols)).select(cols)
            for p in state_dirs
        ]
        if new_cas_table is not None:
            pieces.append(keep_rows(new_cas_table).select(cols))
        pieces = [p for p in pieces if p.num_rows]
        if not pieces:
            tiles_tbl = None
        else:
            tbl = pa.concat_tables(pieces).drop_columns(["src_seq"])
            tiles_tbl = UnifiedDrillOrMerge(zh, vopts, None, tile_filter=keys)(tbl)
        target, n_tomb = _write_overlay_table(tiles_tbl, keys, out_dir)
        tmp = os.path.join(patch_dir, "meta.json.tmp")
        with open(tmp, "w") as f:
            json.dump(
                {
                    "removed": sorted(removed_now),
                    "added": added_map,
                    "added_json": added_json,
                    "next_seq": next_seq,
                },
                f,
            )
        os.replace(tmp, os.path.join(patch_dir, "meta.json"))
        return {
            "affected_tiles": len(keys),
            "affected_subtrees": len(sub_keys),
            "tombstones": n_tomb,
            "update_dir": target,
            "fast_path": True,
            "small_state": True,
        }

    if new_cas_table is not None:
        new_kept = ray.data.from_arrow(keep_rows(new_cas_table))
        cur = new_kept if kept is None else kept.union(new_kept)
    else:
        cur = kept
    if cur is None:
        return {
            "affected_tiles": 0,
            "affected_subtrees": 0,
            "tombstones": 0,
            "update_dir": None,
            "fast_path": True,
        }

    # tiny drills: size the single shuffle to the affected subtree count,
    # not the build-scale bin count
    pyramid_kwargs["drill_partitions"] = max(4, min(
        int(pyramid_kwargs.get("drill_partitions", 64))
        if pyramid_kwargs.get("drill_partitions") not in (None, "auto")
        else 64,
        4 * max(len(sub_keys), 1),
    ))
    pyramid_kwargs.setdefault("deepen", False)
    tiles = build_pyramid_fast(
        None, vopts, subtree_filter=sub_keys, cascade_rows=cur, **pyramid_kwargs
    )
    target, n_tomb = _write_update_overlay(tiles, keys, out_dir)
    # commit the state patch LAST (meta.json presence = committed): a run
    # killed mid-update leaves an uncommitted patch dir that loading skips;
    # retrying the same diff re-resolves from the committed chain and
    # rewrites an identical overlay, then commits — the same
    # retry-to-resume contract as the pyramid writer
    tmp = os.path.join(patch_dir, "meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump(
            {
                "removed": sorted(removed_now),
                "added": added_map,
                "added_json": added_json,
                "next_seq": next_seq,
            },
            f,
        )
    os.replace(tmp, os.path.join(patch_dir, "meta.json"))
    return {
        "affected_tiles": len(keys),
        "affected_subtrees": len(sub_keys),
        "tombstones": n_tomb,
        "update_dir": target,
        "fast_path": True,
    }


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

    fast = _fast_update(source_rows, diff, options, out_dir, pyramid_kwargs)
    if fast is not None:
        return fast

    patched, affected = apply_diff_dataset(source_rows, diff, options)
    keys = affected_tile_keys(affected, options.max_zoom, options)

    zh = min(pyramid_kwargs.get("z_handoff", 7), options.max_zoom)
    pyramid_kwargs["z_handoff"] = zh
    sub_keys = {tile_key(z, x, y) for (z, x, y) in keys if z == zh}

    tiles = build_pyramid_fast(
        patched, options, subtree_filter=sub_keys, **pyramid_kwargs
    )
    target, n_tomb = _write_update_overlay(tiles, keys, out_dir)
    return {
        "affected_tiles": len(keys),
        "affected_subtrees": len(sub_keys),
        "tombstones": n_tomb,
        "update_dir": target,
    }
