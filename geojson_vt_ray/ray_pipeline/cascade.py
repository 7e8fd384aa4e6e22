"""Shuffle-free pyramid cascade — the 100 TB-shape tiler.

Key property of hierarchical tiling: every child-tile feature descends from
exactly one parent-tile feature, and tile assembly is per-feature + an
order-preserving merge. So the full pyramid needs NO per-level shuffle at
all:

  level z map_batches:  tile-shard rows → per-shard 4-way buffered clip →
                        child feature rows (stay co-located) + a mergeable
                        *partial tile* row (this shard's transformed tile
                        features, with per-feature binary ``seq`` order keys,
                        plus counter partials)

Partial-tile rows stream through the remaining levels untouched; one final
``groupby(tkey)`` merges partials (merge-sort by seq, sum counters). A tile
with a single partial — the overwhelming majority below the top zooms — is
passed through the merge unchanged. The z0–z4 hot tiles are exactly the
salted-partial-merge design (SURVEY.md §4): their assembly is spread across
every shard and only the pre-assembled partials shuffle.

Levels deliberately alternate ``num_cpus`` by an epsilon so Ray's operator
fusion keeps each level a separate operator — the streaming executor then
re-balances blocks between levels, which is what absorbs geographic skew.
"""

from __future__ import annotations

import json
from typing import Optional

import numpy as np
import pyarrow as pa

import ray.data

from ..arrowio.codec import (
    KIND_FEATURE,
    KIND_MARKER,
    KIND_TILE,
    KIND_TILE_PARTIAL,
    LevelRowBuilder,
    decode_features,
)
from ..kernels.tile import create_tile, transform_tile_features
from ..options import TilerOptions
from .tiler import ConvertWrap, _clip_children

TILE_COLUMNS = ["z", "x", "y", "features_json", "num_points", "num_simplified", "num_features", "min_seq", "max_seq"]


class CascadeLevel:
    """One pyramid level: consume feature rows at zoom z, emit child feature
    rows at z+1 plus partial tile rows; pass tile rows through."""

    def __init__(self, z: int, options: TilerOptions, markers_for_children: bool = False):
        self.z = z
        self.options = options
        # last cascade level: children existence must become KIND_MARKER rows
        # (so the hand-off groupby forms a group and emits a complete empty
        # tile) instead of empty partials (which would duplicate hand-off
        # tiles already emitted complete)
        self.markers_for_children = markers_for_children

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        z = self.z
        options = self.options
        out = LevelRowBuilder()

        # pass through partial tile rows untouched
        tile_mask = pc.equal(batch.column("kind"), KIND_TILE_PARTIAL)
        passthrough = batch.filter(tile_mask)

        features = decode_features(batch)  # (seq, feature) pairs, kind==0 only
        # group this batch's rows into tile shards
        shards: dict[tuple[int, int], list] = {}
        xs = batch.column("x").to_pylist()
        ys = batch.column("y").to_pylist()
        kinds = batch.column("kind").to_pylist()
        fi = 0
        for i in range(batch.num_rows):
            if kinds[i] != KIND_FEATURE:
                continue
            shards.setdefault((xs[i], ys[i]), []).append(features[fi])
            fi += 1

        for (x, y), shard in shards.items():
            self._emit_partial(out, shard, z, x, y)
            if z < options.max_zoom and shard:
                bbox = {
                    "minX": min(f["minX"] for _, f in shard),
                    "maxX": max(f["maxX"] for _, f in shard),
                    "minY": min(f["minY"] for _, f in shard),
                    "maxY": max(f["maxY"] for _, f in shard),
                }
                for cx, cy, child in _clip_children(shard, z, x, y, options, bbox):
                    if self.markers_for_children:
                        out.add_marker(z + 1, cx, cy)
                    else:
                        # existence marker: empty partial (dedup'd at merge)
                        out.add_partial_tile(z + 1, cx, cy, [], "[]", 0, 0, 0)
                    for seq, f in child:
                        out.add_feature(z + 1, cx, cy, seq, f)

        built = out.table()
        if passthrough.num_rows:
            return pa.concat_tables([passthrough.select(built.column_names), built])
        return built

    def _emit_partial(self, out: LevelRowBuilder, shard: list, z: int, x: int, y: int) -> None:
        _emit_partial(out, shard, z, x, y, self.options)


def _emit_partial(
    out: LevelRowBuilder, shard: list, z: int, x: int, y: int, options: TilerOptions
) -> None:
    """Mergeable per-batch tile shard: per-feature create_tile keeps the seqs
    list parallel to the emitted features so the final merge can restore
    reference feature order across batches."""
    seqs: list[bytes] = []
    tfeatures: list[dict] = []
    num_points = num_simplified = 0
    for seq, f in shard:
        t = create_tile([f], z, x, y, options)
        num_points += t["numPoints"]
        num_simplified += t["numSimplified"]
        if t["features"]:
            tf = transform_tile_features(t, options.extent)
            seqs.append(seq)
            tfeatures.append(tf[0])
    out.add_partial_tile(
        z, x, y, seqs, json.dumps(tfeatures), num_points, num_simplified, len(shard)
    )


class CascadeToHandoff:
    """Whole cascade z0..z_handoff in ONE map stage: per input batch, a
    breadth-first in-memory drill to the hand-off zoom. Emits the same row
    mix the per-level cascade produced — mergeable partial-tile rows for
    every shallow tile the batch touches, plus feature rows (and existence
    markers carrying a leaf-cost estimate) at the hand-off zoom — but skips
    the per-level Arrow encode/decode round-trips and the 6 extra operators.

    Shallow-tile assembly stays the salted-partial-merge design: each batch
    contributes one mergeable partial per tile; only partials shuffle.
    """

    def __init__(self, options: TilerOptions, z_handoff: int):
        self.options = options
        self.z_handoff = z_handoff

    def __call__(self, batch: pa.Table) -> pa.Table:
        options = self.options
        zh = self.z_handoff
        out = LevelRowBuilder()
        features = decode_features(batch)

        level: dict[tuple[int, int], list] = {}
        xs = batch.column("x").to_pylist()
        ys = batch.column("y").to_pylist()
        kinds = batch.column("kind").to_pylist()
        fi = 0
        for i in range(batch.num_rows):
            if kinds[i] != KIND_FEATURE:
                continue
            level.setdefault((xs[i], ys[i]), []).append(features[fi])
            fi += 1

        for z in range(zh):
            nxt: dict[tuple[int, int], list] = {}
            for (x, y), shard in level.items():
                _emit_partial(out, shard, z, x, y, options)
                if z < options.max_zoom and shard:
                    bbox = {
                        "minX": min(f["minX"] for _, f in shard),
                        "maxX": max(f["maxX"] for _, f in shard),
                        "minY": min(f["minY"] for _, f in shard),
                        "maxY": max(f["maxY"] for _, f in shard),
                    }
                    for cx, cy, child in _clip_children(shard, z, x, y, options, bbox):
                        # empty children still create the key → existence tile
                        nxt.setdefault((cx, cy), []).extend(child)
            level = nxt

        for (x, y), shard in level.items():
            est = sum(_est_leaf_tiles(shard, zh, x, y, options.max_zoom)) if shard else 0.0
            out.add_marker(zh, x, y, est=est)
            for seq, f in shard:
                out.add_feature(zh, x, y, seq, f)
        return out.table()


class CascadePerFeature:
    """`CascadeToHandoff` with per-feature shards and source attribution —
    the persisted UPDATEABLE cascade state (round-5 task 3).

    Every emitted row (shallow partial, existence partial, hand-off
    feature, cost marker) descends from exactly ONE input feature and
    carries its ``src_seq`` (the input_seq packed into the row's order
    key). An incremental update can therefore patch the state by pure row
    algebra — drop rows whose src_seq is removed/replaced, union the
    diff's own per-feature rows — and the downstream merge + drill
    produce BIT-identical tiles to a full rebuild: partial merging is
    associative/commutative over shards (sort by seq, sum counters), the
    hand-off feature rows are the same rows batch mode emits, leaf-cost
    estimates are per-feature additive, and existence keys are the union
    of per-feature existence keys. Sharding granularity is the only
    difference from `CascadeToHandoff`, and the merge erases it.
    """

    def __init__(self, options: TilerOptions, z_handoff: int):
        self.options = options
        self.z_handoff = z_handoff

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = LevelRowBuilder()
        features = decode_features(batch)
        xs = batch.column("x").to_pylist()
        ys = batch.column("y").to_pylist()
        kinds = batch.column("kind").to_pylist()
        src: list[int] = []
        fi = 0
        for i in range(batch.num_rows):
            if kinds[i] != KIND_FEATURE:
                continue
            pair = features[fi]
            fi += 1
            n0 = len(out.cols["kind"])
            self._one(out, xs[i], ys[i], pair)
            iseq = int.from_bytes(pair[0][1:9], "big")
            src.extend([iseq] * (len(out.cols["kind"]) - n0))
        return out.table().append_column("src_seq", pa.array(src, pa.int64()))

    def _one(self, out: LevelRowBuilder, x: int, y: int, pair) -> None:
        options = self.options
        zh = self.z_handoff
        level: dict[tuple[int, int], list] = {(x, y): [pair]}
        for z in range(zh):
            nxt: dict[tuple[int, int], list] = {}
            for (tx, ty), shard in level.items():
                _emit_partial(out, shard, z, tx, ty, options)
                if z < options.max_zoom and shard:
                    bbox = {
                        "minX": min(f["minX"] for _, f in shard),
                        "maxX": max(f["maxX"] for _, f in shard),
                        "minY": min(f["minY"] for _, f in shard),
                        "maxY": max(f["maxY"] for _, f in shard),
                    }
                    for cx, cy, child in _clip_children(shard, z, tx, ty, options, bbox):
                        nxt.setdefault((cx, cy), []).extend(child)
            level = nxt
        for (tx, ty), shard in level.items():
            est = sum(_est_leaf_tiles(shard, zh, tx, ty, options.max_zoom)) if shard else 0.0
            out.add_marker(zh, tx, ty, est=est)
            for seq, f in shard:
                out.add_feature(zh, tx, ty, seq, f)


class DeepenHeavy:
    """Push a heavy hand-off tile's frontier one level deeper.

    LPT binning can balance bins but not split an atomic tile — one dense
    hand-off subtree bounds the drill makespan no matter how many CPUs run.
    This map stage (no shuffle; runs on the small cascade output) converts a
    heavy tile into (a) a mergeable partial-tile row per batch — the parent
    tile assembles exactly like the shallow cascade tiles — and (b) child
    feature rows + cost markers at z+1, so the drill's atomic unit shrinks
    4× per pass. The driver re-reads the markers and repeats while any tile
    exceeds the atom limit.
    """

    def __init__(self, options: TilerOptions, heavy_ref):
        self.options = options
        self.heavy_ref = heavy_ref  # ray.ObjectRef of frozenset[int] tkeys

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray as _ray

        heavy: frozenset = _ray.get(self.heavy_ref)
        options = self.options
        tk = batch.column("tkey").to_numpy()
        kinds = batch.column("kind").to_numpy()
        hot = np.isin(tk, np.fromiter(heavy, dtype=np.int64, count=len(heavy))) & (
            (kinds == KIND_FEATURE) | (kinds == KIND_MARKER)
        )
        if not hot.any():
            return batch
        keep = batch.filter(pa.array(~hot))
        work = batch.filter(pa.array(hot))

        feat_rows = work.filter(pa.compute.equal(work.column("kind"), KIND_FEATURE))
        features = decode_features(feat_rows)
        xs = feat_rows.column("x").to_pylist()
        ys = feat_rows.column("y").to_pylist()
        zs = feat_rows.column("z").to_pylist()
        shards: dict[tuple[int, int, int], list] = {}
        for i, f in enumerate(features):
            shards.setdefault((zs[i], xs[i], ys[i]), []).append(f)
        # marker-only heavy tiles (no features in this batch) contribute
        # nothing: the tile's partial/children come from the batches that
        # hold its features, and empty-child existence markers come with them
        out = LevelRowBuilder()
        for (z, x, y), shard in shards.items():
            _emit_partial(out, shard, z, x, y, options)
            bbox = {
                "minX": min(f["minX"] for _, f in shard),
                "maxX": max(f["maxX"] for _, f in shard),
                "minY": min(f["minY"] for _, f in shard),
                "maxY": max(f["maxY"] for _, f in shard),
            }
            for cx, cy, child in _clip_children(shard, z, x, y, options, bbox):
                est = sum(_est_leaf_tiles(child, z + 1, cx, cy, options.max_zoom)) if child else 0.0
                out.add_marker(z + 1, cx, cy, est=est)
                for seq, f in child:
                    out.add_feature(z + 1, cx, cy, seq, f)
        return pa.concat_tables([keep, out.table()])


def _merge_partials(group: pa.Table) -> pa.Table:
    z = group.column("z")[0].as_py()
    x = group.column("x")[0].as_py()
    y = group.column("y")[0].as_py()
    seqs_col = group.column("seqs").to_pylist()
    feats_col = group.column("features_json").to_pylist()
    np_ = int(pa.compute.sum(group.column("num_points")).as_py() or 0)
    ns = int(pa.compute.sum(group.column("num_simplified")).as_py() or 0)
    nf = int(pa.compute.sum(group.column("num_features")).as_py() or 0)

    pairs: list[tuple[bytes, dict]] = []
    for seqs, fj in zip(seqs_col, feats_col):
        if not seqs:
            continue
        feats = json.loads(fj)
        pairs.extend(zip(seqs, feats))
    pairs.sort(key=lambda p: p[0])

    return pa.table(
        {
            "z": pa.array([z], pa.int16()),
            "x": pa.array([x], pa.int32()),
            "y": pa.array([y], pa.int32()),
            "features_json": pa.array([json.dumps([f for _, f in pairs])], pa.string()),
            "num_points": pa.array([np_], pa.int64()),
            "num_simplified": pa.array([ns], pa.int64()),
            "num_features": pa.array([nf], pa.int64()),
            "min_seq": pa.array([pairs[0][0] if pairs else b""], pa.binary()),
            "max_seq": pa.array([pairs[-1][0] if pairs else b""], pa.binary()),
        }
    )


def build_tiles_cascade(
    ds: "ray.data.Dataset",
    options: TilerOptions,
    batch_size: int = 1024,
) -> "ray.data.Dataset":
    """Full z0..max_zoom pyramid as a pure map cascade + one partial merge.

    Correct at any scale but pays an Arrow re-encode per level for every
    surviving feature row — `build_pyramid_fast` below is the production
    shape (cascade only to the hand-off zoom, then local subtree drill)."""
    options = options.validate()
    cur = ds.map_batches(ConvertWrap(options), batch_format="pyarrow")
    for z in range(options.max_zoom + 1):
        cur = cur.map_batches(
            CascadeLevel(z, options),
            batch_format="pyarrow",
            batch_size=batch_size,
            # epsilon keeps levels un-fused → per-level block re-balancing
            num_cpus=1 + (z % 2) * 1e-4,
        )
    return cur.groupby("tkey").map_groups(_merge_partials, batch_format="pyarrow")


CASCADE_BUCKETS = 64  # tile-key buckets of the persisted updateable state


def write_cascade_state(
    cas: "ray.data.Dataset", state_dir: str, buckets: int = CASCADE_BUCKETS
) -> None:
    """Persist per-feature cascade rows bucketed by tile key (``ck = tkey
    mod buckets``) so an update reads ONLY the buckets holding its
    affected tiles/subtrees — O(affected) I/O, never a full state scan."""
    import os
    import shutil

    done = state_dir + ".done"
    if os.path.exists(done):
        return
    shutil.rmtree(state_dir, ignore_errors=True)

    def add_ck(batch: pa.Table) -> pa.Table:
        tk = batch.column("tkey").to_numpy()
        ck = (np.abs(tk) % buckets).astype(np.int32)
        return batch.append_column("ck", pa.array(ck))

    cas.map_batches(add_ck, batch_format="pyarrow").write_parquet(
        state_dir, partition_cols=["ck"]
    )
    with open(done, "w") as f:
        f.write("1")


def write_pyramid_fast(
    ds: "ray.data.Dataset",
    options: TilerOptions,
    out_dir: str,
    resumable: bool = True,
    updateable: bool = False,
    **kwargs,
) -> dict:
    """Production pyramid sink with per-BIN resume.

    Layout (``resumable=True``)::

        out/_plan.json          bin plan (n_bins + tkey->bin), written once
        out/bins/skey=<k>/      one partition per drill bin (tiles of every
                                zoom that bin produced)
        out/_done/<k>.done      per-bin completion markers
        out/_pyramid.done       overall manifest (tile count)

    A killed run resumes by reloading the recorded bin plan (bin membership
    stays deterministic regardless of cluster size), deleting partition
    directories without a done marker, and re-running the pipeline with the
    finished bins FILTERED OUT BEFORE THE DRILL SHUFFLE — completed subtree
    work is skipped as compute, not just as writes. The cascade pass itself
    re-runs (it is the cheap, shuffle-free ~2% of the job).

    ``resumable=False`` keeps the flat ``z=<n>/`` layout with all-or-nothing
    resume.
    """
    import glob
    import os
    import shutil

    import pyarrow.parquet as pq

    done = os.path.join(out_dir, "_pyramid.done")
    if os.path.exists(done):
        with open(done) as f:
            return {"tiles": int(f.read() or 0), "resumed": True}
    os.makedirs(out_dir, exist_ok=True)

    if updateable:
        # per-feature cascade state: persisted for O(affected) incremental
        # updates AND fed to this build (merge-identical to the batch
        # cascade — per-feature sharding is erased by the partial merge)
        vopts = options.validate()
        zh = min(kwargs.get("z_handoff", 7), vopts.max_zoom)
        kwargs["z_handoff"] = zh
        cas = (
            ds.map_batches(ConvertWrap(vopts), batch_format="pyarrow")
            .map_batches(
                CascadePerFeature(vopts, zh),
                batch_format="pyarrow",
                batch_size=kwargs.get("batch_size", 1024),
            )
            .materialize()
        )
        write_cascade_state(cas, os.path.join(out_dir, "_cascade", "base"))
        with open(os.path.join(out_dir, "_cascade", "meta.json"), "w") as f:
            json.dump(
                {
                    "z_handoff": zh,
                    "buckets": CASCADE_BUCKETS,
                    "next_seq": 1 << 40,
                },
                f,
            )
        kwargs["cascade_rows"] = cas

    if not resumable:
        tiles = build_pyramid_fast(ds, options, **kwargs)
        tiles.write_parquet(out_dir, partition_cols=["z"])
        n = 0
        for part in glob.glob(os.path.join(out_dir, "z=*", "*.parquet")):
            n += pq.ParquetFile(part).metadata.num_rows
        with open(done, "w") as f:
            f.write(str(n))
        return {"tiles": n, "resumed": False}

    plan_path = os.path.join(out_dir, "_plan.json")
    done_dir = os.path.join(out_dir, "_done")
    bins_dir = os.path.join(out_dir, "bins")
    os.makedirs(done_dir, exist_ok=True)

    bin_plan = None
    if os.path.exists(plan_path):
        with open(plan_path) as f:
            bin_plan = json.load(f)
    done_bins = {
        int(os.path.basename(p)[: -len(".done")])
        for p in glob.glob(os.path.join(done_dir, "*.done"))
    }
    # partitions without a done marker are partial output of a killed run
    for d in glob.glob(os.path.join(bins_dir, "skey=*")):
        if int(os.path.basename(d).split("=")[1]) not in done_bins:
            shutil.rmtree(d)

    tiles = build_pyramid_fast(
        ds, options, bin_plan=bin_plan, keep_skey=True,
        skip_bins=done_bins or None, **kwargs,
    )
    plan = tiles._graft_plan
    if not os.path.exists(plan_path):
        with open(plan_path, "w") as f:
            json.dump({"n_bins": plan["n_bins"], "bins": plan["bins"]}, f)
    tiles.write_parquet(bins_dir, partition_cols=["skey"])

    # per-bin checkpoint manifests: tile/feature/point metrics plus the
    # input-seq lineage span (which source features produced this
    # partition's tiles — min_seq/max_seq are order keys derived from
    # input_seq). Computed in one Ray task per bin so the driver never
    # reads tile rows; a resumed run trusts existing manifests untouched.
    import ray as _ray

    @_ray.remote
    def bin_manifest(d: str) -> dict:
        parts = sorted(glob.glob(os.path.join(d, "*.parquet")))
        tiles_n = feats = pts = simp = 0
        seq_lo: Optional[bytes] = None
        seq_hi: Optional[bytes] = None
        for part in parts:
            t = pq.read_table(
                part,
                columns=["num_features", "num_points", "num_simplified", "min_seq", "max_seq"],
            )
            tiles_n += t.num_rows
            feats += sum(t.column("num_features").to_pylist())
            pts += sum(t.column("num_points").to_pylist())
            simp += sum(t.column("num_simplified").to_pylist())
            for s in t.column("min_seq").to_pylist():
                if s and (seq_lo is None or s < seq_lo):
                    seq_lo = s
            for s in t.column("max_seq").to_pylist():
                if s and (seq_hi is None or s > seq_hi):
                    seq_hi = s
        return {
            "tiles": tiles_n,
            "num_features": feats,
            "num_points": pts,
            "num_simplified": simp,
            "seq_min": seq_lo.hex() if seq_lo else None,
            "seq_max": seq_hi.hex() if seq_hi else None,
            "files": [os.path.basename(p) for p in parts],
        }

    pending: list[tuple[int, "object"]] = []
    n = 0
    for d in glob.glob(os.path.join(bins_dir, "skey=*")):
        k = int(os.path.basename(d).split("=")[1])
        for part in glob.glob(os.path.join(d, "*.parquet")):
            n += pq.ParquetFile(part).metadata.num_rows
        if not os.path.exists(os.path.join(done_dir, f"{k}.done")):
            pending.append((k, bin_manifest.remote(d)))
    for k, ref in pending:
        manifest = _ray.get(ref)
        tmp = os.path.join(done_dir, f"{k}.done.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(done_dir, f"{k}.done"))
    with open(done, "w") as f:
        f.write(str(n))
    return {"tiles": n, "resumed": bool(done_bins)}


class TileServer:
    """Read-side getTile over a written pyramid (the batch engine's stand-in
    for the reference's lazy in-memory index, SURVEY.md §3.2).

    Startup reads only the (z, x, y) index columns of every partition file
    and keeps them as per-file SORTED numpy key arrays (lookups are a
    reverse-overlay-order binary search per file — startup is vectorized,
    never a Python insert per tile, so serving a multi-million-tile
    pyramid starts in O(tiles) numpy time, not O(tiles) interpreter time).
    Tile payloads (`features_json`) load lazily per file on first access,
    with a small LRU of hydrated files. ``_updates/upd_*`` directories
    written by `incremental_update_pyramid` overlay the base pyramid in
    directory order (newest wins), completing the reference's
    updateData → getTile loop (`test/update.test.ts:452`)."""

    _CACHE_FILES = 16

    def __init__(self, out_dir: str, cache_files: Optional[int] = None):
        import glob
        import os

        import pyarrow.parquet as pq

        # hydrated-file LRU size: random-access serving over P partition
        # files wants cache_files >= P (each file's payload column loads
        # once, ~file-size bytes of heap); the default 16 suits localized
        # tile traffic / bounded memory. At 10^12-row scale you shard
        # servers by key range instead of raising this.
        self._cache_files = int(cache_files) if cache_files else self._CACHE_FILES
        self._pq = pq
        # per file, in overlay order: (path, sorted packed keys, row index
        # per sorted key, tombstone mask per sorted key or None)
        self._files: list[tuple[str, np.ndarray, np.ndarray, Optional[np.ndarray]]] = []
        self._cache: dict[str, list] = {}
        self._mvt_cache: dict[str, list] = {}
        self._no_mvt: set[str] = set()

        files: list[tuple[str, Optional[int]]] = []
        for zdir in sorted(glob.glob(os.path.join(out_dir, "z=*"))):
            z = int(os.path.basename(zdir).split("=")[1])
            for part in sorted(glob.glob(os.path.join(zdir, "*.parquet"))):
                files.append((part, z))
        for part in sorted(glob.glob(os.path.join(out_dir, "bins", "skey=*", "*.parquet"))):
            files.append((part, None))
        # updates overlay last, in creation order: newest wins
        for upd in sorted(glob.glob(os.path.join(out_dir, "_updates", "*"))):
            for part in sorted(glob.glob(os.path.join(upd, "**", "*.parquet"), recursive=True)):
                files.append((part, None))

        for path, fixed_z in files:
            cols = ["x", "y"] if fixed_z is not None else ["z", "x", "y"]
            is_update = os.sep + "_updates" + os.sep in path
            if is_update:
                cols = cols + ["num_features"]
            t = pq.read_table(path, columns=cols)
            xs = t.column("x").to_numpy().astype(np.int64)
            ys = t.column("y").to_numpy().astype(np.int64)
            zs = (
                t.column("z").to_numpy().astype(np.int64)
                if fixed_z is None
                else np.full(len(xs), fixed_z, dtype=np.int64)
            )
            keys = self._pack(zs, xs, ys)
            order = np.argsort(keys, kind="stable")
            # tombstone rows (num_features < 0): the tile ceased to exist in
            # this update — the reverse-order lookup stops on them with None
            tomb = None
            if is_update:
                tomb = (t.column("num_features").to_numpy() < 0)[order]
            self._files.append((path, keys[order], order, tomb))

    @staticmethod
    def _pack(z, x, y):
        return (
            (np.asarray(z, dtype=np.int64) << 58)
            | (np.asarray(x, dtype=np.int64) << 29)
            | np.asarray(y, dtype=np.int64)
        )

    def _lookup(self, z: int, x: int, y: int) -> Optional[tuple[str, int]]:
        """(path, row-in-file) of the newest overlay holding this tile, or
        None (missing or tombstoned)."""
        key = (z << 58) | (x << 29) | y
        for path, keys, rows, tomb in reversed(self._files):
            i = int(np.searchsorted(keys, key))
            if i < len(keys) and keys[i] == key:
                if tomb is not None and tomb[i]:
                    return None
                return path, int(rows[i])
        return None

    def tile_keys(self) -> list[tuple[int, int, int]]:
        """Sorted (z, x, y) of every live tile (overlay- and tombstone-
        aware) — vectorized: last-overlay-wins via one lexsort over the
        concatenated per-file key arrays."""
        if not self._files:
            return []
        all_keys = np.concatenate([f[1] for f in self._files])
        file_ord = np.concatenate(
            [np.full(len(f[1]), i, dtype=np.int64) for i, f in enumerate(self._files)]
        )
        tombs = np.concatenate(
            [
                f[3] if f[3] is not None else np.zeros(len(f[1]), dtype=bool)
                for f in self._files
            ]
        )
        order = np.lexsort((file_ord, all_keys))
        k = all_keys[order]
        last = np.concatenate((k[1:] != k[:-1], [True]))  # newest overlay per key
        live = last & ~tombs[order]
        k = k[live]
        zs = k >> 58
        xs = (k >> 29) & ((1 << 29) - 1)
        ys = k & ((1 << 29) - 1)
        return list(zip(zs.tolist(), xs.tolist(), ys.tolist()))

    def _rows(self, path: str) -> list:
        rows = self._cache.get(path)
        if rows is None:
            t = self._pq.read_table(
                path,
                columns=["features_json", "num_points", "num_simplified", "num_features"],
            )
            rows = [
                t.column(c).to_pylist()
                for c in ("features_json", "num_points", "num_simplified", "num_features")
            ]
            if len(self._cache) >= self._cache_files:
                self._cache.pop(next(iter(self._cache)))
            self._cache[path] = rows
        return rows

    def get_tile(self, z: int, x: int, y: int):
        z2 = 1 << z
        x = (x + z2) & (z2 - 1)  # wrap x like the reference
        hit = self._lookup(z, x, y)
        if hit is None:
            return None
        path, i = hit
        fj, npn, nsi, nfe = self._rows(path)
        return {
            "z": z,
            "x": x,
            "y": y,
            "features": json.loads(fj[i]),
            "numPoints": npn[i],
            "numSimplified": nsi[i],
            "numFeatures": nfe[i],
        }

    def get_tile_mvt(
        self, z: int, x: int, y: int, extent: int = 4096, layer_name: str = "geojsonvt"
    ) -> Optional[bytes]:
        """The tile as Mapbox Vector Tile bytes (the vt-pbf serving path,
        `kernels/mvt.py`) — what an HTTP tile endpoint returns directly.
        None for a tile outside the pyramid, a valid empty-layer blob for
        an in-pyramid tile with no features (the empty ≠ missing contract).

        Pyramids written with ``emit_mvt=True`` store the blob per tile;
        serving then returns it without touching features_json (extent and
        layer name are baked into the stored blob at build time — the
        arguments apply only to the re-encode fallback, where ``extent``
        must match the pyramid's TilerOptions extent)."""
        z2 = 1 << z
        xw = (x + z2) & (z2 - 1)
        hit = self._lookup(z, xw, y)
        if hit is None:
            return None
        path, i = hit
        if path not in self._no_mvt:
            blobs = self._mvt_cache.get(path)
            if blobs is None:
                pf = self._pq.ParquetFile(path)
                if "mvt" in pf.schema_arrow.names:
                    blobs = self._pq.read_table(path, columns=["mvt"]).column(
                        "mvt"
                    ).to_pylist()
                    if len(self._mvt_cache) >= self._cache_files:
                        self._mvt_cache.pop(next(iter(self._mvt_cache)))
                    self._mvt_cache[path] = blobs
                else:
                    self._no_mvt.add(path)
            if blobs is not None and blobs[i]:
                return blobs[i]
        tile = self.get_tile(z, x, y)
        if tile is None:
            return None
        from ..kernels.mvt import encode_layers

        return encode_layers(
            {layer_name: {"features": tile["features"], "extent": extent}}
        )


def compact_pyramid_updates(out_dir: str) -> dict:
    """Merge ``_updates/upd_*`` overlays back into the base ``bins/`` pyramid.

    Overlays are great for serving but accumulate: every `TileServer` start
    pays one extra file scan per update, and resume manifests only describe
    the base. Compaction folds them in with newest-wins semantics (later
    ``upd_`` directory wins per (z, x, y); tombstone rows — num_features < 0
    — delete the base tile) and removes ``_updates/``.

    Scale shape: only the bins that an update actually touched are rewritten
    — one Ray task per affected bin reads that partition's base files plus
    its slice of the update rows and writes a single merged file. Untouched
    partitions (the overwhelming majority under a small diff) are never read.
    The merged file is written under a temp name and promoted with
    ``os.replace``; old part files are removed only after promotion, and the
    merged name sorts after them so a crash mid-compaction still serves
    newest-wins.
    """
    import glob
    import os
    import shutil

    import pyarrow.parquet as pq

    import ray

    upd_dirs = sorted(glob.glob(os.path.join(out_dir, "_updates", "upd_*")))
    if not upd_dirs:
        return {"updates": 0, "compacted_bins": 0}

    plan_path = os.path.join(out_dir, "_plan.json")
    if not os.path.exists(plan_path):
        raise ValueError(
            "compact_pyramid_updates requires the fast-sink layout "
            "(out/_plan.json + out/bins/skey=*) written by write_pyramid_fast"
        )
    with open(plan_path) as f:
        plan = json.load(f)
    n_bins = int(plan["n_bins"])
    bins_map = {int(k): int(v) for k, v in plan["bins"].items()}
    # all plan keys sit at the hand-off zoom: z is packed in the low 5 bits
    zh = next(iter(bins_map)) % 32 if bins_map else 0

    def row_bin(z: int, x: int, y: int) -> int:
        from ..arrowio.codec import tile_key

        if z >= zh:
            tk = tile_key(zh, x >> (z - zh), y >> (z - zh))
            b = bins_map.get(tk)
            if b is not None:
                return b
        else:
            tk = tile_key(z, x, y)
        # shallow tiles (and unknown subtrees) use the same hash fallback as
        # the writer's add_bin stage
        return int((tk * 0x9E3779B97F4A7C15) % (1 << 62)) % n_bins

    # the driver holds only (part, row-index) ROUTING per bin — never the
    # features_json payloads: each compact task reads its own slice of the
    # update files, so update volume bounds task memory, not driver memory
    per_bin: dict[int, list[tuple[str, list[int]]]] = {}
    for upd in upd_dirs:
        for part in sorted(glob.glob(os.path.join(upd, "**", "*.parquet"), recursive=True)):
            coords = pq.read_table(part, columns=["z", "x", "y"])
            zs = coords.column("z").to_pylist()
            xs = coords.column("x").to_pylist()
            ys = coords.column("y").to_pylist()
            rows_of: dict[int, list[int]] = {}
            for i, (z, x, y) in enumerate(zip(zs, xs, ys)):
                rows_of.setdefault(row_bin(z, x, y), []).append(i)
            for b, idxs in rows_of.items():
                per_bin.setdefault(b, []).append((part, idxs))

    @ray.remote
    def compact_bin(b: int, update_slices: list) -> int:
        part_dir = os.path.join(out_dir, "bins", f"skey={b}")
        os.makedirs(part_dir, exist_ok=True)
        old = sorted(glob.glob(os.path.join(part_dir, "*.parquet")))
        merged: dict[tuple[int, int, int], dict] = {}
        for p in old:
            for row in pq.read_table(p, columns=TILE_COLUMNS).to_pylist():
                merged[(row["z"], row["x"], row["y"])] = row
        # slices arrive in upd-dir order, so later updates win per key
        for part, idxs in update_slices:
            t = pq.read_table(part, columns=TILE_COLUMNS).take(idxs)
            for row in t.to_pylist():
                key = (row["z"], row["x"], row["y"])
                if row["num_features"] < 0:
                    merged.pop(key, None)
                else:
                    merged[key] = row
        rows = sorted(merged.values(), key=lambda r: (r["z"], r["x"], r["y"]))
        table = pa.table(
            {
                "z": pa.array([r["z"] for r in rows], pa.int16()),
                "x": pa.array([r["x"] for r in rows], pa.int32()),
                "y": pa.array([r["y"] for r in rows], pa.int32()),
                "features_json": pa.array([r["features_json"] for r in rows], pa.string()),
                "num_points": pa.array([r["num_points"] for r in rows], pa.int64()),
                "num_simplified": pa.array([r["num_simplified"] for r in rows], pa.int64()),
                "num_features": pa.array([r["num_features"] for r in rows], pa.int64()),
                "min_seq": pa.array([r["min_seq"] for r in rows], pa.binary()),
                "max_seq": pa.array([r["max_seq"] for r in rows], pa.binary()),
            }
        )
        tmp = os.path.join(part_dir, "_compact.tmp")
        pq.write_table(table, tmp)
        # 'zz-compact' sorts after Ray's part files, so a crash that leaves
        # both still resolves newest-wins in TileServer's sorted scan
        os.replace(tmp, os.path.join(part_dir, "zz-compact.parquet"))
        for p in old:
            if os.path.basename(p) != "zz-compact.parquet":
                os.remove(p)
        return len(rows)

    refs = [compact_bin.remote(b, slices) for b, slices in per_bin.items()]
    counts = ray.get(refs)

    shutil.rmtree(os.path.join(out_dir, "_updates"))
    # refresh the overall tile-count manifest
    total = 0
    for part in glob.glob(os.path.join(out_dir, "bins", "skey=*", "*.parquet")):
        total += pq.ParquetFile(part).metadata.num_rows
    with open(os.path.join(out_dir, "_pyramid.done"), "w") as f:
        f.write(str(total))
    return {
        "updates": len(upd_dirs),
        "compacted_bins": len(per_bin),
        "tiles": total,
        "bin_tiles": dict(zip(per_bin.keys(), counts)),
    }


KIND_CHUNK = 4  # pickled feature-chunk of a heavy tile, drilled in a map stage


class TileRowBuilder:
    """Narrow tile-only output rows (the single-pass drill emits nothing
    else — skipping the 24-column level schema saves ~15% drill CPU)."""

    __slots__ = ("kind", "tkey", "z", "x", "y", "features_json", "num_points",
                 "num_simplified", "num_features", "min_seq", "max_seq", "payload",
                 "mvt", "mvt_cfg", "mvt_meta_cache", "mvt_layer_bytes",
                 "mvt_empty_blob")

    def __init__(self, mvt_cfg: "Optional[tuple[str, int]]" = None) -> None:
        self.kind: list[int] = []
        self.tkey: list[int] = []
        self.z: list[int] = []
        self.x: list[int] = []
        self.y: list[int] = []
        self.features_json: list[str] = []
        self.num_points: list[int] = []
        self.num_simplified: list[int] = []
        self.num_features: list[int] = []
        self.min_seq: list[bytes] = []
        self.max_seq: list[bytes] = []
        self.payload: list[bytes] = []
        self.mvt: list[bytes] = []
        # (layer_name, extent) switches the drill's in-array MVT emission on
        # (`drill_vec._emit_level`); rows from non-drill paths (scalar tiles,
        # partial/chunk merges) keep mvt=b"" and are completed byte-
        # identically from features_json by `mvt_sink.fill_mvt`.
        self.mvt_cfg = mvt_cfg
        if mvt_cfg is not None:
            from ..kernels.mvt_fast import assemble_tile_mvt

            self.mvt_meta_cache: dict = {}
            self.mvt_layer_bytes = mvt_cfg[0].encode("utf-8")
            self.mvt_empty_blob = assemble_tile_mvt(
                [], b"", self.mvt_layer_bytes, mvt_cfg[1]
            )

    def add_tile(
        self,
        tile: dict,
        features_json: str,
        min_seq: bytes = b"",
        max_seq: bytes = b"",
        kind: int = KIND_TILE,
    ) -> None:
        from ..arrowio.codec import tile_key

        self.kind.append(kind)
        self.tkey.append(tile_key(tile["z"], tile["x"], tile["y"]))
        self.z.append(tile["z"])
        self.x.append(tile["x"])
        self.y.append(tile["y"])
        self.features_json.append(features_json)
        self.num_points.append(tile["numPoints"])
        self.num_simplified.append(tile["numSimplified"])
        self.num_features.append(tile["numFeatures"])
        self.min_seq.append(min_seq)
        self.max_seq.append(max_seq)
        self.payload.append(b"")
        self.mvt.append(b"")

    def add_merged(
        self,
        z: int,
        x: int,
        y: int,
        features_json: str,
        num_points: int,
        num_simplified: int,
        num_features: int,
        min_seq: bytes,
        max_seq: bytes,
    ) -> None:
        from ..arrowio.codec import tile_key

        self.kind.append(KIND_TILE)
        self.tkey.append(tile_key(z, x, y))
        self.z.append(z)
        self.x.append(x)
        self.y.append(y)
        self.features_json.append(features_json)
        self.num_points.append(num_points)
        self.num_simplified.append(num_simplified)
        self.num_features.append(num_features)
        self.min_seq.append(min_seq)
        self.max_seq.append(max_seq)
        self.payload.append(b"")
        self.mvt.append(b"")

    def add_tiles_bulk(
        self,
        z: int,
        xs: list,
        ys: list,
        tkeys: list,
        features_json: list,
        num_points: list,
        num_simplified: list,
        num_features: list,
        min_seq: list,
        max_seq: list,
        mvt: "Optional[list]" = None,
    ) -> None:
        """Append one level's tiles in bulk (vectorized drill emission)."""
        n = len(xs)
        self.kind.extend([KIND_TILE] * n)
        self.tkey.extend(tkeys)
        self.z.extend([z] * n)
        self.x.extend(xs)
        self.y.extend(ys)
        self.features_json.extend(features_json)
        self.num_points.extend(num_points)
        self.num_simplified.extend(num_simplified)
        self.num_features.extend(num_features)
        self.min_seq.extend(min_seq)
        self.max_seq.extend(max_seq)
        self.payload.extend([b""] * n)
        self.mvt.extend(mvt if mvt is not None else [b""] * n)

    def add_chunk(self, z: int, x: int, y: int, payload: bytes) -> None:
        from ..arrowio.codec import tile_key

        self.kind.append(KIND_CHUNK)
        self.tkey.append(tile_key(z, x, y))
        self.z.append(z)
        self.x.append(x)
        self.y.append(y)
        self.features_json.append("")
        self.num_points.append(0)
        self.num_simplified.append(0)
        self.num_features.append(0)
        self.min_seq.append(b"")
        self.max_seq.append(b"")
        self.payload.append(payload)
        self.mvt.append(b"")

    def table(self) -> pa.Table:
        return pa.table(
            {
                "kind": pa.array(self.kind, pa.int8()),
                "tkey": pa.array(self.tkey, pa.int64()),
                "z": pa.array(self.z, pa.int16()),
                "x": pa.array(self.x, pa.int32()),
                "y": pa.array(self.y, pa.int32()),
                "features_json": pa.array(self.features_json, pa.string()),
                "num_points": pa.array(self.num_points, pa.int64()),
                "num_simplified": pa.array(self.num_simplified, pa.int64()),
                "num_features": pa.array(self.num_features, pa.int64()),
                "min_seq": pa.array(self.min_seq, pa.binary()),
                "max_seq": pa.array(self.max_seq, pa.binary()),
                "payload": pa.array(self.payload, pa.binary()),
                "mvt": pa.array(self.mvt, pa.binary()),
            }
        )


def _drill_subtree(
    out, features: list, z: int, x: int, y: int, tile_bbox: dict, options: TilerOptions,
    chunk_threshold=None,
) -> None:
    """Emit every descendant tile of (z, x, y) for these features.

    With a chunk_threshold, subtrees whose estimated leaf-tile cost exceeds
    it are deferred as KIND_CHUNK rows instead of drilled inline — child
    subtrees are disjoint, so chunked drilling needs no merge and duplicates
    nothing."""
    import pickle

    stack = [(features, z, x, y, tile_bbox)]
    while stack:
        feats, cz, cx0, cy0, ctile = stack.pop()
        for cx, cy, child in _clip_children(feats, cz, cx0, cy0, options, ctile):
            child_tile = create_tile([f for _, f in child], cz + 1, cx, cy, options)
            out.add_tile(
                child_tile,
                json.dumps(transform_tile_features(child_tile, options.extent)),
                child[0][0] if child else b"",
                child[-1][0] if child else b"",
            )
            if cz + 1 < options.max_zoom and child:
                if (
                    chunk_threshold is not None
                    and sum(_est_leaf_tiles(child, cz + 1, cx, cy, options.max_zoom))
                    > chunk_threshold
                ):
                    out.add_chunk(cz + 1, cx, cy, pickle.dumps((child, cz + 1, cx, cy)))
                else:
                    stack.append((child, cz + 1, cx, cy, child_tile))


def _est_leaf_tiles(pairs: list, z: int, x: int, y: int, max_zoom: int) -> list[float]:
    """Per-feature drill-cost estimate in max-zoom leaf tiles:
    clipped-geometry area × 4^mz (interior fill — every covered leaf is a
    tile) + clipped perimeter × 2^mz (boundary tiles) + a per-point floor.
    Uses the feature's *clipped* rings, so edge-crossing features (tiny area,
    modest perimeter) stay cheap while interior-covering polygons are
    detected. Drives heavy-tile chunking."""
    import numpy as np

    area_scale = 4.0 ** max_zoom
    perim_scale = 2.0 ** max_zoom
    ests = []
    for _, f in pairs:
        geometry = f["geometry"]
        ftype = f["type"]
        if ftype in ("Point", "MultiPoint"):
            ests.append(8.0 + len(geometry) / 3)
            continue
        if ftype == "LineString":
            rings = [geometry]
        elif ftype in ("MultiLineString", "Polygon"):
            rings = geometry
        else:
            rings = [r for poly in geometry for r in poly]
        area = 0.0
        perim = 0.0
        npts = 0
        for r in rings:
            pts = r.points
            arr = pts if isinstance(pts, np.ndarray) else np.asarray(pts, dtype=np.float64)
            n = len(arr) // 3
            npts += n
            if n < 2:
                continue
            xs = arr[0::3]
            ys = arr[1::3]
            dx = np.diff(xs)
            dy = np.diff(ys)
            perim += float(np.sqrt(dx * dx + dy * dy).sum())
            if ftype in ("Polygon", "MultiPolygon"):
                area += abs(float((xs[:-1] * ys[1:] - xs[1:] * ys[:-1]).sum()) / 2.0)
        ests.append(area * area_scale + perim * perim_scale + 8.0 + npts)
    return ests


class DrillOrSplit:
    """Hand-off stage: one call per co-located tile group. Normal tiles drill
    their whole subtree locally (complete tile rows, Python-object speed,
    zero further shuffles). Heavy tiles — estimated to cover more than
    ``chunk_threshold`` max-zoom leaf tiles — split their features into
    contiguous-seq chunks that drill in a parallel map stage and merge per
    tile afterwards (single giant features can't be split and remain the
    per-task cost bound). The wide (non-narrow) mode instead re-splits heavy
    tiles into child feature rows for another groupby pass."""

    def __init__(
        self,
        z: int,
        options: TilerOptions,
        heavy_threshold: int,
        narrow: bool = False,
        chunk_threshold: float | None = None,
    ):
        self.z = z
        self.options = options
        self.heavy_threshold = heavy_threshold
        self.narrow = narrow
        self.chunk_threshold = chunk_threshold

    def __call__(self, group: pa.Table) -> pa.Table:
        options = self.options
        z = self.z
        x = group.column("x")[0].as_py()
        y = group.column("y")[0].as_py()

        features = decode_features(group)
        features.sort(key=lambda p: p[0])

        out = TileRowBuilder() if self.narrow else LevelRowBuilder()
        tile = create_tile([f for _, f in features], z, x, y, options)
        out.add_tile(
            tile,
            json.dumps(transform_tile_features(tile, options.extent)),
            features[0][0] if features else b"",
            features[-1][0] if features else b"",
        )

        if z >= options.max_zoom or not features:
            return out.table()

        if self.narrow:
            _drill_subtree(
                out, features, z, x, y, tile, options, chunk_threshold=self.chunk_threshold
            )
            return out.table()

        if tile["numPoints"] <= self.heavy_threshold or z >= options.max_zoom - 1:
            _drill_subtree(out, features, z, x, y, tile, options)
        else:
            for cx, cy, child in _clip_children(features, z, x, y, options, tile):
                out.add_marker(z + 1, cx, cy)
                for seq, f in child:
                    out.add_feature(z + 1, cx, cy, seq, f)
        return out.table()


class UnifiedDrillOrMerge:
    """ONE group function for the single shuffle of the fast pyramid.

    A group is one drill BIN — a cost-balanced set of tiles (see
    `assign_bins_lpt`). Each tile within is either a set of shallow-tile
    partial rows (merge-sort by seq, sum counters) or a hand-off tile's
    feature/marker rows (assemble the tile, then drill its whole subtree
    locally, deferring chunk rows for estimated-heavy child subtrees when a
    chunk threshold is set). Both paths emit the narrow tile-row schema.
    """

    def __init__(
        self,
        z: int,
        options: TilerOptions,
        chunk_threshold: Optional[float],
        mvt_cfg: "Optional[tuple[str, int]]" = None,
        tile_filter: "Optional[set]" = None,
    ):
        self.z = z
        self.options = options
        self.chunk_threshold = chunk_threshold
        self.mvt_cfg = mvt_cfg
        # ancestry-closed invalidation cone of an incremental update:
        # drills prune descendants outside it (vectorized path only; the
        # scalar line-metrics/chunked paths drill fully and the caller's
        # affected-keys output filter keeps correctness either way)
        self.tile_filter = tile_filter

    def __call__(self, group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        out = TileRowBuilder(self.mvt_cfg)
        group = group.take(pc.sort_indices(group.column("tkey")))
        tkeys = group.column("tkey").to_numpy()
        bounds = np.nonzero(np.concatenate(([True], tkeys[1:] != tkeys[:-1])))[0]
        bounds = np.append(bounds, len(tkeys))
        # per-tile drills, not one forest per bin: drill_forest_vec exists
        # (and is the core of drill_subtree_vec) but measured 4% SLOWER on
        # hand-off-sized subtrees — level-concat copies outweigh the saved
        # kernel dispatches at these working-set sizes
        for bi in range(len(bounds) - 1):
            tile_rows = group.slice(bounds[bi], bounds[bi + 1] - bounds[bi])
            if tile_rows.column("kind")[0].as_py() == KIND_TILE_PARTIAL:
                self._merge(out, tile_rows)
            else:
                self._drill(out, tile_rows)
        return out.table()

    def _drill(self, out: "TileRowBuilder", group: pa.Table) -> None:
        options = self.options
        # per-row zoom, not self.z: heavy tiles deepen below the hand-off
        z = group.column("z")[0].as_py()
        x = group.column("x")[0].as_py()
        y = group.column("y")[0].as_py()
        features = decode_features(group)
        features.sort(key=lambda p: p[0])

        if features and not options.line_metrics and self.chunk_threshold is None:
            from ..kernels.drill_vec import drill_subtree_vec

            drill_subtree_vec(
                out, features, z, x, y, options, emit_root=True,
                allowed=self.tile_filter,
            )
            return

        tile = create_tile([f for _, f in features], z, x, y, options)
        out.add_tile(
            tile,
            json.dumps(transform_tile_features(tile, options.extent)),
            features[0][0] if features else b"",
            features[-1][0] if features else b"",
        )
        if z < options.max_zoom and features:
            _drill_subtree(
                out, features, z, x, y, tile, options, chunk_threshold=self.chunk_threshold
            )

    @staticmethod
    def _merge(out: TileRowBuilder, group: pa.Table) -> None:
        z = group.column("z")[0].as_py()
        x = group.column("x")[0].as_py()
        y = group.column("y")[0].as_py()
        np_ = int(pa.compute.sum(group.column("num_points")).as_py() or 0)
        ns = int(pa.compute.sum(group.column("num_simplified")).as_py() or 0)
        nf = int(pa.compute.sum(group.column("num_features")).as_py() or 0)
        pairs: list[tuple[bytes, dict]] = []
        for seqs, fj in zip(
            group.column("seqs").to_pylist(), group.column("features_json").to_pylist()
        ):
            if seqs:
                pairs.extend(zip(seqs, json.loads(fj)))
        pairs.sort(key=lambda p: p[0])
        out.add_merged(
            z, x, y,
            json.dumps([f for _, f in pairs]),
            np_, ns, nf,
            pairs[0][0] if pairs else b"",
            pairs[-1][0] if pairs else b"",
        )


class ChunkDrill:
    """Parallel drill of deferred heavy subtrees. Each chunk's tile row was
    already emitted by its parent task; this stage drills the descendants,
    re-deferring any still-heavy grandchild subtree (the driver loops until
    no chunks remain)."""

    def __init__(
        self,
        options: TilerOptions,
        chunk_threshold: float,
        mvt_cfg: "Optional[tuple[str, int]]" = None,
    ):
        self.options = options
        self.chunk_threshold = chunk_threshold
        self.mvt_cfg = mvt_cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pickle

        out = TileRowBuilder(self.mvt_cfg)
        for payload in batch.column("payload").to_pylist():
            chunk, z, x, y = pickle.loads(payload)
            bbox = {
                "minX": min(f["minX"] for _, f in chunk),
                "maxX": max(f["maxX"] for _, f in chunk),
                "minY": min(f["minY"] for _, f in chunk),
                "maxY": max(f["maxY"] for _, f in chunk),
            }
            _drill_subtree(
                out, chunk, z, x, y, bbox, self.options,
                chunk_threshold=self.chunk_threshold,
            )
        return out.table()


def _merge_chunk_fragments(group: pa.Table) -> pa.Table:
    rows = group.to_pylist()
    rows.sort(key=lambda r: r["min_seq"])  # contiguous seq ranges → concat order
    feats: list = []
    np_ = ns = nf = 0
    min_seq = b""
    max_seq = b""
    for r in rows:
        np_ += r["num_points"]
        ns += r["num_simplified"]
        nf += r["num_features"]
        fl = json.loads(r["features_json"]) if r["features_json"] else []
        if fl:
            if not feats:
                min_seq = r["min_seq"]
            max_seq = r["max_seq"]
            feats.extend(fl)
    first = rows[0]
    return pa.table(
        {
            "z": pa.array([first["z"]], pa.int16()),
            "x": pa.array([first["x"]], pa.int32()),
            "y": pa.array([first["y"]], pa.int32()),
            "features_json": pa.array([json.dumps(feats)], pa.string()),
            "num_points": pa.array([np_], pa.int64()),
            "num_simplified": pa.array([ns], pa.int64()),
            "num_features": pa.array([nf], pa.int64()),
            "min_seq": pa.array([min_seq], pa.binary()),
            "max_seq": pa.array([max_seq], pa.binary()),
        }
    )


def _kind_filter(kinds: tuple, invert: bool = False, scatter: bool = False):
    import pyarrow.compute as pc

    def fn(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch.column("kind"), value_set=pa.array(kinds, pa.int8()))
        out = batch.filter(pc.invert(mask) if invert else mask)
        if scatter:
            out = _with_skey(out)
        return out

    return fn


def _with_skey(out: pa.Table) -> pa.Table:
    """Bijective key hash: groupby sorts by key, and raw tile keys are
    spatially contiguous — dense regions would range-partition into the same
    reduce task. Scatter, keeping group identity."""
    import numpy as np

    tk = out.column("tkey").to_numpy().astype(np.uint64)
    mixed = (tk * np.uint64(0x9E3779B97F4A7C15)) & np.uint64((1 << 63) - 1)
    return out.append_column("skey", pa.array(mixed.astype(np.int64)))


def assign_bins_lpt(tkeys: np.ndarray, ests: np.ndarray, n_bins: int) -> dict[int, int]:
    """Longest-processing-time bin packing of hand-off tiles into drill bins.

    The cascade's per-tile leaf-cost estimates make the single drill shuffle
    explicitly load-balanced instead of hash-scattered: heaviest tile first
    into the least-loaded bin, so the makespan is ~max(total/n_bins,
    heaviest tile). Driver-side on ≤4^z_handoff keys — O(T log T) on a tiny
    table at any data scale."""
    import heapq

    order = np.argsort(-ests, kind="stable")
    heap = [(0.0, b) for b in range(n_bins)]
    out: dict[int, int] = {}
    loads = [0.0] * n_bins
    for i in order:
        load, b = heapq.heappop(heap)
        out[int(tkeys[i])] = b
        loads[b] = load + float(ests[i]) + 1.0
        heapq.heappush(heap, (loads[b], b))
    # relabel bins heaviest-first: the sort shuffle emits blocks in key
    # order and the drill launches tasks as blocks arrive, so low ids run
    # first — heaviest bins starting first trims the makespan tail
    rank = {b: r for r, b in enumerate(sorted(range(n_bins), key=lambda b: -loads[b]))}
    return {tk: rank[b] for tk, b in out.items()}


def auto_chunk_threshold(
    per_tile_est: "np.typing.ArrayLike", num_cpus: float
) -> Optional[float]:
    """Default-on monster-subtree policy: chunk only when one hand-off tile's
    estimated leaf-tile cost dominates a per-core share of the total work
    (a world-covering polygon), so ordinary skew keeps the fully streaming
    single-pass path. Threshold sizes chunks to ~1/(4·cores) of the total."""
    import numpy as np

    est = np.asarray(per_tile_est, dtype=np.float64)
    if len(est) == 0:
        return None
    total = float(est.sum())
    heaviest = float(est.max())
    if heaviest <= max(4.0 * total / max(num_cpus, 1.0), float(1 << 18)):
        return None
    return max(total / (4.0 * max(num_cpus, 1.0)), float(1 << 16))


def build_pyramid_fast(
    ds: "ray.data.Dataset",
    options: TilerOptions,
    z_handoff: int = 7,
    heavy_threshold: Optional[int] = None,
    batch_size: int = 1024,
    drill_partitions: "int | str" = "auto",
    chunk_threshold: "Optional[float] | str" = "auto",
    deepen: bool = True,
    subtree_filter: "Optional[set[int]]" = None,
    bin_plan: "Optional[dict]" = None,
    keep_skey: bool = False,
    skip_bins: "Optional[set[int]]" = None,
    emit_mvt: bool = False,
    mvt_layer: str = "geojsonvt",
    cascade_rows: "Optional[ray.data.Dataset]" = None,
) -> "ray.data.Dataset":
    """Production pyramid: ONE cascade map stage to ``z_handoff`` (shallow
    tiles assembled as mergeable partials), ONE cost-balanced groupby that
    both merges the shallow partials and drills every hand-off subtree
    locally. Shuffle budget: exactly one sort over the (small) cascade
    output; the (huge) tile stream never shuffles.

    The cascade emits per-tile leaf-cost estimates on its marker rows; a
    tiny driver-side aggregate over the already-materialized cascade output
    feeds (a) LPT bin packing of hand-off tiles into ``drill_partitions``
    bins (``"auto"`` = 4× cluster CPUs) so the drill's makespan is bounded
    by the heaviest BIN, not a hash-collision of heavy tiles, and (b) the
    default-on monster-subtree chunking decision (`auto_chunk_threshold`;
    pass None to force streaming, a float to force chunking).

    ``subtree_filter``: optional set of hand-off tile keys — only those
    subtrees are drilled (shallow z<z_handoff tiles still assemble from the
    full cascade pass). This is the incremental-update pruning path: the
    expensive drill runs over O(affected subtrees), not the world.

    ``bin_plan``: optional dict ``{"n_bins": int, "bins": {tkey: bin}}``
    recorded by a previous run — reusing it makes bin membership
    deterministic across resumed runs regardless of cluster size. The plan
    actually used is exposed on the returned dataset as ``ds._graft_plan``.
    """
    import pyarrow.compute as pc

    import ray as _ray

    options = options.validate()
    mvt_cfg = (mvt_layer, options.extent) if emit_mvt else None
    z_handoff = min(z_handoff, options.max_zoom)
    ncpu = float(_ray.cluster_resources().get("CPU", 8))
    n_bins = max(4 * int(ncpu), 16) if drill_partitions == "auto" else int(drill_partitions)

    if cascade_rows is not None:
        if "src_seq" in cascade_rows.schema().names:
            # attribution column of the persisted updateable state — the
            # merge/drill doesn't use it, and DeepenHeavy emits plain
            # LEVEL_SCHEMA rows, so strip it before the pipeline
            cascade_rows = cascade_rows.drop_columns(["src_seq"])
        cur = cascade_rows.materialize()
    else:
        cur = (
            ds.map_batches(ConvertWrap(options), batch_format="pyarrow")
            .map_batches(
                CascadeToHandoff(options, z_handoff),
                batch_format="pyarrow",
                batch_size=batch_size,
            )
            .materialize()  # cascade output is small (partials + hand-off frontier)
        )

    if subtree_filter is not None:
        filt_ref = _ray.put(frozenset(subtree_filter))

        def prune(batch: pa.Table) -> pa.Table:
            keep_keys: frozenset = _ray.get(filt_ref)
            tk = batch.column("tkey").to_numpy()
            kinds = batch.column("kind").to_numpy()
            drill_row = (kinds == KIND_FEATURE) | (kinds == KIND_MARKER)
            in_set = np.isin(
                tk, np.fromiter(keep_keys, dtype=np.int64, count=len(keep_keys))
            )
            return batch.filter(pa.array(~drill_row | in_set))

        cur = cur.map_batches(prune, batch_format="pyarrow").materialize()

    if heavy_threshold is not None:
        return _build_pyramid_heavy_loop(
            cur, options, z_handoff, heavy_threshold, n_bins
        )

    def _collect_est(ds_):
        t = ds_.map_batches(
            lambda b: b.filter(pc.equal(b.column("kind"), KIND_MARKER)).select(
                ["tkey", "est"]
            ),
            batch_format="pyarrow",
        ).to_pandas()
        if t.empty or "tkey" not in t.columns:
            # an update that empties every affected subtree leaves no
            # hand-off markers at all (schema-less empty frame)
            import pandas as pd

            return pd.Series(dtype=np.float64)
        return t.groupby("tkey")["est"].sum()

    per_tile = _collect_est(cur)

    # variable-depth hand-off: while one tile's estimated subtree cost
    # dominates a bin-sized share of the work, push its frontier a level
    # deeper (its own tile row assembles from mergeable partials, like the
    # shallow cascade tiles). LPT can balance bins but not split an atomic
    # tile; this bounds the drill makespan by the ATOM limit instead of the
    # densest subtree. Each pass is a shuffle-free map over the small
    # cascade output.
    if deepen:
        total = float(per_tile.sum())
        atom_limit = max(total / (2.0 * n_bins), 4096.0)
        for _ in range(4):
            heavy = frozenset(
                int(k) for k in per_tile.index[per_tile.to_numpy() > atom_limit]
            )
            if not heavy:
                break
            heavy_ref = _ray.put(heavy)
            cur = cur.map_batches(
                DeepenHeavy(options, heavy_ref), batch_format="pyarrow"
            ).materialize()
            per_tile = _collect_est(cur)

    if chunk_threshold == "auto":
        chunk_threshold = auto_chunk_threshold(per_tile.to_numpy(), ncpu)
    if bin_plan is not None:
        n_bins = int(bin_plan["n_bins"])
        bin_map = {int(k): int(v) for k, v in bin_plan["bins"].items()}
    else:
        bin_map = assign_bins_lpt(per_tile.index.to_numpy(), per_tile.to_numpy(), n_bins)
    plan = {"n_bins": n_bins, "bins": bin_map}
    bin_ref = _ray.put(bin_map)

    skip = frozenset(skip_bins) if skip_bins else None

    def add_bin(batch: pa.Table) -> pa.Table:
        bm: dict[int, int] = _ray.get(bin_ref)
        tk = batch.column("tkey").to_numpy()
        # shallow partial tiles (not in the map) hash into bins — their merge
        # work is negligible next to the hand-off drills
        skey = np.fromiter(
            (
                bm.get(int(t), int((int(t) * 0x9E3779B97F4A7C15) % (1 << 62)) % n_bins)
                for t in tk
            ),
            dtype=np.int64,
            count=len(tk),
        )
        out = batch.append_column("skey", pa.array(skey))
        if skip:
            # resume: rows of completed bins drop BEFORE the shuffle, so
            # finished subtrees cost no drill compute on a resumed run
            out = out.filter(
                pa.array(~np.isin(skey, np.fromiter(skip, dtype=np.int64, count=len(skip))))
            )
        return out

    unified = UnifiedDrillOrMerge(z_handoff, options, chunk_threshold, mvt_cfg)

    def run_group(group: pa.Table, _u=unified) -> pa.Table:
        t = _u(group)
        if keep_skey:
            sk = group.column("skey")[0].as_py()
            t = t.append_column("skey", pa.array([sk] * t.num_rows, pa.int64()))
        return t

    # pre-shuffle block fan-out: Ray's sort-based map_groups parallelism
    # follows input block count — the small-byte cascade output would
    # otherwise collapse into one reduce task and serialize the whole drill.
    # Exactly n_bins: the sort shuffle materializes O(blocks × ranges) tiny
    # object-store slices, so over-partitioning a small frontier (e.g.
    # 4×n_bins=512 on a 553-row table) costs ~65 s of pure shuffle latency
    # before the first drill task starts; measured sweet spot is blocks ==
    # n_bins (18.6 s vs 81.8 s wall on the ×1 us-states pyramid).
    level_out = (
        cur.map_batches(add_bin, batch_format="pyarrow")
        .repartition(n_bins)
        .groupby("skey")
        .map_groups(run_group, batch_format="pyarrow")
    )
    mvt_cols = ["mvt"] if emit_mvt else []
    if chunk_threshold is None:
        # fully streaming: drill output flows straight to the consumer
        out = level_out.select_columns(
            TILE_COLUMNS + mvt_cols + (["skey"] if keep_skey else [])
        )
        if emit_mvt:
            from .mvt_sink import fill_mvt

            out = fill_mvt(out, extent=options.extent, layer_name=mvt_layer)
        out._graft_plan = plan
        return out

    # chunked mode: monstrous subtrees are deferred as chunk rows and
    # drilled in additional map rounds (disjoint subtrees → complete
    # tiles, no merge). Costs one materialize per round; rounds ≈
    # log4(monster/threshold).
    if keep_skey:
        raise ValueError("keep_skey requires chunk_threshold=None (streaming mode)")
    level_out = level_out.materialize()
    tiles = level_out.map_batches(
        _kind_filter((KIND_TILE,)), batch_format="pyarrow"
    ).select_columns(TILE_COLUMNS + mvt_cols)
    chunks = level_out.map_batches(_kind_filter((KIND_CHUNK,)), batch_format="pyarrow")
    while chunks.count() > 0:
        nxt = (
            chunks.repartition(n_bins)
            .map_batches(
                ChunkDrill(options, chunk_threshold, mvt_cfg),
                batch_format="pyarrow",
                batch_size=1,
            )
            .materialize()
        )
        tiles = tiles.union(
            nxt.map_batches(_kind_filter((KIND_TILE,)), batch_format="pyarrow")
            .select_columns(TILE_COLUMNS + mvt_cols)
        )
        chunks = nxt.map_batches(_kind_filter((KIND_CHUNK,)), batch_format="pyarrow")
    if emit_mvt:
        from .mvt_sink import fill_mvt

        tiles = fill_mvt(tiles, extent=options.extent, layer_name=mvt_layer)
    tiles._graft_plan = plan
    return tiles


def _build_pyramid_heavy_loop(
    cur: "ray.data.Dataset",
    options: TilerOptions,
    z_handoff: int,
    heavy_threshold: int,
    drill_partitions: int,
) -> "ray.data.Dataset":
    """Legacy multi-pass mode: heavy hand-off tiles (num_points >
    heavy_threshold) re-split into child feature rows for another bounded
    groupby pass instead of drilling locally."""
    shallow_tiles = (
        cur.map_batches(_kind_filter((KIND_TILE_PARTIAL,)), batch_format="pyarrow")
        .groupby("tkey")
        .map_groups(_merge_partials, batch_format="pyarrow")
    )
    frontier = cur.map_batches(
        _kind_filter((KIND_FEATURE, KIND_MARKER), scatter=True), batch_format="pyarrow"
    )

    tiles = shallow_tiles
    z = z_handoff
    while z <= options.max_zoom:
        splitter = DrillOrSplit(z, options, heavy_threshold)

        def run(group: pa.Table, _s=splitter) -> pa.Table:
            return _s(group)

        level_out = (
            frontier.repartition(drill_partitions)
            .groupby("skey")
            .map_groups(run, batch_format="pyarrow")
            .materialize()
        )
        complete = (
            level_out.map_batches(_kind_filter((KIND_TILE,)), batch_format="pyarrow")
            .select_columns(TILE_COLUMNS)
        )
        tiles = tiles.union(complete)
        frontier = level_out.map_batches(
            _kind_filter((KIND_FEATURE, KIND_MARKER), scatter=True), batch_format="pyarrow"
        )
        z += 1
        if frontier.count() == 0:
            break
    return tiles


def pyramid_stats(tiles: "ray.data.Dataset") -> dict:
    """Distributed analogue of the reference's debug stats
    (`src/tile-index.ts:9-31`): per-zoom created-tile counters plus
    feature/point/simplified sums, computed as a per-batch partial aggregate
    (only ≤25 tiny rows per block leave each task — no tile shuffle)."""
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select(["z", "num_points", "num_simplified", "num_features"])
        t = t.append_column(
            "nonempty", pc.cast(pc.greater(t.column("num_features"), 0), pa.int64())
        )
        g = t.group_by("z").aggregate(
            [("z", "count"), ("num_points", "sum"), ("num_simplified", "sum"),
             ("num_features", "sum"), ("nonempty", "sum")]
        )
        return g.rename_columns(
            ["z", "tiles", "points", "simplified", "features", "nonempty"]
        )

    small = tiles.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = small.groupby("z")[["tiles", "points", "simplified", "features", "nonempty"]].sum()
    # `stats` mirrors the reference: every created tile counts, including
    # empty split children (`src/tile-index.ts:222-228` pushes `tl || []`)
    stats = {f"z{int(z)}": int(r["tiles"]) for z, r in agg.iterrows()}
    per_zoom = {
        int(z): {
            "tiles": int(r["tiles"]),
            "tiles_nonempty": int(r["nonempty"]),
            "points": int(r["points"]),
            "simplified": int(r["simplified"]),
            "features": int(r["features"]),
        }
        for z, r in agg.iterrows()
    }
    return {
        "total": int(agg["tiles"].sum()),
        "total_nonempty": int(agg["nonempty"].sum()),
        "stats": stats,
        "per_zoom": per_zoom,
    }
