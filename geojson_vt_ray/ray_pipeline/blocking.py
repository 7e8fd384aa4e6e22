"""Triangle-blocking primitives shared by the skew-guarded bucket joins
(SimHash / MinHash banding in text.py, radius-kNN cell joins in cells.py).

A bucket whose membership exceeds a cap splits into ``ceil(size/cap)``
chunks; for symmetric pair generation each member replicates to every
unordered chunk-pair block containing its chunk (any two members meet in
exactly the block ``(min(cx,cy), max(cx,cy))``), while for bipartite
joins only the small side replicates per chunk.

Chunk ids are assigned by POSITION within the batch (round-robin per
row), not by hashing a member key: key hashes break on duplicate keys —
the canonical hot-bucket case is millions of identical members, which a
key hash would put in ONE chunk, defeating the guard — and position
assignment needs no assumption about the id column's type. Any
assignment is correct (pair completeness never depends on which chunk a
member gets); balance is what matters.
"""

from __future__ import annotations

import numpy as np


def monster_chunks(counts, key_cols: list[str], cap: int) -> dict:
    """{key_tuple_or_scalar: n_chunks} for groups above ``cap``, from a
    pandas frame of group counts (column ``count()``)."""
    if len(counts) == 0:
        return {}
    ncs = [int(-(-c // cap)) for c in counts["count()"]]
    if len(key_cols) == 1:
        keys = [int(v) for v in counts[key_cols[0]]]
    else:
        keys = [tuple(int(v) for v in row) for row in counts[key_cols].itertuples(index=False)]
    return dict(zip(keys, ncs))


def chunk_counts_for(batch_keys, mons: dict) -> np.ndarray:
    """Per-row chunk count (1 = not a monster). ``batch_keys`` is a
    single int array or a tuple of aligned int arrays matching the
    monster dict's key shape. Only loops over the (tiny) monster dict."""
    if isinstance(batch_keys, tuple):
        n = len(batch_keys[0])
        nc = np.ones(n, dtype=np.int64)
        for key, v in mons.items():
            m = np.ones(n, dtype=bool)
            for col, kv in zip(batch_keys, key):
                m &= col == kv
            nc[m] = v
    else:
        nc = np.ones(len(batch_keys), dtype=np.int64)
        for key, v in mons.items():
            nc[batch_keys == key] = v
    return nc


def assign_chunks(nc: np.ndarray, keys=None) -> np.ndarray:
    """Round-robin chunk id per row using the PER-BUCKET running rank
    (cumcount of rows sharing the same bucket key) — a global batch
    index `i % nc` collapses when a hot bucket's rows occur at a stride
    sharing a factor with nc, and key hashes bunch duplicate members;
    the rank is stride-proof and key-type-agnostic.

    ``keys`` (an int array or tuple of aligned int arrays — the same
    value the caller passed to `chunk_counts_for`) identifies the
    bucket each row belongs to, so two interleaved monster buckets that
    happen to share an nc value still each round-robin over all their
    chunks (A,B,A,B with nc=2 would otherwise put every A in chunk 0).
    Without keys, rows pool by nc value (legacy behavior — correct, but
    balance degrades in exactly that shared-nc case)."""
    n = len(nc)
    chunk = np.zeros(n, dtype=np.int64)
    hot = np.nonzero(nc > 1)[0]
    if len(hot) == 0:
        return chunk
    if keys is None:
        for v in np.unique(nc[hot]):
            m = nc == v
            chunk[m] = np.arange(int(m.sum()), dtype=np.int64) % v
        return chunk
    if isinstance(keys, tuple):
        karrs = [np.asarray(k)[hot] for k in keys]
        order = np.lexsort(tuple(reversed(karrs)))
        sorted_keys = [k[order] for k in karrs]
        new_run = np.zeros(len(hot), dtype=bool)
        new_run[0] = True
        for k in sorted_keys:
            new_run[1:] |= k[1:] != k[:-1]
    else:
        k = np.asarray(keys)[hot]
        order = np.argsort(k, kind="stable")
        ks = k[order]
        new_run = np.empty(len(hot), dtype=bool)
        new_run[0] = True
        new_run[1:] = ks[1:] != ks[:-1]
    run_id = np.cumsum(new_run) - 1
    starts = np.nonzero(new_run)[0]
    rank = np.arange(len(hot), dtype=np.int64) - starts[run_id]
    chunk[hot[order]] = rank % nc[hot][order]
    return chunk


def replicate_blocks(nc: np.ndarray, chunk: np.ndarray):
    """Symmetric-pair replication: for each row, one replica per chunk
    ``other`` in range(nc) with block (min(chunk, other), max(...)).

    Returns (row_idx, c1, c2, chunk_of_replica); empty-safe."""
    n = len(nc)
    if n == 0 or int(nc.max(initial=1)) == 1:
        idx = np.arange(n, dtype=np.int64)
        z = np.zeros(n, dtype=np.int64)
        return idx, z, z, z
    reps = nc
    idx = np.repeat(np.arange(n, dtype=np.int64), reps)
    total = int(reps.sum())
    starts = np.concatenate([[0], np.cumsum(reps)[:-1]])
    other = np.arange(total, dtype=np.int64) - np.repeat(starts, reps)
    ch = np.repeat(chunk, reps)
    return idx, np.minimum(ch, other), np.maximum(ch, other), ch


def replicate_all(nc: np.ndarray):
    """Bipartite replication (small side): one replica per chunk id in
    range(nc_i). Returns (row_idx, chunk_id); empty-safe."""
    n = len(nc)
    if n == 0 or int(nc.max(initial=1)) == 1:
        return np.arange(n, dtype=np.int64), np.zeros(n, dtype=np.int64)
    idx = np.repeat(np.arange(n, dtype=np.int64), nc)
    total = int(nc.sum())
    starts = np.concatenate([[0], np.cumsum(nc)[:-1]])
    chunk = np.arange(total, dtype=np.int64) - np.repeat(starts, nc)
    return idx, chunk


_MIX1 = np.uint64(0x9E3779B97F4A7C15)
_MIX2 = np.uint64(0xBF58476D1CE4E5B9)
_MIX3 = np.uint64(0x94D049BB133111EB)


def mix_to_partitions(arrays, n_partitions: int) -> np.ndarray:
    """Mix one or more aligned int arrays into a BOUNDED partition id
    (int64 in [0, n_partitions)) — the dispatch-bounding key every
    formerly-per-distinct-key groupby in this repo hashes through, so the
    downstream ``map_groups`` runs once per PARTITION (n_partitions Python
    dispatches) instead of once per distinct key (millions).

    splitmix64-style finalizer over the xor of per-column products; only
    balance depends on the mix quality — correctness never does, because
    every consumer re-groups on the full key vectorized inside the
    partition task."""
    if not isinstance(arrays, (tuple, list)):
        arrays = (arrays,)
    h = np.zeros(len(arrays[0]), dtype=np.uint64)
    for i, a in enumerate(arrays):
        h ^= (np.asarray(a).astype(np.uint64) + np.uint64(i)) * _MIX1
    h = (h ^ (h >> np.uint64(30))) * _MIX2
    h = (h ^ (h >> np.uint64(27))) * _MIX3
    h ^= h >> np.uint64(31)
    return (h % np.uint64(n_partitions)).astype(np.int64)


def lexsort_segments(arrays):
    """Sort rows by the given key arrays (last array = primary, numpy
    lexsort convention NOT used — pass keys major-first) and return
    ``(order, starts, ends)`` where ``starts[i]:ends[i]`` is the i-th
    equal-key segment in the sorted order. The vectorized replacement for
    a per-distinct-key groupby inside one bounded partition task."""
    arrays = [np.asarray(a) for a in arrays]
    order = np.lexsort(tuple(reversed(arrays)))
    n = len(order)
    if n == 0:
        return order, np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    new_seg = np.zeros(n, dtype=bool)
    new_seg[0] = True
    for a in arrays:
        s = a[order]
        new_seg[1:] |= s[1:] != s[:-1]
    starts = np.flatnonzero(new_seg)
    ends = np.r_[starts[1:], n]
    return order, starts, ends


def scan_monsters(keyed_ds, key_cols: list[str], cap: int) -> dict:
    """The shared monster scan: group the (small, key-only) dataset by
    ``key_cols``, keep groups above ``cap``, and return the
    `monster_chunks` dict. One groupby-count shuffle; the caller decides
    whether the keyed dataset re-executes its tag stage (the usual
    re-scan-don't-pin tradeoff) or is already materialized."""
    import pyarrow as pa
    import pyarrow.compute as pc

    # Two-level vectorized count instead of Ray's groupby().count():
    # that aggregation dispatches per distinct key, and the monster scan
    # sees MILLIONS of distinct (mostly size-1) keys — measured 58 s for
    # 8.4M rows / 262k keys vs ~2 s for this shape. Level 1: per-batch
    # partial counts via Arrow's C++ group_by; level 2: partials hash
    # into a bounded number of reduce partitions, each re-aggregated
    # vectorized. Keys are ints in every call site (band values, shingle
    # hashes), which the hash below relies on.
    n_parts = 64
    _KM = np.uint64(0x9E3779B97F4A7C15)

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select(key_cols).group_by(key_cols).aggregate([([], "count_all")])
        h = np.zeros(g.num_rows, dtype=np.uint64)
        for i, c in enumerate(key_cols):
            h ^= (g.column(c).to_numpy().astype(np.uint64) + np.uint64(i)) * _KM
        h = (h ^ (h >> np.uint64(31))) * _KM
        return g.append_column(
            "pk", pa.array((h % np.uint64(n_parts)).astype(np.int64))
        )

    def reduce_part(group: pa.Table) -> pa.Table:
        g = (
            group.select(key_cols + ["count_all"])
            .group_by(key_cols)
            .aggregate([("count_all", "sum")])
        )
        g = g.filter(pc.greater(g.column("count_all_sum"), cap))
        return g.rename_columns(key_cols + ["count()"])

    counts = (
        keyed_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(reduce_part, batch_format="pyarrow")
        .to_pandas()
    )
    return monster_chunks(counts, key_cols, cap)


def bounded_counts(keyed_ds, key_col: str, n_parts: int = 256):
    """Per-key row counts with BOUNDED dispatch: per-batch Arrow C++
    partial counts, then one groupby over ``n_parts`` hash partitions
    with a vectorized re-aggregation per partition — never a Python
    dispatch per distinct key. The drop-in replacement for
    ``ds.groupby(k).count()`` wherever key cardinality is data-dependent
    (cell ids at caller-chosen levels: a fine level over dense data has
    millions of occupied cells, which re-enters the per-distinct-key
    wall `scan_monsters`' docstring measures at 30x). Returns a Dataset
    with columns ``(key_col, "count()")``. Keys must be ints.
    """
    import pyarrow as pa

    _KM = np.uint64(0x9E3779B97F4A7C15)

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select([key_col]).group_by([key_col]).aggregate([([], "count_all")])
        h = (g.column(key_col).to_numpy().astype(np.uint64)) * _KM
        h = (h ^ (h >> np.uint64(31))) * _KM
        return g.append_column(
            "pk", pa.array((h % np.uint64(n_parts)).astype(np.int64))
        )

    def reduce_part(group: pa.Table) -> pa.Table:
        g = (
            group.select([key_col, "count_all"])
            .group_by([key_col])
            .aggregate([("count_all", "sum")])
        )
        return g.rename_columns([key_col, "count()"])

    return (
        keyed_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(reduce_part, batch_format="pyarrow")
    )
