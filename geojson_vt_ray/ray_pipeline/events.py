"""Windowed aggregates over the events stream table.

Ray Data has no event-time windows; tumbling windows become a window-key
column + pre-aggregated ``groupby`` (the guide's batch-pattern for
stream-shaped inputs). Float columns aggregate with min/max (exact selection)
— sums are emitted only for integers, keeping the DuckDB oracle bit-exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Count, Max, Min


def tumbling_window_stats(
    events: "ray.data.Dataset", window_seconds: int = 3600
) -> "ray.data.Dataset":
    """Per (event_type, window) counts and value min/max.

    Window key = floor(epoch_micros / window) — integer arithmetic, exact.
    Partial aggregation happens inside map_batches (one row per key per
    batch); the groupby then shuffles only partials.
    """
    win_us = window_seconds * 1_000_000

    def partial(batch: pa.Table) -> pa.Table:
        ts = pc.cast(batch.column("ts"), pa.int64())
        win = pc.multiply(pc.divide(ts, win_us), win_us)  # integer floor division
        t = pa.table(
            {
                "event_type": batch.column("event_type"),
                "window_start_us": win,
                "value": batch.column("value"),
            }
        )
        # batch-local partial aggregation
        agg = t.group_by(["event_type", "window_start_us"]).aggregate(
            [("value", "count"), ("value", "min"), ("value", "max")]
        )
        return agg.rename_columns(
            ["event_type", "window_start_us", "n_partial", "min_partial", "max_partial"]
        )

    from ray.data.aggregate import Sum

    partials = events.map_batches(partial, batch_format="pyarrow")
    return partials.groupby(["event_type", "window_start_us"]).aggregate(
        Sum("n_partial", alias_name="n_events"),
        Min("min_partial", alias_name="min_value"),
        Max("max_partial", alias_name="max_value"),
    )


def sessionize(
    events: "ray.data.Dataset",
    gap_us: int = 1_800_000_000,
    user_cap: int = 1_000_000,
    salt_window_us: int = 86_400_000_000,
    n_partitions: int = 256,
) -> "ray.data.Dataset":
    """Gap-based sessionization: one output row per (user, session), where a
    session breaks whenever consecutive events of a user are more than
    ``gap_us`` apart (classic 30-minute web-session semantics — an operator
    Ray Data has no native window for).

    Shape: project to (user_id, epoch_us) in a map stage, then ONE shuffle
    on a BOUNDED partition key (hash of (user_id, salt) onto
    ``n_partitions``) with session detection vectorized across ALL of a
    partition's users in one task (lexsort + segment-boundary diff/cumsum)
    — grouping on raw user_id would pay a Python dispatch per distinct
    user (BASELINE.md dispatch audit: ~30× slower at 262k keys).

    Skew guard (hot users): a user with more than ``user_cap`` events salts
    into (user, time-bucket) groups of width ``salt_window_us`` (default
    1 day); a user still over-cap INSIDE one bucket gets a finer window
    (floored at ``gap_us`` — events bursting within one gap-width window
    are a single session and must meet one task under exact gap semantics,
    so that residue is irreducible). Bucket-level sessions are computed per
    salted group, then ONE tiny per-user stitch pass merges boundary
    sessions whose gap across a bucket edge is ≤ gap_us; the stitch group
    holds SESSIONS, bounded by active-time/gap. Result is identical to the
    unsalted path (gap-merge is associative over any time partition;
    pinned by the salted==unsalted equality tests).

    Cost note: the hot-user scans re-read the two pruned integer columns
    (one pass, plus a second pass over hot users' rows only when any
    exist) — the same re-scan-don't-pin tradeoff as every other monster
    scan in this repo; pinning the projected table at 10^12 rows costs far
    more than re-reading two int64 columns.
    """

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "us": pc.cast(batch.column("ts"), pa.int64()),
            }
        )

    projected = events.map_batches(project, batch_format="pyarrow")

    import ray as _ray

    from .blocking import scan_monsters

    # over-cap scans share the bounded monster scan (two-level vectorized
    # count — Ray's groupby().count() dispatches per distinct user)
    hot_counts = scan_monsters(projected, ["user_id"], user_cap)
    # per-user salt window: day buckets by default; users over-cap inside a
    # single day bucket drop to a finer window (never below the gap)
    hot_win: dict[int, int] = {int(u): int(salt_window_us) for u in hot_counts}
    if hot_win:
        fine = max(int(gap_us), int(salt_window_us) // 64)
        if fine < salt_window_us:
            coarse_ref = _ray.put(frozenset(hot_win))

            def tag_hot(batch: pa.Table) -> pa.Table:
                hw = _ray.get(coarse_ref)
                uid = batch.column("user_id").to_numpy()
                us = batch.column("us").to_numpy()
                m = np.isin(uid, np.fromiter(hw, dtype=np.int64, count=len(hw)))
                return pa.table(
                    {
                        "user_id": pa.array(uid[m]),
                        "salt": pa.array(us[m] // salt_window_us),
                    }
                )

            over = scan_monsters(
                projected.map_batches(tag_hot, batch_format="pyarrow"),
                ["user_id", "salt"],
                user_cap,
            )
            for u in {int(k[0]) for k in over}:
                hot_win[u] = fine
    hot_ref = _ray.put(hot_win)

    from .blocking import mix_to_partitions

    def add_salt(batch: pa.Table) -> pa.Table:
        hw = _ray.get(hot_ref)
        uid = batch.column("user_id").to_numpy()
        us = batch.column("us").to_numpy()
        if hw:
            win = np.zeros(len(uid), dtype=np.int64)
            for u, w in hw.items():  # hot dict is tiny by construction
                win[uid == u] = w
            is_hot = win > 0
            salt = np.where(is_hot, us // np.maximum(win, 1), 0)
        else:
            is_hot = np.zeros(len(uid), dtype=bool)
            salt = np.zeros(len(uid), dtype=np.int64)
        salt = salt.astype(np.int64)
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "salt": pa.array(salt),
                "hot": pa.array(is_hot),
                "us": batch.column("us"),
                "pkey": pa.array(mix_to_partitions((uid, salt), n_partitions)),
            }
        )

    _SESSION_SCHEMA = {
        "user_id": pa.int64(),
        "session_id": pa.int64(),
        "session_start_us": pa.int64(),
        "session_end_us": pa.int64(),
        "n_events": pa.int64(),
    }

    def partition_sessions(g: pa.Table) -> pa.Table:
        """Every (user, salt) group hashed into this partition, sessionized
        in ONE vectorized pass: sort by (user, salt, ts), a session breaks
        at each (user, salt) boundary or when the within-group time gap
        exceeds gap_us; session ordinals restart per (user, salt) group."""
        n = g.num_rows
        if n == 0:
            return pa.table(
                {
                    **{k: pa.array([], t) for k, t in _SESSION_SCHEMA.items()},
                    "hot": pa.array([], pa.bool_()),
                }
            )
        uid = g.column("user_id").to_numpy()
        salt = g.column("salt").to_numpy()
        us = g.column("us").to_numpy()
        hot = g.column("hot").to_numpy()
        order = np.lexsort((us, salt, uid))
        uid, salt, us, hot = uid[order], salt[order], us[order], hot[order]
        new_seg = np.zeros(n, dtype=bool)
        new_seg[0] = True
        new_seg[1:] = (uid[1:] != uid[:-1]) | (salt[1:] != salt[:-1])
        new_session = new_seg | np.r_[True, np.diff(us) > gap_us]
        starts = np.flatnonzero(new_session)
        ends = np.append(starts[1:], n) - 1
        m = len(starts)
        # session ordinal within its (user, salt) group
        seg_first = np.flatnonzero(new_seg[starts])
        seg_id = np.cumsum(new_seg[starts]) - 1
        session_id = np.arange(m, dtype=np.int64) - seg_first[seg_id] + 1
        return pa.table(
            {
                "user_id": pa.array(uid[starts], pa.int64()),
                "session_id": pa.array(session_id),
                "session_start_us": pa.array(us[starts], pa.int64()),
                "session_end_us": pa.array(us[ends], pa.int64()),
                "n_events": pa.array(np.diff(np.append(starts, n)), pa.int64()),
                "hot": pa.array(hot[starts]),
            }
        )

    grouped = (
        projected.map_batches(add_salt, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(partition_sessions, batch_format="pyarrow")
    )

    def _sessions_table(cols: dict) -> pa.Table:
        return pa.table({k: pa.array(cols[k], t) for k, t in _SESSION_SCHEMA.items()})

    if not hot_win:
        return grouped.map_batches(
            lambda b: b.drop_columns(["hot"]), batch_format="pyarrow"
        )

    # sessions are tiny relative to events; pin them so the cold/hot split
    # doesn't recompute the groupby twice
    grouped = grouped.materialize()

    def split(keep_hot: bool):
        def fn(batch: pa.Table) -> pa.Table:
            mask = batch.column("hot")
            if not keep_hot:
                mask = pc.invert(mask)
            out = batch.filter(mask).drop_columns(["hot"])
            if keep_hot:
                uid = out.column("user_id").to_numpy()
                out = out.append_column(
                    "pk", pa.array(mix_to_partitions(uid, n_partitions))
                )
            return out

        return fn

    cold = grouped.map_batches(split(False), batch_format="pyarrow")

    def stitch_partition(g: pa.Table) -> pa.Table:
        """Every hot user hashed into this partition, boundary-stitched in
        ONE vectorized pass: sort sessions by (user, start); within a user,
        salt buckets partition time so ends strictly increase with starts —
        a merged run continues while the gap to the previous session's end
        is ≤ gap_us, and a run's end is its last member's end."""
        n = g.num_rows
        if n == 0:
            return _sessions_table({k: [] for k in _SESSION_SCHEMA})
        uid = g.column("user_id").to_numpy()
        s = g.column("session_start_us").to_numpy()
        e = g.column("session_end_us").to_numpy()
        n_ev = g.column("n_events").to_numpy()
        order = np.lexsort((s, uid))
        uid, s, e, n_ev = uid[order], s[order], e[order], n_ev[order]
        new_user = np.zeros(n, dtype=bool)
        new_user[0] = True
        new_user[1:] = uid[1:] != uid[:-1]
        new_run = new_user | np.r_[True, s[1:] - e[:-1] > gap_us]
        run_idx = np.flatnonzero(new_run)
        m = len(run_idx)
        ends = e[np.append(run_idx[1:], n) - 1]
        counts = np.add.reduceat(n_ev, run_idx)
        user_first = np.flatnonzero(new_user[run_idx])
        user_id_of_run = np.cumsum(new_user[run_idx]) - 1
        session_id = np.arange(m, dtype=np.int64) - user_first[user_id_of_run] + 1
        return _sessions_table(
            {
                "user_id": uid[run_idx].astype(np.int64),
                "session_id": session_id,
                "session_start_us": s[run_idx],
                "session_end_us": ends,
                "n_events": counts,
            }
        )

    hot_sessions = (
        grouped.map_batches(split(True), batch_format="pyarrow")
        .groupby("pk")
        .map_groups(stitch_partition, batch_format="pyarrow")
    )
    return cold.union(hot_sessions)


def distinct_users_window(
    events: "ray.data.Dataset", window_seconds: int = 3600
) -> "ray.data.Dataset":
    """Exact distinct users per tumbling window. Each batch first dedupes
    its own (window, user) pairs — the shuffle then moves at most one row
    per pair per batch — and the per-window merge counts uniques."""
    win_us = window_seconds * 1_000_000

    def partial(batch: pa.Table) -> pa.Table:
        ts = pc.cast(batch.column("ts"), pa.int64())
        win = pc.multiply(pc.divide(ts, win_us), win_us)
        t = pa.table({"window_start_us": win, "user_id": batch.column("user_id")})
        return t.group_by(["window_start_us", "user_id"]).aggregate([])

    def merge(g: pa.Table) -> pa.Table:
        n = len(np.unique(g.column("user_id").to_numpy()))
        return pa.table(
            {
                "window_start_us": pa.array([g.column("window_start_us")[0].as_py()], pa.int64()),
                "n_users": pa.array([n], pa.int64()),
            }
        )

    return (
        events.map_batches(partial, batch_format="pyarrow")
        .groupby("window_start_us")
        .map_groups(merge, batch_format="pyarrow")
    )


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mix (splitmix64 finalizer), vectorized."""
    z = (x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def hll_users_window(
    events: "ray.data.Dataset", window_seconds: int = 3600, p: int = 10
) -> "ray.data.Dataset":
    """Approximate distinct users per tumbling window with a HyperLogLog
    sketch (2^p byte registers). The sketch is the point at 100 TB: each
    batch emits ONE fixed-size register row per window regardless of row
    count, register merges are elementwise max (associative, any order),
    and the estimate uses the standard bias-corrected harmonic mean with
    the linear-counting small-range correction.

    Accuracy ~1.04/sqrt(2^p) (≈3.3% at p=10); verified against the exact
    operator in tests. No SQL oracle — approximation is the semantics.
    """
    win_us = window_seconds * 1_000_000
    m = 1 << p

    def partial(batch: pa.Table) -> pa.Table:
        ts = pc.cast(batch.column("ts"), pa.int64()).to_numpy()
        win = (ts // win_us) * win_us
        h = _splitmix64(batch.column("user_id").to_numpy())
        idx = (h >> np.uint64(64 - p)).astype(np.int64)
        rest = h << np.uint64(p)
        # rank = leading zeros of the remaining 64-p bits, + 1 (capped)
        nz = rest != 0
        lz = np.full(len(h), 64 - p, dtype=np.int64)
        # count leading zeros via float64 exponent trick is lossy; use a
        # 16-bit-at-a-time table-free loop (4 iterations, vectorized)
        v = rest.copy()
        lzc = np.zeros(len(h), dtype=np.int64)
        for s in (32, 16, 8, 4, 2, 1):
            top = v >> np.uint64(64 - s)
            zero_top = top == 0
            lzc += np.where(zero_top, s, 0)
            v = np.where(zero_top, v << np.uint64(s), v)
        lz[nz] = np.minimum(lzc[nz], 64 - p)
        rank = (lz + 1).astype(np.uint8)

        wins, inv = np.unique(win, return_inverse=True)
        regs = np.zeros((len(wins), m), dtype=np.uint8)
        np.maximum.at(regs, (inv, idx), rank)
        return pa.table(
            {
                "window_start_us": pa.array(wins, pa.int64()),
                "registers": pa.FixedSizeListArray.from_arrays(
                    pa.array(regs.reshape(-1), pa.uint8()), m
                ),
            }
        )

    def merge(g: pa.Table) -> pa.Table:
        col = g.column("registers")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        regs = col.values.to_numpy(zero_copy_only=False).reshape(len(g), m)
        merged = regs.max(axis=0)
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(np.float64(2.0) ** -merged.astype(np.float64))
        zeros = int((merged == 0).sum())
        if est <= 2.5 * m and zeros:
            est = m * np.log(m / zeros)  # linear counting
        return pa.table(
            {
                "window_start_us": pa.array([g.column("window_start_us")[0].as_py()], pa.int64()),
                "n_users_hll": pa.array([int(round(est))], pa.int64()),
            }
        )

    return (
        events.map_batches(partial, batch_format="pyarrow")
        .groupby("window_start_us")
        .map_groups(merge, batch_format="pyarrow")
    )


def asof_join_latest(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    key: str = "user_id",
    ts_col: str = "ts",
    out_cols: tuple = ("event_id", "user_id", "ts"),
    n_partitions: int = 256,
) -> "ray.data.Dataset":
    """Distributed backward as-of join: for each left row, the latest right
    ``ts`` with ``right.ts <= left.ts`` for the same ``key`` (SQL
    ``ASOF LEFT JOIN`` / pandas ``merge_asof``), an operator the reference
    engine and Ray Data both lack.

    Shape: ONE shuffle on a BOUNDED hash of the (integer) join key — both
    sides are tagged and unioned, and each partition task runs one lexsort
    plus a vectorized searchsorted merge per key segment (grouping on the
    raw key would pay a Python dispatch per distinct user; BASELINE.md
    dispatch audit). Only the join key co-locates rows; emitting the
    matched timestamp (not an arbitrary matched row) keeps the result
    deterministic under duplicate right timestamps.

    Scale note: a pathologically hot key serializes in its segment. The
    scale path is time-bucket salting — segment on (key, ts_bucket) and
    carry each bucket's per-key max right-ts forward with a tiny
    prefix-max pass; not needed at the tested key cardinalities.
    """
    from .blocking import lexsort_segments, mix_to_partitions

    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            t = pa.table(
                {
                    "event_id": (
                        batch.column("event_id")
                        if side == 0
                        else pa.array(np.full(batch.num_rows, -1, dtype=np.int64))
                    ),
                    key: batch.column(key),
                    ts_col: batch.column(ts_col),
                    "side": pa.array(np.full(batch.num_rows, side, dtype=np.int8)),
                    "pk": pa.array(
                        mix_to_partitions(
                            batch.column(key).to_numpy().astype(np.int64),
                            n_partitions,
                        )
                    ),
                }
            )
            return t

        return fn

    tagged = left.map_batches(tag(0), batch_format="pyarrow").union(
        right.map_batches(tag(1), batch_format="pyarrow")
    )

    def merge_partition(group: pa.Table) -> pa.Table:
        """Every join key hashed into this partition, as-of-merged in ONE
        task: per-key work is a sort + searchsorted over its segment."""
        side = group.column("side").to_numpy()
        ts = group.column(ts_col).to_numpy()  # datetime64[us]
        kcol = group.column(key).to_numpy()
        eid = group.column("event_id").to_numpy()
        order, starts, ends = lexsort_segments((kcol,))
        side_s, ts_s, k_s, eid_s = (
            a[order] for a in (side, ts, kcol, eid)
        )
        out_eid: list[np.ndarray] = []
        out_key: list[np.ndarray] = []
        out_lts: list[np.ndarray] = []
        out_mts: list[np.ndarray] = []
        out_hit: list[np.ndarray] = []
        for s, e in zip(starts, ends):
            lmask = side_s[s:e] == 0
            if not lmask.any():
                continue
            lts = ts_s[s:e][lmask]
            rts = np.sort(ts_s[s:e][~lmask])
            idx = np.searchsorted(rts, lts, side="right") - 1
            matched = np.empty(len(lts), dtype=ts.dtype)
            hit = idx >= 0
            if len(rts):
                matched[hit] = rts[np.clip(idx, 0, None)][hit]
            out_eid.append(eid_s[s:e][lmask])
            out_key.append(k_s[s:e][lmask])
            out_lts.append(lts)
            out_mts.append(matched)
            out_hit.append(hit)
        if not out_eid:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    key: group.column(key).slice(0, 0),
                    ts_col: group.column(ts_col).slice(0, 0),
                    "matched_ts": group.column(ts_col).slice(0, 0),
                }
            )
        hit = np.concatenate(out_hit)
        return pa.table(
            {
                "event_id": pa.array(np.concatenate(out_eid)),
                key: pa.array(np.concatenate(out_key)),
                ts_col: pa.array(np.concatenate(out_lts)),
                "matched_ts": pa.array(np.concatenate(out_mts), mask=~hit),
            }
        )

    return tagged.groupby("pk").map_groups(merge_partition, batch_format="pyarrow")
