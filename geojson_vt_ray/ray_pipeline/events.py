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


def asof_join_latest(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    key: str = "user_id",
    ts_col: str = "ts",
    out_cols: tuple = ("event_id", "user_id", "ts"),
) -> "ray.data.Dataset":
    """Distributed backward as-of join: for each left row, the latest right
    ``ts`` with ``right.ts <= left.ts`` for the same ``key`` (SQL
    ``ASOF LEFT JOIN`` / pandas ``merge_asof``), an operator the reference
    engine and Ray Data both lack.

    Shape: ONE shuffle — both sides are tagged and unioned, then a single
    ``groupby(key).map_groups`` runs a vectorized searchsorted merge per
    key group. Only the join key co-locates rows; emitting the matched
    timestamp (not an arbitrary matched row) keeps the result deterministic
    under duplicate right timestamps.

    Scale note: a pathologically hot key serializes in one group. The scale
    path is time-bucket salting — group on (key, ts_bucket) and carry each
    bucket's per-key max right-ts forward with a tiny prefix-max pass; not
    needed at the tested key cardinalities.
    """
    import pyarrow.compute as pc

    lcols = list(out_cols)

    def tag(side: int, cols: list):
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
                }
            )
            return t

        return fn

    tagged = left.map_batches(tag(0, lcols), batch_format="pyarrow").union(
        right.map_batches(tag(1, []), batch_format="pyarrow")
    )

    def merge(group: pa.Table) -> pa.Table:
        side = group.column("side").to_numpy()
        ts = group.column(ts_col).to_numpy()  # datetime64[us]
        lmask = side == 0
        lts = ts[lmask]
        rts = np.sort(ts[~lmask])
        idx = np.searchsorted(rts, lts, side="right") - 1
        matched = np.empty(len(lts), dtype=ts.dtype)
        hit = idx >= 0
        matched[hit] = rts[np.clip(idx, 0, None)][hit]
        out = pa.table(
            {
                "event_id": pa.array(group.column("event_id").to_numpy()[lmask]),
                key: pa.array(group.column(key).to_numpy()[lmask]),
                ts_col: pa.array(lts),
                "matched_ts": pa.array(matched, mask=~hit),
            }
        )
        return out

    return tagged.groupby(key).map_groups(merge, batch_format="pyarrow")
