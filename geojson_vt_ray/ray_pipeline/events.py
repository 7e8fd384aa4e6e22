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
