"""Distributed as-of join vs pandas merge_asof ground truth."""

import numpy as np
import pandas as pd
import pytest
import ray.data


@pytest.mark.parametrize("seed", [0, 1])
def test_asof_join_latest_matches_pandas(ray_session, seed):
    from geojson_vt_ray.ray_pipeline.events import asof_join_latest

    rs = np.random.RandomState(seed)
    n_l, n_r = 400, 300
    base = np.datetime64("2025-01-01T00:00:00", "us")
    left = pd.DataFrame(
        {
            "event_id": np.arange(n_l),
            "user_id": rs.randint(0, 20, n_l),
            "ts": base + rs.randint(0, 10**9, n_l).astype("timedelta64[us]"),
        }
    )
    right = pd.DataFrame(
        {
            "event_id": np.arange(n_r) + 10_000,
            "user_id": rs.randint(0, 20, n_r),
            # duplicate timestamps on purpose: result must stay deterministic
            "ts": base + (rs.randint(0, 10**6, n_r) * 1000).astype("timedelta64[us]"),
        }
    )
    got = (
        asof_join_latest(
            ray.data.from_pandas(left).repartition(4),
            ray.data.from_pandas(right).repartition(3),
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        left.sort_values("ts"),
        right[["user_id", "ts"]].assign(matched_ts=lambda d: d["ts"]).sort_values("ts"),
        on="ts",
        by="user_id",
        direction="backward",
    ).sort_values("event_id").reset_index(drop=True)
    assert len(got) == n_l
    pd.testing.assert_series_equal(
        got["matched_ts"], want["matched_ts"], check_names=False
    )


def test_sessionize_hot_user_salting_equals_unsalted(ray_session):
    """A hot user salted into day buckets yields the identical session rows
    as the unsalted single-group path, including sessions that span bucket
    edges (events on both sides within the gap)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from geojson_vt_ray.ray_pipeline.events import sessionize

    day = 86_400_000_000
    gap = 1_800_000_000
    rs = np.random.RandomState(9)
    ts = []
    # hot user 7: bursts across 5 days, some spanning midnight within gap
    t = day * 10
    for _ in range(600):
        step = int(rs.choice([60_000_000, 600_000_000, gap + 1_000_000, day // 3]))
        t += step
        ts.append((7, t))
    # guarantee a bucket-edge session: events 1s before and after a midnight
    edge = day * 12
    ts += [(7, edge - 1_000_000), (7, edge + 1_000_000)]
    # a couple of cold users
    for u in (1, 2):
        t0 = day * 11
        for k in range(5):
            ts.append((u, t0 + k * (gap * 2)))
    tbl = pa.table(
        {
            "user_id": pa.array([u for u, _ in ts], pa.int64()),
            "ts": pa.array([t for _, t in ts], pa.int64()),
        }
    )

    def run(cap):
        ds = ray.data.from_arrow(tbl).repartition(4)
        df = sessionize(ds, gap_us=gap, user_cap=cap).to_pandas()
        return sorted(
            map(
                tuple,
                df[
                    ["user_id", "session_start_us", "session_end_us", "n_events"]
                ].itertuples(index=False),
            )
        )

    unsalted = run(10**9)
    salted = run(100)  # user 7 (602 events) goes over the cap
    assert salted == unsalted
    assert len(unsalted) > 3


def test_sessionize_salted_pre_epoch_timestamps(ray_session):
    """Negative (pre-1970) timestamps through the hot-user stitch: merged
    session ends must be the true (negative) values, not clamped to 0."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from geojson_vt_ray.ray_pipeline.events import sessionize

    day = 86_400_000_000
    gap = 1_800_000_000
    ts = []
    t = -day * 30
    for _ in range(120):
        t += int(gap // 3)
        ts.append((5, t))
    tbl = pa.table(
        {
            "user_id": pa.array([u for u, _ in ts], pa.int64()),
            "ts": pa.array([t for _, t in ts], pa.int64()),
        }
    )

    def run(cap):
        ds = ray.data.from_arrow(tbl)
        df = sessionize(ds, gap_us=gap, user_cap=cap).to_pandas()
        return sorted(
            map(
                tuple,
                df[["user_id", "session_start_us", "session_end_us", "n_events"]].itertuples(
                    index=False
                ),
            )
        )

    unsalted = run(10**9)
    salted = run(50)
    assert salted == unsalted
    assert all(end < 0 for _, _, end, _ in unsalted)


def test_sessionize_intra_window_hot_user(ray_session):
    """A hot user concentrated inside ONE day bucket gets the finer salt
    window (second-level scan); results still equal the unsalted path."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from geojson_vt_ray.ray_pipeline.events import sessionize

    day = 86_400_000_000
    gap = 1_800_000_000
    rs = np.random.RandomState(3)
    ts = []
    t = day * 20 + 1_000_000  # everything inside day 20
    for _ in range(400):
        t += int(rs.choice([30_000_000, 120_000_000, gap + 60_000_000]))
        if t >= day * 21 - gap:
            t = day * 20 + 40_000_000_000  # stay inside the day
        ts.append((3, t))
    ts += [(8, day * 20 + k * gap * 3) for k in range(4)]  # cold user
    tbl = pa.table(
        {
            "user_id": pa.array([u for u, _ in ts], pa.int64()),
            "ts": pa.array([t for _, t in ts], pa.int64()),
        }
    )

    def run(cap):
        ds = ray.data.from_arrow(tbl).repartition(3)
        df = sessionize(ds, gap_us=gap, user_cap=cap).to_pandas()
        return sorted(
            map(
                tuple,
                df[["user_id", "session_start_us", "session_end_us", "n_events"]].itertuples(
                    index=False
                ),
            )
        )

    assert run(50) == run(10**9)
