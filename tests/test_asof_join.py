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
