"""Relational (TPC-H-shaped), sessionization, distinct-count and IVF-ANN
operator checks against DuckDB / exact oracles on the sf0.001 tables."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ["events", "lineitem", "orders", "customer", "nation", "region"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con.execute(sql).df()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def test_pricing_summary_matches_duckdb(ray_session):
    import ray.data

    from geojson_vt_ray.ray_pipeline.entry_queries import ORACLES
    from geojson_vt_ray.ray_pipeline.relational import pricing_summary

    li = ray.data.read_parquet(f"{SF}/lineitem.parquet")
    got = _norm(pricing_summary(li).to_pandas())
    want = _norm(_duck(ORACLES["tpch_pricing"]))
    pd.testing.assert_frame_equal(got, want, check_exact=True)


def test_revenue_by_nation_matches_duckdb(ray_session):
    import ray.data

    from geojson_vt_ray.ray_pipeline.entry_queries import ORACLES
    from geojson_vt_ray.ray_pipeline.relational import revenue_by_nation

    orders = ray.data.read_parquet(f"{SF}/orders.parquet")
    got = _norm(
        revenue_by_nation(
            orders,
            pq.read_table(f"{SF}/customer.parquet"),
            pq.read_table(f"{SF}/nation.parquet"),
            pq.read_table(f"{SF}/region.parquet"),
        ).to_pandas()
    )
    want = _norm(_duck(ORACLES["tpch_revenue_nation"]))
    pd.testing.assert_frame_equal(got, want, check_exact=True)


def test_topk_per_group_matches_window_oracle(ray_session):
    import ray.data

    from geojson_vt_ray.ray_pipeline.entry_queries import ORACLES
    from geojson_vt_ray.ray_pipeline.relational import topk_per_group

    cust = ray.data.read_parquet(f"{SF}/customer.parquet")
    got = _norm(
        topk_per_group(
            cust,
            key="c_nationkey",
            order_col="c_acctbal",
            k=3,
            tie_col="c_custkey",
            out_cols=["c_custkey", "c_nationkey", "c_acctbal"],
        ).to_pandas()
    )
    want = _norm(_duck(ORACLES["tpch_top_customers"]))
    want["rank"] = want["rank"].astype(np.int64)
    pd.testing.assert_frame_equal(got, want, check_exact=True)


def test_topk_per_group_small_batches_cross_batch_merge(ray_session):
    """Force many tiny batches so the per-group winner must come from the
    cross-batch merge, not a single batch's local top-k."""
    import ray.data

    from geojson_vt_ray.ray_pipeline.relational import topk_per_group

    n = 200
    t = pa.table(
        {
            "g": pa.array(np.arange(n) % 4, pa.int64()),
            "v": pa.array((np.arange(n) * 37 % 101).astype(np.float64)),
            "id": pa.array(np.arange(n), pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(20)
    got = topk_per_group(ds, "g", "v", 2, "id", ["g", "v", "id"]).to_pandas()
    df = t.to_pandas()
    for g in range(4):
        sub = df[df.g == g].sort_values(["v", "id"], ascending=[False, True]).head(2)
        gg = got[got.g == g].sort_values("rank")
        assert list(gg["id"]) == list(sub["id"])
        assert list(gg["rank"]) == [1, 2]


def test_sessionize_known_sessions(ray_session):
    import ray.data

    from geojson_vt_ray.ray_pipeline.events import sessionize

    base = 1_700_000_000_000_000
    gap = 1_800_000_000
    # user 1: 3 events close, then a >gap break, then 2 events
    us1 = [base, base + 10**6, base + 2 * 10**6, base + 2 * 10**6 + gap + 1, base + 3 * 10**6 + gap]
    # user 2: single event
    us2 = [base + 5]
    t = pa.table(
        {
            "user_id": pa.array([1] * 5 + [2], pa.int64()),
            "ts": pa.array(us1 + us2, pa.timestamp("us")),
        }
    )
    out = sessionize(ray.data.from_arrow(t)).to_pandas().sort_values(
        ["user_id", "session_id"]
    )
    u1 = out[out.user_id == 1]
    assert list(u1.n_events) == [3, 2]
    assert list(u1.session_id) == [1, 2]
    assert u1.iloc[0].session_start_us == base
    assert u1.iloc[0].session_end_us == base + 2 * 10**6
    assert len(out[out.user_id == 2]) == 1


def test_sessionize_matches_duckdb(ray_session):
    import ray.data

    from geojson_vt_ray.ray_pipeline.entry_queries import ORACLES
    from geojson_vt_ray.ray_pipeline.events import sessionize

    events = ray.data.read_parquet(f"{SF}/events.parquet")
    got = _norm(sessionize(events).to_pandas())
    want = _norm(_duck(ORACLES["events_sessions"]))
    pd.testing.assert_frame_equal(got, want, check_exact=True)


def test_distinct_users_matches_duckdb(ray_session):
    import ray.data

    from geojson_vt_ray.ray_pipeline.entry_queries import ORACLES
    from geojson_vt_ray.ray_pipeline.events import distinct_users_window

    events = ray.data.read_parquet(f"{SF}/events.parquet")
    got = _norm(distinct_users_window(events).to_pandas())
    want = _norm(_duck(ORACLES["events_distinct_users"]))
    pd.testing.assert_frame_equal(got, want, check_exact=True)


def test_hll_tracks_exact_counts(ray_session):
    import ray.data

    from geojson_vt_ray.ray_pipeline.events import distinct_users_window, hll_users_window

    events = ray.data.read_parquet(f"{SF}/events.parquet")
    hll = hll_users_window(events).to_pandas()
    exact = distinct_users_window(events).to_pandas()
    m = hll.merge(exact, on="window_start_us")
    assert len(m) == len(exact)
    rel = (m.n_users_hll - m.n_users).abs() / m.n_users
    # p=10 → ~3.3% std error; small windows resolve via linear counting
    assert rel.mean() < 0.05
    assert rel.max() < 0.2


def test_hll_merge_is_order_independent(ray_session):
    """Register merges are elementwise max: the estimate over the full table
    equals the estimate when the same rows arrive in many small blocks."""
    import ray.data

    from geojson_vt_ray.ray_pipeline.events import hll_users_window

    t = pq.read_table(f"{SF}/events.parquet", columns=["user_id", "ts"])
    one = hll_users_window(ray.data.from_arrow(t)).to_pandas()
    many = hll_users_window(ray.data.from_arrow(t).repartition(17)).to_pandas()
    pd.testing.assert_frame_equal(
        _norm(one), _norm(many), check_exact=True
    )


def test_ivf_recall_vs_bruteforce(ray_session):
    import ray.data

    from geojson_vt_ray.ray_pipeline.ann import brute_force_topk, ivf_topk

    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    vec_ids = t.column("vec_id").to_numpy()
    qmask = vec_ids % 50 == 0
    col = t.column("embedding").combine_chunks()
    vals = col.values.to_numpy(zero_copy_only=False).astype(np.float64)
    dim = col.offsets.to_numpy()[1]
    qvecs = vals.reshape(len(vec_ids), dim)[qmask]
    emb = ray.data.from_arrow(t)
    bf = brute_force_topk(emb, qvecs, vec_ids[qmask], k=5, inorder=False).to_pandas()
    ivf = ivf_topk(emb, qvecs, vec_ids[qmask], k=5, n_centroids=64, nprobe=16).to_pandas()
    want = set(zip(bf.query_id, bf.neighbor_id))
    got = set(zip(ivf.query_id, ivf.neighbor_id))
    assert len(got & want) / len(want) >= 0.7
    # IVF similarities are a subset of exact cosine values: every returned
    # (q, n) pair present in brute force must carry the identical cos_sim
    bfm = {(q, n): s for q, n, s in zip(bf.query_id, bf.neighbor_id, bf.cos_sim)}
    for q, n, s in zip(ivf.query_id, ivf.neighbor_id, ivf.cos_sim):
        if (q, n) in bfm:
            assert s == pytest.approx(bfm[(q, n)], rel=1e-12)


def test_cogroup_join_cross_product_and_drop(ray_session):
    import ray.data

    from geojson_vt_ray.ray_pipeline.relational import cogroup_join

    left = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 1, 2, 3], pa.int64()),
                  "a": pa.array([10, 11, 20, 30], pa.int64())})
    ).repartition(3)
    right = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 1, 2, 4], pa.int64()),
                  "b": pa.array(["x", "y", "z", "w"], pa.string())})
    ).repartition(2)
    out = cogroup_join(left, right, "k", ["a"], ["b"]).to_pandas()
    out = out.sort_values(["__key", "La", "Rb"]).reset_index(drop=True)
    # k=1: 2x2 cross; k=2: 1x1; k=3 and k=4: dropped (inner join)
    assert len(out) == 5
    assert list(out["__key"]) == [1, 1, 1, 1, 2]
    assert set(zip(out["La"], out["Rb"])) == {(10, "x"), (10, "y"), (11, "x"), (11, "y"), (20, "z")}


def test_priority_revenue_matches_duckdb(ray_session):
    import ray.data

    from geojson_vt_ray.ray_pipeline.entry_queries import ORACLES
    from geojson_vt_ray.ray_pipeline.relational import order_revenue_by_priority

    li = ray.data.read_parquet(f"{SF}/lineitem.parquet")
    orders = ray.data.read_parquet(f"{SF}/orders.parquet")
    got = _norm(order_revenue_by_priority(li, orders).to_pandas())
    want = _norm(_duck(ORACLES["tpch_priority_revenue"]))
    pd.testing.assert_frame_equal(got, want, check_exact=True)


def test_cumulative_revenue_matches_duckdb(ray_session):
    import ray.data

    from geojson_vt_ray.ray_pipeline.entry_queries import ORACLES
    from geojson_vt_ray.ray_pipeline.relational import _int_col, cumulative_per_group

    orders = ray.data.read_parquet(f"{SF}/orders.parquet")
    got = _norm(
        cumulative_per_group(
            orders,
            key="o_custkey",
            order_cols=["o_orderdate", "o_orderkey"],
            value_expr=lambda b: _int_col(b, "o_totalprice", 100.0),
            out_cols=[],
            cum_name="cum_revenue_cents",
        ).to_pandas()
    )
    want = _norm(_duck(ORACLES["tpch_cumulative_revenue"]))
    pd.testing.assert_frame_equal(got, want, check_exact=True)


def test_doc_sample_deterministic(ray_session):
    from geojson_vt_ray.ray_pipeline.entry_queries import QUERIES

    a = _norm(QUERIES["doc_samples"](SF).to_pandas())
    b = _norm(QUERIES["doc_samples"](SF).to_pandas())
    pd.testing.assert_frame_equal(a, b, check_exact=True)
    hash10 = a[a["kind"] == "hash10"]
    assert 0 < len(hash10) < 500  # ~10% of the table


def test_length_quantiles_matches_duckdb(ray_session):
    from geojson_vt_ray.ray_pipeline.entry_queries import ORACLES, QUERIES

    got = _norm(QUERIES["doc_length_quantiles"](SF).to_pandas())
    want = _norm(
        duckdb.connect()
        .execute(
            ORACLES["doc_length_quantiles"].replace(
                "documents", f"'{SF}/documents.parquet'"
            )
        )
        .df()
    )
    pd.testing.assert_frame_equal(got, want, check_exact=True)


def test_stratified_sample_matches_duckdb(ray_session):
    from geojson_vt_ray.ray_pipeline.entry_queries import ORACLES, QUERIES

    got = _norm(QUERIES["doc_samples"](SF).to_pandas())
    want = _norm(
        duckdb.connect()
        .execute(
            ORACLES["doc_samples"].replace(
                "FROM documents", f"FROM '{SF}/documents.parquet'"
            )
        )
        .df()
    )
    want["rank"] = want["rank"].astype(np.int64)
    want["h"] = want["h"].astype(np.int64)
    pd.testing.assert_frame_equal(got, want, check_exact=True)
    # every language stratum is capped at 20
    strat = got[got["kind"] == "strat20"]
    assert (strat.groupby("lang").size() <= 20).all()
