"""Mergeable deterministic quantile sketch (ray_pipeline/sketch.py)."""

import numpy as np
import pytest

from geojson_vt_ray.ray_pipeline.sketch import QuantileSketch, quantile_sketch_column


def _rank_error(values: np.ndarray, estimate: float, q: float) -> float:
    """|rank(estimate) - q·n| / n."""
    n = len(values)
    rank = np.searchsorted(np.sort(values), estimate, side="left")
    return abs(rank - q * n) / n


def test_exact_below_capacity():
    """With fewer than k values nothing compacts: the query is the exact
    order statistic (first value whose rank reaches ceil(q*n))."""
    r = np.random.default_rng(1)
    n = 200
    vals = r.normal(size=n)
    sk = QuantileSketch(k=256).add(vals)
    s = np.sort(vals)
    for q in (0.0, 0.25, 0.5, 0.9, 1.0):
        # all weights are 1, so query() returns s[searchsorted(1..n, q*n)]
        want = s[min(int(np.searchsorted(np.arange(1, n + 1), q * n)), n - 1)]
        assert sk.query(q) == want, q


def test_bounded_rank_error_large_stream():
    r = np.random.default_rng(7)
    vals = np.concatenate([r.normal(size=120_000), r.exponential(size=30_000) * 50])
    sk = QuantileSketch(k=256)
    for chunk in np.array_split(vals, 37):
        sk.add(chunk)
    assert sk.n == len(vals)
    # stored size is bounded ~ k·log(n/k), never the stream
    stored = sum(len(b) for b in sk.levels)
    assert stored <= 256 * 16
    for q in (0.01, 0.1, 0.5, 0.9, 0.99):
        err = _rank_error(vals, sk.query(q), q)
        assert err < 0.01, (q, err)


def test_merge_matches_single_within_bound():
    """Merging partials built over disjoint shards answers with the same
    error bound as one sketch over the whole stream."""
    r = np.random.default_rng(3)
    vals = r.uniform(-5, 5, size=60_000)
    parts = np.array_split(vals, 8)
    sk = QuantileSketch(k=128)
    for p in parts:
        sk.merge(QuantileSketch(k=128).add(p))
    assert sk.n == len(vals)
    for q in (0.05, 0.5, 0.95):
        assert _rank_error(vals, sk.query(q), q) < 0.02


def test_row_codec_roundtrip():
    r = np.random.default_rng(5)
    sk = QuantileSketch(k=64).add(r.normal(size=10_000))
    vals, wts = sk.to_rows()
    assert set(np.unique(wts)).issubset({1 << h for h in range(32)})
    back = QuantileSketch.from_rows(vals, wts, k=64)
    assert back.n == sk.n
    for q in (0.1, 0.5, 0.9):
        assert back.query(q) == sk.query(q)


def test_deterministic():
    vals = np.sin(np.arange(50_000) * 0.7) * 100
    a = QuantileSketch(k=128).add(vals)
    b = QuantileSketch(k=128).add(vals)
    for q in (0.2, 0.5, 0.8):
        assert a.query(q) == b.query(q)


def test_rejects_bad_k():
    with pytest.raises(ValueError):
        QuantileSketch(k=3)
    with pytest.raises(ValueError):
        QuantileSketch(k=127)


def test_distributed_sketch_vs_exact(ray_session):
    """The Dataset pipeline (per-batch partials -> one bounded reducer)
    lands within 1% rank error of exact quantiles on the events table."""
    import pyarrow.parquet as pq
    import ray

    sf = "/root/testdata/sf0.01"
    tbl = pq.read_table(f"{sf}/events.parquet", columns=["value"])
    vals = tbl.column("value").to_numpy()
    ds = ray.data.read_parquet(f"{sf}/events.parquet")
    qs = [0.1, 0.5, 0.9, 0.99]
    out = quantile_sketch_column(ds, "value", qs, k=256).to_pandas()
    assert out["n"].iloc[0] == len(vals)
    for _, row in out.iterrows():
        err = _rank_error(vals, row["value"], row["q"])
        assert err < 0.01, (row["q"], err)


def test_frequency_sketch_mg_guarantee():
    """Misra-Gries invariants on a skewed stream: every reported estimate
    is a lower bound within `offset` of truth, offset <= n/(k+1), and all
    items with true count > n/(k+1) survive."""
    from collections import Counter

    from geojson_vt_ray.ray_pipeline.sketch import FrequencySketch

    r = np.random.default_rng(11)
    # zipf-ish: heavy head + long tail
    items = np.concatenate(
        [np.repeat([f"hot{i}" for i in range(5)], [4000, 2500, 1500, 900, 600]),
         np.asarray([f"t{v}" for v in r.integers(0, 40_000, size=30_000)])]
    )
    r.shuffle(items)
    truth = Counter(items.tolist())
    k = 64
    sk = FrequencySketch(k)
    for chunk in np.array_split(items, 23):
        vals, cnts = np.unique(chunk, return_counts=True)
        sk.merge(FrequencySketch(k).add_counts(vals, cnts))
    n = len(items)
    assert sk.n == n
    assert sk.offset <= n // (k + 1) + 1
    for it, est, err in sk.top(10):
        assert est <= truth[it] <= est + err
    survivors = set(sk.counts)
    for it, c in truth.items():
        if c > n / (k + 1):
            assert it in survivors, (it, c)


def test_heavy_hitter_tokens_distributed(ray_session):
    """Distributed MG pipeline: top tokens agree with exact wordcount
    within the reported error bound on the documents table."""
    from collections import Counter

    import pyarrow.parquet as pq
    import ray

    from geojson_vt_ray.ray_pipeline.sketch import heavy_hitter_tokens

    sf = "/root/testdata/sf0.01"
    texts = pq.read_table(f"{sf}/documents.parquet", columns=["text"]).column(
        "text"
    ).to_pylist()
    truth = Counter()
    for t in texts:
        truth.update(t.split(" "))
    ds = ray.data.read_parquet(f"{sf}/documents.parquet", columns=["text"])
    out = heavy_hitter_tokens(ds, k_track=512, k_out=10).to_pandas()
    assert len(out) == 10
    exact_top = [t for t, _ in sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:10]]
    for _, row in out.iterrows():
        assert row["est"] <= truth[row["token"]] <= row["est"] + row["err"]
    # with k_track >> distinct hot tokens the sketch recovers the exact head
    assert set(out["token"]) == set(exact_top)


def test_exact_quantiles_global_bit_equal(ray_session):
    """`exact_quantiles_global` (distributed selection by iterative
    histogram refinement) must be BIT-EQUAL to quantile_cont's symmetric
    lerp of the exact order statistics — including under massive ties,
    extreme skew, and n smaller than the gather threshold."""
    import pyarrow as pa
    import ray.data

    from geojson_vt_ray.ray_pipeline.sketch import exact_quantiles_global

    qs = [0.1, 0.5, 0.9, 0.99]
    rng = np.random.default_rng(7)
    cases = {
        "uniform": rng.uniform(-5, 5, 200_000),
        "ties": np.repeat([1.0, 2.0, 2.0, 3.0], 50_000).astype(np.float64),
        "massive_tie": np.full(100_000, 3.14159),
        "small": rng.normal(0, 1, 37),
        "skew": np.concatenate(
            [rng.uniform(0, 1, 199_990), rng.uniform(1e9, 2e9, 10)]
        ),
    }
    for name, v in cases.items():
        ds = ray.data.from_arrow(pa.table({"value": pa.array(v, pa.float64())}))
        out = exact_quantiles_global(
            ds, "value", qs, n_bins=64, gather_threshold=512, max_rounds=8
        ).to_pandas()
        a = np.sort(v.astype(np.float64))
        for i, q in enumerate(qs):
            idx = (len(a) - 1) * q
            lo, hi = int(np.floor(idx)), int(np.ceil(idx))
            frac = idx - lo
            expect = a[lo] * (1 - frac) + a[hi] * frac
            assert out["value"].values[i] == expect, (name, q)
            assert out["n"].values[i] == len(a)


def test_exact_quantiles_is_exact_twin_of_sketch(ray_session):
    """The exact operator and the MRL sketch share the (q, value, n)
    schema, and the sketch's answer stays within its pinned rank error
    of the exact one on the same input."""
    import pyarrow as pa
    import ray.data

    from geojson_vt_ray.ray_pipeline.sketch import (
        exact_quantiles_global,
        quantile_sketch_column,
    )

    rng = np.random.default_rng(11)
    v = rng.lognormal(0, 2, 100_000)
    ds = ray.data.from_arrow(pa.table({"value": pa.array(v, pa.float64())}))
    qs = [0.1, 0.5, 0.9]
    exact = exact_quantiles_global(ds, "value", qs, n_bins=256).to_pandas()
    approx = quantile_sketch_column(ds, "value", qs, k=256).to_pandas()
    assert list(exact.columns) == list(approx.columns)
    a = np.sort(v)
    for i, q in enumerate(qs):
        # rank error of the sketch answer vs the exact answer's rank
        r_approx = np.searchsorted(a, approx["value"].values[i]) / len(a)
        assert abs(r_approx - q) < 0.01, q
        r_exact = np.searchsorted(a, exact["value"].values[i]) / len(a)
        assert abs(r_exact - q) < 1e-4, q
