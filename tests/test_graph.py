"""Distributed connected components vs an exact union-find reference."""

import numpy as np
import pyarrow as pa


def _union_find_components(n, a, b):
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in zip(a, b):
        parent[find(int(x))] = find(int(y))
    comp = {}
    for i in range(n):
        comp.setdefault(find(i), []).append(i)
    return {i: min(comp[find(i)]) for i in range(n)}


def _run_cc(n, a, b, **kwargs):
    import ray.data

    from geojson_vt_ray.ray_pipeline.graph import connected_components

    edges = ray.data.from_arrow(
        pa.table({"doc_a": pa.array(a, pa.int64()), "doc_b": pa.array(b, pa.int64())})
    )
    nodes = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(np.arange(n), pa.int64())})
    )
    out = connected_components(edges, nodes=nodes, **kwargs).to_pandas()
    return out.set_index("node")["component"].to_dict()


def test_cc_random_graph(ray_session):
    rs = np.random.RandomState(3)
    n = 400
    a = rs.randint(0, n, 250)
    b = rs.randint(0, n, 250)
    assert _run_cc(n, a, b) == _union_find_components(n, a, b)


def test_cc_long_chain_needs_log_rounds(ray_session):
    """A single path graph is the worst case for label propagation — it
    exercises the logarithmic chain contraction, not just one-hop spread."""
    n = 128
    a = np.arange(n - 1)
    b = np.arange(1, n)
    got = _run_cc(n, a, b, n_buckets=8)
    assert got == {i: 0 for i in range(n)}


def test_cc_singletons_and_self_loops(ray_session):
    n = 10
    a = np.array([2, 5, 5])
    b = np.array([2, 6, 6])  # self-loop + duplicate edge
    got = _run_cc(n, a, b)
    expected = {i: i for i in range(n)}
    expected[6] = 5
    assert got == expected


def test_simhash_dedup_clusters_consistent_with_pairs(ray_session):
    """Cluster labels must be exactly the connected components of the pair
    set, singletons included, with correct sizes."""
    import ray.data

    from geojson_vt_ray.ray_pipeline.text import (
        simhash_dedup_clusters,
        simhash_near_dup_pairs,
    )

    rs = np.random.RandomState(5)
    words = [f"w{i}" for i in range(50)]
    texts = []
    for i in range(25):
        base = " ".join(rs.choice(words, 150))
        texts.append(base)
        if i % 3 == 0:
            texts.append(base)  # exact duplicate
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    pairs = [
        (int(r["doc_a"]), int(r["doc_b"]))
        for r in simhash_near_dup_pairs(docs, max_hamming=3).iter_rows()
    ]
    n = len(texts)
    expected = _union_find_components(
        n, [p[0] for p in pairs], [p[1] for p in pairs]
    )
    out = simhash_dedup_clusters(docs, max_hamming=3).to_pandas()
    assert len(out) == n
    got = out.set_index("doc_id")["cluster_id"].to_dict()
    assert got == expected
    sizes = out.groupby("cluster_id")["doc_id"].count().to_dict()
    for _, row in out.iterrows():
        assert row["cluster_size"] == sizes[row["cluster_id"]]
    assert any(s > 1 for s in sizes.values())


def test_star_contraction_logarithmic_rounds_on_paths(ray_session):
    """Pin the O(log n) round claim AND the bounded-state property
    (round-5 task 5): adversarial path graphs (diameter = n-1, the worst
    case for min-label contraction) must converge in <= 2·log2(n) + 8
    star-rounds with EXACT labels (every node of a 0-1-2-...-n-1 path
    labels to 0).  This test is what exposed hash-to-min's ~0.6·n²
    intermediate pair blow-up (2^16 path → 2.7e9 pairs → object-store
    spill filled the disk) and motivated the switch to large/small-star,
    whose per-round state is O(V+E) — see graph.py's module docstring."""
    import math

    import numpy as np
    import pyarrow as pa
    import ray.data

    from geojson_vt_ray.ray_pipeline.graph import connected_components

    measured = {}
    for p in (10, 13, 16):
        n = 1 << p
        a = np.arange(n - 1, dtype=np.int64)
        edges = ray.data.from_arrow(
            pa.table({"doc_a": pa.array(a), "doc_b": pa.array(a + 1)})
        )
        stats: dict = {}
        out = connected_components(
            edges, n_buckets=16, max_rounds=64, stats_out=stats
        ).materialize()
        assert stats["converged"], (p, stats)
        bound = 2 * int(math.log2(n)) + 8
        assert stats["rounds"] <= bound, (p, stats["rounds"], bound)
        measured[p] = stats["rounds"]
        # exact labels: one component, min id 0
        t = pa.concat_tables(ray.get(out.to_arrow_refs()))
        assert t.num_rows == n
        comp = t.column("component").to_numpy()
        assert (comp == 0).all()
    # logarithmic growth, not linear: growing the diameter 64x may add
    # only ~2·log2(64)=12 star-rounds
    assert measured[16] - measured[10] <= 16, measured
