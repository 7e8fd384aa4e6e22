"""End-to-end dedup-chain scale witness: MinHash-LSH candidates → exact
Jaccard verification → connected components → labeled clusters, per-stage
wall times over a synthetic near-duplicate corpus.

This is the 100 TB workload shape run end-to-end on the bounded-dispatch
path (BASELINE.md "Per-group dispatch re-audit"): every stage's shuffle
groups on a hashed bounded partition key, never on a raw data-cardinality
key, so per-stage cost is O(rows / partitions) work per task plus the
shuffle itself — no stage pays a Python dispatch per distinct
bucket/pair/doc.

Corpus: N docs of 12 tokens; each even doc has one near-duplicate twin
(one token changed → Jaccard 11/13 ≈ 0.846 over 3-shingles ≥ 0.7), and
every doc id is cluster-labeled (singletons included). Expected invariants
printed alongside: verified pairs == N/2 twins, cluster count == N/2.

Usage: RAY_GRAFT_CPUS=32 python tools/dedup_chain_bench.py [N_docs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["PYTHONPATH"] = (
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    + os.pathsep
    + os.environ.get("PYTHONPATH", "")
)  # Ray workers import the package too

import numpy as np
import pyarrow as pa


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    import ray.data
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from geojson_vt_ray.ray_pipeline.graph import connected_components, labeled_clusters
    from geojson_vt_ray.ray_pipeline.text import (
        minhash_candidate_pairs,
        verify_jaccard_distributed,
    )

    def gen(batch) -> pa.Table:
        i = batch["id"]
        texts = []
        for v in i:
            base = v // 2
            toks = [f"tok{base * 7 + j}" for j in range(12)]
            if v % 2:
                toks[11] = f"alt{base}"
            texts.append(" ".join(toks))
        return pa.table(
            {"doc_id": pa.array(i, pa.int64()), "text": pa.array(texts, pa.string())}
        )

    docs = (
        ray.data.range(n_docs, override_num_blocks=max(64, num_cpus * 4))
        .map_batches(gen, batch_format="numpy")
        .materialize()
    )

    timings: dict[str, float] = {}

    def timed(name: str, fn):
        t0 = time.time()
        out = fn()
        timings[name] = round(time.time() - t0, 2)
        return out

    cands = timed(
        "minhash_candidates", lambda: minhash_candidate_pairs(docs).materialize()
    )
    n_cands = cands.count()

    verified = timed(
        "verify_jaccard",
        lambda: verify_jaccard_distributed(docs, cands, threshold=0.7).materialize(),
    )
    n_verified = verified.count()

    # Partition count is FIXED, not tied to num_cpus (the same rule as the
    # pyramid bench's drill_partitions): scaling legs must run identical
    # logical plans. A standalone probe showed 64 vs 128 buckets within
    # noise at this scale (18-23 s either way at 32 CPUs), so the bucket
    # count is chosen for data size, and leg-to-leg CC differences beyond
    # that are host/context noise, not plan differences.
    cc_buckets = 128
    cc_stats: dict = {}
    clusters = timed(
        "connected_components",
        lambda: labeled_clusters(
            connected_components(
                verified,
                "doc_a",
                "doc_b",
                nodes=docs.select_columns(["doc_id"]),
                node_col="doc_id",
                n_buckets=cc_buckets,
                stats_out=cc_stats,
            ),
            id_col="doc_id",
            n_buckets=cc_buckets,
        ).materialize(),
    )
    n_labeled = clusters.count()
    n_clusters = clusters.filter(
        lambda r: r["doc_id"] == r["cluster_id"]
    ).count()

    total = round(sum(timings.values()), 2)
    print(
        json.dumps(
            {
                "metric": "dedup chain (minhash -> verify -> components)",
                "value": total,
                "unit": "sec",
                "n_docs": n_docs,
                "num_cpus": num_cpus,
                "stages": timings,
                "candidate_pairs": n_cands,
                "verified_pairs": n_verified,
                "expected_pairs": n_docs // 2,
                "labeled_docs": n_labeled,
                "clusters": n_clusters,
                "expected_clusters": n_docs // 2,
                "cc_star_rounds": cc_stats.get("rounds"),
                "cc_converged": cc_stats.get("converged"),
                "docs_per_sec": round(n_docs / total, 1),
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
