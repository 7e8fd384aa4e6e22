"""Distributed connected components over a pair/edge Dataset.

The near-duplicate detectors (exact-hash groups, MinHash-LSH, SimHash
banding, embedding-cosine) all emit *pairs*; a dedup pipeline needs
*clusters* — one representative per connected component of the pair graph.
This module computes components with the "hash-to-min" algorithm
(Rastogi, Machanavajjhala, Chitnis, Das Sarma: "Finding Connected
Components in Map-Reduce in Logarithmic Rounds", ICDE 2013): each node's
label set contracts toward the component-minimum id in O(log d) rounds.

Ray-Data-native shape: one round = ONE ``groupby(bucket).map_groups``
shuffle over (node, label) pairs where ``bucket = mix(node) % P`` — every
round is P vectorized numpy calls (sort + reduceat + repeat), never a
Python call per node or per edge.  The graph never sits on the driver;
convergence is detected from a multiset hash of the full label state
(count + three independent 64-bit mixed sums), computed as Dataset
aggregates.  The iteration is deterministic, so an unchanged state is a
true fixpoint.

Scale notes (100 TB): shuffled volume per round is O(E) pairs of int64 —
documents/embeddings never enter the graph stage.  Rounds are
O(log(max component diameter)); dedup graphs are overwhelmingly tiny
cliques plus short chains, so 3-6 rounds in practice.  A monster
component costs extra *rounds*, never extra memory per task, because a
task only ever sees one bucket's direct-neighbor pairs.  The per-round
``materialize()`` pins O(E) int64 pairs in the object store.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

_MIX = np.uint64(0x9E3779B97F4A7C15)  # splitmix64 / golden-ratio odd constant


def _pair_table(node: np.ndarray, label: np.ndarray, n_buckets: int) -> pa.Table:
    node = node.astype(np.int64)
    bucket = ((node.astype(np.uint64) * _MIX) % np.uint64(n_buckets)).astype(np.int32)
    return pa.table(
        {
            "bucket": pa.array(bucket),
            "node": pa.array(node),
            "label": pa.array(label.astype(np.int64)),
        }
    )


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — decorrelates the multiset-hash sums."""
    x = (x + _MIX).astype(np.uint64)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def connected_components(
    edges: "ray.data.Dataset",
    col_a: str = "doc_a",
    col_b: str = "doc_b",
    nodes: "ray.data.Dataset | None" = None,
    node_col: str = "doc_id",
    n_buckets: int = 64,
    max_rounds: int = 50,
) -> "ray.data.Dataset":
    """Label every node with the minimum node id of its connected component.

    Args:
        edges: Dataset with two int-id columns (``col_a``, ``col_b``); treated
            as an undirected graph.
        nodes: optional Dataset of all node ids (``node_col``) — include it to
            get singleton components for nodes with no edges (a dedup
            pipeline wants every document labeled, not just the duplicated
            ones).
        n_buckets: shuffle fan-out per round; size to ~2-4x cluster cores.
        max_rounds: safety bound; hash-to-min needs O(log d) rounds.

    Returns:
        Dataset with columns ``node`` (int64) and ``component`` (int64, the
        min node id of the node's component).
    """

    def seed_edges(batch: pa.Table) -> pa.Table:
        a = batch.column(col_a).to_numpy().astype(np.int64)
        b = batch.column(col_b).to_numpy().astype(np.int64)
        # symmetric closure + self-loops so every touched node is present
        return _pair_table(
            np.concatenate([a, b, a]), np.concatenate([b, a, a]), n_buckets
        )

    pairs = edges.map_batches(seed_edges, batch_format="pyarrow")
    if nodes is not None:

        def seed_nodes(batch: pa.Table) -> pa.Table:
            n = batch.column(node_col).to_numpy().astype(np.int64)
            return _pair_table(n, n, n_buckets)

        pairs = pairs.union(nodes.map_batches(seed_nodes, batch_format="pyarrow"))

    def round_fn(group: pa.Table) -> pa.Table:
        """One hash-to-min round over one bucket, fully vectorized.

        For each node in the bucket with (deduped) label set C and
        m = min(C): emit (node, m), (l, m) for every l in C, and (m, l)
        for every l in C — neighbors learn the min, the min learns the
        neighborhood, which is what contracts chains logarithmically.

        Also emits THREE sentinel rows (bucket −1/−2/−3) carrying this
        bucket's (count, h1, h2) multiset-hash partials of the DEDUPED
        INPUT — the convergence signature rides the round's own shuffle
        instead of paying a second full groupby per round (the former
        `state_sig` dataset pass; see BASELINE.md dispatch audit) — and
        the bucket's per-node minima (uniq_nodes, mins) tagged bucket −4:
        at the detected fixpoint those rows ARE the final answer, so the
        finalize step becomes a map-only filter of the last materialized
        round instead of one more full O(V+E) sort-shuffle.

        The pair output is locally deduped before emit (one lexsort over
        ~3x the bucket's rows): hash-to-min's emission rules produce
        heavy duplication near convergence, and dropping it here shrinks
        every round's shuffle instead of paying the dedup only on the
        receive side of the next round.
        """
        if group.num_rows == 0:
            return _pair_table(np.empty(0, np.int64), np.empty(0, np.int64), n_buckets)
        node = group.column("node").to_numpy()
        label = group.column("label").to_numpy()
        order = np.lexsort((label, node))
        node, label = node[order], label[order]
        keep = np.concatenate(
            ([True], (node[1:] != node[:-1]) | (label[1:] != label[:-1]))
        )
        node, label = node[keep], label[keep]
        # signature partials of the deduped input state (top 32 bits per
        # component: sums of up to 2^31 rows stay inside int64; two
        # independent 32-bit mixes keep collision odds ~2^-64)
        h = _mix64(
            node.astype(np.uint64) * np.uint64(0x100000001B3)
            + _mix64(label.astype(np.uint64))
        )
        sig_vals = np.array(
            [
                len(node),
                int((h >> np.uint64(32)).astype(np.int64).sum()),
                int((_mix64(h) >> np.uint64(32)).astype(np.int64).sum()),
            ],
            dtype=np.int64,
        )
        starts = np.nonzero(np.concatenate(([True], node[1:] != node[:-1])))[0]
        counts = np.diff(np.append(starts, len(node)))
        uniq_nodes = node[starts]
        mins = label[starts]  # sorted by (node, label): first label is the min
        rep_min = np.repeat(mins, counts)
        out_node = np.concatenate([uniq_nodes, label, rep_min])
        out_label = np.concatenate([mins, rep_min, label])
        order2 = np.lexsort((out_label, out_node))
        out_node, out_label = out_node[order2], out_label[order2]
        keep2 = np.concatenate(
            ([True], (out_node[1:] != out_node[:-1]) | (out_label[1:] != out_label[:-1]))
        )
        out = _pair_table(out_node[keep2], out_label[keep2], n_buckets)
        sent = pa.table(
            {
                "bucket": pa.array(np.array([-1, -2, -3], dtype=np.int32)),
                "node": pa.array(sig_vals),
                "label": pa.array(np.zeros(3, dtype=np.int64)),
            }
        )
        answer = pa.table(
            {
                "bucket": pa.array(np.full(len(uniq_nodes), -4, dtype=np.int32)),
                "node": pa.array(uniq_nodes.astype(np.int64)),
                "label": pa.array(mins.astype(np.int64)),
            }
        )
        return pa.concat_tables([out, sent, answer])

    def extract_sig(ds: "ray.data.Dataset") -> tuple:
        """Order-independent multiset hash of the round's DEDUPED INPUT,
        summed from the sentinel partial rows `round_fn` emitted — two
        cheap passes over already-materialized blocks, no extra shuffle.
        Dedup correctness: bucket = mix(node) % P, so every copy of a
        (node, label) pair lives in one bucket and the per-bucket dedup
        inside round_fn IS a global dedup."""

        def partial(batch: pa.Table) -> pa.Table:
            b = batch.column("bucket").to_numpy()
            v = batch.column("node").to_numpy()
            return pa.table(
                {
                    "n": pa.array([int(v[b == -1].sum())], pa.int64()),
                    "h1": pa.array([int(v[b == -2].sum())], pa.int64()),
                    "h2": pa.array([int(v[b == -3].sum())], pa.int64()),
                }
            )

        agg = ds.map_batches(partial, batch_format="pyarrow").aggregate(
            ray.data.aggregate.Sum("n"),
            ray.data.aggregate.Sum("h1"),
            ray.data.aggregate.Sum("h2"),
        )
        return (agg["sum(n)"], agg["sum(h1)"], agg["sum(h2)"])

    def drop_sentinels(batch: pa.Table) -> pa.Table:
        b = batch.column("bucket").to_numpy()
        return batch.filter(pa.array(b >= 0))

    # convergence: the signature produced by round r hashes round r's
    # input == round r-1's output, so equality of consecutive signatures
    # witnesses output_{r-1} == output_{r-2} (a true fixpoint — the
    # iteration is deterministic). One round runs past the fixpoint, in
    # exchange for halving the shuffles per round vs a separate
    # state-signature groupby.
    prev_sig = None
    converged = False
    out = None
    for _ in range(max_rounds):
        out = (
            pairs.groupby("bucket")
            .map_groups(round_fn, batch_format="pyarrow")
            .materialize()
        )
        sig = extract_sig(out)
        pairs = out.map_batches(drop_sentinels, batch_format="pyarrow")
        if sig == prev_sig:
            converged = True
            break
        prev_sig = sig

    if converged:
        # The detected fixpoint state IS the final round's deduped input,
        # and round_fn already reduced it per node into the bucket −4
        # rows — every node exactly once (bucket = mix(node) % P puts all
        # of a node's rows in one bucket), labeled with its component
        # min. Map-only filter; no finalize shuffle.
        def take_answer(batch: pa.Table) -> pa.Table:
            b = batch.column("bucket").to_numpy()
            sel = batch.filter(pa.array(b == -4))
            return pa.table(
                {"node": sel.column("node"), "component": sel.column("label")}
            )

        return out.map_batches(take_answer, batch_format="pyarrow")

    # max_rounds exhausted without a detected fixpoint: reduce the last
    # round's OUTPUT per node (one more shuffle), preserving the prior
    # best-effort behavior.
    def finalize(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table(
                {"node": pa.array([], pa.int64()), "component": pa.array([], pa.int64())}
            )
        node = group.column("node").to_numpy()
        label = group.column("label").to_numpy()
        order = np.lexsort((label, node))
        node, label = node[order], label[order]
        starts = np.nonzero(np.concatenate(([True], node[1:] != node[:-1])))[0]
        return pa.table(
            {
                "node": pa.array(node[starts].astype(np.int64)),
                "component": pa.array(label[starts].astype(np.int64)),
            }
        )

    return pairs.groupby("bucket").map_groups(finalize, batch_format="pyarrow")


def labeled_clusters(
    cc: "ray.data.Dataset", id_col: str = "doc_id", n_buckets: int = 64
) -> "ray.data.Dataset":
    """Attach component sizes to `connected_components` output: one row per
    node with (id_col, cluster_id, cluster_size). One bucketed groupby over
    (node, component) int64 pairs — the shared tail of every dedup-cluster
    pipeline (SimHash text clusters, embedding-cosine clusters)."""

    def with_bucket(batch: pa.Table) -> pa.Table:
        comp = batch.column("component").to_numpy().astype(np.uint64)
        b = ((comp * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(n_buckets)).astype(
            np.int32
        )
        return batch.append_column("cbucket", pa.array(b))

    def attach_size(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "cluster_id": pa.array([], pa.int64()),
                    "cluster_size": pa.array([], pa.int64()),
                }
            )
        node = group.column("node").to_numpy()
        comp = group.column("component").to_numpy()
        order = np.argsort(comp, kind="stable")
        node, comp = node[order], comp[order]
        starts = np.nonzero(np.concatenate(([True], comp[1:] != comp[:-1])))[0]
        counts = np.diff(np.append(starts, len(comp)))
        return pa.table(
            {
                id_col: pa.array(node.astype(np.int64)),
                "cluster_id": pa.array(comp.astype(np.int64)),
                "cluster_size": pa.array(np.repeat(counts, counts).astype(np.int64)),
            }
        )

    return (
        cc.map_batches(with_bucket, batch_format="pyarrow")
        .groupby("cbucket")
        .map_groups(attach_size, batch_format="pyarrow")
    )
