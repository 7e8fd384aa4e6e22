"""Distributed connected components over a pair/edge Dataset.

The near-duplicate detectors (exact-hash groups, MinHash-LSH, SimHash
banding, embedding-cosine) all emit *pairs*; a dedup pipeline needs
*clusters* — one representative per connected component of the pair graph.
This module computes components with alternating **large-star /
small-star** contraction (Kiveris, Lattanzi, Mirrokni, Rastogi, Vassilvitskii:
"Connected Components in MapReduce and Beyond", SoCC 2014): each round
re-points edges at per-neighborhood minima until the edge set is a star
forest rooted at every component's minimum id.

Why not hash-to-min (Rastogi et al., ICDE 2013), which earlier revisions
used?  Hash-to-min also needs only O(log d) rounds, but its intermediate
label-set state is **quadratic on high-diameter graphs**: on a path of
2^16 nodes the deduped pair multiset peaks at ~0.6·n² ≈ 2.7e9 pairs
(measured — it filled a 90 GB object-store spill disk).  Large-star /
small-star emits at most one edge per input edge plus one per touched
node, so the per-round state is provably O(V + E): the same 2^16-node
path peaks at ~8.4e5 edges (3200x less), and `tests/test_graph.py`
pins both the logarithmic round count and the exact labels on
adversarial path graphs.

Ray-Data-native shape: one round = ONE ``groupby(bucket).map_groups``
shuffle over edge rows where ``bucket = mix(group_key) % P`` — every
round is P vectorized numpy calls (sort + reduceat-style segment mins +
repeat), never a Python call per node or per edge.  Large-star groups
the symmetric arcs by either endpoint; small-star groups canonical
(min, max) edges by the larger endpoint.  The graph never sits on the
driver; convergence is detected from a multiset hash of the deduped
edge state (count + two independent 64-bit mixed sums) carried on
sentinel rows that ride the round's own shuffle.  The alternation is
deterministic, so an unchanged same-op state is a true fixpoint.

Scale notes (100 TB): shuffled volume per round is O(V + E) int64 edge
rows — documents/embeddings never enter the graph stage.  Rounds are
O(log n) in practice (measured: path graphs of 2^10/2^13/2^16 nodes
converge in 23/29/35 star-rounds ≈ 2·log2(n) + 3).  A giant component
does concentrate its star center's neighborhood into one group near
convergence (O(component) int64 in one task) — inherent to every
min-labelling algorithm's final star; dedup components are tiny, and
even a 10^9-node star is ~8 GB in a single 64-bit column, spillable.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

_MIX = np.uint64(0x9E3779B97F4A7C15)  # splitmix64 / golden-ratio odd constant


def _edge_table(a: np.ndarray, b: np.ndarray, n_buckets: int) -> pa.Table:
    """Canonical (lo, hi) edge rows, bucketed by the large-star group key
    convention (both directions are re-derived by the next remap)."""
    a = a.astype(np.int64)
    b = b.astype(np.int64)
    lo = np.minimum(a, b)
    hi = np.maximum(a, b)
    bucket = ((lo.astype(np.uint64) * _MIX) % np.uint64(n_buckets)).astype(np.int32)
    return pa.table(
        {"bucket": pa.array(bucket), "node": pa.array(lo), "label": pa.array(hi)}
    )


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — decorrelates the multiset-hash sums."""
    x = (x + _MIX).astype(np.uint64)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _dedup_sorted(a: np.ndarray, b: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Lexsort by (a, b) and drop duplicate rows."""
    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    keep = np.concatenate(([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])))
    return a[keep], b[keep]


def _sig_rows(a: np.ndarray, b: np.ndarray) -> pa.Table:
    """Three sentinel rows (bucket −1/−2/−3) carrying this group's
    (count, h1, h2) multiset-hash partials of its DEDUPED input — the
    convergence signature rides the round's own shuffle instead of
    paying a second full groupby per round (top 32 bits per component:
    sums of up to 2^31 rows stay inside int64; two independent 32-bit
    mixes keep collision odds ~2^-64)."""
    h = _mix64(a.astype(np.uint64) * np.uint64(0x100000001B3) + _mix64(b.astype(np.uint64)))
    sig_vals = np.array(
        [
            len(a),
            int((h >> np.uint64(32)).astype(np.int64).sum()),
            int((_mix64(h) >> np.uint64(32)).astype(np.int64).sum()),
        ],
        dtype=np.int64,
    )
    return pa.table(
        {
            "bucket": pa.array(np.array([-1, -2, -3], dtype=np.int32)),
            "node": pa.array(sig_vals),
            "label": pa.array(np.zeros(3, dtype=np.int64)),
        }
    )


def _answer_rows(nodes: np.ndarray, mins: np.ndarray) -> pa.Table:
    """Bucket −4 rows: this group's per-node neighborhood minima.  At the
    detected fixpoint (a star forest) these ARE the final component
    labels, so the finalize step becomes a map-only filter of the last
    materialized round instead of one more full O(V+E) sort-shuffle."""
    return pa.table(
        {
            "bucket": pa.array(np.full(len(nodes), -4, dtype=np.int32)),
            "node": pa.array(nodes.astype(np.int64)),
            "label": pa.array(mins.astype(np.int64)),
        }
    )


def connected_components(
    edges: "ray.data.Dataset",
    col_a: str = "doc_a",
    col_b: str = "doc_b",
    nodes: "ray.data.Dataset | None" = None,
    node_col: str = "doc_id",
    n_buckets: int = 64,
    max_rounds: int = 80,
    stats_out: "dict | None" = None,
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
        max_rounds: safety bound on star-rounds; the large-star/small-star
            alternation needs ~2·log2(n) of them even on adversarial
            diameters.
        stats_out: optional dict — filled with ``{"rounds": r, "converged":
            bool}`` so callers/tests can pin the logarithmic-round claim
            (measured: path graphs of 2^10/2^13/2^16 nodes converge in
            23/29/35 star-rounds ≈ 2·log2(n) + 3, `tests/test_graph.py`).

    Returns:
        Dataset with columns ``node`` (int64) and ``component`` (int64, the
        min node id of the node's component).
    """

    def seed_edges(batch: pa.Table) -> pa.Table:
        a = batch.column(col_a).to_numpy().astype(np.int64)
        b = batch.column(col_b).to_numpy().astype(np.int64)
        return _edge_table(a, b, n_buckets)

    state = edges.map_batches(seed_edges, batch_format="pyarrow")
    if nodes is not None:

        def seed_nodes(batch: pa.Table) -> pa.Table:
            n = batch.column(node_col).to_numpy().astype(np.int64)
            return _edge_table(n, n, n_buckets)  # self loops keep singletons alive

        state = state.union(nodes.map_batches(seed_nodes, batch_format="pyarrow"))

    def remap_large(batch: pa.Table) -> pa.Table:
        """Canonical edges → symmetric arcs bucketed by FIRST endpoint
        (large-star's group key), dropping the previous round's
        sentinels."""
        bcol = batch.column("bucket").to_numpy()
        sel = batch.filter(pa.array(bcol >= 0))
        lo = sel.column("node").to_numpy()
        hi = sel.column("label").to_numpy()
        v = np.concatenate([lo, hi])
        u = np.concatenate([hi, lo])
        bucket = ((v.astype(np.uint64) * _MIX) % np.uint64(n_buckets)).astype(np.int32)
        return pa.table(
            {"bucket": pa.array(bucket), "node": pa.array(v), "label": pa.array(u)}
        )

    def remap_small(batch: pa.Table) -> pa.Table:
        """Canonical edges → (hi, lo) arcs bucketed by the LARGER endpoint
        (small-star's group key), dropping sentinels."""
        bcol = batch.column("bucket").to_numpy()
        sel = batch.filter(pa.array(bcol >= 0))
        lo = sel.column("node").to_numpy()
        hi = sel.column("label").to_numpy()
        bucket = ((hi.astype(np.uint64) * _MIX) % np.uint64(n_buckets)).astype(np.int32)
        return pa.table(
            {"bucket": pa.array(bucket), "node": pa.array(hi), "label": pa.array(lo)}
        )

    def large_fn(group: pa.Table) -> pa.Table:
        """One large-star over one bucket, fully vectorized: for each
        node v with neighbors Γ(v) and m = min(Γ(v) ∪ {v}), emit the
        canonical edges (u, m) for every u ∈ Γ(v) with u > v, plus the
        current star edge (v, m) — the extra (v, m) keeps every node
        (including roots and singleton self-loops) alive in the state,
        at ≤ one edge per node per round.  Output size ≤ |E| + |V|.
        Bucket = mix(v) % P, so every copy of an arc (v, u) lands in one
        bucket and the per-group dedup IS a global dedup."""
        if group.num_rows == 0:
            return _edge_table(np.empty(0, np.int64), np.empty(0, np.int64), n_buckets)
        v, u = _dedup_sorted(
            group.column("node").to_numpy(), group.column("label").to_numpy()
        )
        sig = _sig_rows(v, u)
        starts = np.nonzero(np.concatenate(([True], v[1:] != v[:-1])))[0]
        counts = np.diff(np.append(starts, len(v)))
        uniq_v = v[starts]
        m = np.minimum(u[starts], uniq_v)  # u sorted within segment: first is min
        rep_m = np.repeat(m, counts)
        rep_v = np.repeat(uniq_v, counts)
        big = u > rep_v
        ea = np.concatenate([u[big], uniq_v])
        eb = np.concatenate([rep_m[big], m])
        ea, eb = _dedup_sorted(np.minimum(ea, eb), np.maximum(ea, eb))
        return pa.concat_tables(
            [_edge_table(ea, eb, n_buckets), sig, _answer_rows(uniq_v, m)]
        )

    def small_fn(group: pa.Table) -> pa.Table:
        """One small-star over one bucket: for each node v with
        smaller-or-equal neighbors Γ≤(v) and m = min(Γ≤(v) ∪ {v}), emit
        (u, m) for every u ∈ Γ≤(v) ∪ {v} with u ≠ m, plus the root
        self-loop (m, m) so roots survive rounds where no child names
        them.  Output size ≤ |E| + |V|.  Bucket = mix(hi) % P: all
        copies of a canonical edge share a group, so dedup is global."""
        if group.num_rows == 0:
            return _edge_table(np.empty(0, np.int64), np.empty(0, np.int64), n_buckets)
        v, u = _dedup_sorted(
            group.column("node").to_numpy(), group.column("label").to_numpy()
        )
        sig = _sig_rows(v, u)
        starts = np.nonzero(np.concatenate(([True], v[1:] != v[:-1])))[0]
        counts = np.diff(np.append(starts, len(v)))
        uniq_v = v[starts]
        m = u[starts]  # u ≤ v everywhere in small-star arcs; first is min
        rep_m = np.repeat(m, counts)
        ea = np.concatenate([u, uniq_v])
        eb = np.concatenate([rep_m, m])
        keep = ea != eb
        ea = np.concatenate([ea[keep], m])
        eb = np.concatenate([eb[keep], m])
        ea, eb = _dedup_sorted(np.minimum(ea, eb), np.maximum(ea, eb))
        return pa.concat_tables(
            [_edge_table(ea, eb, n_buckets), sig, _answer_rows(uniq_v, m)]
        )

    def extract_sig(ds: "ray.data.Dataset") -> tuple:
        """Order-independent multiset hash of the round's DEDUPED INPUT,
        summed from the sentinel partial rows — two cheap passes over
        already-materialized blocks, no extra shuffle."""

        def partial(batch: pa.Table) -> pa.Table:
            b = batch.column("bucket").to_numpy()
            s = batch.column("node").to_numpy()
            return pa.table(
                {
                    "n": pa.array([int(s[b == -1].sum())], pa.int64()),
                    "h1": pa.array([int(s[b == -2].sum())], pa.int64()),
                    "h2": pa.array([int(s[b == -3].sum())], pa.int64()),
                }
            )

        agg = ds.map_batches(partial, batch_format="pyarrow").aggregate(
            ray.data.aggregate.Sum("n"),
            ray.data.aggregate.Sum("h1"),
            ray.data.aggregate.Sum("h2"),
        )
        return (agg["sum(n)"], agg["sum(h1)"], agg["sum(h2)"])

    # convergence: the signature produced by star-round r hashes round r's
    # deduped input == round r-1's output.  Equality of the signatures of
    # two consecutive SAME-OP rounds (r and r-2) witnesses that one full
    # large∘small alternation mapped the state to itself — a true
    # fixpoint of the deterministic alternation, i.e. a star forest (the
    # only states both ops fix).  Two star-rounds run past the fixpoint,
    # in exchange for zero extra shuffles for convergence detection.
    sig_hist: list[tuple] = []
    converged = False
    out = None
    rounds = 0
    for r in range(max_rounds):
        # pin the remapped rows before the round's sort barrier — the sort
        # re-executes a lazy input (sampling + exchange), doubling the remap
        # pass per round (see text.verify_jaccard_distributed's barrier note)
        if r % 2 == 0:
            staged = state.map_batches(
                remap_large, batch_format="pyarrow"
            ).materialize()
            out = staged.groupby("bucket").map_groups(
                large_fn, batch_format="pyarrow"
            ).materialize()
        else:
            staged = state.map_batches(
                remap_small, batch_format="pyarrow"
            ).materialize()
            out = staged.groupby("bucket").map_groups(
                small_fn, batch_format="pyarrow"
            ).materialize()
        rounds += 1
        sig = extract_sig(out)
        state = out
        if len(sig_hist) >= 2 and sig == sig_hist[-2]:
            converged = True
            break
        sig_hist.append(sig)
    if stats_out is not None:
        stats_out["rounds"] = rounds
        stats_out["converged"] = converged

    if converged:
        # At the fixpoint every group's per-node minimum IS the component
        # min, and the last round already reduced them into the bucket −4
        # rows — every node exactly once (the group key hashes all of a
        # node's rows into one bucket).  Map-only filter; no finalize
        # shuffle.
        def take_answer(batch: pa.Table) -> pa.Table:
            b = batch.column("bucket").to_numpy()
            sel = batch.filter(pa.array(b == -4))
            return pa.table(
                {"node": sel.column("node"), "component": sel.column("label")}
            )

        return out.map_batches(take_answer, batch_format="pyarrow")

    # max_rounds exhausted without a detected fixpoint: reduce the last
    # round's OUTPUT per node over symmetric arcs (one more shuffle),
    # preserving best-effort behavior.
    def finalize(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table(
                {"node": pa.array([], pa.int64()), "component": pa.array([], pa.int64())}
            )
        node, label = _dedup_sorted(
            group.column("node").to_numpy(), group.column("label").to_numpy()
        )
        starts = np.nonzero(np.concatenate(([True], node[1:] != node[:-1])))[0]
        return pa.table(
            {
                "node": pa.array(node[starts].astype(np.int64)),
                "component": pa.array(
                    np.minimum(label[starts], node[starts]).astype(np.int64)
                ),
            }
        )

    # pin the finalize output: every consumer (labeled_clusters' cbucket
    # groupby, cluster-size joins) adds another sort barrier, and Ray's
    # sort-based groupby re-executes an un-materialized input pipeline
    # (see text.verify_jaccard_distributed's barrier note). O(V) rows.
    return (
        state.map_batches(remap_large, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(finalize, batch_format="pyarrow")
        .materialize()
    )


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
