"""Approximate/exact nearest-neighbor search over the embeddings table.

* Brute-force cosine top-k — the exactness baseline. Per batch the
  embedding block is matmul'd against the broadcast query matrix; partial
  top-k (with boundary-tie widening) per query; tiny per-query merge. For
  oracle comparability an in-order accumulation mode reproduces sequential
  float64 summation (matching DuckDB's list_dot_product evaluation order)
  instead of BLAS pairwise summation.
* LSH-bucketed variant — random-hyperplane signatures bucket the vectors; a
  query only scans its bucket (and optional neighboring buckets by Hamming
  distance ≤1): the 100 TB path, trading recall for a bounded scan.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


def _emb_matrix(batch: pa.Table) -> np.ndarray:
    col = batch.column("embedding")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    values = col.values.to_numpy(zero_copy_only=False).astype(np.float64)
    if pa.types.is_fixed_size_list(col.type):
        dim = col.type.list_size
    else:
        offsets = col.offsets.to_numpy()
        dim = offsets[1] - offsets[0]
    return values.reshape(len(col), dim)


def _cosine_inorder(embs: np.ndarray, queries: np.ndarray) -> np.ndarray:
    """Cosine similarities with strict left-to-right float64 accumulation over
    the dimension axis (bit-matching a sequential SQL implementation)."""
    n, d = embs.shape
    q = queries.shape[0]
    dot = np.zeros((q, n))
    nq = np.zeros(queries.shape[0])
    ne = np.zeros(n)
    for j in range(d):
        dot += queries[:, j : j + 1] * embs[None, :, j]
        nq += queries[:, j] * queries[:, j]
        ne += embs[:, j] * embs[:, j]
    return dot / np.sqrt(nq[:, None] * ne[None, :])


def brute_force_topk(
    embeddings: "ray.data.Dataset",
    query_vecs: np.ndarray,
    query_ids: np.ndarray,
    k: int,
    exclude_self: bool = True,
    inorder: bool = False,
) -> "ray.data.Dataset":
    """Exact cosine top-k of each query vector against the full table.

    Returns (query_id, neighbor_id, cos_sim) rows, k per query, ordered by
    (-cos_sim, neighbor_id) with deterministic tie handling.

    Default is the BLAS matmul path; ``inorder=True`` switches to strict
    sequential float64 accumulation (d× the memory traffic) and exists ONLY
    for bit-equality with the DuckDB oracle — production callers should
    never need it.
    """
    refs = ray.put((np.asarray(query_vecs, dtype=np.float64), np.asarray(query_ids)))

    def partial_fn(batch: pa.Table) -> pa.Table:
        # ray.get of a broadcast is zero-copy from the local plasma store;
        # a plain function keeps this on prewarmed task workers instead of
        # paying an actor-pool cold spawn for state that costs nothing to load
        q, qids = ray.get(refs)
        embs = _emb_matrix(batch)
        vec_ids = batch.column("vec_id").to_numpy()
        if inorder:
            sims = _cosine_inorder(embs, q)
        else:
            qn = q / np.linalg.norm(q, axis=1, keepdims=True)
            en = embs / np.linalg.norm(embs, axis=1, keepdims=True)
            sims = qn @ en.T
        kk = min(k + 1 if exclude_self else k, sims.shape[1])
        if kk < sims.shape[1]:
            part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            thresh = np.take_along_axis(sims, part, axis=1).min(axis=1)
            qi, pi = np.nonzero(sims >= thresh[:, None])  # widen boundary ties
        else:
            qi, pi = np.divmod(np.arange(sims.size), sims.shape[1])
        return pa.table(
            {
                "query_id": pa.array(qids[qi].astype(np.int64), pa.int64()),
                "neighbor_id": pa.array(vec_ids[pi].astype(np.int64), pa.int64()),
                "cos_sim": pa.array(sims[qi, pi], pa.float64()),
            }
        )

    partial = embeddings.map_batches(partial_fn, batch_format="pyarrow")
    return partial.groupby("query_id").map_groups(
        _topk_merge(k, exclude_self), batch_format="pyarrow"
    )


def _topk_merge(k: int, exclude_self: bool):
    """Typed Arrow per-query top-k merge: (-cos_sim, neighbor_id) order with
    deterministic ties; returns a correctly-typed empty table when the self
    filter drains the group (no schema-less blocks)."""
    import pyarrow.compute as pc

    def merge(g: pa.Table) -> pa.Table:
        if exclude_self:
            g = g.filter(pc.not_equal(g.column("neighbor_id"), g.column("query_id")[0]))
        idx = pc.sort_indices(
            g, sort_keys=[("cos_sim", "descending"), ("neighbor_id", "ascending")]
        )
        return g.take(idx[:k])

    return merge


_EMPTY_PAIRS = pa.table(
    {
        "vec_a": pa.array([], pa.int64()),
        "vec_b": pa.array([], pa.int64()),
        "cos_sim": pa.array([], pa.float64()),
    }
)


def embedding_near_dup_pairs(
    embeddings: "ray.data.Dataset",
    threshold: float,
    inorder: bool = True,
    n_blocks: int | None = None,
    block_rows: int = 8192,
) -> "ray.data.Dataset":
    """Embedding-cosine near-duplicate pairs: (vec_a < vec_b, cos_sim) with
    cos_sim >= threshold — EXACT, via a distributed grid self-join.

    Vectors hash into ``n_blocks`` blocks; each vector replicates once per
    block into grid cell (min(own, other), max(own, other)), and a
    ``groupby(grid cell)`` computes the block-pair similarity matrix inside
    the group. Nothing materializes on the driver and no task sees more than
    two blocks; replication cost is n·n_blocks rows. The O(n²) FLOPs are
    inherent to the exact contract — `lsh_topk`'s hyperplane bucketing is the
    approximate 100 TB path. ``inorder`` keeps the accumulation
    bit-compatible with the DuckDB oracle (sequential float64 over dims).

    ``n_blocks`` defaults to ceil(row_count / block_rows) (one cheap count —
    parquet metadata when the input is a read), so each grid group holds
    ~2·block_rows vectors and per-task memory stays flat as the dataset
    grows, instead of scaling with n/4 at a fixed block count. The pair set
    is invariant to the block count (every pair meets in exactly one cell).
    """
    if n_blocks is None:
        n_rows = embeddings.count()
        n_blocks = max(2, -(-int(n_rows) // block_rows))

    def replicate(batch: pa.Table) -> pa.Table:
        vec_ids = batch.column("vec_id").to_numpy()
        # bijective odd-constant mix → balanced, deterministic block id
        blk = (
            (vec_ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
            % np.uint64(n_blocks)
        ).astype(np.int64)
        n = len(vec_ids)
        others = np.tile(np.arange(n_blocks, dtype=np.int64), n)
        own = np.repeat(blk, n_blocks)
        lo = np.minimum(own, others)
        hi = np.maximum(own, others)
        idx = np.repeat(np.arange(n), n_blocks)
        emb = batch.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        return pa.table(
            {
                "gkey": pa.array(lo * n_blocks + hi),
                "blk": pa.array(own),
                "vec_id": pa.array(vec_ids[idx]),
                "embedding": emb.take(pa.array(idx)),
            }
        )

    def cell_pairs(group: pa.Table) -> pa.Table:
        gkey = int(group.column("gkey")[0].as_py())
        lo, hi = divmod(gkey, n_blocks)
        ids = group.column("vec_id").to_numpy()
        blk = group.column("blk").to_numpy()
        mat = _emb_matrix(group)

        def sims_of(a_mat, b_mat):
            if inorder:
                return _cosine_inorder(b_mat, a_mat)  # (len(a), len(b))
            an = a_mat / np.linalg.norm(a_mat, axis=1, keepdims=True)
            bn = b_mat / np.linalg.norm(b_mat, axis=1, keepdims=True)
            return an @ bn.T

        if lo == hi:
            sims = sims_of(mat, mat)
            ia, ib = np.triu_indices(len(ids), k=1)
            a_ids, b_ids = ids[ia], ids[ib]
            s = sims[ia, ib]
        else:
            ma = blk == lo
            mb = ~ma
            if not ma.any() or not mb.any():
                return _EMPTY_PAIRS
            sims = sims_of(mat[ma], mat[mb])
            ia, ib = np.divmod(np.arange(sims.size), sims.shape[1])
            a_ids, b_ids = ids[ma][ia], ids[mb][ib]
            s = sims.reshape(-1)
        keep = s >= threshold
        a_ids, b_ids, s = a_ids[keep], b_ids[keep], s[keep]
        swap = a_ids > b_ids  # canonical vec_a < vec_b (cosine is symmetric)
        return pa.table(
            {
                "vec_a": pa.array(np.where(swap, b_ids, a_ids).astype(np.int64)),
                "vec_b": pa.array(np.where(swap, a_ids, b_ids).astype(np.int64)),
                "cos_sim": pa.array(s, pa.float64()),
            }
        )

    return (
        embeddings.map_batches(replicate, batch_format="pyarrow")
        .groupby("gkey")
        .map_groups(cell_pairs, batch_format="pyarrow")
    )


def hyperplane_signatures(vectors: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Random-hyperplane LSH bucket ids (one bit per plane)."""
    bits = (vectors @ planes.T) >= 0
    weights = (1 << np.arange(planes.shape[0], dtype=np.int64))
    return (bits.astype(np.int64) * weights[None, :]).sum(axis=1)


def lsh_topk(
    embeddings: "ray.data.Dataset",
    query_vecs: np.ndarray,
    query_ids: np.ndarray,
    k: int,
    n_planes: int = 8,
    seed: int = 42,
    probe_hamming: int = 1,
) -> "ray.data.Dataset":
    """LSH-bucketed ANN with multi-probe: scan buckets within
    ``probe_hamming`` bit flips of the query's bucket. Scale path — scans
    ~(1 + n_planes)/2^n_planes of the data at hamming 1; recall is evaluated
    against `brute_force_topk` in tests."""
    rs = np.random.RandomState(seed)
    dim = np.asarray(query_vecs).shape[1]
    planes = rs.standard_normal((n_planes, dim))
    qsig = hyperplane_signatures(np.asarray(query_vecs, dtype=np.float64), planes)
    qn_pre = np.asarray(query_vecs, dtype=np.float64)
    qn_pre = qn_pre / np.linalg.norm(qn_pre, axis=1, keepdims=True)
    refs = ray.put((qn_pre, np.asarray(query_ids), qsig, planes))

    def partial_fn(batch: pa.Table) -> pa.Table:
        # broadcast state is a cheap zero-copy ray.get — plain function
        # stays on prewarmed task workers (no actor-pool cold spawn)
        qn, qids, qsig_l, planes_l = ray.get(refs)
        embs = _emb_matrix(batch)
        vec_ids = batch.column("vec_id").to_numpy()
        esig = hyperplane_signatures(embs, planes_l)
        en = embs / np.linalg.norm(embs, axis=1, keepdims=True)
        out_q: list[np.ndarray] = []
        out_n: list[np.ndarray] = []
        out_s: list[np.ndarray] = []
        for qi in range(len(qids)):
            xor = np.bitwise_xor(esig, qsig_l[qi])
            # popcount via bit-twiddling (values < 2^n_planes, small)
            ham = np.zeros(len(xor), dtype=np.int64)
            v = xor.copy()
            while v.any():
                ham += v & 1
                v >>= 1
            mask = ham <= probe_hamming
            if not mask.any():
                continue
            sims = en[mask] @ qn[qi]
            ids = vec_ids[mask]
            kk = min(k + 1, len(sims))
            part = np.argpartition(-sims, kk - 1)[:kk] if kk < len(sims) else np.arange(len(sims))
            out_q.append(np.full(len(part), qids[qi], dtype=np.int64))
            out_n.append(ids[part].astype(np.int64))
            out_s.append(sims[part])
        if not out_q:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "neighbor_id": pa.array([], pa.int64()),
                    "cos_sim": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "neighbor_id": pa.array(np.concatenate(out_n), pa.int64()),
                "cos_sim": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )

    partial = embeddings.map_batches(partial_fn, batch_format="pyarrow")
    return partial.groupby("query_id").map_groups(
        _topk_merge(k, exclude_self=True), batch_format="pyarrow"
    )


def _spherical_kmeans(
    sample: np.ndarray, n_centroids: int, iters: int = 10
) -> np.ndarray:
    """Deterministic spherical k-means on a bounded driver-side sample:
    strided init (no RNG), assign by max cosine, recenter + renormalize;
    an emptied cluster keeps its previous centroid."""
    sn = sample / np.linalg.norm(sample, axis=1, keepdims=True)
    cents = sn[:: max(1, len(sn) // n_centroids)][:n_centroids].copy()
    for _ in range(iters):
        assign = np.argmax(sn @ cents.T, axis=1)
        for c in range(len(cents)):
            members = sn[assign == c]
            if len(members):
                v = members.sum(axis=0)
                nrm = np.linalg.norm(v)
                if nrm > 0:
                    cents[c] = v / nrm
    return cents


def ivf_topk(
    embeddings: "ray.data.Dataset",
    query_vecs: np.ndarray,
    query_ids: np.ndarray,
    k: int,
    n_centroids: int = 16,
    nprobe: int = 4,
    sample_size: int = 2048,
    kmeans_iters: int = 10,
) -> "ray.data.Dataset":
    """IVF-flat ANN: a coarse spherical-kmeans codebook (trained on a
    bounded ``sample_size`` sample — standard IVF practice, the only
    driver-side materialization) partitions vectors into cells; each query
    scans only its ``nprobe`` nearest cells. Per batch every vector's cell
    is one argmax; partial top-k per query feeds the same tiny per-query
    merge as the brute-force path. Recall vs `brute_force_topk` is
    asserted in tests.
    """
    # deterministic training sample: limit() on an unordered stream returns
    # whichever blocks finish first (Ray preserve_order=False), which made
    # the codebook — and the returned neighbors — vary run to run. An
    # order-independent hash filter on vec_id replaces it; the xor-shift
    # after the multiply is what makes it safe — multiplication alone
    # preserves residues mod powers of two, so structured id sets (all-odd,
    # stride-4 shards) would keep none or all of the rows. Costs one count
    # (parquet metadata when the input is a read) and one filter pass —
    # the price of determinism. Local-filesystem/driver-sized sample only.
    n_rows = max(1, embeddings.count())
    stride = max(1, n_rows // sample_size)

    def _mix(vid: np.ndarray) -> np.ndarray:
        h = vid.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        return h ^ (h >> np.uint64(31))

    def keep_sample(batch: pa.Table) -> pa.Table:
        m = _mix(batch.column("vec_id").to_numpy()) % np.uint64(stride) == 0
        return batch.filter(pa.array(m))

    sample_rows = embeddings.map_batches(keep_sample, batch_format="pyarrow").take_all()
    if not sample_rows:
        # degenerate id set evaded the hash — fall back to the (order-
        # nondeterministic) bounded head rather than crash
        sample_rows = embeddings.limit(sample_size).take_all()
    sample_tbl = pa.Table.from_pylist(sample_rows)
    vid = sample_tbl.column("vec_id").to_numpy()
    if len(vid) > 4 * sample_size:
        # over-selection guard: keep the sample_size smallest mixed hashes
        keep = np.argsort(_mix(vid), kind="stable")[:sample_size]
        sample_tbl = sample_tbl.take(pa.array(np.sort(keep)))
        vid = sample_tbl.column("vec_id").to_numpy()
    order = np.argsort(vid, kind="stable")
    sample = _emb_matrix(sample_tbl.take(pa.array(order)))
    cents = _spherical_kmeans(sample, n_centroids, kmeans_iters)
    q = np.asarray(query_vecs, dtype=np.float64)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    # per-query probed cells: top-nprobe centroids by cosine
    probes = np.argsort(-(qn @ cents.T), kind="stable", axis=1)[:, :nprobe]
    refs = ray.put((qn, np.asarray(query_ids), probes, cents))

    def partial_fn(batch: pa.Table) -> pa.Table:
        # broadcast state is a cheap zero-copy ray.get — plain function
        # stays on prewarmed task workers (no actor-pool cold spawn)
        qn_l, qids, probes_l, cents_l = ray.get(refs)
        embs = _emb_matrix(batch)
        vec_ids = batch.column("vec_id").to_numpy()
        en = embs / np.linalg.norm(embs, axis=1, keepdims=True)
        cells = np.argmax(en @ cents_l.T, axis=1)
        out_q: list[np.ndarray] = []
        out_n: list[np.ndarray] = []
        out_s: list[np.ndarray] = []
        for qi in range(len(qids)):
            mask = np.isin(cells, probes_l[qi])
            if not mask.any():
                continue
            sims = en[mask] @ qn_l[qi]
            ids = vec_ids[mask]
            kk = min(k + 1, len(sims))
            part = (
                np.argpartition(-sims, kk - 1)[:kk]
                if kk < len(sims)
                else np.arange(len(sims))
            )
            out_q.append(np.full(len(part), qids[qi], dtype=np.int64))
            out_n.append(ids[part].astype(np.int64))
            out_s.append(sims[part])
        if not out_q:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "neighbor_id": pa.array([], pa.int64()),
                    "cos_sim": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "neighbor_id": pa.array(np.concatenate(out_n), pa.int64()),
                "cos_sim": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )

    partial = embeddings.map_batches(partial_fn, batch_format="pyarrow")
    return partial.groupby("query_id").map_groups(
        _topk_merge(k, exclude_self=True), batch_format="pyarrow"
    )


def embedding_dedup_clusters(
    embeddings: "ray.data.Dataset",
    threshold: float,
    inorder: bool = True,
    n_buckets: int = 64,
) -> "ray.data.Dataset":
    """Embedding-cosine near-duplicate CLUSTERS: connected components of the
    `embedding_near_dup_pairs` graph, one row per vector with its cluster
    representative (min vec_id) and size — the semantic-dedup primitive
    (`WHERE vec_id = cluster_id` keeps one exemplar per cluster).

    Composition of two existing distributed stages: the exact grid
    self-join for pairs, then large/small-star label propagation
    (`graph.connected_components`, O(E) int64 pairs per round). Only ids
    shuffle in the components rounds; embeddings never leave the pair
    stage."""
    from .graph import connected_components, labeled_clusters

    pairs = embedding_near_dup_pairs(embeddings, threshold, inorder=inorder)
    ids = embeddings.select_columns(["vec_id"])
    cc = connected_components(
        pairs, "vec_a", "vec_b", nodes=ids, node_col="vec_id", n_buckets=n_buckets
    )
    return labeled_clusters(cc, id_col="vec_id", n_buckets=n_buckets)
