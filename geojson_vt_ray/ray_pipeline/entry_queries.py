"""Driver-facing query registry: one Ray pipeline + matching DuckDB oracle per
operator (SURVEY.md §2 inventory + the training-data operators).

Exactness contract with the oracle: every float that reaches a compared
column is either a dyadic rational (phash-derived mercator coords, rect
corners), an exact integer aggregate, a min/max selection, or an
explicitly in-order accumulation that matches DuckDB's evaluation order
(cosine similarity via ``CAST(... AS DOUBLE[])``). Image rows derive from
``doc_id + 1`` (index 0 would sit exactly on the world corner and trip
edge semantics).
"""

from __future__ import annotations

import json
from typing import Any, Callable

import numpy as np
import pyarrow as pa

import ray.data

# ------------------------------------------------------------------ helpers

IMG_EXPR = "CAST(doc_id + 1 AS HUGEINT)"
LNG = f"(({IMG_EXPR} * 2654435761) % 4294967296)"
LAT = f"(({IMG_EXPR} * 2246822519) % 2147483648)"
IMG_ID = "'img-' || lpad(CAST(doc_id + 1 AS VARCHAR), 12, '0')"


def _base_image_rows(doc_ids: np.ndarray) -> tuple[list[str], np.ndarray]:
    """The ONE base image-row construction (id string + phash) every img_*
    query derives from — keep in sync with the IMG_ID/LNG/LAT SQL macros."""
    from ..datagen.images import phash_of_index_vec

    idx = doc_ids + 1
    return [f"img-{i:012d}" for i in idx], phash_of_index_vec(idx)


def _image_points(sf_dir: str) -> "ray.data.Dataset":
    """Image rows (no pixel payloads) georeferenced from doc_id+1."""
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def build(batch: pa.Table) -> pa.Table:
        ids, ph = _base_image_rows(batch.column("doc_id").to_numpy())
        return pa.table({"image_id": pa.array(ids, pa.string()), "phash": pa.array(ph)})

    return docs.map_batches(build, batch_format="pyarrow")


def _part_keys(sf_dir: str) -> np.ndarray:
    import pyarrow.parquet as pq

    return pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey"]).column(
        "p_partkey"
    ).to_numpy()


RECT_SQL_CTE = """
rect AS (
  SELECT p_partkey AS rect_id,
         GREATEST(0.0, cx - hw) AS x0, LEAST(1.0, cx + hw) AS x1,
         GREATEST(0.0, cy - hh) AS y0, LEAST(1.0, cy + hh) AS y1
  FROM (
    SELECT p_partkey,
           ((CAST(p_partkey AS HUGEINT) * 2654435761) % 4294967296) / 4294967296.0 AS cx,
           ((CAST(p_partkey AS HUGEINT) * 2246822519) % 2147483648) / 2147483648.0 AS cy,
           (8 + p_partkey % 40) / 1024.0 AS hw,
           (8 + (p_partkey * 3) % 40) / 1024.0 AS hh
    FROM part
  )
)"""

IMG_SQL_CTE = f"""
img AS (
  SELECT doc_id + 1 AS idx,
         {IMG_ID} AS image_id,
         {LNG} / 4294967296.0 AS mx,
         {LAT} / 2147483648.0 AS my
  FROM documents
)"""


# ------------------------------------------------------------------ queries

def q_img_tile_assign(sf_dir: str):
    from .spatial import with_tile_xy

    ds = with_tile_xy(_image_points(sf_dir), z=8)
    return ds.select_columns(["image_id", "x", "y"])


def q_img_tile_counts(sf_dir: str):
    from ray.data.aggregate import Count

    from .spatial import with_tile_xy

    ds = with_tile_xy(_image_points(sf_dir), z=6)
    return ds.groupby(["x", "y"]).aggregate(Count(alias_name="n_images"))


def q_img_rect_join(sf_dir: str):
    from ..datagen.rects import rect_table
    from .spatial import rect_contain_join

    rects = rect_table(_part_keys(sf_dir))
    return rect_contain_join(_image_points(sf_dir), rects)


def q_img_pip_rects(sf_dir: str):
    from ..datagen.rects import rect_internal_features
    from .spatial import pip_join_world, slice_polygons_to_tiles

    z = 6
    feats = rect_internal_features(_part_keys(sf_dir))
    tile_polys = slice_polygons_to_tiles(feats, z)
    return pip_join_world(_image_points(sf_dir), tile_polys, z)


def q_img_knn(sf_dir: str):
    import pyarrow.parquet as pq

    from ..datagen.images import phash_of_index_vec
    from .spatial import knn_join

    doc_ids = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"]).column(
        "doc_id"
    ).to_numpy()
    qidx = doc_ids[doc_ids % 97 == 0] + 1
    qph = phash_of_index_vec(qidx)
    return knn_join(_image_points(sf_dir), qph, qidx, k=5)


def q_img_knn_radius(sf_dir: str):
    """Radius-bounded kNN with BOTH sides distributed: co-partitioned by
    hilbert cell + 3×3 halo replication of the query side (`cells.py`).
    Same query set / tie rule as `img_knn`, capped at d ≤ 0.05."""
    import pyarrow.parquet as pq

    from ..datagen.images import phash_of_index_vec
    from .cells import knn_radius_join_cells

    doc_ids = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"]).column(
        "doc_id"
    ).to_numpy()
    qidx = doc_ids[doc_ids % 97 == 0] + 1
    queries = ray.data.from_arrow(
        pa.table(
            {
                "query_id": pa.array(qidx.astype(np.int64)),
                "phash": pa.array(phash_of_index_vec(qidx)),
            }
        )
    )
    return knn_radius_join_cells(
        _image_points(sf_dir), queries, radius=0.05, k=5
    ).select_columns(["query_id", "neighbor_id", "d2"])


def q_img_hex_knn(sf_dir: str):
    """Radius-bounded kNN co-partitioned by HEX cell with the isotropic
    7-cell disk halo (`cells.hex_radius_knn_join`) — the hex-index
    counterpart of `img_knn_radius` (3×3 square halo). Same tie rule;
    query set idx % 89 == 0, d ≤ 0.05."""
    import pyarrow.parquet as pq

    from ..datagen.images import phash_of_index_vec
    from .cells import hex_radius_knn_join

    doc_ids = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"]).column(
        "doc_id"
    ).to_numpy()
    qidx = doc_ids[doc_ids % 89 == 0] + 1
    queries = ray.data.from_arrow(
        pa.table(
            {
                "query_id": pa.array(qidx.astype(np.int64)),
                "phash": pa.array(phash_of_index_vec(qidx)),
            }
        )
    )
    return hex_radius_knn_join(_image_points(sf_dir), queries, radius=0.05, k=5)


def q_img_knn_geo(sf_dir: str):
    """Exact GEODESIC kNN (great-circle order via squared chord on the
    unit sphere — `cells.geo_knn_join`): the pole-correct variant of
    img_knn. Oracled: the SQL mirrors the exp-based sphere projection
    and the chord² expression tree bit-for-bit."""
    import pyarrow.parquet as pq

    from ..datagen.images import phash_of_index_vec
    from .cells import geo_knn_join

    doc_ids = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"]).column(
        "doc_id"
    ).to_numpy()
    qidx = doc_ids[doc_ids % 101 == 0] + 1
    qph = phash_of_index_vec(qidx)
    res = geo_knn_join(_image_points(sf_dir), qph, qidx, k=5)
    # hash-compare (query, neighbor, rank): the chord² float itself can
    # sit 1 ulp from the oracle's (vectorized vs libm trig) while the
    # geodesic ORDER — the thing this operator asserts — is identical
    return res.select_columns(["query_id", "neighbor_id", "rank"])


def q_img_range_query(sf_dir: str):
    """Exact bbox query through the hilbert-curve index
    (`cells.range_query_bbox`): bbox -> compressed curve-id ranges ->
    per-batch searchsorted pruning -> exact coordinate post-filter.
    Oracled against a plain WHERE on (mx, my); coordinates are exact
    dyadic divisions so they hash bit-equal."""
    from .cells import range_query_bbox

    return range_query_bbox(_image_points(sf_dir), (0.2, 0.3, 0.45, 0.55), level=8)


def q_img_cell_assign(sf_dir: str):
    """Morton (Z-order) cell id at level 8 per image — the SQL-oracled
    face of the curve-cell index (hilbert is pytest-verified against a
    scalar reference; SQL can't express the quadrant-rotation walk)."""
    from .cells import with_cell_id

    ds = with_cell_id(_image_points(sf_dir), level=8, curve="morton")
    return ds.select_columns(["image_id", "cell"])


def q_img_cell_counts(sf_dir: str):
    """Occupancy histogram of level-6 morton cells (native partial-agg
    groupby: only (cell, count) pairs shuffle)."""
    from .cells import cell_counts

    ds = cell_counts(_image_points(sf_dir), level=6, curve="morton")

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["cell", "n_images"])

    return ds.map_batches(rename, batch_format="pyarrow")


def q_img_s2_assign(sf_dir: str):
    """Spherical S2-style cell id (cube face + quadratic ST + Hilbert,
    kernels/s2.py) at level 10 per image. Oracled: the DuckDB SQL mirrors
    the exact float64 expression tree (exp/cos/sin/sqrt + an unrolled
    10-step Hilbert walk) — verified bit-equal on every testdata scale."""
    from .cells import with_s2_cell_id

    ds = with_s2_cell_id(_image_points(sf_dir), level=10)
    return ds.select_columns(["image_id", "s2_cell"])


def q_img_s2_counts(sf_dir: str):
    """Occupancy histogram of level-7 S2 cells (native partial-agg
    groupby: only (cell, count) pairs shuffle)."""
    from .cells import s2_cell_counts

    ds = s2_cell_counts(_image_points(sf_dir), level=7)

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["s2_cell", "n_images"])

    return ds.map_batches(rename, batch_format="pyarrow")


def q_img_hex_assign(sf_dir: str):
    """H3-style hex cell id (pointy-top axial grid + cube rounding,
    kernels/hex.py) at resolution 5 per image. Oracled: deterministic
    floor(v+0.5) rounding keeps the DuckDB SQL bit-equal."""
    from .cells import with_hex_cell

    ds = with_hex_cell(_image_points(sf_dir), res=5)
    return ds.select_columns(["image_id", "hex_cell"])


def q_img_hex_counts(sf_dir: str):
    """Occupancy histogram of resolution-3 hex cells."""
    from .cells import hex_cell_counts

    ds = hex_cell_counts(_image_points(sf_dir), res=3)

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["hex_cell", "n_images"])

    return ds.map_batches(rename, batch_format="pyarrow")


def q_img_hex_density(sf_dir: str):
    """1-ring smoothed hex density (the H3 density-surface idiom): per
    cell, its own count plus its six neighbors'. Only (cell, count)
    pairs shuffle — counts first, then a 7-way offset scatter + sum."""
    from .cells import hex_smoothed_density

    return hex_smoothed_density(_image_points(sf_dir), res=3, k=1)


def q_doc_top_tokens(sf_dir: str):
    """Global top-20 token frequencies (heavy-hitter wordcount): batch
    pre-aggregation -> partial-sum groupby -> tiny sorted head. Oracled
    (exact counts; ties by token ascending)."""
    from .text import top_tokens

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    return top_tokens(docs, k=20)


def q_doc_heavy_hitters(sf_dir: str):
    """Approximate top tokens via the mergeable Misra-Gries sketch
    (`sketch.py::heavy_hitter_tokens`) — bounded-state counterpart of
    the exact doc_top_tokens for token spaces too large for a groupby.
    No SQL oracle (approximate); pytest pins the MG guarantee vs exact."""
    from .sketch import heavy_hitter_tokens

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    return heavy_hitter_tokens(docs, k_track=1024, k_out=20)


def q_doc_normalize(sf_dir: str):
    """Canonical text normalization (lowercase, collapse whitespace,
    strip) — pure Arrow RE2 kernels, zero Python per row. Oracled:
    DuckDB's lower/regexp_replace/trim chain is RE2 too."""
    from .text import normalize_docs

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return normalize_docs(docs).select_columns(["doc_id", "norm_text", "norm_chars"])


def q_events_value_sketch(sf_dir: str):
    """Approximate quantiles of events.value via the mergeable MRL
    compactor sketch (`sketch.py`) — the no-sort scale path next to the
    exact `doc_length_quantiles`. No SQL oracle (approximate by nature);
    pytest pins <1% rank error vs exact on this table."""
    from .sketch import quantile_sketch_column

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])
    return quantile_sketch_column(ev, "value", [0.1, 0.5, 0.9, 0.99], k=256)


def q_doc_token_stats(sf_dir: str):
    from .text import token_stats

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return token_stats(docs).select_columns(["doc_id", "n_tokens", "avg_token_len"])


def q_doc_dedup_exact(sf_dir: str):
    from .text import exact_dedup_groups

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return exact_dedup_groups(docs)


def q_doc_lang_stats(sf_dir: str):
    from ray.data.aggregate import Count, Max, Min, Sum

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "n_chars"])
    return docs.groupby("lang").aggregate(
        Count(alias_name="n_docs"),
        Sum("n_chars", alias_name="total_chars"),
        Min("n_chars", alias_name="min_chars"),
        Max("n_chars", alias_name="max_chars"),
    )


def q_events_hourly(sf_dir: str):
    from .events import tumbling_window_stats

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    )
    return tumbling_window_stats(events, window_seconds=3600)


def q_events_asof(sf_dir: str):
    """Backward as-of join: for each click event, the latest view event
    timestamp by the same user (distributed searchsorted merge, one
    shuffle; operator `events.asof_join_latest`)."""
    import pyarrow.compute as pc

    from .events import asof_join_latest

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "event_type"]
    )
    clicks = events.map_batches(
        lambda b: b.filter(pc.equal(b.column("event_type"), "click")).select(
            ["event_id", "ts", "user_id"]
        ),
        batch_format="pyarrow",
    )
    views = events.map_batches(
        lambda b: b.filter(pc.equal(b.column("event_type"), "view")).select(
            ["event_id", "ts", "user_id"]
        ),
        batch_format="pyarrow",
    )
    return asof_join_latest(clicks, views)


def q_ann_topk(sf_dir: str):
    import pyarrow.parquet as pq

    from .ann import brute_force_topk

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    vec_ids = t.column("vec_id").to_numpy()
    qmask = vec_ids % 50 == 0
    qids = vec_ids[qmask]
    col = t.column("embedding").combine_chunks()
    values = col.values.to_numpy(zero_copy_only=False).astype(np.float64)
    dim = col.offsets.to_numpy()[1]
    qvecs = values.reshape(len(vec_ids), dim)[qmask]
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return brute_force_topk(emb, qvecs, qids, k=5, inorder=True)


def q_ann_lsh_topk(sf_dir: str):
    import pyarrow.parquet as pq

    from .ann import lsh_topk

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    vec_ids = t.column("vec_id").to_numpy()
    qmask = vec_ids % 50 == 0
    qids = vec_ids[qmask]
    col = t.column("embedding").combine_chunks()
    values = col.values.to_numpy(zero_copy_only=False).astype(np.float64)
    dim = col.offsets.to_numpy()[1]
    qvecs = values.reshape(len(vec_ids), dim)[qmask]
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return lsh_topk(emb, qvecs, qids, k=5)


def q_doc_simhash(sf_dir: str):
    from .text import simhash_signatures

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return simhash_signatures(docs)


def q_doc_fingerprints(sf_dir: str):
    from .text import fingerprints

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return fingerprints(docs)


def q_doc_minhash_candidates(sf_dir: str):
    from .text import minhash_candidate_pairs

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return minhash_candidate_pairs(docs)


def q_doc_quality(sf_dir: str):
    from .text import quality_scores

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return quality_scores(docs)


def q_doc_langid(sf_dir: str):
    from .text import lang_id

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return lang_id(docs)


def q_img_decode_stats(sf_dir: str):
    """Decode every synthesized image through the actor-pool decoder and emit
    per-image channel means (non-SQL: exercises the binary payload path)."""
    import pyarrow.parquet as pq

    from ..datagen.images import synth_image_table
    from .images import decoded_features

    doc_ids = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"]).column(
        "doc_id"
    ).to_numpy()

    def synth(batch: pa.Table) -> pa.Table:
        return synth_image_table(batch.column("doc_id").to_numpy() + 1, with_bytes=True)

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    images = docs.map_batches(synth, batch_format="pyarrow", batch_size=512)
    return decoded_features(images).select_columns(
        ["image_id", "mean_r", "mean_g", "mean_b", "n_pixels"]
    )


def q_rect_pyramid(sf_dir: str):
    """Flagship tiling pipeline: rectangle polygon layer (from part keys)
    sliced into the full z0..z6 pyramid; emits per-tile stats (non-SQL)."""
    from ..datagen.rects import rect_geojson
    from ..options import TilerOptions
    from .cascade import build_pyramid_fast
    from .tiler import dataset_from_geojson

    keys = _part_keys(sf_dir)
    gj = rect_geojson(keys[:500])
    opts = TilerOptions(max_zoom=6)
    tiles = build_pyramid_fast(dataset_from_geojson(gj), opts, z_handoff=4)
    return tiles.select_columns(["z", "x", "y", "num_features", "num_points", "num_simplified"])


def q_emb_near_dup(sf_dir: str):
    """Embedding-cosine near-duplicate pairs (threshold 0.32; in-order
    accumulation matches the DuckDB oracle bit-exactly)."""
    from .ann import embedding_near_dup_pairs

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return embedding_near_dup_pairs(emb, threshold=0.32)


def q_emb_dup_clusters(sf_dir: str):
    """Semantic-dedup clusters: connected components of the exact
    embedding-cosine near-dup graph (threshold 0.32); every vector labeled
    with its cluster representative and size. Oracle: the same cosine pair
    graph in SQL + a recursive min-label propagation CTE."""
    from .ann import embedding_dedup_clusters

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return embedding_dedup_clusters(emb, threshold=0.32)


def q_doc_ngram_jaccard(sf_dir: str):
    """Exact n-gram Jaccard near-dup pairs via the distributed inverted-index
    join (oracle: all-pairs SQL over string shingles — same answer)."""
    from .text import ngram_jaccard_pairs

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ngram_jaccard_pairs(docs, threshold=0.2)


def q_doc_simhash_pairs(sf_dir: str):
    """SimHash near-dup pairs (Hamming ≤ 3) via exact pigeonhole banding —
    the oracle's all-pairs bit_count(xor) scan must agree row-for-row."""
    from .text import simhash_near_dup_pairs

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return simhash_near_dup_pairs(docs, max_hamming=3)


def q_doc_dedup_clusters(sf_dir: str):
    """Near-dup clusters: connected components of the SimHash (Hamming ≤ 3)
    pair graph via distributed star contraction; every doc labeled with the min
    doc_id of its component plus the component size. Oracle: the same pair
    graph in SQL + a recursive min-label propagation CTE."""
    from .text import simhash_dedup_clusters

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return simhash_dedup_clusters(docs, max_hamming=3)


def q_doc_bpe_tokens(sf_dir: str):
    """BPE-ish regex token counts (oracle: DuckDB regexp_extract_all with the
    identical RE2-compatible pattern)."""
    from .text import bpe_token_counts

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return bpe_token_counts(docs)


def q_rect_raster_vectorize(sf_dir: str):
    """Raster↔vector round trip in one pipeline: scanline rasterization of
    the sliced rectangle tiles (z0..z3) followed by polygonization of the
    masks — one row per tile carrying BOTH the raster coverage and the
    vectorized ring/vertex counts (non-SQL; round-trip bit-exactness —
    re-rasterizing the rings reproduces each mask — is the pytest oracle)."""
    from ..datagen.rects import rect_geojson
    from ..options import TilerOptions
    from .raster import rasterize_tiles, vectorize_tiles
    from .tiler import build_tiles, dataset_from_geojson

    keys = _part_keys(sf_dir)
    gj = rect_geojson(keys[:200])
    tiles = build_tiles(dataset_from_geojson(gj), TilerOptions(max_zoom=3), mode="pyramid")
    rasters = rasterize_tiles(tiles, size=64)
    return vectorize_tiles(rasters, size=64).select_columns(
        ["z", "x", "y", "coverage", "num_rings", "num_vertices"]
    )


def q_img_cluster(sf_dir: str):
    """Exact greedy clustering (reference supercluster semantics) of the
    image points: the full zoom cascade in one Ray pass, surfaced at zoom 1
    and a mid-zoom (4) via the bbox query (non-SQL: order-dependent
    greedy; parity pinned by the places.json cascade tests)."""
    import pyarrow.compute as pc

    from ..options import ClusterOptions
    from .cluster_stage import cluster_cascade_exact, mercator_points

    cascade = cluster_cascade_exact(
        mercator_points(_image_points(sf_dir)), ClusterOptions(max_zoom=8)
    )
    def keep_zooms(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b.column("zoom"), value_set=pa.array([1, 4], pa.int32())))

    return cascade.map_batches(keep_zooms, batch_format="pyarrow")


def q_tpch_pricing(sf_dir: str):
    """TPC-H Q1-shaped pricing summary on the exact integer domain
    (cents / e4 / e6) — partial aggregation per batch, tiny groupby."""
    from .relational import pricing_summary

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_shipdate",
        ],
    )
    return pricing_summary(li)


def q_tpch_revenue_nation(sf_dir: str):
    """Revenue per nation/region: broadcast dimension-chain join (customer→
    nation→region collapsed to one lookup) over the streaming orders fact."""
    import pyarrow.parquet as pq

    from .relational import revenue_by_nation

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    customer = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    region = pq.read_table(f"{sf_dir}/region.parquet")
    return revenue_by_nation(orders, customer, nation, region)


def q_tpch_top_customers(sf_dir: str):
    """Distributed top-3 customers by account balance per nation (batch-local
    top-k before the shuffle; rank assigned in the per-group merge)."""
    from .relational import topk_per_group

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey", "c_acctbal"]
    )
    return topk_per_group(
        cust,
        key="c_nationkey",
        order_col="c_acctbal",
        k=3,
        tie_col="c_custkey",
        out_cols=["c_custkey", "c_nationkey", "c_acctbal"],
    )


def q_events_sessions(sf_dir: str):
    """Gap-based sessionization (30-minute gap): one row per (user, session)
    with start/end/count — single groupby(user) shuffle."""
    from .events import sessionize

    events = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    return sessionize(events)


def q_events_distinct_users(sf_dir: str):
    """Exact distinct users per hourly window (batch-local pair dedup before
    the shuffle)."""
    from .events import distinct_users_window

    events = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    return distinct_users_window(events, window_seconds=3600)


def q_events_hll_users(sf_dir: str):
    """HyperLogLog distinct-user sketch per hourly window (non-SQL:
    approximate by design; accuracy asserted vs the exact operator in
    tests)."""
    from .events import hll_users_window

    events = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    return hll_users_window(events, window_seconds=3600)


def q_ann_ivf_topk(sf_dir: str):
    """IVF-flat ANN top-k (coarse spherical-kmeans codebook, nprobe cells
    per query; non-SQL: recall measured against brute force in tests)."""
    import pyarrow.parquet as pq

    from .ann import ivf_topk

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    vec_ids = t.column("vec_id").to_numpy()
    qmask = vec_ids % 50 == 0
    qids = vec_ids[qmask]
    col = t.column("embedding").combine_chunks()
    values = col.values.to_numpy(zero_copy_only=False).astype(np.float64)
    dim = col.offsets.to_numpy()[1]
    qvecs = values.reshape(len(vec_ids), dim)[qmask]
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return ivf_topk(emb, qvecs, qids, k=5, n_centroids=64, nprobe=16)


def q_img_embed_topk(sf_dir: str):
    """Vision-encoder stand-in end-to-end: actor-pool decode → grid-pool
    embedding → brute-force cosine top-k over the extracted vectors
    (non-SQL: exercises the binary-payload → embedding → ANN chain)."""
    import pyarrow.parquet as pq

    from ..datagen.images import synth_image_table
    from .ann import brute_force_topk
    from .images import image_embeddings

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def synth(batch: pa.Table) -> pa.Table:
        return synth_image_table(batch.column("doc_id").to_numpy() + 1, with_bytes=True)

    images = docs.map_batches(synth, batch_format="pyarrow", batch_size=512)
    embs = image_embeddings(images, grid=4)

    def to_vec_rows(batch: pa.Table) -> pa.Table:
        ids = [int(s[4:]) for s in batch.column("image_id").to_pylist()]
        return pa.table(
            {"vec_id": pa.array(ids, pa.int64()), "embedding": batch.column("embedding")}
        )

    vecs = embs.map_batches(to_vec_rows, batch_format="pyarrow")
    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    qidx = np.arange(1, n_docs + 1, max(1, n_docs // 8))
    from ..datagen.images import image_size, synth_pixels

    qvecs = []
    for i in qidx:
        w, h = image_size(int(i))
        px = synth_pixels(int(i), w, h).astype(np.float64)
        ys = (np.arange(h) * 4) // h
        xs = (np.arange(w) * 4) // w
        pooled = np.zeros((3, 4, 4))
        counts = np.zeros((4, 4))
        np.add.at(counts, (ys[:, None], xs[None, :]), 1.0)
        for c in range(3):
            np.add.at(pooled[c], (ys[:, None], xs[None, :]), px[c])
        v = (pooled / counts).reshape(-1)
        v = v / np.linalg.norm(v)
        # match float32 storage of the embedding column
        qvecs.append(v.astype(np.float32).astype(np.float64))
    return brute_force_topk(vecs, np.asarray(qvecs), qidx.astype(np.int64), k=5)


def q_video_frames(sf_dir: str):
    """Frame sampling over synthesized video containers: demux every 2nd
    frame, emit per-frame channel means (non-SQL: binary demux path)."""
    from .images import sampled_frames, video_dataset

    import pyarrow.parquet as pq

    n = min(200, pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows)
    return sampled_frames(video_dataset(n, n_frames=8), stride=2)


def q_tpch_priority_revenue(sf_dir: str):
    """Big-big co-group join (lineitem × orders on orderkey, neither side
    broadcast) → discounted revenue per order priority."""
    from .relational import order_revenue_by_priority

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )
    return order_revenue_by_priority(li, orders)


def q_tpch_cumulative_revenue(sf_dir: str):
    """Ordered running revenue total per customer (window-function class:
    one groupby(custkey) shuffle + per-group sort/cumsum on exact cents)."""
    from .relational import _int_col, cumulative_per_group

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"],
    )
    return cumulative_per_group(
        orders,
        key="o_custkey",
        order_cols=["o_orderdate", "o_orderkey"],
        value_expr=lambda b: _int_col(b, "o_totalprice", 100.0),
        out_cols=[],
        cum_name="cum_revenue_cents",
    )



def q_doc_samples(sf_dir: str):
    """Both deterministic sampling primitives in ONE oracled union row
    (kind, doc_id, lang, h, rank): the 10% md5-bucket sample
    (h = rank = 0) and the stratified 20-per-language md5-ordered sample
    — merged so the 50-row driver cap gains a slot for `doc_dup_spans`
    while both samplers keep an exact SQL oracle."""
    from .relational import topk_per_group
    from .text import md5_u64

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])

    def hash10(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        keep = np.fromiter(
            (md5_u64(str(i).encode()) % 10 == 0 for i in ids), count=len(ids), dtype=bool
        )
        sub = batch.filter(pa.array(keep))
        z = np.zeros(sub.num_rows, dtype=np.int64)
        return pa.table(
            {
                "kind": pa.array(["hash10"] * sub.num_rows, pa.string()),
                "doc_id": sub.column("doc_id"),
                "lang": sub.column("lang"),
                "h": pa.array(z),
                "rank": pa.array(z),
            }
        )

    def with_hash(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        h = np.fromiter(
            (md5_u64(str(i).encode()) % (1 << 63) for i in ids),
            count=len(ids),
            dtype=np.int64,
        )
        return batch.append_column("h", pa.array(h, pa.int64()))

    strat = topk_per_group(
        docs.map_batches(with_hash, batch_format="pyarrow"),
        key="lang",
        order_col="h",
        k=20,
        tie_col="doc_id",
        out_cols=["doc_id", "lang", "h"],
    )

    def strat_rows(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "kind": pa.array(["strat20"] * b.num_rows, pa.string()),
                "doc_id": b.column("doc_id"),
                "lang": b.column("lang"),
                "h": b.column("h"),
                "rank": b.column("rank").cast(pa.int64()),
            }
        )

    return _norm_union(
        [
            docs.map_batches(hash10, batch_format="pyarrow"),
            strat.map_batches(strat_rows, batch_format="pyarrow"),
        ]
    )


def q_doc_dup_spans(sf_dir: str):
    """Exact substring-duplicate spans (Lee et al. 2022 exact-substring
    dedup): maximal per-document byte ranges covered by 30-byte windows
    occurring >= 2 times anywhere in the corpus — one bounded windowed
    shuffle + np.unique byte verification + vectorized span merge
    (`text.duplicate_spans`). Oracle: DuckDB grams-via-numbers-table +
    gaps-and-islands merge."""
    from .text import duplicate_spans

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return duplicate_spans(docs, min_len=30)


def q_doc_length_quantiles(sf_dir: str):
    """Exact per-group quantiles (median / p90 of document length): one
    groupby(lang) shuffle of the two pruned columns, per-group sort +
    linear interpolation matching quantile_cont bit-for-bit. Scale note:
    for groups too large to co-locate, the sketch path is a t-digest /
    fixed-bin histogram partial — exactness is the point here."""

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "n_chars"])

    def per_lang(g: pa.Table) -> pa.Table:
        a = np.sort(g.column("n_chars").to_numpy().astype(np.float64))

        def qc(q: float) -> float:
            # symmetric lerp — the exact expression quantile_cont evaluates
            idx = (len(a) - 1) * q
            lo = int(np.floor(idx))
            hi = int(np.ceil(idx))
            frac = idx - lo
            return a[lo] * (1 - frac) + a[hi] * frac

        return pa.table(
            {
                "lang": pa.array([g.column("lang")[0].as_py()], pa.string()),
                "median_chars": pa.array([qc(0.5)], pa.float64()),
                "p90_chars": pa.array([qc(0.9)], pa.float64()),
                "n_docs": pa.array([len(a)], pa.int64()),
            }
        )

    return docs.groupby("lang").map_groups(per_lang, batch_format="pyarrow")



def _image_phash_rows(sf_dir: str) -> "ray.data.Dataset":
    """Image-id + phash rows with PLANTED near-duplicate variants: every
    20th image gets a twin whose phash differs in ≤3 deterministic bit
    positions (the synthetic phashes are uniform 63-bit values, so without
    planting, Hamming-≤4 pairs would be vanishingly rare). The identical
    construction exists inline in ``ORACLES["img_phash_near_dup"]``'s
    ``img`` CTE — change the bit positions in BOTH places."""
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def build(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy()
        idx = d + 1
        ids, ph = _base_image_rows(d)
        vm = d % 20 == 0
        dv = d[vm].astype(np.uint64)
        mask = (
            (np.uint64(1) << ((dv * np.uint64(7) + np.uint64(1)) % np.uint64(63)))
            | (np.uint64(1) << ((dv * np.uint64(13) + np.uint64(5)) % np.uint64(63)))
            | (np.uint64(1) << ((dv * np.uint64(29) + np.uint64(11)) % np.uint64(63)))
        )
        vph = (ph[vm].astype(np.uint64) ^ mask).astype(np.int64)
        vids = [f"img-{i:012d}-v" for i in idx[vm]]
        return pa.table(
            {
                "image_id": pa.array(ids + vids, pa.string()),
                "phash": pa.array(np.concatenate([ph, vph])),
            }
        )

    return docs.map_batches(build, batch_format="pyarrow")


def q_img_phash_near_dup(sf_dir: str):
    """Image near-dup pairs by perceptual-hash Hamming distance ≤ 4 —
    exact pigeonhole banding over the input_hint phash column (the image
    twin of doc_simhash_pairs; `images.phash_near_dup_pairs`)."""
    from .images import phash_near_dup_pairs

    return phash_near_dup_pairs(_image_phash_rows(sf_dir), max_hamming=4)


# ---- merged non-SQL driver entries ------------------------------------
# The driver caps CORRECTNESS at 50 rows, so the 11 pytest-oracled
# pipelines ride in 4 union queries (normalized schemas, a `kind`/`method`
# discriminator column): every non-SQL pipeline still executes end-to-end
# under the driver's rows-only check, and ALL registry entries now get a
# driver row. Each constituent keeps its own standalone q_* function and
# pytest oracle.

def _norm_union(parts: list) -> Any:
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def q_rect_pyramid_raster(sf_dir: str):
    """Flagship tiling pipeline + both egress round trips in one driver
    row (non-SQL): the full z0..z6 rect pyramid's stats, the
    rasterize→polygonize tiles of `q_rect_raster_vectorize`, and an MVT
    encode→decode leg over the same pyramid rows, unioned as
    (kind, z, x, y, m1..m3). The MVT leg's m1 (stored feature count) vs
    m3 (feature count decoded back out of the binary) makes the driver
    row itself witness the codec round trip. The pyramid is built ONCE
    and shared by the stats and MVT legs."""
    from ..datagen.rects import rect_geojson
    from ..options import TilerOptions
    from .cascade import build_pyramid_fast
    from .mvt_sink import mvt_tiles
    from .tiler import dataset_from_geojson

    keys = _part_keys(sf_dir)
    opts = TilerOptions(max_zoom=6)
    tiles = build_pyramid_fast(
        dataset_from_geojson(rect_geojson(keys[:500])), opts, z_handoff=4
    ).materialize()

    def pyr_rows(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "kind": pa.array(["pyramid"] * b.num_rows, pa.string()),
                "z": b.column("z").cast(pa.int32()),
                "x": b.column("x").cast(pa.int32()),
                "y": b.column("y").cast(pa.int32()),
                "m1": b.column("num_features").cast(pa.float64()),
                "m2": b.column("num_points").cast(pa.float64()),
                "m3": b.column("num_simplified").cast(pa.float64()),
            }
        )

    def ras_rows(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "kind": pa.array(["raster"] * b.num_rows, pa.string()),
                "z": b.column("z").cast(pa.int32()),
                "x": b.column("x").cast(pa.int32()),
                "y": b.column("y").cast(pa.int32()),
                "m1": b.column("coverage").cast(pa.float64()),
                "m2": b.column("num_rings").cast(pa.float64()),
                "m3": b.column("num_vertices").cast(pa.float64()),
            }
        )

    def mvt_rows(b: pa.Table) -> pa.Table:
        from ..kernels.mvt import decode_tile

        blobs = b.column("mvt").to_pylist()
        decoded = [
            float(len(decode_tile(blob)["geojsonvt"]["features"])) for blob in blobs
        ]
        return pa.table(
            {
                "kind": pa.array(["mvt"] * b.num_rows, pa.string()),
                "z": b.column("z").cast(pa.int32()),
                "x": b.column("x").cast(pa.int32()),
                "y": b.column("y").cast(pa.int32()),
                "m1": b.column("num_features").cast(pa.float64()),
                "m2": pa.array([float(len(blob)) for blob in blobs], pa.float64()),
                "m3": pa.array(decoded, pa.float64()),
            }
        )

    return _norm_union(
        [
            tiles.select_columns(
                ["z", "x", "y", "num_features", "num_points", "num_simplified"]
            ).map_batches(pyr_rows, batch_format="pyarrow"),
            q_rect_raster_vectorize(sf_dir).map_batches(ras_rows, batch_format="pyarrow"),
            mvt_tiles(tiles, extent=opts.extent).map_batches(
                mvt_rows, batch_format="pyarrow"
            ),
        ]
    )


def q_img_multimodal(sf_dir: str):
    """The binary-payload pipelines in one driver row (non-SQL):
    `q_img_cluster` (exact supercluster cascade), `q_img_decode_stats`
    (actor-pool decode), `q_img_embed_topk` (decode→embed→ANN chain) and
    `q_video_frames` (container demux + frame sampling), unioned as
    (kind, id, v1..v4)."""

    def cluster_rows(b: pa.Table) -> pa.Table:
        cid = b.column("cluster_id").to_pylist()
        pid = b.column("point_id").to_pylist()
        ids = [str(c) if c != -1 else p for c, p in zip(cid, pid)]
        return pa.table(
            {
                "kind": pa.array(["cluster"] * b.num_rows, pa.string()),
                "id": pa.array(ids, pa.string()),
                "v1": b.column("point_count").cast(pa.float64()),
                "v2": b.column("px").cast(pa.float64()),
                "v3": b.column("py").cast(pa.float64()),
                "v4": b.column("zoom").cast(pa.float64()),
            }
        )

    def decode_rows(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "kind": pa.array(["decode"] * b.num_rows, pa.string()),
                "id": b.column("image_id").cast(pa.string()),
                "v1": b.column("mean_r").cast(pa.float64()),
                "v2": b.column("mean_g").cast(pa.float64()),
                "v3": b.column("mean_b").cast(pa.float64()),
                "v4": b.column("n_pixels").cast(pa.float64()),
            }
        )

    def topk_rows(b: pa.Table) -> pa.Table:
        q = b.column("query_id").to_pylist()
        n = b.column("neighbor_id").to_pylist()
        return pa.table(
            {
                "kind": pa.array(["embed_topk"] * b.num_rows, pa.string()),
                "id": pa.array([f"{a}:{c}" for a, c in zip(q, n)], pa.string()),
                "v1": b.column("cos_sim").cast(pa.float64()),
                "v2": b.column("query_id").cast(pa.float64()),
                "v3": b.column("neighbor_id").cast(pa.float64()),
                "v4": pa.array(np.zeros(b.num_rows), pa.float64()),
            }
        )

    def frame_rows(b: pa.Table) -> pa.Table:
        v = b.column("video_id").to_pylist()
        f = b.column("frame_idx").to_pylist()
        return pa.table(
            {
                "kind": pa.array(["video"] * b.num_rows, pa.string()),
                "id": pa.array([f"{a}:{c}" for a, c in zip(v, f)], pa.string()),
                "v1": b.column("mean_r").cast(pa.float64()),
                "v2": b.column("mean_g").cast(pa.float64()),
                "v3": b.column("mean_b").cast(pa.float64()),
                "v4": b.column("frame_idx").cast(pa.float64()),
            }
        )

    return _norm_union(
        [
            q_img_cluster(sf_dir).map_batches(cluster_rows, batch_format="pyarrow"),
            q_img_decode_stats(sf_dir).map_batches(decode_rows, batch_format="pyarrow"),
            q_img_embed_topk(sf_dir).map_batches(topk_rows, batch_format="pyarrow"),
            q_video_frames(sf_dir).map_batches(frame_rows, batch_format="pyarrow"),
        ]
    )


def q_events_value_quantiles(sf_dir: str):
    """EXACT global quantiles of events.value — the oracled exact twin of
    the MRL sketch row in `q_sketches` (`sketch.exact_quantiles_global`:
    distributed selection by iterative histogram refinement, ~3 streaming
    passes over the one pruned column instead of an all-to-all sort;
    bit-equal to DuckDB quantile_cont)."""
    from .sketch import exact_quantiles_global

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])
    return exact_quantiles_global(ev, "value", [0.1, 0.5, 0.9, 0.99])


def q_sketches(sf_dir: str):
    """ALL the approximate pipelines in one driver row (non-SQL:
    approximate by nature, each pinned vs its exact twin in pytest):
    the three mergeable sketches — `q_events_hll_users` (HyperLogLog),
    `q_events_value_sketch` (MRL quantiles, exact twin
    `q_events_value_quantiles`), `q_doc_heavy_hitters` (Misra–Gries) —
    plus both approximate-ANN variants, `q_ann_lsh_topk` (multi-probe
    LSH) and `q_ann_ivf_topk` (IVF-flat, recall pinned vs brute force
    in pytest), unioned as (kind, key, value, aux)."""

    def hll_rows(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "kind": pa.array(["hll_users"] * b.num_rows, pa.string()),
                "key": b.column("window_start_us").cast(pa.string()),
                "value": b.column("n_users_hll").cast(pa.float64()),
                "aux": pa.array(np.zeros(b.num_rows), pa.float64()),
            }
        )

    def quant_rows(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "kind": pa.array(["value_quantile"] * b.num_rows, pa.string()),
                "key": b.column("q").cast(pa.string()),
                "value": b.column("value").cast(pa.float64()),
                "aux": b.column("n").cast(pa.float64()),
            }
        )

    def hh_rows(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "kind": pa.array(["heavy_hitter"] * b.num_rows, pa.string()),
                "key": b.column("token").cast(pa.string()),
                "value": b.column("est").cast(pa.float64()),
                "aux": b.column("err").cast(pa.float64()),
            }
        )

    def ann_rows(method: str):
        def fn(b: pa.Table) -> pa.Table:
            q = b.column("query_id").to_pylist()
            nb = b.column("neighbor_id").to_pylist()
            return pa.table(
                {
                    "kind": pa.array([f"ann_{method}"] * b.num_rows, pa.string()),
                    "key": pa.array([f"{a}:{c}" for a, c in zip(q, nb)], pa.string()),
                    "value": b.column("cos_sim").cast(pa.float64()),
                    "aux": b.column("query_id").cast(pa.float64()),
                }
            )

        return fn

    return _norm_union(
        [
            q_events_hll_users(sf_dir).map_batches(hll_rows, batch_format="pyarrow"),
            q_events_value_sketch(sf_dir).map_batches(quant_rows, batch_format="pyarrow"),
            q_doc_heavy_hitters(sf_dir).map_batches(hh_rows, batch_format="pyarrow"),
            q_ann_lsh_topk(sf_dir).map_batches(ann_rows("lsh"), batch_format="pyarrow"),
            q_ann_ivf_topk(sf_dir).map_batches(ann_rows("ivf"), batch_format="pyarrow"),
        ]
    )


# Registry order matters: the driver runs queries in dict order and caps the
# CORRECTNESS run at 50 rows (r2 ran exactly the first 50 of 56).  All 47
# SQL-oracled queries come first so every oracle-checkable pipeline gets a
# driver row; the 3 no-oracle entries (merged unions carrying all 12
# pytest-oracled pipelines — see above) follow, so EVERY registered
# pipeline surfaces a CORRECTNESS row under the 50-row cap.
QUERIES: dict[str, Callable[[str], Any]] = {
    # ---- SQL-oracled (47) ---------------------------------------------
    "img_tile_assign": q_img_tile_assign,
    "img_tile_counts": q_img_tile_counts,
    "img_rect_join": q_img_rect_join,
    "img_pip_rects": q_img_pip_rects,
    "img_knn": q_img_knn,
    "img_knn_radius": q_img_knn_radius,
    "img_cell_assign": q_img_cell_assign,
    "img_cell_counts": q_img_cell_counts,
    "img_s2_assign": q_img_s2_assign,
    "img_s2_counts": q_img_s2_counts,
    "img_knn_geo": q_img_knn_geo,
    "img_range_query": q_img_range_query,
    "img_hex_knn": q_img_hex_knn,
    "img_hex_assign": q_img_hex_assign,
    "img_hex_counts": q_img_hex_counts,
    "img_hex_density": q_img_hex_density,
    "img_phash_near_dup": q_img_phash_near_dup,
    "doc_token_stats": q_doc_token_stats,
    "doc_dedup_exact": q_doc_dedup_exact,
    "doc_lang_stats": q_doc_lang_stats,
    "doc_quality": q_doc_quality,
    "doc_langid": q_doc_langid,
    "doc_simhash": q_doc_simhash,
    "doc_simhash_pairs": q_doc_simhash_pairs,
    "doc_dedup_clusters": q_doc_dedup_clusters,
    "doc_fingerprints": q_doc_fingerprints,
    "doc_minhash_candidates": q_doc_minhash_candidates,
    "events_hourly": q_events_hourly,
    "events_asof": q_events_asof,
    "ann_topk": q_ann_topk,
    "emb_near_dup": q_emb_near_dup,
    "emb_dup_clusters": q_emb_dup_clusters,
    "doc_ngram_jaccard": q_doc_ngram_jaccard,
    "doc_bpe_tokens": q_doc_bpe_tokens,
    "tpch_pricing": q_tpch_pricing,
    "tpch_revenue_nation": q_tpch_revenue_nation,
    "tpch_top_customers": q_tpch_top_customers,
    "tpch_priority_revenue": q_tpch_priority_revenue,
    "tpch_cumulative_revenue": q_tpch_cumulative_revenue,
    "events_sessions": q_events_sessions,
    "events_distinct_users": q_events_distinct_users,
    "doc_top_tokens": q_doc_top_tokens,
    "doc_normalize": q_doc_normalize,
    "doc_samples": q_doc_samples,
    "doc_length_quantiles": q_doc_length_quantiles,
    "doc_dup_spans": q_doc_dup_spans,
    "events_value_quantiles": q_events_value_quantiles,
    # ---- pytest-oracled / non-SQL (3 union rows, 12 pipelines) --------
    "rect_pyramid_raster": q_rect_pyramid_raster,
    "img_multimodal": q_img_multimodal,
    "sketches": q_sketches,
}


# ---- text-operator oracle building blocks ----------------------------------
# Token hash = md5_number_lower (== geojson_vt_ray.ray_pipeline.text.md5_u64);
# k-shingle hash = wraparound (mod 2^64) dot product with SHINGLE_PRIMES —
# HUGEINT arithmetic + one final mod is ring-equal to numpy uint64 wraparound.

_U64 = "18446744073709551616"
_TOKS_CTE = "toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents)"
_TH_CTE = (
    "th AS (SELECT doc_id, "
    "list_transform(t, s -> CAST(md5_number_lower(s) AS HUGEINT)) AS h, "
    "len(t) AS n FROM toks)"
)


def _shingle_cte(k: int) -> str:
    from .text import SHINGLE_PRIMES

    primes = SHINGLE_PRIMES[:k]
    window = " + ".join(f"h[i+{j}]*{p}" for j, p in enumerate(primes))
    short = " + ".join(f"h[{j + 1}]*{p}" for j, p in enumerate(primes))
    # short-doc (< k tokens) case: all tokens in one window; list_sum of the
    # per-position products (positions beyond n simply absent)
    return (
        f"sh AS (SELECT doc_id, CASE WHEN n >= {k} THEN "
        f"list_distinct(list_transform(generate_series(1, n-{k - 1}), "
        f"i -> ({window}) % {_U64})) "
        f"ELSE [list_sum(list_transform(generate_series(1, n), "
        f"j -> h[j] * ([{', '.join(str(p) for p in primes)}])[j])) % {_U64}] END AS s "
        f"FROM th)"
    )


def _minhash_oracle_sql(n_perm: int = 64, bands: int = 16, shingle_k: int = 3) -> str:
    from .text import SHINGLE_PRIMES, minhash_params

    a, b = minhash_params(n_perm)
    rpb = n_perm // bands
    a_list = ", ".join(str(int(v)) for v in a)
    b_list = ", ".join(str(int(v)) for v in b)
    q_list = ", ".join(str(p) for p in SHINGLE_PRIMES[:rpb])
    return f"""
        WITH {_TOKS_CTE}, {_TH_CTE}, {_shingle_cte(shingle_k)},
        shingle AS (SELECT doc_id, unnest(s) AS sv FROM sh),
        perms AS (SELECT i AS perm, ([{a_list}])[i+1] AS a, ([{b_list}])[i+1] AS b
                  FROM generate_series(0, {n_perm - 1}) AS g(i)),
        vals AS (SELECT doc_id, perm,
                        min((a * (sv % 2147483647) + b) % 2147483647) AS r
                 FROM shingle, perms GROUP BY doc_id, perm),
        bh AS (SELECT doc_id, perm // {rpb} AS band,
                      CAST((sum(CAST(r AS HUGEINT)
                                * ([{q_list}])[(perm % {rpb}) + 1]) % {_U64}) // 2
                           AS BIGINT) AS band_hash
               FROM vals GROUP BY doc_id, perm // {rpb})
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_bands
        FROM bh a JOIN bh b
          ON a.band = b.band AND a.band_hash = b.band_hash AND b.doc_id > a.doc_id
        GROUP BY 1, 2
    """


def _morton_cte(level: int) -> str:
    """Chained spread-bits CTEs: morton-interleave the level-``level`` tile
    coords of each image (ring-equal to `kernels.cells.morton_encode` for
    level ≤ 8 — the 0x0F0F/0x3333/0x5555 magic-mask cascade)."""
    return f"""
c0 AS (SELECT {IMG_ID} AS image_id,
              CAST({LNG} >> {32 - level} AS BIGINT) AS x,
              CAST({LAT} >> {31 - level} AS BIGINT) AS y
       FROM documents),
c1 AS (SELECT image_id, (x | (x << 4)) & 3855 AS x, (y | (y << 4)) & 3855 AS y FROM c0),
c2 AS (SELECT image_id, (x | (x << 2)) & 13107 AS x, (y | (y << 2)) & 13107 AS y FROM c1),
c3 AS (SELECT image_id, (x | (x << 1)) & 21845 AS x, (y | (y << 1)) & 21845 AS y FROM c2)"""


def _s2_cte(level: int) -> str:
    """Chained CTEs reproducing `kernels.s2.s2_cell_id` bit-for-bit in
    DuckDB: mercator -> sphere xyz (exp-based tanh/sech, no sinh builtin
    needed), dominant cube face, per-face (u,v) ratios, quadratic ST,
    grid (i,j), then `level` unrolled Hilbert steps with the S2
    swap/invert orientation tables as list_extract lookups. Final CTE
    `s2h{level}` carries (doc_id, face, pos)."""
    n = 1 << level
    ctes = [
        f"""s2m AS (
  SELECT doc_id,
         ({LNG} / 4294967296.0 - 0.5) * (2*pi()) AS lon,
         exp(pi() * (1.0 - 2.0 * ({LAT} / 2147483648.0))) AS e
  FROM documents),
s2xyz AS (
  SELECT doc_id,
    (2.0/(e + 1.0/e))*cos(lon) AS x,
    (2.0/(e + 1.0/e))*sin(lon) AS y,
    (e - 1.0/e)/(e + 1.0/e) AS z
  FROM s2m),
s2fuv AS (
  SELECT doc_id,
    CASE WHEN abs(z) >= abs(x) AND abs(z) >= abs(y) THEN (CASE WHEN z >= 0 THEN 2 ELSE 5 END)
         WHEN abs(y) >= abs(x) THEN (CASE WHEN y >= 0 THEN 1 ELSE 4 END)
         ELSE (CASE WHEN x >= 0 THEN 0 ELSE 3 END) END AS face,
    x, y, z FROM s2xyz),
s2uv AS (
  SELECT doc_id, face,
    CASE face WHEN 0 THEN y/x WHEN 1 THEN -x/y WHEN 2 THEN -x/z
              WHEN 3 THEN z/x WHEN 4 THEN z/y ELSE -y/z END AS u,
    CASE face WHEN 0 THEN z/x WHEN 1 THEN z/y WHEN 2 THEN -y/z
              WHEN 3 THEN y/x WHEN 4 THEN -x/y ELSE -x/z END AS v
  FROM s2fuv),
s2st AS (
  SELECT doc_id, face,
    CASE WHEN u >= 0 THEN 0.5*sqrt(1.0+3.0*u) ELSE 1.0-0.5*sqrt(1.0-3.0*u) END AS s,
    CASE WHEN v >= 0 THEN 0.5*sqrt(1.0+3.0*v) ELSE 1.0-0.5*sqrt(1.0-3.0*v) END AS t
  FROM s2uv),
s2h0 AS (
  SELECT doc_id, face,
    LEAST(GREATEST(CAST(floor(s * {n}) AS BIGINT), 0), {n - 1}) AS i,
    LEAST(GREATEST(CAST(floor(t * {n}) AS BIGINT), 0), {n - 1}) AS j,
    face & 1 AS o, CAST(0 AS HUGEINT) AS pos
  FROM s2st)"""
    ]
    ij_to_pos = "[0,1,3,2, 0,3,1,2, 2,3,1,0, 2,1,3,0]"
    pos_to_orient = "[1,0,0,3]"
    for step, k in enumerate(range(level - 1, -1, -1), start=1):
        ctes.append(
            f"""s2h{step} AS (
  SELECT doc_id, face, i, j,
    xor(o, list_extract({pos_to_orient}, q + 1)) AS o,
    pos * 4 + q AS pos
  FROM (SELECT *, list_extract({ij_to_pos}, o*4 + (((i >> {k}) & 1)*2 | ((j >> {k}) & 1)) + 1) AS q
        FROM s2h{step - 1}))"""
        )
    return ",\n".join(ctes)


def _hex_cte(res: int) -> str:
    """CTEs reproducing `kernels.hex.hex_cell` bit-for-bit: axial coords
    (constants in the same evaluation order as the numpy kernel), cube
    rounding via floor(v+0.5), largest-error component fix. Final CTE
    `hexc` carries (doc_id, cell)."""
    size = repr(1.0 / 8.0 / (1 << res))
    return f"""hexpt AS (
  SELECT doc_id, {LNG} / 4294967296.0 AS mx, {LAT} / 2147483648.0 AS my FROM documents),
hexax AS (
  SELECT doc_id,
    (sqrt(3.0)/3.0 * mx - (1.0/3.0) * my) / {size} AS q,
    ((2.0/3.0) * my) / {size} AS r
  FROM hexpt),
hexrnd AS (
  SELECT doc_id, q, r, -q - r AS s,
    floor(q + 0.5) AS rq, floor(r + 0.5) AS rr, floor(-q - r + 0.5) AS rs
  FROM hexax),
hexfix AS (
  SELECT doc_id,
    CASE WHEN abs(rq-q) > abs(rr-r) AND abs(rq-q) > abs(rs-s) THEN -rr - rs ELSE rq END AS fq,
    CASE WHEN NOT (abs(rq-q) > abs(rr-r) AND abs(rq-q) > abs(rs-s)) AND abs(rr-r) > abs(rs-s)
         THEN -rq - rs ELSE rr END AS fr
  FROM hexrnd),
hexc AS (
  SELECT doc_id, CAST(fq AS BIGINT) * 16777216 + CAST(fr AS BIGINT) AS cell FROM hexfix)"""


def _s2_hug_expr(level: int) -> str:
    """S2CellId packing (face<<61 | pos<<shift | sentinel) over (face,
    pos) columns, in HUGEINT. All powers of two are EXACT integer
    literals cast to HUGEINT — DuckDB's `**` operator returns DOUBLE,
    which would silently round the packing sum once 2·level + 4 exceeds
    the 53-bit mantissa (level >= 25)."""
    shift = 61 - 2 * level
    return (
        f"CAST(face AS HUGEINT) * CAST('{1 << 61}' AS HUGEINT)"
        f" + pos * CAST('{1 << shift}' AS HUGEINT)"
        f" + CAST('{1 << (shift - 1)}' AS HUGEINT)"
    )


# uint64 -> int64 two's complement over a HUGEINT column named `hug`
_S2_TO_BIGINT = (
    f"CAST(CASE WHEN hug >= CAST('{1 << 63}' AS HUGEINT)"
    f" THEN hug - CAST('{1 << 64}' AS HUGEINT) ELSE hug END AS BIGINT)"
)


_STOPWORDS_SQL = ", ".join(
    f"'{w}'"
    for w in "the a an and or of to in is are was were be been it this that with for on as at by".split()
)


ORACLES: dict[str, str] = {
    "img_tile_assign": f"""
        SELECT {IMG_ID} AS image_id,
               CAST({LNG} >> 24 AS BIGINT) AS x,
               CAST({LAT} >> 23 AS BIGINT) AS y
        FROM documents
    """,
    "img_tile_counts": f"""
        SELECT CAST({LNG} >> 26 AS BIGINT) AS x,
               CAST({LAT} >> 25 AS BIGINT) AS y,
               count(*) AS n_images
        FROM documents GROUP BY 1, 2
    """,
    "img_rect_join": f"""
        WITH {IMG_SQL_CTE}, {RECT_SQL_CTE}
        SELECT img.image_id, rect.rect_id
        FROM img, rect
        WHERE img.mx >= rect.x0 AND img.mx < rect.x1
          AND img.my >= rect.y0 AND img.my < rect.y1
    """,
    "img_pip_rects": f"""
        WITH {IMG_SQL_CTE}, {RECT_SQL_CTE}
        SELECT img.image_id, rect.rect_id
        FROM img, rect
        WHERE img.mx > rect.x0 AND img.mx < rect.x1
          AND img.my > rect.y0 AND img.my < rect.y1
    """,
    "img_knn": f"""
        WITH {IMG_SQL_CTE},
        q AS (SELECT * FROM img WHERE (idx - 1) % 97 = 0)
        SELECT query_id, neighbor_id, d2 FROM (
          SELECT q.idx AS query_id, i.image_id AS neighbor_id,
                 (i.mx - q.mx) * (i.mx - q.mx) + (i.my - q.my) * (i.my - q.my) AS d2,
                 ROW_NUMBER() OVER (
                   PARTITION BY q.idx
                   ORDER BY (i.mx - q.mx) * (i.mx - q.mx) + (i.my - q.my) * (i.my - q.my),
                            i.image_id
                 ) AS rn
          FROM img i, q WHERE i.idx != q.idx
        ) WHERE rn <= 5
    """,
    "img_knn_radius": f"""
        WITH {IMG_SQL_CTE},
        q AS (SELECT * FROM img WHERE (idx - 1) % 97 = 0)
        SELECT query_id, neighbor_id, d2 FROM (
          SELECT q.idx AS query_id, i.image_id AS neighbor_id,
                 (i.mx - q.mx) * (i.mx - q.mx) + (i.my - q.my) * (i.my - q.my) AS d2,
                 ROW_NUMBER() OVER (
                   PARTITION BY q.idx
                   ORDER BY (i.mx - q.mx) * (i.mx - q.mx) + (i.my - q.my) * (i.my - q.my),
                            i.image_id
                 ) AS rn
          FROM img i, q
          WHERE i.idx != q.idx
            AND (i.mx - q.mx) * (i.mx - q.mx) + (i.my - q.my) * (i.my - q.my)
                <= 0.05 * 0.05
        ) WHERE rn <= 5
    """,
    "img_cell_assign": f"""
        WITH {_morton_cte(8)}
        SELECT image_id, x | (y << 1) AS cell FROM c3
    """,
    "img_cell_counts": f"""
        WITH {_morton_cte(6)}
        SELECT x | (y << 1) AS cell, count(*) AS n_images FROM c3 GROUP BY 1
    """,
    "img_s2_assign": f"""
        WITH {_s2_cte(10)}
        SELECT image_id, {_S2_TO_BIGINT} AS s2_cell
        FROM (SELECT {IMG_ID} AS image_id, {_s2_hug_expr(10)} AS hug FROM s2h10)
    """,
    "img_s2_counts": f"""
        WITH {_s2_cte(7)}
        SELECT {_S2_TO_BIGINT} AS s2_cell, count(*) AS n_images
        FROM (SELECT {_s2_hug_expr(7)} AS hug FROM s2h7)
        GROUP BY 1
    """,
    "img_range_query": f"""
        WITH {IMG_SQL_CTE}
        SELECT image_id, mx, my FROM img
        WHERE mx >= 0.2 AND mx < 0.45 AND my >= 0.3 AND my < 0.55
    """,
    "img_knn_geo": f"""
        WITH gxy AS (
          SELECT doc_id + 1 AS idx,
                 {IMG_ID} AS image_id,
                 ({LNG} / 4294967296.0 - 0.5) * (2*pi()) AS lon,
                 exp(pi() * (1.0 - 2.0 * ({LAT} / 2147483648.0))) AS e
          FROM documents),
        gsph AS (
          SELECT idx, image_id,
            (2.0/(e + 1.0/e))*cos(lon) AS x,
            (2.0/(e + 1.0/e))*sin(lon) AS y,
            (e - 1.0/e)/(e + 1.0/e) AS z
          FROM gxy),
        gq AS (SELECT * FROM gsph WHERE (idx - 1) % 101 = 0)
        SELECT query_id, neighbor_id, rn AS rank FROM (
          SELECT gq.idx AS query_id, i.image_id AS neighbor_id,
                 (i.x - gq.x) * (i.x - gq.x) + (i.y - gq.y) * (i.y - gq.y)
                   + (i.z - gq.z) * (i.z - gq.z) AS chord2,
                 ROW_NUMBER() OVER (
                   PARTITION BY gq.idx
                   ORDER BY (i.x - gq.x) * (i.x - gq.x) + (i.y - gq.y) * (i.y - gq.y)
                              + (i.z - gq.z) * (i.z - gq.z),
                            i.image_id
                 ) AS rn
          FROM gsph i, gq
          WHERE i.idx != gq.idx
        ) WHERE rn <= 5
    """,
    "img_hex_knn": f"""
        WITH {IMG_SQL_CTE},
        q AS (SELECT * FROM img WHERE (idx - 1) % 89 = 0)
        SELECT query_id, neighbor_id, d2 FROM (
          SELECT q.idx AS query_id, i.image_id AS neighbor_id,
                 (i.mx - q.mx) * (i.mx - q.mx) + (i.my - q.my) * (i.my - q.my) AS d2,
                 ROW_NUMBER() OVER (
                   PARTITION BY q.idx
                   ORDER BY (i.mx - q.mx) * (i.mx - q.mx) + (i.my - q.my) * (i.my - q.my),
                            i.image_id
                 ) AS rn
          FROM img i, q
          WHERE i.idx != q.idx
            AND (i.mx - q.mx) * (i.mx - q.mx) + (i.my - q.my) * (i.my - q.my)
                <= 0.05 * 0.05
        ) WHERE rn <= 5
    """,
    "img_hex_assign": f"""
        WITH {_hex_cte(5)}
        SELECT {IMG_ID} AS image_id, cell AS hex_cell FROM hexc
    """,
    "img_hex_counts": f"""
        WITH {_hex_cte(3)}
        SELECT cell AS hex_cell, count(*) AS n_images FROM hexc GROUP BY 1
    """,
    "img_hex_density": f"""
        WITH {_hex_cte(3)},
        hexcnt AS (SELECT cell, count(*) AS n FROM hexc GROUP BY 1),
        hexoffs(dq, dr) AS (VALUES (0,0),(1,0),(1,-1),(0,-1),(-1,0),(-1,1),(0,1))
        SELECT CAST(hexcnt.cell + (dq * 16777216 + dr) AS BIGINT) AS hex_cell,
               CAST(SUM(n) AS BIGINT) AS smoothed
        FROM hexcnt, hexoffs GROUP BY 1
    """,
    # phash = (lat31 << 32) | lng32 (datagen.images.phash_of_index_vec);
    # planted variants flip ≤3 deterministic bits, mirroring
    # _image_phash_rows exactly. Pair predicate: Hamming ≤ 4 via
    # bit_count(xor); lexicographic image_a < image_b matches the numpy
    # side's object-array swap (ASCII ids ⇒ identical collation).
    "img_phash_near_dup": f"""
        WITH img AS (
          SELECT {IMG_ID} AS image_id,
                 CAST({LAT} * 4294967296 + {LNG} AS BIGINT) AS phash
          FROM documents
          UNION ALL
          SELECT {IMG_ID} || '-v',
                 xor(CAST({LAT} * 4294967296 + {LNG} AS BIGINT),
                     (CAST(1 AS BIGINT) << CAST((doc_id*7+1) % 63 AS INTEGER))
                   | (CAST(1 AS BIGINT) << CAST((doc_id*13+5) % 63 AS INTEGER))
                   | (CAST(1 AS BIGINT) << CAST((doc_id*29+11) % 63 AS INTEGER)))
          FROM documents WHERE doc_id % 20 = 0
        )
        SELECT a.image_id AS image_a, b.image_id AS image_b,
               CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
        FROM img a JOIN img b ON a.image_id < b.image_id
        WHERE bit_count(xor(a.phash, b.phash)) <= 4
    """,
    "doc_normalize": r"""
        SELECT doc_id,
               trim(regexp_replace(lower(text), '\s+', ' ', 'g'), ' ') AS norm_text,
               CAST(length(trim(regexp_replace(lower(text), '\s+', ' ', 'g'), ' ')) AS BIGINT)
                 AS norm_chars
        FROM documents
    """,
    "doc_top_tokens": """
        SELECT token, CAST(count(*) AS BIGINT) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        GROUP BY token
        ORDER BY n DESC, token
        LIMIT 20
    """,
    "doc_token_stats": """
        SELECT doc_id,
               CAST(array_length(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               CAST(length(text) - (array_length(string_split(text, ' ')) - 1) AS DOUBLE)
                 / array_length(string_split(text, ' ')) AS avg_token_len
        FROM documents
    """,
    "doc_dedup_exact": """
        SELECT md5(text) AS text_hash, count(*) AS n_dups, min(doc_id) AS keep_doc_id
        FROM documents GROUP BY md5(text)
    """,
    "doc_lang_stats": """
        SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
               min(n_chars) AS min_chars, max(n_chars) AS max_chars
        FROM documents GROUP BY lang
    """,
    "events_hourly": """
        SELECT event_type,
               (epoch_us(ts) // 3600000000) * 3600000000 AS window_start_us,
               count(*) AS n_events, min(value) AS min_value, max(value) AS max_value
        FROM events GROUP BY 1, 2
    """,
    "events_asof": """
        SELECT l.event_id, l.user_id, l.ts, r.ts AS matched_ts
        FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') l
        ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'view') r
          ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
    "emb_near_dup": """
        WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               list_dot_product(a.e, b.e)
                 / sqrt(list_dot_product(a.e, a.e) * list_dot_product(b.e, b.e)) AS cos_sim
        FROM v a, v b
        WHERE b.vec_id > a.vec_id
          AND list_dot_product(a.e, b.e)
                / sqrt(list_dot_product(a.e, a.e) * list_dot_product(b.e, b.e)) >= 0.32
    """,
    "emb_dup_clusters": """
        WITH RECURSIVE v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        prs AS (SELECT a.vec_id AS pa, b.vec_id AS pb
                FROM v a, v b
                WHERE b.vec_id > a.vec_id
                  AND list_dot_product(a.e, b.e)
                        / sqrt(list_dot_product(a.e, a.e) * list_dot_product(b.e, b.e)) >= 0.32),
        edges AS (SELECT pa AS a, pb AS b FROM prs UNION ALL SELECT pb, pa FROM prs),
        cc(node, label) AS (
            SELECT vec_id, vec_id FROM embeddings
            UNION
            SELECT e.b, cc.label FROM cc JOIN edges e ON e.a = cc.node
        ),
        labels AS (SELECT node, min(label) AS cluster_id FROM cc GROUP BY node)
        SELECT node AS vec_id, cluster_id,
               CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size
        FROM labels
    """,
    "doc_fingerprints": """
        SELECT doc_id,
               CAST(list_reduce(
                      list_prepend(CAST(0 AS HUGEINT),
                        list_transform(string_split(text, ' '),
                                       s -> CAST(md5_number_lower(s) AS HUGEINT))),
                      (acc, x) -> (acc * 1000003 + x) % 2305843009213693951)
                    AS BIGINT) AS fingerprint
        FROM documents
    """,
    "doc_simhash": f"""
        WITH {_TOKS_CTE}, {_TH_CTE}, {_shingle_cte(2)},
        bits AS (SELECT doc_id, b,
                        sum(CASE WHEN (sv >> b) & 1 = 1 THEN 1 ELSE -1 END) AS acc
                 FROM (SELECT doc_id, unnest(s) AS sv FROM sh),
                      generate_series(0, 63) AS g(b)
                 GROUP BY doc_id, b),
        sig AS (SELECT doc_id,
                       sum(CASE WHEN acc >= 0 THEN (CAST(1 AS HUGEINT) << b)
                                ELSE CAST(0 AS HUGEINT) END) AS v
                FROM bits GROUP BY doc_id)
        SELECT doc_id,
               CAST(CASE WHEN v >= 9223372036854775808 THEN v - {_U64} ELSE v END
                    AS BIGINT) AS simhash
        FROM sig
    """,
    "doc_simhash_pairs": f"""
        WITH {_TOKS_CTE}, {_TH_CTE}, {_shingle_cte(2)},
        bits AS (SELECT doc_id, b,
                        sum(CASE WHEN (sv >> b) & 1 = 1 THEN 1 ELSE -1 END) AS acc
                 FROM (SELECT doc_id, unnest(s) AS sv FROM sh),
                      generate_series(0, 63) AS g(b)
                 GROUP BY doc_id, b),
        sig AS (SELECT doc_id,
                       sum(CASE WHEN acc >= 0 THEN (CAST(1 AS HUGEINT) << b)
                                ELSE CAST(0 AS HUGEINT) END) AS v
                FROM bits GROUP BY doc_id),
        s64 AS (SELECT doc_id,
                       CAST(CASE WHEN v >= 9223372036854775808 THEN v - {_U64} ELSE v END
                            AS BIGINT) AS h
                FROM sig)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(a.h, b.h)) AS BIGINT) AS hamming
        FROM s64 a, s64 b
        WHERE a.doc_id < b.doc_id AND bit_count(xor(a.h, b.h)) <= 3
    """,
    "doc_dedup_clusters": f"""
        WITH RECURSIVE {_TOKS_CTE}, {_TH_CTE}, {_shingle_cte(2)},
        bits AS (SELECT doc_id, b,
                        sum(CASE WHEN (sv >> b) & 1 = 1 THEN 1 ELSE -1 END) AS acc
                 FROM (SELECT doc_id, unnest(s) AS sv FROM sh),
                      generate_series(0, 63) AS g(b)
                 GROUP BY doc_id, b),
        sig AS (SELECT doc_id,
                       sum(CASE WHEN acc >= 0 THEN (CAST(1 AS HUGEINT) << b)
                                ELSE CAST(0 AS HUGEINT) END) AS v
                FROM bits GROUP BY doc_id),
        s64 AS (SELECT doc_id,
                       CAST(CASE WHEN v >= 9223372036854775808 THEN v - {_U64} ELSE v END
                            AS BIGINT) AS h
                FROM sig),
        pairs AS (SELECT a.doc_id AS pa, b.doc_id AS pb
                  FROM s64 a, s64 b
                  WHERE a.doc_id < b.doc_id
                    AND bit_count(xor(a.h, b.h)) <= 3),
        edges AS (SELECT pa AS a, pb AS b FROM pairs
                  UNION ALL SELECT pb, pa FROM pairs),
        cc(node, label) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT e.b, cc.label FROM cc JOIN edges e ON e.a = cc.node
        ),
        labels AS (SELECT node, min(label) AS cluster_id FROM cc GROUP BY node)
        SELECT node AS doc_id, cluster_id,
               CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size
        FROM labels
    """,
    "doc_bpe_tokens": r"""
        WITH toks AS (SELECT doc_id,
               regexp_extract_all(text,
                 '[A-Za-z]+|[0-9]{1,3}|[^ \t\n\r\fA-Za-z0-9]+|[ \t\n\r\f]+') AS t
             FROM documents)
        SELECT doc_id,
               CAST(len(list_filter(t, x -> NOT regexp_matches(x, '^[ \t\n\r\f]')))
                    AS BIGINT) AS n_bpe_tokens,
               CAST(len(list_filter(t, x -> regexp_matches(x, '^[A-Za-z]')))
                    AS BIGINT) AS n_word_tokens
        FROM toks
    """,
    "doc_ngram_jaccard": """
        WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        sh AS (SELECT doc_id,
                      CASE WHEN len(t) >= 3 THEN
                        list_distinct(list_transform(generate_series(1, len(t)-2),
                                                     i -> array_to_string(t[i:i+2], ' ')))
                      ELSE [array_to_string(t, ' ')] END AS s
               FROM toks)
        SELECT doc_a, doc_b, jaccard FROM (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                   / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jaccard
          FROM sh a, sh b WHERE b.doc_id > a.doc_id)
        WHERE jaccard >= 0.2
    """,
    "doc_minhash_candidates": _minhash_oracle_sql(),
    "doc_quality": f"""
        WITH w AS (SELECT doc_id, text,
                          regexp_extract_all(text, '[A-Za-z]+') AS words
                   FROM documents)
        SELECT doc_id,
               CASE WHEN len(words) = 0 THEN 0.0 ELSE
                 CAST(len(list_filter(words, x -> lower(x) IN ({_STOPWORDS_SQL})))
                      AS DOUBLE) / len(words) END AS stop_ratio,
               CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
                 / GREATEST(1, length(text)) AS alpha_ratio,
               CASE WHEN len(words) = 0 THEN 0.0 ELSE
                 CAST(list_sum(list_transform(words, x -> length(x))) AS DOUBLE)
                   / len(words) END AS mean_word_len
        FROM w
    """,
    "doc_langid": r"""
        WITH t AS (SELECT doc_id, lower(substr(text, 1, 500)) AS tl,
                          substr(text, 1, 200) AS head
                   FROM documents),
        tok AS (SELECT doc_id, head,
                       list_distinct(string_split_regex(tl, '\s+')) AS toks
                FROM t),
        hits AS (SELECT doc_id, head,
                        len(list_intersect(toks, ['the','and','of','to','is'])) AS h_en,
                        len(list_intersect(toks, ['der','die','und','das','ist'])) AS h_de,
                        len(list_intersect(toks, ['le','la','et','les','est'])) AS h_fr,
                        len(list_intersect(toks, ['el','la','los','es','y'])) AS h_es
                 FROM tok)
        SELECT doc_id,
               CASE WHEN length(regexp_replace(head, '[^\x{4e00}-\x{9fff}]', '', 'g')) > 5
                      THEN 'zh'
                    WHEN h_en >= h_de AND h_en >= h_fr AND h_en >= h_es THEN 'en'
                    WHEN h_de >= h_fr AND h_de >= h_es THEN 'de'
                    WHEN h_fr >= h_es THEN 'fr'
                    ELSE 'es' END AS lang_pred
        FROM hits
    """,
    "ann_topk": """
        WITH q AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
                   WHERE vec_id % 50 = 0),
        v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
        SELECT query_id, neighbor_id, cos_sim FROM (
          SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
                 list_dot_product(q.e, v.e)
                   / sqrt(list_dot_product(q.e, q.e) * list_dot_product(v.e, v.e)) AS cos_sim,
                 ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY list_dot_product(q.e, v.e)
                     / sqrt(list_dot_product(q.e, q.e) * list_dot_product(v.e, v.e)) DESC,
                     v.vec_id
                 ) AS rn
          FROM q, v WHERE v.vec_id != q.vec_id
        ) WHERE rn <= 5
    """,
    "tpch_pricing": """
        WITH li AS (
          SELECT l_returnflag, l_linestatus,
                 CAST(ROUND(l_quantity) AS BIGINT) AS qty,
                 CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price_c,
                 CAST(ROUND(l_discount * 100) AS BIGINT) AS disc_p,
                 CAST(ROUND(l_tax * 100) AS BIGINT) AS tax_p
          FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00')
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(qty) AS BIGINT) AS sum_qty,
               CAST(SUM(price_c) AS BIGINT) AS sum_base_price_cents,
               CAST(SUM(price_c * (100 - disc_p)) AS BIGINT) AS sum_disc_price_e4,
               CAST(SUM(price_c * (100 - disc_p) * (100 + tax_p)) AS BIGINT) AS sum_charge_e6,
               COUNT(*) AS n_rows,
               CAST(CAST(SUM(qty) AS BIGINT) AS DOUBLE) / COUNT(*) AS avg_qty
        FROM li GROUP BY 1, 2
    """,
    "tpch_revenue_nation": """
        SELECT n.n_name, r.r_name,
               CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS revenue_cents,
               COUNT(*) AS n_orders
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY 1, 2
    """,
    "tpch_top_customers": """
        SELECT c_custkey, c_nationkey, c_acctbal, rn AS rank FROM (
          SELECT c_custkey, c_nationkey, c_acctbal,
                 ROW_NUMBER() OVER (
                   PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
                 ) AS rn
          FROM customer
        ) WHERE rn <= 3
    """,
    "events_sessions": """
        WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
        g AS (SELECT user_id, us,
                     CASE WHEN us - LAG(us) OVER w > 1800000000
                            OR LAG(us) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
              FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
        s AS (SELECT user_id, us,
                     SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
                                      ROWS UNBOUNDED PRECEDING) AS sid
              FROM g)
        SELECT user_id, CAST(sid AS BIGINT) AS session_id,
               MIN(us) AS session_start_us, MAX(us) AS session_end_us,
               COUNT(*) AS n_events
        FROM s GROUP BY user_id, sid
    """,
    "events_distinct_users": """
        SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS window_start_us,
               COUNT(DISTINCT user_id) AS n_users
        FROM events GROUP BY 1
    """,
    "tpch_priority_revenue": """
        SELECT o_orderpriority,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS BIGINT)
                 AS revenue_e4,
               COUNT(*) AS n_lineitems
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1
    """,
    "tpch_cumulative_revenue": """
        SELECT o_custkey, o_orderkey, o_orderdate,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS UNBOUNDED PRECEDING
               ) AS BIGINT) AS cum_revenue_cents
        FROM orders
    """,
    "doc_samples": """
        SELECT 'hash10' AS kind, doc_id, lang,
               CAST(0 AS BIGINT) AS h, CAST(0 AS BIGINT) AS rank
        FROM documents
        WHERE CAST(md5_number_lower(CAST(doc_id AS VARCHAR)) AS HUGEINT) % 10 = 0
        UNION ALL
        SELECT 'strat20' AS kind, doc_id, lang, h, rn AS rank FROM (
          SELECT doc_id, lang, h,
                 ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h DESC, doc_id) AS rn
          FROM (SELECT doc_id, lang,
                       CAST(md5_number_lower(CAST(doc_id AS VARCHAR))
                            % 9223372036854775808 AS BIGINT) AS h
                FROM documents)
        ) WHERE rn <= 20
    """,
    "doc_dup_spans": """
        WITH nums AS (
          SELECT unnest(generate_series(
            1, (SELECT MAX(length(text)) FROM documents))) AS i
        ),
        grams AS (
          SELECT d.doc_id, n.i - 1 AS pos, substr(d.text, n.i, 30) AS g
          FROM documents d JOIN nums n ON n.i <= length(d.text) - 29
        ),
        dups AS (SELECT g FROM grams GROUP BY g HAVING count(*) >= 2),
        hits AS (SELECT doc_id, pos FROM grams WHERE g IN (SELECT g FROM dups)),
        marked AS (
          SELECT doc_id, pos,
            CASE WHEN pos <= max(pos + 30) OVER (
                   PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 THEN 0 ELSE 1 END AS brk
          FROM hits
        ),
        islands AS (
          SELECT doc_id, pos,
                 SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
          FROM marked
        )
        SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + 30 AS span_end,
               MAX(pos) + 30 - MIN(pos) AS span_len
        FROM islands GROUP BY doc_id, island
    """,
    "doc_length_quantiles": """
        SELECT lang, median(CAST(n_chars AS DOUBLE)) AS median_chars,
               quantile_cont(CAST(n_chars AS DOUBLE), 0.9) AS p90_chars,
               COUNT(*) AS n_docs
        FROM documents GROUP BY lang
    """,
    "events_value_quantiles": """
        WITH s AS (
          SELECT quantile_cont(CAST(value AS DOUBLE),
                               [0.1, 0.5, 0.9, 0.99]) AS vs,
                 COUNT(*) AS n
          FROM events
        )
        SELECT unnest([0.1, 0.5, 0.9, 0.99]) AS q,
               unnest(vs) AS value, n
        FROM s
    """,
}
