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


def _image_points(sf_dir: str) -> "ray.data.Dataset":
    """Image rows (no pixel payloads) georeferenced from doc_id+1."""
    from ..datagen.images import phash_of_index_vec

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def build(batch: pa.Table) -> pa.Table:
        idx = batch.column("doc_id").to_numpy() + 1
        ph = phash_of_index_vec(idx)
        ids = [f"img-{i:012d}" for i in idx]
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


def q_doc_ngram_jaccard(sf_dir: str):
    """Exact n-gram Jaccard near-dup pairs over documents (non-SQL)."""
    from .text import ngram_jaccard_pairs

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ngram_jaccard_pairs(docs, threshold=0.2)


def q_doc_bpe_tokens(sf_dir: str):
    """BPE-ish regex token counts (non-SQL: regex class semantics)."""
    from .text import bpe_token_counts

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return bpe_token_counts(docs)


def q_rect_raster(sf_dir: str):
    """Raster tiles from the sliced rectangle layer (z0..z3): per-tile
    scanline rasterization coverage (non-SQL)."""
    from ..datagen.rects import rect_geojson
    from ..options import TilerOptions
    from .raster import rasterize_tiles
    from .tiler import build_tiles, dataset_from_geojson

    keys = _part_keys(sf_dir)
    gj = rect_geojson(keys[:200])
    tiles = build_tiles(dataset_from_geojson(gj), TilerOptions(max_zoom=3), mode="pyramid")
    return rasterize_tiles(tiles, size=64).select_columns(["z", "x", "y", "coverage"])


def q_img_cluster(sf_dir: str):
    """Exact greedy clustering (reference supercluster semantics) of the
    image points; zoom-1 cluster tiles (non-SQL: order-dependent greedy)."""
    from ..options import ClusterOptions
    from .cluster_stage import cluster_tiles_exact

    return cluster_tiles_exact(
        _image_points(sf_dir), ClusterOptions(max_zoom=8), zoom=1
    )


QUERIES: dict[str, Callable[[str], Any]] = {
    "img_tile_assign": q_img_tile_assign,
    "img_tile_counts": q_img_tile_counts,
    "img_rect_join": q_img_rect_join,
    "img_pip_rects": q_img_pip_rects,
    "img_knn": q_img_knn,
    "img_decode_stats": q_img_decode_stats,
    "rect_pyramid": q_rect_pyramid,
    "rect_raster": q_rect_raster,
    "img_cluster": q_img_cluster,
    "doc_token_stats": q_doc_token_stats,
    "doc_dedup_exact": q_doc_dedup_exact,
    "doc_lang_stats": q_doc_lang_stats,
    "doc_quality": q_doc_quality,
    "doc_langid": q_doc_langid,
    "doc_simhash": q_doc_simhash,
    "doc_fingerprints": q_doc_fingerprints,
    "doc_minhash_candidates": q_doc_minhash_candidates,
    "events_hourly": q_events_hourly,
    "ann_topk": q_ann_topk,
    "ann_lsh_topk": q_ann_lsh_topk,
    "emb_near_dup": q_emb_near_dup,
    "doc_ngram_jaccard": q_doc_ngram_jaccard,
    "doc_bpe_tokens": q_doc_bpe_tokens,
}


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
}
