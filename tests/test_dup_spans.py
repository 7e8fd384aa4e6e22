"""Exact substring duplicate spans (text.duplicate_spans) vs brute force
and vs the DuckDB gaps-and-islands oracle (the SQL registered for the
driver's correctness gate)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _brute_spans(texts: dict[int, str], L: int) -> set[tuple[int, int, int]]:
    from collections import Counter

    grams: Counter = Counter()
    for t in texts.values():
        for i in range(len(t) - L + 1):
            grams[t[i : i + L]] += 1
    spans = set()
    for did, t in texts.items():
        hits = [i for i in range(len(t) - L + 1) if grams[t[i : i + L]] >= 2]
        if not hits:
            continue
        start, end = hits[0], hits[0] + L
        for p in hits[1:]:
            if p <= end:  # overlapping or touching windows merge
                end = max(end, p + L)
            else:
                spans.add((did, start, end))
                start, end = p, p + L
        spans.add((did, start, end))
    return spans


def _make_corpus(seed: int = 11, n: int = 60) -> dict[int, str]:
    rng = np.random.default_rng(seed)
    vocab = ["alpha", "bravo", "charlie", "delta", "echo", "fox", "golf", "hotel"]
    texts = {}
    for d in range(n):
        words = [vocab[i] for i in rng.integers(0, len(vocab), 25)]
        texts[d] = " ".join(words)
    # planted exact duplicates: a long shared sentence across two docs,
    # a within-doc repeat, and a doc too short to window
    shared = "the quick brown fox jumps over the lazy dog again and again"
    texts[n] = "prefix one " + shared + " suffix one"
    texts[n + 1] = "prefix twoo " + shared + " suffix twoo"
    texts[n + 2] = "zz " + shared[:35] + " mid " + shared[:35] + " end"
    texts[n + 3] = "tiny"
    return texts


@pytest.mark.parametrize("L", [12, 30])
def test_duplicate_spans_matches_bruteforce(ray_session, L):
    import ray

    from geojson_vt_ray.ray_pipeline.text import duplicate_spans

    texts = _make_corpus()
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(texts.keys()), pa.int64()),
                "text": pa.array(list(texts.values()), pa.string()),
            }
        )
    )
    got = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in duplicate_spans(ds, min_len=L, n_partitions=16).iter_rows()
    }
    assert got == _brute_spans(texts, L)
    assert len(got) > 0


def test_duplicate_spans_matches_duckdb_oracle(ray_session):
    """The exact SQL shape registered in oracle_sql(): grams via
    generate_series + substr, count>=2, gaps-and-islands merge."""
    import ray

    from geojson_vt_ray.ray_pipeline.text import duplicate_spans

    texts = _make_corpus(seed=5, n=40)
    df = pd.DataFrame(
        {"doc_id": list(texts.keys()), "text": list(texts.values())}
    )
    L = 20
    con = duckdb.connect()
    con.register("documents", df)
    oracle = con.execute(
        f"""
        WITH nums AS (
          SELECT unnest(generate_series(
            1, (SELECT MAX(length(text)) FROM documents))) AS i
        ),
        grams AS (
          SELECT d.doc_id, n.i - 1 AS pos, substr(d.text, n.i, {L}) AS g
          FROM documents d JOIN nums n ON n.i <= length(d.text) - {L - 1}
        ),
        dups AS (SELECT g FROM grams GROUP BY g HAVING count(*) >= 2),
        hits AS (SELECT doc_id, pos FROM grams WHERE g IN (SELECT g FROM dups)),
        marked AS (
          SELECT doc_id, pos,
            CASE WHEN pos <= max(pos + {L}) OVER (
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
        SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + {L} AS span_end,
               MAX(pos) + {L} - MIN(pos) AS span_len
        FROM islands GROUP BY doc_id, island
        """
    ).fetchall()
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(texts.keys()), pa.int64()),
                "text": pa.array(list(texts.values()), pa.string()),
            }
        )
    )
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_len"])
        for r in duplicate_spans(ds, min_len=L, n_partitions=16).iter_rows()
    }
    assert got == {tuple(r) for r in oracle}
    assert len(got) > 0


def test_duplicate_spans_winnowed_detects_unaligned_duplicates(ray_session):
    """winnow=w ships ~2/(w+1) of the windows yet must still detect every
    duplicated region of length >= L + w - 1 — including duplicates at
    DIFFERENT byte offsets in their documents (the case a naive position
    stride misses), with reported spans contained in the exact spans."""
    import ray

    from geojson_vt_ray.ray_pipeline.text import duplicate_spans

    L, W = 20, 8
    texts = _make_corpus(seed=23, n=50)
    # force unaligned placements of a long shared passage
    passage = "winnowing selects content defined fingerprints deterministically"
    assert len(passage) >= L + W - 1
    texts[100] = "a" * 7 + passage + " tail one xx"
    texts[101] = "bcdefghijklmn " + passage + " tail twoo"

    def run(w):
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(list(texts.keys()), pa.int64()),
                    "text": pa.array(list(texts.values()), pa.string()),
                }
            )
        )
        return {
            (r["doc_id"], r["span_start"], r["span_end"])
            for r in duplicate_spans(ds, min_len=L, n_partitions=16, winnow=w).iter_rows()
        }

    exact = run(1)
    winnowed = run(W)
    assert exact == _brute_spans(texts, L)
    # no false positives: every winnowed span lies inside an exact span
    for d, s, e in winnowed:
        assert any(
            d == d2 and s >= s2 and e <= e2 for d2, s2, e2 in exact
        ), (d, s, e)
    # the planted unaligned passage is detected in BOTH docs
    for did in (100, 101):
        assert any(d == did for d, _, _ in winnowed), did
    # boundary slack: the winnowed span covers the passage interior
    for did in (100, 101):
        off = texts[did].index(passage)
        spans = [(s, e) for d, s, e in winnowed if d == did]
        assert any(
            s <= off + W - 1 and e >= off + len(passage) - (W - 1)
            for s, e in spans
        ), (did, spans)
