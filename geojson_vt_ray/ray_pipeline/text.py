"""Text-analysis + deduplication operators over the documents table.

All hot paths are vectorized or batch-local; shuffles only move small partial
results (pre-aggregation pattern) or candidate keys (LSH banding):

* token/quality stats — stateless ``map_batches`` (compiled regex per actor).
* exact dedup — content-hash column per batch → ``groupby(hash)`` over
  (hash, doc_id) pairs only, never the text bodies.
* MinHash-LSH near-dup — per-batch shingle→minhash signatures → explode to
  (band, band_hash, doc_id) rows → ``groupby`` bands → candidate pairs →
  exact-Jaccard verification joins only the candidate texts.
* SimHash — 64-bit signature per doc; near-dups = equal rotated prefixes.
* language ID — n-gram/stopword heuristic per batch (actor-pool stage).
* fingerprinting — polynomial rolling hash over tokens.
"""

from __future__ import annotations

import hashlib
import re
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

MERSENNE61 = (1 << 61) - 1
_WS_RE = re.compile(r"\s+")


# ---------------------------------------------------------------- token stats

def token_stats(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """doc_id, n_tokens (single-space split), n_chars, avg_token_len.

    Split convention = split on single space (matches the SQL oracle's
    string_split(text, ' ')).
    """

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        n_tokens = np.empty(len(texts), dtype=np.int64)
        tok_chars = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            parts = t.split(" ")
            n_tokens[i] = len(parts)
            tok_chars[i] = sum(len(p) for p in parts)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": pa.array(n_tokens),
                "n_chars": pc.cast(pc.utf8_length(batch.column("text")), pa.int64()),
                "avg_token_len": pa.array(tok_chars / n_tokens),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow")


# ------------------------------------------------------------- quality scores

class QualityScorer:
    """Actor-pool quality scoring: stopword ratio, alpha ratio, mean word
    length — regexes/stopset compiled once per actor."""

    STOPWORDS = frozenset(
        "the a an and or of to in is are was were be been it this that with for on as at by".split()
    )

    def __init__(self) -> None:
        self.word_re = re.compile(r"[A-Za-z]+")

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        stop_ratio = np.zeros(len(texts))
        alpha_ratio = np.zeros(len(texts))
        mean_wlen = np.zeros(len(texts))
        for i, t in enumerate(texts):
            words = self.word_re.findall(t)
            if words:
                stop_ratio[i] = sum(w.lower() in self.STOPWORDS for w in words) / len(words)
                mean_wlen[i] = sum(map(len, words)) / len(words)
            alpha_ratio[i] = sum(c.isalpha() for c in t) / max(1, len(t))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "stop_ratio": pa.array(stop_ratio),
                "alpha_ratio": pa.array(alpha_ratio),
                "mean_word_len": pa.array(mean_wlen),
            }
        )


def quality_scores(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    return docs.map_batches(QualityScorer, batch_format="pyarrow", concurrency=(1, 32))


# ------------------------------------------------------------------ lang id

class LangId:
    """Character-frequency + stopword-hit language heuristic (en/de/fr/es/zh)."""

    MARKERS = {
        "en": {"the", "and", "of", "to", "is"},
        "de": {"der", "die", "und", "das", "ist"},
        "fr": {"le", "la", "et", "les", "est"},
        "es": {"el", "la", "los", "es", "y"},
    }

    def __init__(self) -> None:
        self.ws = _WS_RE

    def classify(self, text: str) -> str:
        # CJK codepoints dominate → zh
        cjk = sum(1 for c in text[:200] if "一" <= c <= "鿿")
        if cjk > 5:
            return "zh"
        toks = set(self.ws.split(text.lower()[:500]))
        best, best_hits = "en", -1
        for lang, markers in self.MARKERS.items():
            hits = len(toks & markers)
            if hits > best_hits:
                best, best_hits = lang, hits
        return best

    def __call__(self, batch: pa.Table) -> pa.Table:
        langs = [self.classify(t) for t in batch.column("text").to_pylist()]
        return pa.table(
            {"doc_id": batch.column("doc_id"), "lang_pred": pa.array(langs, pa.string())}
        )


def lang_id(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    return docs.map_batches(LangId, batch_format="pyarrow", concurrency=(1, 32))


# ------------------------------------------------------------- fingerprinting

def fingerprints(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Polynomial rolling hash over the token stream mod 2^61-1 (order
    sensitive — a document permutation changes the fingerprint)."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        fps = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            h = 0
            for tok in t.split(" "):
                th = int.from_bytes(hashlib.blake2b(tok.encode(), digest_size=8).digest(), "big")
                h = (h * 1_000_003 + th) % MERSENNE61
            fps[i] = h
        return pa.table({"doc_id": batch.column("doc_id"), "fingerprint": pa.array(fps)})

    return docs.map_batches(fn, batch_format="pyarrow")


# --------------------------------------------------------------- exact dedup

def exact_dedup_groups(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Duplicate groups by exact text content: (text_hash, n_dups, min doc_id).

    Only (hash, doc_id) pairs shuffle; text bodies never leave the first
    stage.
    """

    def hash_stage(batch: pa.Table) -> pa.Table:
        hashes = [hashlib.md5(t.encode()).hexdigest() for t in batch.column("text").to_pylist()]
        return pa.table(
            {"text_hash": pa.array(hashes, pa.string()), "doc_id": batch.column("doc_id")}
        )

    from ray.data.aggregate import Count, Min

    pairs = docs.map_batches(hash_stage, batch_format="pyarrow")
    return pairs.groupby("text_hash").aggregate(
        Count(alias_name="n_dups"), Min("doc_id", alias_name="keep_doc_id")
    )


# ---------------------------------------------------------------- MinHash-LSH

def _token_shingles(text: str, k: int) -> set[bytes]:
    toks = text.split(" ")
    if len(toks) < k:
        return {" ".join(toks).encode()}
    return {" ".join(toks[i : i + k]).encode() for i in range(len(toks) - k + 1)}


MERSENNE31 = (1 << 31) - 1


class MinHasher:
    """Per-batch MinHash signatures (n_perm universal hashes over blake2
    shingle hashes), banded for LSH.

    Arithmetic is fully vectorized in uint64: a, b, h < 2^31 so a*h + b never
    overflows; modulus 2^31-1."""

    def __init__(self, n_perm: int = 64, shingle_k: int = 3, seed: int = 42):
        rs = np.random.RandomState(seed)  # fixed seed — deterministic across actors
        self.a = rs.randint(1, MERSENNE31, size=n_perm).astype(np.uint64)
        self.b = rs.randint(0, MERSENNE31, size=n_perm).astype(np.uint64)
        self.n_perm = n_perm
        self.shingle_k = shingle_k

    def signature(self, text: str) -> np.ndarray:
        sh = _token_shingles(text, self.shingle_k)
        hv = np.array(
            [
                int.from_bytes(hashlib.blake2b(s, digest_size=4).digest(), "big") % MERSENNE31
                for s in sh
            ],
            dtype=np.uint64,
        )
        # (a*h + b) mod p over the (perm, shingle) matrix, min per permutation
        m = (self.a[:, None] * hv[None, :] + self.b[:, None]) % np.uint64(MERSENNE31)
        return m.min(axis=1)


def minhash_band_rows(
    docs: "ray.data.Dataset", n_perm: int = 64, bands: int = 16, shingle_k: int = 3
) -> "ray.data.Dataset":
    """doc → (band, band_hash, doc_id) rows; equal band_hash within a band ⇒
    LSH candidate bucket."""
    rows_per_band = n_perm // bands

    class BandStage:
        def __init__(self) -> None:
            self.mh = MinHasher(n_perm=n_perm, shingle_k=shingle_k)

        def __call__(self, batch: pa.Table) -> pa.Table:
            doc_ids = batch.column("doc_id").to_pylist()
            out_band: list[int] = []
            out_hash: list[int] = []
            out_doc: list[int] = []
            for did, text in zip(doc_ids, batch.column("text").to_pylist()):
                sig = self.mh.signature(text)
                for b in range(bands):
                    chunk = sig[b * rows_per_band : (b + 1) * rows_per_band]
                    bh = int.from_bytes(
                        hashlib.blake2b(chunk.tobytes(), digest_size=8).digest(), "big"
                    ) >> 1
                    out_band.append(b)
                    out_hash.append(bh)
                    out_doc.append(did)
            return pa.table(
                {
                    "band": pa.array(out_band, pa.int32()),
                    "band_hash": pa.array(out_hash, pa.int64()),
                    "doc_id": pa.array(out_doc, pa.int64()),
                }
            )

    return docs.map_batches(BandStage, batch_format="pyarrow", concurrency=(1, 32))


def minhash_candidate_pairs(
    docs: "ray.data.Dataset", n_perm: int = 64, bands: int = 16, shingle_k: int = 3
) -> "ray.data.Dataset":
    """Candidate near-duplicate pairs (doc_a < doc_b) from LSH buckets,
    deduplicated across bands."""
    band_rows = minhash_band_rows(docs, n_perm, bands, shingle_k)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(g["doc_id"].tolist())
        pairs = [(a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]]
        if not pairs:
            return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                                 "doc_b": pd.Series([], dtype="int64")})
        return pd.DataFrame(pairs, columns=["doc_a", "doc_b"])

    pairs = band_rows.groupby(["band", "band_hash"]).map_groups(
        bucket_pairs, batch_format="pandas"
    )
    # dedup identical pairs found in multiple bands
    from ray.data.aggregate import Count

    return pairs.groupby(["doc_a", "doc_b"]).aggregate(Count(alias_name="n_bands"))


def verify_jaccard(
    docs: "ray.data.Dataset",
    candidate_pairs: list[tuple[int, int]],
    shingle_k: int = 3,
    threshold: float = 0.7,
) -> list[tuple[int, int, float]]:
    """Exact Jaccard verification of candidate pairs (small candidate set:
    texts fetched via a broadcast filter)."""
    import ray as _ray

    need = {d for p in candidate_pairs for d in p}
    need_ref = _ray.put(need)

    def fetch(batch: pa.Table) -> pa.Table:
        wanted = _ray.get(need_ref)
        mask = pa.array([d in wanted for d in batch.column("doc_id").to_pylist()])
        return batch.filter(mask).select(["doc_id", "text"])

    texts = {
        r["doc_id"]: r["text"]
        for r in docs.map_batches(fetch, batch_format="pyarrow").iter_rows()
    }
    out = []
    for a, b in candidate_pairs:
        sa = _token_shingles(texts[a], shingle_k)
        sb = _token_shingles(texts[b], shingle_k)
        j = len(sa & sb) / len(sa | sb)
        if j >= threshold:
            out.append((a, b, j))
    return out


# ----------------------------------------------------- exact n-gram Jaccard

def ngram_jaccard_pairs(
    docs: "ray.data.Dataset", threshold: float = 0.5, shingle_k: int = 3
) -> "ray.data.Dataset":
    """Exact all-pairs n-gram Jaccard near-dup detection.

    Each batch compares its docs against the broadcast full shingle-set
    table (hashes only — texts never ship); emits (doc_a < doc_b, jaccard)
    above the threshold. Quadratic — the LSH path (`minhash_candidate_pairs`)
    is the scale variant; this is the exactness baseline it is verified
    against.
    """
    import ray as _ray

    def shingle_stage(batch: pa.Table) -> pa.Table:
        rows = []
        for did, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            hs = sorted(
                int.from_bytes(hashlib.blake2b(s, digest_size=8).digest(), "big") >> 1
                for s in _token_shingles(text, shingle_k)
            )
            rows.append({"doc_id": did, "shingles": hs})
        return pa.Table.from_pylist(
            rows,
            schema=pa.schema([("doc_id", pa.int64()), ("shingles", pa.list_(pa.int64()))]),
        )

    shingled = docs.map_batches(shingle_stage, batch_format="pyarrow")
    all_sets = {
        r["doc_id"]: frozenset(r["shingles"]) for r in shingled.iter_rows()
    }
    sets_ref = _ray.put(all_sets)

    def pair_stage(batch: pa.Table) -> pa.Table:
        sets = _ray.get(sets_ref)
        out_a: list[int] = []
        out_b: list[int] = []
        out_j: list[float] = []
        for did in batch.column("doc_id").to_pylist():
            sa = sets[did]
            for other, sb in sets.items():
                if other <= did:
                    continue
                inter = len(sa & sb)
                if inter == 0:
                    continue
                j = inter / (len(sa) + len(sb) - inter)
                if j >= threshold:
                    out_a.append(did)
                    out_b.append(other)
                    out_j.append(j)
        return pa.table(
            {
                "doc_a": pa.array(out_a, pa.int64()),
                "doc_b": pa.array(out_b, pa.int64()),
                "jaccard": pa.array(out_j, pa.float64()),
            }
        )

    return shingled.map_batches(pair_stage, batch_format="pyarrow")


# ------------------------------------------------------- BPE-ish tokenization

_BPE_RE = re.compile(
    r"[A-Za-z]+|[0-9]{1,3}|[^\sA-Za-z0-9]+|\s+"
)


def bpe_token_counts(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Token counting with a BPE-ish pretokenizer regex (letter runs, short
    digit groups, punctuation runs, whitespace runs — GPT-2-style shape)."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        n_tokens = np.empty(len(texts), dtype=np.int64)
        n_word = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            toks = _BPE_RE.findall(t)
            n_tokens[i] = sum(1 for tk in toks if not tk.isspace())
            n_word[i] = sum(1 for tk in toks if tk[:1].isalpha())
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_bpe_tokens": pa.array(n_tokens),
                "n_word_tokens": pa.array(n_word),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow")


# ------------------------------------------------------------------- SimHash

def simhash_signatures(docs: "ray.data.Dataset", shingle_k: int = 2) -> "ray.data.Dataset":
    """64-bit SimHash per document over token shingles."""

    def fn(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id")
        sigs = np.empty(batch.num_rows, dtype=np.uint64)
        for i, text in enumerate(batch.column("text").to_pylist()):
            acc = np.zeros(64, dtype=np.int64)
            for s in _token_shingles(text, shingle_k):
                h = int.from_bytes(hashlib.blake2b(s, digest_size=8).digest(), "big")
                bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
                acc += np.where(bits.astype(bool), 1, -1)
            sigs[i] = np.packbits((acc >= 0).astype(np.uint8), bitorder="little").view(np.uint64)[0]
        return pa.table({"doc_id": doc_ids, "simhash": pa.array(sigs.astype(np.int64))})

    return docs.map_batches(fn, batch_format="pyarrow")
