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
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

MERSENNE61 = (1 << 61) - 1
MERSENNE31 = (1 << 31) - 1
_WS_RE = re.compile(r"\s+")

# Public 32-bit mixing primes (xxhash32 constants) — shingle hashes combine
# token hashes with these so the formula is reproducible in plain SQL
# (HUGEINT arithmetic mod 2^64 == numpy uint64 wraparound).
SHINGLE_PRIMES = (2654435761, 2246822519, 3266489917, 668265263, 374761393)
_PRIMES_U64 = np.array(SHINGLE_PRIMES, dtype=np.uint64)
U64_MOD = 1 << 64


def md5_u64(data: bytes) -> int:
    """Lower 8 bytes of md5, little-endian — identical to DuckDB's
    ``md5_number_lower`` so every hash-derived operator can carry an exact
    SQL oracle."""
    return int.from_bytes(hashlib.md5(data).digest()[8:], "little")


class TokenHasher:
    """Vectorized token→shingle hashing with a per-actor vocabulary cache.

    Token hash = md5_number_lower(token); k-shingle hash = the wraparound
    (mod 2^64) dot product of the window's token hashes with SHINGLE_PRIMES.
    Texts shorter than k hash all their tokens as one window. Returns the
    *distinct* shingle hashes (set semantics, matching `_token_shingles`).

    The vocabulary cache is BOUNDED (cleared past ``cache_cap`` entries):
    real corpora are Zipf-distributed so the hot vocabulary fits and hits,
    but a worst-case stream of all-distinct tokens must not grow an
    actor's heap without limit — the cache is an optimization, never a
    correctness dependency.
    """

    def __init__(self, k: int, cache_cap: int = 2_000_000):
        self.k = k
        self.cache_cap = cache_cap
        self._cache: dict[str, int] = {}

    def token_hashes(self, toks: list[str]) -> np.ndarray:
        cache = self._cache
        if len(cache) > self.cache_cap:
            cache.clear()
        out = np.empty(len(toks), dtype=np.uint64)
        for i, t in enumerate(toks):
            h = cache.get(t)
            if h is None:
                h = md5_u64(t.encode())
                cache[t] = h
            out[i] = h
        return out

    def shingles(self, text: str) -> np.ndarray:
        toks = text.split(" ")
        th = self.token_hashes(toks)
        k = self.k
        n = len(th)
        if n < k:
            return np.array([(th * _PRIMES_U64[:n]).sum()], dtype=np.uint64)
        m = n - k + 1
        acc = np.zeros(m, dtype=np.uint64)
        for j in range(k):
            acc += th[j : j + m] * _PRIMES_U64[j]
        return np.unique(acc)

    def shingle_stream(
        self, col: "pa.Array | pa.ChunkedArray"
    ) -> tuple[np.ndarray, np.ndarray]:
        """All shingle hashes of a batch, doc-contiguous, plus per-doc
        start offsets — fully vectorized over the Arrow column.

        Tokenize with Arrow's C++ split; md5 runs once per BATCH-UNIQUE
        token (dictionary_encode) on top of the cross-batch cache; the
        k-window wraparound dot products are k vectorized passes over
        the flat token-hash array. Unlike the per-doc `shingles()` path
        this does NOT dedup shingles within a doc (`distinct_shingle_lists`
        adds that vectorized). Short docs (< k tokens) use the same
        one-shingle expression as `shingles()`."""
        import pyarrow.compute as pc

        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        toks = pc.split_pattern(col, " ")
        offs = toks.offsets.to_numpy().astype(np.int64)
        flat = toks.values
        d = flat.dictionary_encode()
        codes = d.indices.to_numpy().astype(np.int64)
        uniq = d.dictionary.to_pylist()
        cache = self._cache
        if len(cache) > self.cache_cap:
            cache.clear()
        uh = np.empty(len(uniq), dtype=np.uint64)
        for i, t in enumerate(uniq):
            h = cache.get(t)
            if h is None:
                h = md5_u64(t.encode())
                cache[t] = h
            uh[i] = h
        th = uh[codes]

        k = self.k
        n = np.diff(offs)  # tokens per doc (>= 1: split never yields [])
        n_docs = len(n)
        cnt = np.where(n >= k, n - k + 1, 1)  # shingles per doc
        out_offs = np.concatenate(([0], np.cumsum(cnt)))
        out = np.zeros(out_offs[-1], dtype=np.uint64)

        # long docs: every in-doc window start, k wraparound-dot passes
        doc_of = np.repeat(np.arange(n_docs), n)
        pos_in_doc = np.arange(len(th)) - np.repeat(offs[:-1], n)
        long_start = pos_in_doc <= np.repeat(n - k, n)  # n-k < 0 kills short docs
        starts = np.nonzero(long_start)[0]
        acc = np.zeros(len(starts), dtype=np.uint64)
        for j in range(k):
            acc += th[starts + j] * _PRIMES_U64[j]
        long_docs = np.nonzero(n >= k)[0]
        m_long = cnt[long_docs]
        dst = np.repeat(
            out_offs[long_docs] - np.concatenate(([0], np.cumsum(m_long)[:-1])),
            m_long,
        ) + np.arange(int(m_long.sum()))
        out[dst] = acc

        # short docs (n < k): one shingle = sum(th[:n] * primes[:n])
        short_docs = np.nonzero(n < k)[0]
        if len(short_docs):
            wp = _PRIMES_U64[np.minimum(pos_in_doc, k - 1)]
            seg = np.add.reduceat(th * wp, offs[:-1])
            out[out_offs[short_docs]] = seg[short_docs]
        return out, out_offs[:-1]

    def distinct_shingle_lists(
        self, col: "pa.Array | pa.ChunkedArray"
    ) -> tuple[np.ndarray, np.ndarray]:
        """Per-doc SORTED-DISTINCT shingle hashes as (flat values, per-doc
        lengths) — the whole-batch vectorized equivalent of
        ``[self.shingles(t) for t in texts]`` (bit-identical sets AND order:
        `shingles()` ends in np.unique, so both emit sorted-distinct). One
        lexsort + one adjacent-equality pass replaces 10^6 tiny per-doc
        np.unique calls; measured 312 us/doc -> ~15 us/doc on the dedup
        chain corpus (the verify join side's dominant cost)."""
        flat, offs = self.shingle_stream(col)
        n_docs = len(offs)
        cnt = np.diff(np.append(offs, len(flat)))
        doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), cnt)
        order = np.lexsort((flat, doc_of))
        fv = flat[order]
        dv = doc_of[order]
        if len(fv) == 0:
            return fv, np.zeros(n_docs, dtype=np.int64)
        keep = np.concatenate(
            ([True], (dv[1:] != dv[:-1]) | (fv[1:] != fv[:-1]))
        )
        return fv[keep], np.bincount(dv[keep], minlength=n_docs)


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
    # task-based: the scorer's only state is a compiled regex + stopset —
    # serialized once with the closure, hydrated per worker.
    scorer = QualityScorer()
    return docs.map_batches(
        lambda batch, _s=scorer: _s(batch), batch_format="pyarrow"
    )


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
    # task-based: classifier state is a shared regex + marker sets.
    clf = LangId()
    return docs.map_batches(lambda batch, _c=clf: _c(batch), batch_format="pyarrow")


# ------------------------------------------------------------- fingerprinting

def fingerprints(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Polynomial rolling hash over the token stream mod 2^61-1 (order
    sensitive — a document permutation changes the fingerprint)."""

    def fp_stage(batch: pa.Table) -> pa.Table:
        hasher = _cached_token_hasher(1)
        texts = batch.column("text").to_pylist()
        fps = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            h = 0
            for th in hasher.token_hashes(t.split(" ")).tolist():
                h = (h * 1_000_003 + th) % MERSENNE61
            fps[i] = h
        return pa.table({"doc_id": batch.column("doc_id"), "fingerprint": pa.array(fps)})

    return docs.map_batches(fp_stage, batch_format="pyarrow")


# --------------------------------------------------------------- exact dedup

def exact_dedup_groups(
    docs: "ray.data.Dataset", n_partitions: int = 256
) -> "ray.data.Dataset":
    """Duplicate groups by exact text content: (text_hash, n_dups, min doc_id).

    Only (hash, doc_id) pairs shuffle; text bodies never leave the first
    stage. Dispatch is BOUNDED: hashes route to ``n_partitions`` partitions
    (pkey = low md5 bytes mod P — already uniform, no re-mix needed) and the
    count/min per distinct hash runs vectorized via Arrow's C++ ``group_by``
    inside ONE task per partition. The former
    ``groupby("text_hash").aggregate(Count, Min)`` paid a Python dispatch per
    DISTINCT HASH — at web scale that is one dispatch per unique document
    (measured 58 s for a mere 262k-key count; see BASELINE.md dispatch
    audit)."""

    def hash_stage(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        hashes = []
        pkeys = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            d = hashlib.md5(t.encode()).digest()
            hashes.append(d.hex())
            pkeys[i] = int.from_bytes(d[8:], "little") % n_partitions
        return pa.table(
            {
                "text_hash": pa.array(hashes, pa.string()),
                "doc_id": batch.column("doc_id"),
                "pkey": pa.array(pkeys),
            }
        )

    def partition_groups(g: pa.Table) -> pa.Table:
        agg = (
            g.select(["text_hash", "doc_id"])
            .group_by(["text_hash"])
            .aggregate([([], "count_all"), ("doc_id", "min")])
        )
        return pa.table(
            {
                "text_hash": agg.column("text_hash"),
                "n_dups": agg.column("count_all"),
                "keep_doc_id": agg.column("doc_id_min"),
            }
        )

    pairs = docs.map_batches(hash_stage, batch_format="pyarrow")
    return pairs.groupby("pkey").map_groups(partition_groups, batch_format="pyarrow")


# ---------------------------------------------------------------- MinHash-LSH

def _token_shingles(text: str, k: int) -> set[bytes]:
    toks = text.split(" ")
    if len(toks) < k:
        return {" ".join(toks).encode()}
    return {" ".join(toks[i : i + k]).encode() for i in range(len(toks) - k + 1)}


def minhash_params(n_perm: int = 64, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    """The (a, b) universal-hash constants — deterministic from the seed so
    every actor AND the SQL oracle reproduce the same permutations."""
    rs = np.random.RandomState(seed)
    a = rs.randint(1, MERSENNE31, size=n_perm).astype(np.uint64)
    b = rs.randint(0, MERSENNE31, size=n_perm).astype(np.uint64)
    return a, b


class MinHasher:
    """Whole-batch MinHash signatures: one (n_perm × total_shingles) universal
    hash matrix + per-doc ``np.minimum.reduceat`` — no per-shingle Python.

    h31 = shingle_hash mod 2^31-1; signature r = min((a*h31 + b) mod 2^31-1);
    all values < 2^31 so a*h31 + b < 2^62 never overflows uint64."""

    def __init__(self, n_perm: int = 64, shingle_k: int = 3, seed: int = 42):
        self.a, self.b = minhash_params(n_perm, seed)
        self.n_perm = n_perm
        self.hasher = TokenHasher(shingle_k)

    def signatures(self, texts: list[str]) -> np.ndarray:
        """(n_perm, n_docs) signature matrix for a batch of texts."""
        return self.signatures_arrow(pa.array(texts, pa.string()))

    def _shingle_stream(
        self, col: "pa.Array | pa.ChunkedArray"
    ) -> tuple[np.ndarray, np.ndarray]:
        """All shingle hashes of a batch, doc-contiguous, plus per-doc start
        offsets — `TokenHasher.shingle_stream` (the core moved there so the
        verify/posting/simhash stages share it). Duplicate shingles are kept:
        the signature is a per-permutation MIN, which is invariant to
        duplicates, so the result is bit-identical to the per-doc path
        (pinned by the vectorized==per-doc equality test)."""
        return self.hasher.shingle_stream(col)

    def signatures_arrow(self, col: "pa.Array | pa.ChunkedArray") -> np.ndarray:
        """(n_perm, n_docs) signature matrix straight from an Arrow string
        column — the zero-`to_pylist` hot path `BandStage` uses."""
        if len(col) == 0:
            return np.empty((self.n_perm, 0), dtype=np.uint64)
        shingles, offsets = self._shingle_stream(col)
        h31 = shingles % np.uint64(MERSENNE31)
        # (a*h + b) mod 2^31-1 via the Mersenne fold (2^31 ≡ 1 mod M, so
        # x ≡ (x & M) + (x >> 31)), one PERMUTATION ROW at a time: each
        # row is ~7 in-place passes over one contiguous length-n vector
        # followed immediately by its per-doc min — the (n_perm × n)
        # signature matrix is never materialized (it was 0.5 GB per 1M
        # shingles, and the row-wise form measured 11.4× faster than the
        # blocked broadcast it replaces). Bit-identical to the plain
        # modulo (pinned by the fold==modulo unit test and the SQL
        # oracle).
        M = np.uint64(MERSENNE31)
        s31 = np.uint64(31)
        out = np.empty((self.n_perm, len(offsets)), dtype=np.uint64)
        for r in range(self.n_perm):
            x = self.a[r] * h31  # < 2^62
            x += self.b[r]
            lo = x & M
            x >>= s31
            x += lo  # < 2^32
            lo = x & M
            x >>= s31
            x += lo  # <= M + 1
            x[x >= M] -= M
            out[r] = np.minimum.reduceat(x, offsets)
        return out

    def signature(self, text: str) -> np.ndarray:
        return self.signatures([text])[:, 0]


def band_hashes(sig: np.ndarray, bands: int) -> np.ndarray:
    """(bands, n_docs) band hashes: wraparound dot product of each band's rows
    with SHINGLE_PRIMES, halved into the positive int64 range."""
    n_perm, n_docs = sig.shape
    rpb = n_perm // bands
    v = sig.reshape(bands, rpb, n_docs) * _PRIMES_U64[:rpb][None, :, None]
    return (v.sum(axis=1) >> np.uint64(1)).astype(np.int64)


_TOKEN_HASHER_CACHE: dict[int, "TokenHasher"] = {}


def _cached_token_hasher(k: int) -> "TokenHasher":
    """Per-worker-process TokenHasher cache for task-based stages: hashing is
    deterministic (md5), so tasks and actors produce identical output; the
    bounded vocabulary cache stays warm across batches as it did per actor."""
    if k not in _TOKEN_HASHER_CACHE:
        _TOKEN_HASHER_CACHE.clear()  # at most one shingle size resident
        _TOKEN_HASHER_CACHE[k] = TokenHasher(k)
    return _TOKEN_HASHER_CACHE[k]


_MINHASHER_CACHE: dict[tuple[int, int], "MinHasher"] = {}


def _cached_minhasher(n_perm: int, shingle_k: int) -> "MinHasher":
    """Per-worker-process MinHasher cache: MinHasher is deterministically
    seeded so every worker holds bit-identical permutation params, and the
    TokenHasher's bounded vocabulary cache persists across batches exactly
    as it did when the stage was an actor."""
    key = (n_perm, shingle_k)
    if key not in _MINHASHER_CACHE:
        _MINHASHER_CACHE.clear()  # at most one config resident per worker
        _MINHASHER_CACHE[key] = MinHasher(n_perm=n_perm, shingle_k=shingle_k)
    return _MINHASHER_CACHE[key]


def minhash_band_rows(
    docs: "ray.data.Dataset", n_perm: int = 64, bands: int = 16, shingle_k: int = 3
) -> "ray.data.Dataset":
    """doc → (band, band_hash, doc_id) rows; equal band_hash within a band ⇒
    LSH candidate bucket. Task-based (parallelism follows the cluster from
    the first batch — no actor-pool ramp-up) with the hasher state cached
    per worker process."""

    def band_stage(batch: pa.Table) -> pa.Table:
        mh = _cached_minhasher(n_perm, shingle_k)
        doc_ids = batch.column("doc_id").to_numpy()
        bh = band_hashes(mh.signatures_arrow(batch.column("text")), bands)
        n_docs = len(doc_ids)
        return pa.table(
            {
                "band": pa.array(np.repeat(np.arange(bands, dtype=np.int32), n_docs)),
                "band_hash": pa.array(bh.reshape(-1)),
                "doc_id": pa.array(np.tile(doc_ids, bands)),
            }
        )

    return docs.map_batches(band_stage, batch_format="pyarrow")


def minhash_candidate_pairs(
    docs: "ray.data.Dataset",
    n_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    bucket_cap: int = 4096,
    n_partitions: int = 256,
) -> "ray.data.Dataset":
    """Candidate near-duplicate pairs (doc_a < doc_b) from LSH buckets,
    deduplicated across bands.

    Skew guard: buckets above ``bucket_cap`` are triangle-blocked exactly
    like `simhash_near_dup_pairs` — members round-robin (per-bucket
    running rank) into ceil(size/cap) chunks, replicate to every
    unordered chunk-pair block, and each
    block task emits at most ~cap² candidates; a pair still surfaces
    exactly once per band, so the n_bands counts are unchanged (pinned
    by the degenerate-corpus equality test).

    Dispatch is BOUNDED (the `hamming_near_dup_pairs` shape): band buckets
    hash onto ``n_partitions`` partitions and pair generation runs
    lexsort + per-segment numpy inside ONE task per partition; the
    cross-band dedup/count likewise groups on a bounded pair-hash
    partition and counts via Arrow's C++ ``group_by`` inside each task.
    At 10⁹ docs both former groupbys (per-bucket ``map_groups``, per-pair
    ``Count``) paid a Python dispatch per DISTINCT KEY — the measured
    wall (117 s / 2M rows, BASELINE.md dispatch audit) arrives long
    before 100 TB."""
    # pin the small (band, band_hash, doc_id) rows so the bucket-size
    # scan doesn't recompute the shingle/minhash stage
    band_rows = minhash_band_rows(docs, n_perm, bands, shingle_k).materialize()

    import ray as _ray

    from .blocking import scan_monsters

    monsters = scan_monsters(band_rows, ["band", "band_hash"], bucket_cap)
    monsters_ref = _ray.put(monsters)

    def block_stage(batch: pa.Table) -> pa.Table:
        from .blocking import assign_chunks, chunk_counts_for, replicate_blocks

        mons = _ray.get(monsters_ref)
        n = batch.num_rows
        if not mons:
            z = pa.array(np.zeros(n, dtype=np.int32))
            return (
                batch.append_column("c1", z)
                .append_column("c2", z)
                .append_column("chunk", z)
            )
        # position-based round-robin chunks (a doc-id hash would bunch
        # duplicate members into one chunk and needs an integer id type)
        keys = (batch.column("band").to_numpy(), batch.column("band_hash").to_numpy())
        nc = chunk_counts_for(keys, mons)
        idx, c1, c2, ch = replicate_blocks(nc, assign_chunks(nc, keys))
        sub = batch.take(pa.array(idx))
        return (
            sub.append_column("c1", pa.array(c1.astype(np.int32)))
            .append_column("c2", pa.array(c2.astype(np.int32)))
            .append_column("chunk", pa.array(ch.astype(np.int32)))
        )

    from .blocking import lexsort_segments, mix_to_partitions

    _EMPTY_CAND = pa.table(
        {
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "dk": pa.array([], pa.int64()),
        }
    )

    def add_pkey(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("pkey", pa.array([], pa.int64()))
        return batch.append_column(
            "pkey",
            pa.array(
                mix_to_partitions(
                    (
                        batch.column("band").to_numpy(),
                        batch.column("band_hash").to_numpy(),
                        batch.column("c1").to_numpy(),
                        batch.column("c2").to_numpy(),
                    ),
                    n_partitions,
                )
            ),
        )

    def partition_pairs(g: pa.Table) -> pa.Table:
        """Every (band, band_hash, c1, c2) bucket hashed into this
        partition, pair-generated in ONE task — per-bucket work is a tiny
        numpy kernel over a sorted segment (in-process loop, no Ray
        dispatch per bucket)."""
        if g.num_rows < 2:
            return _EMPTY_CAND
        band = g.column("band").to_numpy()
        bh = g.column("band_hash").to_numpy()
        c1 = g.column("c1").to_numpy()
        c2 = g.column("c2").to_numpy()
        chunk = g.column("chunk").to_numpy()
        doc = g.column("doc_id").to_numpy()
        order, starts, ends = lexsort_segments((band, bh, c1, c2))
        band, c1, c2, chunk, doc = (
            a[order] for a in (band, c1, c2, chunk, doc)
        )
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        # vectorized fast path for the dominant segment shapes: len-1
        # segments never pair (skipped wholesale) and len-2 segments — a
        # doc and its twin — pair iff triangle bucket or one member per
        # chunk of a cross block; only the rare len>2 buckets loop
        lens = ends - starts
        s2 = starts[lens == 2]
        if len(s2):
            ok2 = (c1[s2] == c2[s2]) | (chunk[s2] != chunk[s2 + 1])
            s2 = s2[ok2]
        if len(s2):
            d0, d1 = doc[s2], doc[s2 + 1]
            out_a.append(np.minimum(d0, d1))
            out_b.append(np.maximum(d0, d1))
        for si in np.flatnonzero(lens > 2):
            s, e = int(starts[si]), int(ends[si])
            seg_doc = doc[s:e]
            if c1[s] == c2[s]:
                ids = np.sort(seg_doc)
                ia, ib = np.triu_indices(len(ids), k=1)
                a, b = ids[ia], ids[ib]
            else:
                seg_chunk = chunk[s:e]
                left = seg_doc[seg_chunk == c1[s]]
                right = seg_doc[seg_chunk == c2[s]]
                if len(left) == 0 or len(right) == 0:
                    continue
                a = np.repeat(left, len(right))
                b = np.tile(right, len(left))
                a, b = np.minimum(a, b), np.maximum(a, b)
            out_a.append(a)
            out_b.append(b)
        if not out_a:
            return _EMPTY_CAND
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        return pa.table(
            {
                "doc_a": pa.array(a, pa.int64()),
                "doc_b": pa.array(b, pa.int64()),
                # dedup partition key: pure function of the pair, so every
                # band's duplicate of the same pair meets in one partition
                "dk": pa.array(mix_to_partitions((a, b), n_partitions)),
            }
        )

    def count_bands(g: pa.Table) -> pa.Table:
        agg = (
            g.select(["doc_a", "doc_b"])
            .group_by(["doc_a", "doc_b"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                "doc_a": agg.column("doc_a"),
                "doc_b": agg.column("doc_b"),
                "n_bands": agg.column("count_all"),
            }
        )

    # Pin the pair rows between the two sort barriers: Ray's sort-based
    # groupby re-executes an un-materialized input (sampling + exchange),
    # so the dk-sort would re-run the whole pkey-sort + pair generation
    # (measured 16x on a 2M-doc chained-groupby DAG; see
    # verify_jaccard_distributed). The pin holds O(candidate pairs) rows —
    # the same state the dk-sort holds anyway.
    pairs = (
        band_rows.map_batches(block_stage, batch_format="pyarrow")
        .map_batches(add_pkey, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(partition_pairs, batch_format="pyarrow")
        .materialize()
    )
    return pairs.groupby("dk").map_groups(count_bands, batch_format="pyarrow")


def verify_jaccard_distributed(
    docs: "ray.data.Dataset",
    candidate_pairs: "ray.data.Dataset",
    threshold: float = 0.7,
    shingle_k: int = 3,
    n_partitions: int = 256,
) -> "ray.data.Dataset":
    """Exact-Jaccard verification of LSH candidate pairs with NOTHING on the
    driver — the scale path when a low-threshold run emits millions of
    candidates (`verify_jaccard` below is the small-set driver-side twin).

    Direct per-pair verification: the pairs are GIVEN, so nothing here
    regenerates them (the former design ran the full inverted-index
    `ngram_jaccard_pairs` over the candidate corpus and filtered — paying
    the Σ|posting|² pair-generation term and its monster-cap machinery for
    pairs it already had).

    1. every doc becomes one (doc_id, sorted-distinct shingle list) row —
       a single vectorized map, no shuffle, no posting explosion;
    2. join pass A: docs and pairs co-partition on a BOUNDED hash of
       ``doc_a`` (one task per partition, ``np.searchsorted`` inside);
       each pair row picks up doc_a's shingle list; duplicate candidate
       rows collapse here (all copies of a pair share the partition);
    3. join pass B: same shape on ``doc_b``, then ONE vectorized
       intersection pass per partition: both lists of a pair are
       distinct-valued, so |A∩B| = the number of duplicated values in
       their concatenation (lexsort by (pair, value) + adjacent-equal
       bincount); J = c / (|A|+|B|-c) exactly.

    Shuffled volume is O(docs · shingles_per_doc + Σ_pairs |A|) int64 —
    linear in docs and pairs, never quadratic in posting-list length.
    Partitioning assumption: a single doc's shingle list replicates once
    per pair it appears in; LSH band caps bound candidate fan-out per doc
    upstream. Pairs whose doc ids are absent from ``docs`` are dropped.

    Returns (doc_a, doc_b, jaccard) rows with jaccard >= threshold.
    ``candidate_pairs`` is a Dataset with int64 doc_a < doc_b columns
    (e.g. `minhash_candidate_pairs` output).
    """
    from .blocking import mix_to_partitions

    _EMPTY_I64 = pa.array([], pa.int64())

    def _list_of(flat: np.ndarray, lens: np.ndarray) -> pa.LargeListArray:
        offs = np.zeros(len(lens) + 1, dtype=np.int64)
        np.cumsum(lens, out=offs[1:])
        return pa.LargeListArray.from_arrays(
            pa.array(offs, pa.int64()), pa.array(flat.astype(np.int64))
        )

    def _empty_list(n: int) -> pa.LargeListArray:
        return pa.LargeListArray.from_arrays(
            pa.array(np.zeros(n + 1, dtype=np.int64), pa.int64()), _EMPTY_I64
        )

    def _join_schema(pk, key, is_doc, doc_a, doc_b, own, carry) -> pa.Table:
        return pa.table(
            {
                "pk": pa.array(pk),
                "key": pa.array(key),
                "is_doc": pa.array(is_doc),
                "doc_a": pa.array(doc_a),
                "doc_b": pa.array(doc_b),
                "own": own,
                "carry": carry,
            }
        )

    def doc_list_stage(batch: pa.Table) -> pa.Table:
        # doc → (doc_id, shingle list) join-side rows; task-based with the
        # token-hash vocabulary cache living per worker process. Whole-batch
        # vectorized shingling (this stage dominated the verify wall at
        # ~312 us/doc on the per-doc path).
        hasher = _cached_token_hasher(shingle_k)
        ids = batch.column("doc_id").to_numpy().astype(np.int64)
        flat, lens = hasher.distinct_shingle_lists(batch.column("text"))
        n = len(ids)
        z = np.zeros(n, dtype=np.int64)
        return _join_schema(
            mix_to_partitions(ids, n_partitions),
            ids,
            np.ones(n, dtype=np.int8),
            z,
            z,
            # uint64→int64 view is bijective: only equality matters below
            _list_of(flat.view(np.int64), lens),
            _empty_list(n),
        )

    def doc_rows(_docs: "ray.data.Dataset") -> "ray.data.Dataset":
        return _docs.map_batches(doc_list_stage, batch_format="pyarrow")

    def pair_rows_a(batch: pa.Table) -> pa.Table:
        a = batch.column("doc_a").to_numpy().astype(np.int64)
        b = batch.column("doc_b").to_numpy().astype(np.int64)
        n = len(a)
        return _join_schema(
            mix_to_partitions(a, n_partitions),
            a,
            np.zeros(n, dtype=np.int8),
            a,
            b,
            _empty_list(n),
            _empty_list(n),
        )

    def _match(g: pa.Table):
        """(pair row indices kept, matched doc row indices) for one
        partition: sorted doc keys + searchsorted pair keys."""
        is_doc = g.column("is_doc").to_numpy()
        keys = g.column("key").to_numpy()
        doc_sel = np.flatnonzero(is_doc == 1)
        pair_sel = np.flatnonzero(is_doc == 0)
        if len(doc_sel) == 0 or len(pair_sel) == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        dkeys = keys[doc_sel]
        dorder = np.argsort(dkeys, kind="stable")
        dkeys_s = dkeys[dorder]
        pkeys = keys[pair_sel]
        pos = np.searchsorted(dkeys_s, pkeys)
        pos_cl = np.minimum(pos, len(dkeys_s) - 1)
        found = dkeys_s[pos_cl] == pkeys
        return pair_sel[found], doc_sel[dorder[pos_cl[found]]]

    def join_a(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        pair_idx, doc_idx = _match(g)
        if len(pair_idx) == 0:
            return _join_schema(
                np.empty(0, np.int64),
                np.empty(0, np.int64),
                np.empty(0, np.int8),
                np.empty(0, np.int64),
                np.empty(0, np.int64),
                _empty_list(0),
                _empty_list(0),
            )
        a = g.column("doc_a").to_numpy()[pair_idx]
        b = g.column("doc_b").to_numpy()[pair_idx]
        # all copies of a pair share this partition (pk = mix(doc_a)):
        # collapse duplicate candidate rows here
        order = np.lexsort((b, a))
        a_s, b_s, pi_s, di_s = (
            a[order],
            b[order],
            pair_idx[order],
            doc_idx[order],
        )
        keep = np.r_[True, (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1])]
        a_k, b_k, di_k = a_s[keep], b_s[keep], di_s[keep]
        n = len(a_k)
        return _join_schema(
            mix_to_partitions(b_k, n_partitions),
            b_k,
            np.zeros(n, dtype=np.int8),
            a_k,
            b_k,
            _empty_list(n),
            g.column("own").take(pa.array(di_k)),
        )

    _EMPTY_OUT = pa.table(
        {
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "jaccard": pa.array([], pa.float64()),
        }
    )

    def join_b_and_score(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        pair_idx, doc_idx = _match(g)
        if len(pair_idx) == 0:
            return _EMPTY_OUT
        take_p = pa.array(pair_idx)
        la = g.column("carry").take(take_p)
        lb = g.column("own").take(pa.array(doc_idx))
        sa = pc.list_value_length(la).to_numpy().astype(np.int64)
        sb = pc.list_value_length(lb).to_numpy().astype(np.int64)
        npairs = len(pair_idx)
        ra = np.repeat(np.arange(npairs, dtype=np.int64), sa)
        rb = np.repeat(np.arange(npairs, dtype=np.int64), sb)
        vals = np.concatenate(
            [pc.list_flatten(la).to_numpy(), pc.list_flatten(lb).to_numpy()]
        )
        pid = np.concatenate([ra, rb])
        order = np.lexsort((vals, pid))
        v, p = vals[order], pid[order]
        dup = (p[1:] == p[:-1]) & (v[1:] == v[:-1])
        c = np.bincount(p[1:][dup], minlength=npairs)
        # every doc yields >= 1 shingle, so the union size is never 0
        j = c / (sa + sb - c)
        m = j >= threshold
        return pa.table(
            {
                "doc_a": g.column("doc_a").take(take_p).filter(pa.array(m)),
                "doc_b": g.column("doc_b").take(take_p).filter(pa.array(m)),
                "jaccard": pa.array(j[m], pa.float64()),
            }
        )

    # Pin the join-side rows and pass A's output before each sort barrier.
    # Ray's sort-based groupby re-executes an un-materialized input pipeline
    # (sampling pass + exchange), and with two CHAINED lazy groupbys the
    # second sort re-runs the entire first — measured 37.4 s vs 2.3 s for
    # an identical chained-groupby DAG with materialize barriers (8 CPUs,
    # 2M docs). Both pins hold exactly the state the sort barrier holds
    # anyway (O(docs·shingles) / O(pairs) rows in the object store, spill-
    # backed), so peak footprint is unchanged — only re-execution is cut.
    docs_side = doc_rows(docs).materialize()
    pass_a = (
        docs_side
        .union(candidate_pairs.map_batches(pair_rows_a, batch_format="pyarrow"))
        .groupby("pk")
        .map_groups(join_a, batch_format="pyarrow")
        .materialize()
    )
    return (
        docs_side
        .union(pass_a)
        .groupby("pk")
        .map_groups(join_b_and_score, batch_format="pyarrow")
    )


def verify_jaccard(
    docs: "ray.data.Dataset",
    candidate_pairs: list[tuple[int, int]],
    shingle_k: int = 3,
    threshold: float = 0.7,
) -> list[tuple[int, int, float]]:
    """Exact Jaccard verification of candidate pairs (small candidate set:
    texts fetched via a broadcast filter; driver-bound by design — use
    `verify_jaccard_distributed` when candidate volume is unbounded)."""
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
    docs: "ray.data.Dataset",
    threshold: float = 0.5,
    shingle_k: int = 3,
    posting_cap: int = 4096,
    n_partitions: int = 256,
) -> "ray.data.Dataset":
    """EXACT n-gram Jaccard near-dup pairs via a distributed inverted index —
    no driver materialization, no all-pairs scan, BOUNDED dispatch (both
    groupbys below hash their unbounded keys — shingles, pair ids — onto
    ``n_partitions`` partitions and run vectorized inside one task each;
    see BASELINE.md's dispatch audit for why per-distinct-key grouping
    collapses at ≫10⁶ keys).

    1. per-doc distinct shingle hashes → (shingle, doc_id, set_size) rows;
    2. posting lists co-locate by a bounded shingle-hash partition key and
       emit candidate pairs per sorted segment (any pair with Jaccard > 0
       shares ≥1 shingle, so this generation is exhaustive); a size-ratio
       prune (J ≤ min/max of the set sizes) drops hopeless pairs before
       they shuffle;
    3. pairs co-locate by a bounded pair-hash partition key; shared-shingle
       counts c come from Arrow C++ ``group_by`` per partition; since every
       shared shingle contributes exactly one posting-list meeting,
       J = c / (|A|+|B|-c) exactly.

    Skew guard: step-2 volume is Σ |posting|², and a stopword shingle in
    natural text makes one posting list ~n. Posting lists above
    ``posting_cap`` are triangle-blocked exactly like
    `minhash_candidate_pairs` / `simhash_near_dup_pairs` (members
    round-robin into ceil(size/cap) chunks, replicate to every unordered
    chunk-pair block), so no task emits more than ~cap² candidates while
    each pair still meets exactly once per shared shingle — the step-3
    counts, and hence the exact Jaccard, are unchanged (pinned by the
    blocked==unblocked equality test). The posting-size scan re-executes
    the shingle stage once (text never ships; cheap relative to pinning
    the posting table at 10^12-row scale).
    """
    import ray as _ray

    from .blocking import assign_chunks, chunk_counts_for, replicate_blocks, scan_monsters

    def shingle_stage(batch: pa.Table) -> pa.Table:
        hasher = _cached_token_hasher(shingle_k)
        doc_ids = batch.column("doc_id").to_numpy()
        allsh, lens = hasher.distinct_shingle_lists(batch.column("text"))
        return pa.table(
            {
                # >>1 keeps the shuffle key in the positive int64 range
                "shingle": pa.array((allsh >> np.uint64(1)).astype(np.int64)),
                "doc_id": pa.array(np.repeat(doc_ids, lens)),
                "set_size": pa.array(np.repeat(lens, lens)),
            }
        )

    postings = docs.map_batches(shingle_stage, batch_format="pyarrow")

    monsters = scan_monsters(postings, ["shingle"], posting_cap)
    monsters_ref = _ray.put(monsters)

    def block_stage(batch: pa.Table) -> pa.Table:
        mons = _ray.get(monsters_ref)
        n = batch.num_rows
        if not mons:
            z = pa.array(np.zeros(n, dtype=np.int32))
            return (
                batch.append_column("c1", z)
                .append_column("c2", z)
                .append_column("chunk", z)
            )
        shingles = batch.column("shingle").to_numpy()
        nc = chunk_counts_for(shingles, mons)
        idx, c1, c2, ch = replicate_blocks(nc, assign_chunks(nc, shingles))
        sub = batch.take(pa.array(idx))
        return (
            sub.append_column("c1", pa.array(c1.astype(np.int32)))
            .append_column("c2", pa.array(c2.astype(np.int32)))
            .append_column("chunk", pa.array(ch.astype(np.int32)))
        )

    from .blocking import lexsort_segments, mix_to_partitions

    _EMPTY_PAIRS = pa.table(
        {
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "size_a": pa.array([], pa.int64()),
            "size_b": pa.array([], pa.int64()),
            "dk": pa.array([], pa.int64()),
        }
    )

    def add_pkey(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("pkey", pa.array([], pa.int64()))
        return batch.append_column(
            "pkey",
            pa.array(
                mix_to_partitions(
                    (
                        batch.column("shingle").to_numpy(),
                        batch.column("c1").to_numpy(),
                        batch.column("c2").to_numpy(),
                    ),
                    n_partitions,
                )
            ),
        )

    def partition_pairs(group: pa.Table) -> pa.Table:
        """Every (shingle, c1, c2) posting list hashed into this partition,
        pair-generated in ONE task — per-posting work is a small numpy
        kernel over a sorted segment (in-process loop, no Ray dispatch per
        posting list)."""
        if group.num_rows < 2:
            return _EMPTY_PAIRS
        shingle = group.column("shingle").to_numpy()
        c1 = group.column("c1").to_numpy()
        c2 = group.column("c2").to_numpy()
        chunk = group.column("chunk").to_numpy()
        ids = group.column("doc_id").to_numpy()
        sizes = group.column("set_size").to_numpy()
        order, starts, ends = lexsort_segments((shingle, c1, c2))
        c1, c2, chunk, ids, sizes = (
            a[order] for a in (c1, c2, chunk, ids, sizes)
        )
        out: list[tuple] = []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            sid = ids[s:e]
            ssz = sizes[s:e]
            if c1[s] == c2[s]:
                o = np.argsort(sid, kind="stable")
                sid, ssz = sid[o], ssz[o]
                ia, ib = np.triu_indices(len(sid), k=1)
                a, b = sid[ia], sid[ib]
                sa, sb = ssz[ia], ssz[ib]
            else:
                seg_chunk = chunk[s:e]
                lm = seg_chunk == c1[s]
                rm = seg_chunk == c2[s]
                if not lm.any() or not rm.any():
                    continue
                li, ri = sid[lm], sid[rm]
                ls, rs = ssz[lm], ssz[rm]
                a = np.repeat(li, len(ri))
                b = np.tile(ri, len(li))
                sa = np.repeat(ls, len(ri))
                sb = np.tile(rs, len(li))
                swap = a > b
                a2 = np.where(swap, b, a)
                b2 = np.where(swap, a, b)
                sa2 = np.where(swap, sb, sa)
                sb2 = np.where(swap, sa, sb)
                a, b, sa, sb = a2, b2, sa2, sb2
            # J <= min(|A|,|B|)/max(|A|,|B|): prune pairs that cannot reach
            # t (epsilon-loosened — survivors re-check exactly in finalize)
            keep = np.minimum(sa, sb) >= threshold * np.maximum(sa, sb) - 1e-9
            if keep.any():
                out.append((a[keep], b[keep], sa[keep], sb[keep]))
        if not out:
            return _EMPTY_PAIRS
        a = np.concatenate([o[0] for o in out])
        b = np.concatenate([o[1] for o in out])
        sa = np.concatenate([o[2] for o in out])
        sb = np.concatenate([o[3] for o in out])
        return pa.table(
            {
                "doc_a": pa.array(a),
                "doc_b": pa.array(b),
                "size_a": pa.array(sa),
                "size_b": pa.array(sb),
                # all duplicates of one pair (one per shared shingle) meet
                # in a single count partition
                "dk": pa.array(mix_to_partitions((a, b), n_partitions)),
            }
        )

    def count_and_finalize(g: pa.Table) -> pa.Table:
        """Shared-shingle count per pair via Arrow C++ group_by inside ONE
        task per pair partition; J = c / (|A|+|B|-c) exactly (sizes are
        identical across a pair's duplicates, so min == any)."""
        agg = (
            g.select(["doc_a", "doc_b", "size_a", "size_b"])
            .group_by(["doc_a", "doc_b"])
            .aggregate([([], "count_all"), ("size_a", "min"), ("size_b", "min")])
        )
        c = agg.column("count_all").to_numpy()
        sa = agg.column("size_a_min").to_numpy()
        sb = agg.column("size_b_min").to_numpy()
        j = c / (sa + sb - c)
        keep = pa.array(j >= threshold)
        return pa.table(
            {
                "doc_a": agg.column("doc_a").filter(keep),
                "doc_b": agg.column("doc_b").filter(keep),
                "jaccard": pa.array(j[j >= threshold], pa.float64()),
            }
        )

    # pin between the two sort barriers — the dk-sort would otherwise
    # re-execute the whole pkey-sort + pair generation (see
    # verify_jaccard_distributed's barrier note; O(pairs) rows pinned)
    pairs = (
        postings.map_batches(block_stage, batch_format="pyarrow")
        .map_batches(add_pkey, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(partition_pairs, batch_format="pyarrow")
        .materialize()
    )
    return pairs.groupby("dk").map_groups(count_and_finalize, batch_format="pyarrow")


# ------------------------------------------------------- BPE-ish tokenization

# explicit whitespace class (identical in Python re and RE2, so the DuckDB
# regexp_extract_all oracle tokenizes byte-for-byte the same way)
_BPE_WS = " \t\n\r\f"
_BPE_PATTERN = r"[A-Za-z]+|[0-9]{1,3}|[^ \t\n\r\fA-Za-z0-9]+|[ \t\n\r\f]+"
_BPE_RE = re.compile(_BPE_PATTERN)
_ASCII_ALPHA = frozenset("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ")


def bpe_token_counts(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Token counting with a BPE-ish pretokenizer regex (letter runs, short
    digit groups, punctuation runs, whitespace runs — GPT-2-style shape)."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        n_tokens = np.empty(len(texts), dtype=np.int64)
        n_word = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            toks = _BPE_RE.findall(t)
            n_tokens[i] = sum(1 for tk in toks if tk[0] not in _BPE_WS)
            n_word[i] = sum(1 for tk in toks if tk[0] in _ASCII_ALPHA)
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
    """64-bit SimHash per document over distinct token shingles.

    Vectorized over the whole batch: one (total_shingles × 64) bit matrix,
    per-doc ±1 sums via ``np.add.reduceat``; a bit is set when its per-doc
    accumulator is ≥ 0. Output is the signed-int64 reinterpretation."""

    def stage(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"doc_id": batch.column("doc_id"), "simhash": pa.array([], pa.int64())}
            )
        hasher = _cached_token_hasher(shingle_k)
        allsh, lens = hasher.distinct_shingle_lists(batch.column("text"))
        offsets = np.concatenate(([0], np.cumsum(lens)[:-1]))
        bits = ((allsh[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                & np.uint64(1)).astype(np.int64)
        acc = np.add.reduceat(2 * bits - 1, offsets, axis=0)  # (n_docs, 64) ±1 sums
        weights = (np.uint64(1) << np.arange(64, dtype=np.uint64))
        sigs = ((acc >= 0).astype(np.uint64) * weights[None, :]).sum(axis=1)
        return pa.table(
            {"doc_id": batch.column("doc_id"), "simhash": pa.array(sigs.astype(np.int64))}
        )

    return docs.map_batches(stage, batch_format="pyarrow")


def _popcount64(x: np.ndarray) -> np.ndarray:
    """SWAR popcount over uint64 (no Python loop)."""
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + (
        (x >> np.uint64(2)) & np.uint64(0x3333333333333333)
    )
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return (x * np.uint64(0x0101010101010101)) >> np.uint64(56)


def hamming_near_dup_pairs(
    sigs: "ray.data.Dataset",
    id_col: str = "doc_id",
    sig_col: str = "simhash",
    out_a: str = "doc_a",
    out_b: str = "doc_b",
    max_hamming: int = 3,
    bucket_cap: int = 4096,
    n_partitions: int = 256,
) -> "ray.data.Dataset":
    """Near-duplicate pairs on any 64-bit signature column: Hamming
    distance ≤ ``max_hamming``, found EXACTLY (not approximately) via
    pigeonhole banding. Shared core of the text SimHash dedup
    (`simhash_near_dup_pairs`) and the image perceptual-hash dedup
    (`images.phash_near_dup_pairs` over the input_hint `phash` column).

    The 64 bits split into ``max_hamming + 1`` bands; any pair within the
    Hamming budget must agree exactly on at least one band (≤ max_hamming
    differing bits over max_hamming+1 disjoint bands leave one band clean
    — bits outside band coverage when 64 % n_bands != 0 only *reduce* the
    differing bits a band can see), so candidate generation is a groupby
    on (band, band value) — only (band, value, id, sig) rows shuffle,
    never payloads. Within-bucket verification is a vectorized XOR + SWAR
    popcount; duplicates found in several bands dedupe in a second small
    groupby over the pair keys. Same recall as the all-pairs scan by
    construction, at shuffle cost O(rows · bands) + Σ bucket².

    Skew guard (``bucket_cap``): a degenerate corpus where many rows
    share a band value would make one bucket quadratic in ONE task.
    Buckets above the cap are TRIANGLE-BLOCKED: members round-robin
    (per-bucket running rank — stride-proof, unlike a member-key hash)
    into ceil(size/cap) chunks and replicate to every unordered chunk-pair
    block containing their chunk, so the groupby key becomes
    (band, bval, c1, c2) and each block task does at most ~cap² work.
    Pair completeness holds — any two members meet in exactly the block
    (min(cx,cy), max(cx,cy)) — at replication cost O(n_chunks) per
    member, which is inherent to exact all-pairs within the bucket.
    Blocked-vs-naive pair-set equality is pinned in tests.
    """
    n_bands = max_hamming + 1
    width = 64 // n_bands
    mask = np.uint64((1 << width) - 1)

    def band_stage(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table(
                {
                    "band": pa.array([], pa.int8()),
                    "bval": pa.array([], pa.int64()),
                    "doc_id": pa.array([], batch.column(id_col).type),
                    "simhash": pa.array([], pa.int64()),
                }
            )
        sig = batch.column(sig_col).to_numpy().astype(np.uint64)
        ids = batch.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        bands = np.repeat(np.arange(n_bands, dtype=np.int8), n)
        bvals = np.concatenate(
            [((sig >> np.uint64(b * width)) & mask).astype(np.int64) for b in range(n_bands)]
        )
        idx = pa.array(np.tile(np.arange(n), n_bands))
        return pa.table(
            {
                "band": pa.array(bands),
                "bval": pa.array(bvals),
                "doc_id": ids.take(idx),
                "simhash": pa.concat_arrays(
                    [batch.column(sig_col).combine_chunks()] * n_bands
                )
                if isinstance(batch.column(sig_col), pa.ChunkedArray)
                else pa.concat_arrays([batch.column(sig_col)] * n_bands),
            }
        )

    def _empty_pairs(id_type: pa.DataType) -> pa.Table:
        return pa.table(
            {
                "doc_a": pa.array([], id_type),
                "doc_b": pa.array([], id_type),
                "hamming": pa.array([], pa.int64()),
                "dk": pa.array([], pa.int64()),
            }
        )

    def partition_pairs(group: pa.Table) -> pa.Table:
        """Every (band, bval, c1, c2) bucket hashed into this partition,
        processed in ONE task: per-bucket work is a small numpy kernel over
        a sorted segment, ~µs each — a naive groupby-per-bucket pays a
        Python map_groups dispatch per bucket, which collapses at millions
        of tiny buckets (2M rows end-to-end measured 117 s before this
        shape + the bounded monster-scan/dedup, ~11 s after, 32 CPUs).

        Ids never leave Arrow: ONE C++ multi-key sort with doc_id as the
        LAST key leaves every triangle segment already id-ordered (UTF-8
        byte order == code-point order, so Arrow's string sort agrees with
        Python's), pair emission accumulates int64 row indices, and a
        single take + if_else pass canonicalizes a <= b — replacing the
        old per-partition to_pylist()/argsort(object)/tolist() round trip
        that materialized millions of Python string objects per run."""
        import pyarrow.compute as pc

        n = group.num_rows
        if n == 0:
            return _empty_pairs(group.column("doc_id").type)
        order_arr = pc.sort_indices(
            group,
            sort_keys=[
                ("band", "ascending"),
                ("bval", "ascending"),
                ("c1", "ascending"),
                ("c2", "ascending"),
                ("doc_id", "ascending"),
            ],
        )
        group = group.take(order_arr)
        band = group.column("band").to_numpy()
        bval = group.column("bval").to_numpy()
        c1 = group.column("c1").to_numpy()
        c2 = group.column("c2").to_numpy()
        chunk = group.column("chunk").to_numpy()
        sig = group.column("simhash").to_numpy().astype(np.uint64)
        ids_sorted = group.column("doc_id")
        if isinstance(ids_sorted, pa.ChunkedArray):
            ids_sorted = ids_sorted.combine_chunks()
        new_seg = np.r_[
            True,
            (band[1:] != band[:-1])
            | (bval[1:] != bval[:-1])
            | (c1[1:] != c1[:-1])
            | (c2[1:] != c2[:-1]),
        ]
        starts = np.flatnonzero(new_seg)
        ends = np.r_[starts[1:], n]
        lens = ends - starts
        out_ai: list[np.ndarray] = []
        out_bi: list[np.ndarray] = []
        out_hs: list[np.ndarray] = []
        # a real-world partition is dominated by len-1 segments (skipped
        # outright) and len-2 segments (a doc and its twin): emit ALL len-2
        # pairs in one vectorized shot — a triangle bucket of two always
        # pairs, a cross-chunk bucket of two pairs iff it holds one member
        # of each chunk — leaving the Python loop only the rare len>2
        # buckets (was: ~10 µs × every segment, singletons included)
        s2 = starts[lens == 2]
        if len(s2):
            ok2 = (c1[s2] == c2[s2]) | (chunk[s2] != chunk[s2 + 1])
            s2 = s2[ok2]
        if len(s2):
            ham2 = _popcount64(np.bitwise_xor(sig[s2], sig[s2 + 1])).astype(
                np.int64
            )
            keep2 = ham2 <= max_hamming
            if keep2.any():
                out_ai.append(s2[keep2].astype(np.int64))
                out_bi.append(s2[keep2].astype(np.int64) + 1)
                out_hs.append(ham2[keep2])
        for si in np.flatnonzero(lens > 2):
            s = int(starts[si])
            e = int(ends[si])
            seg_len = e - s
            ssig = sig[s:e]
            if c1[s] == c2[s]:
                # triangle: rows already id-sorted, so ii < jj implies
                # id[ii] <= id[jj]
                ii, jj = np.triu_indices(seg_len, k=1)
            else:
                li = np.flatnonzero(chunk[s:e] == c1[s])
                ri = np.flatnonzero(chunk[s:e] == c2[s])
                if len(li) == 0 or len(ri) == 0:
                    continue
                ii = np.repeat(li, len(ri))
                jj = np.tile(ri, len(li))
            ham = _popcount64(np.bitwise_xor(ssig[ii], ssig[jj])).astype(
                np.int64
            )
            keep = ham <= max_hamming
            if not keep.any():
                continue
            ii, jj, ham = ii[keep], jj[keep], ham[keep]
            out_ai.append(ii.astype(np.int64) + s)
            out_bi.append(jj.astype(np.int64) + s)
            out_hs.append(ham)
        if not out_ai:
            return _empty_pairs(ids_sorted.type)
        a_idx = np.concatenate(out_ai)
        b_idx = np.concatenate(out_bi)
        a_arr = ids_sorted.take(pa.array(a_idx))
        b_arr = ids_sorted.take(pa.array(b_idx))
        # cross-chunk pairs may violate a <= b; canonicalize vectorized
        swap = pc.greater(a_arr, b_arr)
        swap_np = swap.to_numpy(zero_copy_only=False)
        sa = np.where(swap_np, sig[b_idx], sig[a_idx])
        sb = np.where(swap_np, sig[a_idx], sig[b_idx])
        # dedup partition key: a pure function of the (id-ordered)
        # signature pair, so every band's duplicate of the same pair
        # hashes to the same partition (collisions only affect balance
        # — dedup itself groups on the full id pair)
        dk = (sa * np.uint64(0x9E3779B97F4A7C15)) ^ (
            sb * np.uint64(0xBF58476D1CE4E5B9)
        )
        dk = (dk ^ (dk >> np.uint64(31))) * np.uint64(0x94D049BB133111EB)
        return pa.table(
            {
                "doc_a": pc.if_else(swap, b_arr, a_arr),
                "doc_b": pc.if_else(swap, a_arr, b_arr),
                "hamming": pa.array(np.concatenate(out_hs)),
                "dk": pa.array(
                    ((dk ^ (dk >> np.uint64(29))) % np.uint64(n_partitions)).astype(
                        np.int64
                    )
                ),
            }
        )

    # pin the (id, signature) rows — ~16 bytes/row, no payloads — so the
    # two consumers below (bucket-size scan + the banding join) don't
    # recompute the upstream signature stage twice
    sigs = sigs.materialize()
    tagged = sigs.map_batches(band_stage, batch_format="pyarrow")

    # ---- skew guard: find buckets above the cap (tiny result: at most
    # total_band_rows / cap entries) and broadcast their chunk counts
    import ray as _ray

    from .blocking import scan_monsters

    monsters = scan_monsters(tagged, ["band", "bval"], bucket_cap)
    monsters_ref = _ray.put(monsters)

    def block_stage(batch: pa.Table) -> pa.Table:
        from .blocking import assign_chunks, chunk_counts_for, replicate_blocks

        mons = _ray.get(monsters_ref)
        n = batch.num_rows
        if not mons:
            z = pa.array(np.zeros(n, dtype=np.int32))
            return (
                batch.append_column("c1", z)
                .append_column("c2", z)
                .append_column("chunk", z)
            )
        # position-based round-robin chunks (a doc-id hash would bunch
        # duplicate members into one chunk and needs an integer id type)
        keys = (batch.column("band").to_numpy(), batch.column("bval").to_numpy())
        nc = chunk_counts_for(keys, mons)
        idx, c1, c2, ch = replicate_blocks(nc, assign_chunks(nc, keys))
        sub = batch.take(pa.array(idx))
        return (
            sub.append_column("c1", pa.array(c1.astype(np.int32)))
            .append_column("c2", pa.array(c2.astype(np.int32)))
            .append_column("chunk", pa.array(ch.astype(np.int32)))
        )
    # hash every (band, bval, c1, c2) bucket onto a bounded partition key:
    # the pair-generation shuffle moves the SAME rows either way, but the
    # downstream map_groups then runs once per PARTITION (n_partitions
    # tasks) instead of once per bucket (millions of Python dispatches)
    _K1 = np.uint64(0x9E3779B97F4A7C15)
    _K2 = np.uint64(0xBF58476D1CE4E5B9)
    _K3 = np.uint64(0x94D049BB133111EB)

    def add_pkey(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("pkey", pa.array([], pa.int64()))
        h = (
            batch.column("bval").to_numpy().astype(np.uint64)
            ^ (batch.column("band").to_numpy().astype(np.uint64) * _K1)
            ^ (batch.column("c1").to_numpy().astype(np.uint64) * _K2)
            ^ (batch.column("c2").to_numpy().astype(np.uint64) * _K3)
        )
        h = (h ^ (h >> np.uint64(30))) * _K2
        h = (h ^ (h >> np.uint64(27))) * _K3
        h ^= h >> np.uint64(31)
        return batch.append_column(
            "pkey", pa.array((h % np.uint64(n_partitions)).astype(np.int64))
        )

    def final_dedup(group: pa.Table) -> pa.Table:
        # a pair found in several bands dedupes here, vectorized via
        # Arrow's C++ group_by inside ONE task per dedup partition —
        # Ray's groupby(...).min() costs a dispatch per distinct pair
        # (measured 18 s for 100k pairs; this shape is ~ms). The hamming
        # value is identical across a pair's duplicates, so min == any.
        g = (
            group.select(["doc_a", "doc_b", "hamming"])
            .group_by(["doc_a", "doc_b"])
            .aggregate([("hamming", "min")])
        )
        # name-keyed (not positional) so a future column reorder upstream
        # fails loudly instead of silently mislabeling
        return pa.table(
            {
                out_a: g.column("doc_a"),
                out_b: g.column("doc_b"),
                "hamming": g.column("hamming_min"),
            }
        )

    # pin between the two sort barriers — the dk-sort would otherwise
    # re-execute the whole pkey-sort + pair generation (see
    # verify_jaccard_distributed's barrier note; O(pairs) rows pinned)
    pairs = (
        tagged.map_batches(block_stage, batch_format="pyarrow")
        .map_batches(add_pkey, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(partition_pairs, batch_format="pyarrow")
        .materialize()
    )
    return pairs.groupby("dk").map_groups(final_dedup, batch_format="pyarrow")


def simhash_near_dup_pairs(
    docs: "ray.data.Dataset",
    max_hamming: int = 3,
    shingle_k: int = 2,
    bucket_cap: int = 4096,
) -> "ray.data.Dataset":
    """SimHash near-duplicate pairs: Hamming distance ≤ ``max_hamming`` on
    the 64-bit text signatures — `simhash_signatures` feeding the generic
    pigeonhole-banding core `hamming_near_dup_pairs` (see its docstring
    for the exactness and skew-guard contracts)."""
    sigs = simhash_signatures(docs, shingle_k=shingle_k)
    return hamming_near_dup_pairs(
        sigs,
        id_col="doc_id",
        sig_col="simhash",
        max_hamming=max_hamming,
        bucket_cap=bucket_cap,
    )


def simhash_dedup_clusters(
    docs: "ray.data.Dataset",
    max_hamming: int = 3,
    shingle_k: int = 2,
    n_buckets: int = 64,
) -> "ray.data.Dataset":
    """Near-duplicate CLUSTERS: connected components of the SimHash pair
    graph, one row per document with its cluster representative and size.

    Pipeline: `simhash_near_dup_pairs` (exact pigeonhole banding) → 
    `graph.connected_components` (large/small-star, O(log n) bucketed groupby
    rounds) → one vectorized groupby to attach cluster sizes. Every doc is
    labeled — singletons get cluster_id == doc_id, cluster_size == 1 — so
    `WHERE doc_id = cluster_id` is the canonical keep-one-per-cluster dedup
    filter. Only int64 (node, label) pairs ever shuffle; text stays in the
    signature stage.
    """
    from .graph import connected_components

    pairs = simhash_near_dup_pairs(docs, max_hamming=max_hamming, shingle_k=shingle_k)
    ids = docs.select_columns(["doc_id"])
    cc = connected_components(
        pairs, "doc_a", "doc_b", nodes=ids, node_col="doc_id", n_buckets=n_buckets
    )

    from .graph import labeled_clusters

    return labeled_clusters(cc, id_col="doc_id", n_buckets=n_buckets)


def batch_token_counts(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """Exact (token, count) pairs for a batch's `text` column —
    single-space split, the one tokenization convention shared by
    `token_stats`, `top_tokens` and the MG sketch (sketch.py)."""
    toks: list[str] = []
    for t in batch.column("text").to_pylist():
        toks.extend(t.split(" "))
    return np.unique(np.asarray(toks, dtype=object), return_counts=True)


def top_tokens(
    docs: "ray.data.Dataset", k: int = 20, n_partitions: int = 256
) -> "ray.data.Dataset":
    """Global top-k most frequent tokens (single-space split, same
    convention as `token_stats`) — the heavy-hitter wordcount shape.

    Scale: the token explosion never shuffles raw tokens per occurrence;
    each batch pre-aggregates to (token, count) partials (np.unique over
    the batch's whole token array). Tokens hash onto ``n_partitions``
    partitions (a token lives wholly in one partition), each partition
    task sums its tokens via Arrow C++ ``group_by`` and keeps only ITS
    top-k — any global top-k member is necessarily in its partition's
    top-k, so the final sort runs over ≤ n_partitions·k rows instead of
    the whole vocabulary (the former raw-token groupby paid a dispatch
    per distinct token AND sorted the full vocab table). Ties break by
    token ascending, matching the SQL oracle's ORDER BY n DESC, token."""

    def partial(batch: pa.Table) -> pa.Table:
        vals, cnts = batch_token_counts(batch)
        toks = vals.astype(str)
        # per-batch-vocabulary hashing (bounded by the batch's distinct
        # tokens — same cost class as the token counting itself)
        pk = np.fromiter(
            (md5_u64(t.encode()) % n_partitions for t in toks),
            dtype=np.int64,
            count=len(toks),
        )
        return pa.table(
            {
                "token": pa.array(toks, pa.string()),
                "n": pa.array(cnts.astype(np.int64)),
                "pk": pa.array(pk),
            }
        )

    def partition_topk(g: pa.Table) -> pa.Table:
        agg = (
            g.select(["token", "n"]).group_by(["token"]).aggregate([("n", "sum")])
        )
        n = agg.column("n_sum").to_numpy()
        toks = agg.column("token").to_numpy(zero_copy_only=False)
        order = np.lexsort((toks, -n))[:k]
        idx = pa.array(order)
        return pa.table(
            {
                "token": agg.column("token").take(idx),
                "n": agg.column("n_sum").take(idx),
            }
        )

    # pin before the final sort — a lazy sort re-executes the groupby
    # pipeline (sampling + exchange; see verify_jaccard_distributed's
    # barrier note). The pinned set is tiny: ≤ P·k candidate rows.
    counts = (
        docs.select_columns(["text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(partition_topk, batch_format="pyarrow")
        .materialize()
    )
    return counts.sort(["n", "token"], descending=[True, False]).limit(k)


def normalize_docs(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Canonical text normalization (the step every dedup pipeline runs
    before hashing): lowercase, collapse whitespace runs to one space,
    strip ends. Pure Arrow compute kernels (RE2) — zero Python per row;
    the DuckDB oracle's lower/regexp_replace/trim chain is semantically
    identical (both RE2)."""

    def fn(batch: pa.Table) -> pa.Table:
        t = batch.column("text")
        t = pc.utf8_lower(t)
        t = pc.replace_substring_regex(t, pattern=r"\s+", replacement=" ")
        # trim an EXPLICIT ' ' set: Arrow utf8_trim_whitespace and DuckDB
        # one-arg trim() disagree on unicode whitespace (NEL/LS/PS vs
        # NBSP/U+3000) — the oracle's two-arg trim(t, ' ') and this call
        # strip the identical character set
        t = pc.utf8_trim(t, characters=" ")
        out = batch.drop_columns(["text"]).append_column("norm_text", t)
        return out.append_column("norm_chars", pc.cast(pc.utf8_length(t), pa.int64()))

    return docs.map_batches(fn, batch_format="pyarrow")


# ---- exact substring duplicate spans ---------------------------------------
# Lee et al., "Deduplicating Training Data Makes Language Models Better"
# (ACL 2022) motivates removing repeated SUBSTRINGS, not just whole-document
# twins: a length->=L byte window that occurs twice anywhere in the corpus
# marks both occurrences as duplicated text. The reference implementation
# builds a global suffix array; the Ray-Data-native shape below gets the
# identical span set from a bounded windowed-hash shuffle instead.

_RH_BASE = np.uint64(0x9E3779B97F4A7C15)  # odd, so invertible mod 2^64
_RH_BASE_INV = np.uint64(pow(0x9E3779B97F4A7C15, -1, 1 << 64))


def _window_rows(texts, min_len: int):
    """All ``min_len``-byte windows of an Arrow string column, vectorized.

    Returns ``(starts, doc_idx, pos, data)``: the window start offsets into
    ``data`` (the column's raw UTF-8 buffer as uint8), the row index of the
    owning document, and the window's byte position within its document.
    Zero-copy on the Arrow buffers; no per-document Python loop.

    Positions are BYTE offsets — identical to character offsets for ASCII
    corpora (the synthetic tables); a multi-byte-aware variant would carry
    a codepoint-index map.
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    off_dtype = np.int64 if pa.types.is_large_string(texts.type) else np.int32
    offs = np.frombuffer(texts.buffers()[1], dtype=off_dtype)[
        texts.offset : texts.offset + len(texts) + 1
    ].astype(np.int64)
    data = np.frombuffer(texts.buffers()[2], dtype=np.uint8)
    lens = offs[1:] - offs[:-1]
    nw = np.maximum(lens - min_len + 1, 0)
    doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), nw)
    cum0 = np.concatenate(([0], np.cumsum(nw)))[:-1]
    pos = np.arange(int(nw.sum()), dtype=np.int64) - np.repeat(cum0, nw)
    starts = np.repeat(offs[:-1], nw) + pos
    return starts, doc_idx, pos, data


def _window_hashes(starts: np.ndarray, data: np.ndarray, min_len: int) -> np.ndarray:
    """64-bit polynomial rolling hash of every window in one vectorized
    pass: prefix sums of byte·BASE^{-k} (BASE odd → invertible mod 2^64,
    so the usual division-free sliding trick needs no modulus), re-scaled
    by BASE^{end}. Equal windows hash equal regardless of position; all
    arithmetic wraps in uint64 exactly like the scalar definition."""
    if len(starts) == 0:
        return np.empty(0, dtype=np.uint64)
    m = len(data)
    L = min_len
    binv_pow = np.empty(m, dtype=np.uint64)
    binv_pow[0] = np.uint64(1)
    if m > 1:
        np.multiply.accumulate(
            np.full(m - 1, _RH_BASE_INV, dtype=np.uint64), out=binv_pow[1:]
        )
    b_pow = np.empty(m, dtype=np.uint64)
    b_pow[0] = np.uint64(1)
    if m > 1:
        np.multiply.accumulate(np.full(m - 1, _RH_BASE, dtype=np.uint64), out=b_pow[1:])
    C = np.cumsum(data.astype(np.uint64) * binv_pow, dtype=np.uint64)
    Cm1 = np.concatenate(([np.uint64(0)], C[:-1]))
    return (C[starts + L - 1] - Cm1[starts]) * b_pow[starts + L - 1]


def duplicate_spans(
    docs: "ray.data.Dataset",
    min_len: int = 30,
    n_partitions: int = 256,
    winnow: int = 1,
) -> "ray.data.Dataset":
    """Exact substring-duplicate SPANS per document: every maximal byte
    range covered by length-``min_len`` windows that occur >= 2 times
    anywhere in the corpus (within or across documents).

    Ray-Data-native shape (one bounded shuffle + one bounded per-doc
    merge, no suffix array, nothing on the driver):

    1. window stage (map_batches, zero-copy Arrow buffers): every
       ``min_len``-byte window becomes one row ``(pkey, win, doc_id,
       pos)`` — ``win`` is the raw window as fixed_size_binary and
       ``pkey`` hashes the window's 64-bit rolling hash onto
       ``n_partitions``, so all copies of a window land in ONE partition;
    2. duplicate scan (ONE map_groups task per partition): np.unique over
       the void-viewed window bytes — EXACT byte equality, immune to hash
       collisions — keeps positions whose window occurs >= 2 times;
    3. span merge (bounded per-doc-hash partitions): lexsort (doc, pos)
       and merge overlapping-or-touching ``[pos, pos+min_len)`` intervals
       with a vectorized running-max pass.

    Scale notes: at ``winnow=1`` (exact mode) the window shuffle ships
    ~``min_len`` bytes per corpus byte — linear, like the reference
    suffix array's 8·n machine words, and bounded-dispatch throughout.
    For >>10 TB corpora set ``winnow=w`` (winnowing, Schleimer et al.,
    SIGMOD 2003): only windows whose rolling hash is minimal within some
    run of ``w`` consecutive windows are shipped — expected volume drops
    ~w/2-fold (2/(w+1) of windows selected) and the selection is
    CONTENT-DEFINED, so both copies of a duplicated region select the
    same windows regardless of alignment (a naive position stride would
    sample mismatched windows and miss every unaligned duplicate).
    Guarantee: every duplicated substring of length >= min_len + w - 1
    is detected; verification stays exact byte equality (no false
    positives); reported span boundaries are conservative (contained in
    the exact spans, start up to w-1 bytes late / end up to w-1 bytes
    early). On corpora dominated by bare-minimum-length coincidental
    matches the winnowed span COUNT can exceed the exact count — exact
    spans fragment where uncoordinated selections drop interior windows
    — while every region >= min_len + w - 1 is still caught. Output:
    (doc_id, span_start, span_end, span_len) with span_end exclusive.
    """
    L = int(min_len)
    W = int(winnow)
    if not (1 <= W <= L):
        raise ValueError(f"winnow must be in [1, min_len], got {winnow}")

    def window_stage(batch: pa.Table) -> pa.Table:
        from .blocking import mix_to_partitions

        starts, doc_idx, pos, data = _window_rows(batch.column("text"), L)
        if len(starts) == 0:
            return pa.table(
                {
                    "pkey": pa.array([], pa.int32()),
                    "win": pa.array([], pa.binary(L)),
                    "doc_id": pa.array([], pa.int64()),
                    "pos": pa.array([], pa.int32()),
                }
            )
        h = _window_hashes(starts, data, L)
        if W > 1:
            # winnowing: keep a window iff its hash is the (leftmost)
            # minimum of some run of W consecutive windows OF THE SAME
            # DOC. sliding_window_view per doc run; ties resolve leftmost
            # in both copies of a duplicated region (equal hashes there
            # mean equal content, so the relative selection matches).
            keep_idx: list[np.ndarray] = []
            run_starts = np.flatnonzero(
                np.r_[True, doc_idx[1:] != doc_idx[:-1]]
            )
            run_ends = np.r_[run_starts[1:], len(doc_idx)]
            for rs, re_ in zip(run_starts, run_ends):
                m = re_ - rs
                if m <= W:
                    keep_idx.append(np.array([rs + int(np.argmin(h[rs:re_]))]))
                    continue
                sw = np.lib.stride_tricks.sliding_window_view(h[rs:re_], W)
                sel = np.unique(sw.argmin(axis=1) + np.arange(m - W + 1)) + rs
                keep_idx.append(sel)
            ki = np.concatenate(keep_idx)
            starts, doc_idx, pos, h = starts[ki], doc_idx[ki], pos[ki], h[ki]
        mat = data[starts[:, None] + np.arange(L)]
        win = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(L), len(starts), [None, pa.py_buffer(np.ascontiguousarray(mat).tobytes())]
        )
        ids = batch.column("doc_id").to_numpy()[doc_idx]
        return pa.table(
            {
                # int32 pkey/pos: positions are bounded by document length
                # and pkey by n_partitions — ~15% less shuffle volume
                "pkey": pa.array(
                    mix_to_partitions((h,), n_partitions).astype(np.int32)
                ),
                "win": win,
                "doc_id": pa.array(ids),
                "pos": pa.array(pos.astype(np.int32)),
            }
        )

    _EMPTY_HITS = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "s": pa.array([], pa.int32()),
            "e": pa.array([], pa.int32()),
        }
    )

    def _merge_intervals(doc: np.ndarray, s: np.ndarray, e: np.ndarray):
        """Merge overlapping-or-touching [s, e) intervals per doc —
        vectorized running-max over (doc, s)-sorted rows. The touch-merge
        relation is associative, so partial merges inside dup_scan and the
        global merge in merge_spans compose to the identical span set."""
        order = np.lexsort((s, doc))
        doc, s, e = doc[order], s[order], e[order]
        seg = np.concatenate(([0], np.cumsum(doc[1:] != doc[:-1])))
        OFF = np.int64(1) << np.int64(40)  # > any document length
        adj = s + seg * OFF
        adj_end = e + seg * OFF
        prev_max_end = np.concatenate(
            ([np.int64(-1)], np.maximum.accumulate(adj_end)[:-1])
        )
        first = np.flatnonzero(adj > prev_max_end)  # touching intervals merge
        return doc[first], s[first], np.maximum.reduceat(e, first)

    def dup_scan(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if n < 2:
            return _EMPTY_HITS
        win = group.column("win")
        if isinstance(win, pa.ChunkedArray):
            win = win.combine_chunks()
        raw = np.frombuffer(win.buffers()[1], dtype=np.uint8)
        mat = raw[win.offset * L : (win.offset + n) * L].reshape(n, L)
        rec = np.ascontiguousarray(mat).view(f"V{L}").reshape(n)
        _, inv, cnt = np.unique(rec, return_inverse=True, return_counts=True)
        keep = cnt[inv] >= 2
        if not keep.any():
            return _EMPTY_HITS
        # pre-merge this partition's hits into intervals before they
        # shuffle again: on duplicate-dense corpora contiguous windows
        # collapse ~L-fold (the second shuffle moves spans, not windows);
        # interval touch-merge is associative so the global result is
        # unchanged
        doc = group.column("doc_id").to_numpy()[keep]
        pos = group.column("pos").to_numpy()[keep]
        mdoc, ms, me = _merge_intervals(doc, pos, pos + L)
        return pa.table(
            {
                "doc_id": pa.array(mdoc),
                "s": pa.array(ms.astype(np.int32)),
                "e": pa.array(me.astype(np.int32)),
            }
        )

    def add_dockey(batch: pa.Table) -> pa.Table:
        from .blocking import mix_to_partitions

        if batch.num_rows == 0:
            return batch.append_column("dk", pa.array([], pa.int64()))
        return batch.append_column(
            "dk",
            pa.array(
                mix_to_partitions(
                    (batch.column("doc_id").to_numpy().astype(np.uint64),),
                    n_partitions,
                )
            ),
        )

    _EMPTY_SPANS = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "span_start": pa.array([], pa.int64()),
            "span_end": pa.array([], pa.int64()),
            "span_len": pa.array([], pa.int64()),
        }
    )

    def merge_spans(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if n == 0:
            return _EMPTY_SPANS
        doc, span_start, span_end = _merge_intervals(
            group.column("doc_id").to_numpy(),
            group.column("s").to_numpy().astype(np.int64),
            group.column("e").to_numpy().astype(np.int64),
        )
        return pa.table(
            {
                "doc_id": pa.array(doc),
                "span_start": pa.array(span_start),
                "span_end": pa.array(span_end),
                "span_len": pa.array(span_end - span_start),
            }
        )

    # pin between the window shuffle and the per-doc span shuffle — the
    # dk-sort would otherwise re-execute the whole window sort + dup scan
    # (see verify_jaccard_distributed's barrier note). The pinned rows are
    # the pre-merged duplicate intervals: O(duplicated windows), already
    # interval-compressed inside dup_scan.
    hits = (
        docs.select_columns(["doc_id", "text"])
        .map_batches(window_stage, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(dup_scan, batch_format="pyarrow")
        .map_batches(add_dockey, batch_format="pyarrow")
        .materialize()
    )
    return hits.groupby("dk").map_groups(merge_spans, batch_format="pyarrow")
