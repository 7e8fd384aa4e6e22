"""Dedup / MinHash / SimHash / ANN operator checks against exact oracles."""

import numpy as np
import pyarrow as pa
import pytest


def _docs_ds(texts):
    import ray.data

    return ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    )


def test_exact_dedup(ray_session):
    from geojson_vt_ray.ray_pipeline.text import exact_dedup_groups

    texts = ["a b c", "d e f", "a b c", "g h i", "a b c"]
    out = exact_dedup_groups(_docs_ds(texts)).to_pandas()
    assert len(out) == 3
    trip = out[out["n_dups"] == 3]
    assert len(trip) == 1
    assert int(trip["keep_doc_id"].iloc[0]) == 0


def test_minhash_finds_near_duplicates(ray_session):
    from geojson_vt_ray.ray_pipeline.text import (
        _token_shingles,
        minhash_candidate_pairs,
        verify_jaccard,
    )

    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    near = base.replace("lazy", "sleepy")  # high Jaccard
    texts = [base, near] + [
        f"totally different document number {i} with words w{i} x{i} y{i} z{i} "
        f"alpha{i} beta{i} gamma{i} delta{i} epsilon{i} zeta{i}"
        for i in range(20)
    ]
    docs = _docs_ds(texts)
    pairs = [(int(r["doc_a"]), int(r["doc_b"])) for r in minhash_candidate_pairs(docs).iter_rows()]
    assert (0, 1) in pairs

    verified = verify_jaccard(docs, pairs, threshold=0.5)
    assert any(a == 0 and b == 1 for a, b, _ in verified)
    # exact jaccard agrees
    sa = _token_shingles(base, 3)
    sb = _token_shingles(near, 3)
    j = len(sa & sb) / len(sa | sb)
    got = [jv for a, b, jv in verified if (a, b) == (0, 1)][0]
    assert got == pytest.approx(j)


def test_simhash_near_duplicates_close(ray_session):
    from geojson_vt_ray.ray_pipeline.text import simhash_signatures

    base = "one two three four five six seven eight nine ten " * 10
    near = base.replace("five", "5")
    far = "completely unrelated content about other topics entirely " * 10
    out = {r["doc_id"]: r["simhash"] for r in simhash_signatures(_docs_ds([base, near, far])).iter_rows()}

    def hamming(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert hamming(out[0], out[1]) < hamming(out[0], out[2])
    assert hamming(out[0], out[1]) <= 16


def test_simhash_banded_pairs_equal_all_pairs(ray_session):
    """Pigeonhole banding is EXACT for Hamming <= max_hamming: the banded
    distributed pair finder must return the identical pair set (with the
    identical distances) as a brute-force all-pairs popcount scan."""
    from geojson_vt_ray.ray_pipeline.text import (
        simhash_near_dup_pairs,
        simhash_signatures,
    )

    rs = np.random.RandomState(11)
    words = [f"w{i}" for i in range(60)]
    texts = []
    for i in range(30):
        base = " ".join(rs.choice(words, 200))
        texts.append(base)
        if i % 5 == 0:  # exact duplicate -> hamming 0
            texts.append(base)
        if i % 5 == 1:  # tiny edit on a long doc -> small hamming
            texts.append(base + " zzz")
    docs = _docs_ds(texts)
    max_h = 3

    sigs = {r["doc_id"]: r["simhash"] & ((1 << 64) - 1)
            for r in simhash_signatures(docs).iter_rows()}
    expected = set()
    ids = sorted(sigs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            h = bin(sigs[a] ^ sigs[b]).count("1")
            if h <= max_h:
                expected.add((a, b, h))

    got = {
        (int(r["doc_a"]), int(r["doc_b"]), int(r["hamming"]))
        for r in simhash_near_dup_pairs(docs, max_hamming=max_h).iter_rows()
    }
    assert expected, "corpus must contain at least one near-dup pair"
    assert got == expected


def test_ann_lsh_recall_vs_bruteforce(ray_session):
    import ray.data

    from geojson_vt_ray.ray_pipeline.ann import brute_force_topk, lsh_topk

    rs = np.random.RandomState(7)
    n, d, k = 400, 16, 5
    vecs = rs.standard_normal((n, d))
    table = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float32())),
        }
    )
    ds = ray.data.from_arrow(table)
    qids = np.arange(0, n, 57)
    qvecs = vecs[qids]

    exact = brute_force_topk(ds, qvecs, qids, k, inorder=False).to_pandas()
    approx = lsh_topk(ds, qvecs, qids, k, n_planes=4).to_pandas()

    recalls = []
    for q in qids:
        e = set(exact[exact["query_id"] == q]["neighbor_id"])
        a = set(approx[approx["query_id"] == q]["neighbor_id"])
        if e:
            recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.4  # 4-plane LSH scans ~1/16 of the data


def test_ngram_jaccard_exact_and_minhash_recall(ray_session):
    """Exact all-pairs Jaccard agrees with set arithmetic; MinHash-LSH
    recovers the high-similarity pairs it is an approximation of."""
    from geojson_vt_ray.ray_pipeline.text import (
        _token_shingles,
        minhash_candidate_pairs,
        ngram_jaccard_pairs,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 6
    near = base.replace("delta", "delta4")
    texts = [base, near] + [
        f"unrelated doc {i} " + " ".join(f"w{i}_{j}" for j in range(30)) for i in range(12)
    ]
    docs = _docs_ds(texts)

    exact = {(r["doc_a"], r["doc_b"]): r["jaccard"]
             for r in ngram_jaccard_pairs(docs, threshold=0.3).iter_rows()}
    assert (0, 1) in exact
    sa = _token_shingles(base, 3)
    sb = _token_shingles(near, 3)
    assert exact[(0, 1)] == len(sa & sb) / len(sa | sb)

    lsh = {(int(r["doc_a"]), int(r["doc_b"]))
           for r in minhash_candidate_pairs(docs).iter_rows()}
    high = {p for p, j in exact.items() if j >= 0.6}
    assert high <= lsh  # LSH must recover all strongly-similar pairs here


def test_ngram_jaccard_monster_posting_blocking(ray_session):
    """Triangle blocking of over-cap posting lists: identical (pair,
    jaccard) rows as the unblocked path on a corpus where one shingle
    (a shared stopword run) appears in EVERY document."""
    import pyarrow as pa
    import ray

    from geojson_vt_ray.ray_pipeline.text import ngram_jaccard_pairs

    n = 40
    # common prefix => one hot posting list containing all n docs;
    # i%4 groups are exact duplicates => high-Jaccard pairs
    texts = [f"the quick brown fox jumps over lazy dog {i % 4}" for i in range(n)]
    docs_tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts),
        }
    )

    def run(cap):
        ds = ray.data.from_arrow(docs_tbl)
        out = ngram_jaccard_pairs(ds, threshold=0.3, posting_cap=cap).to_pandas()
        return set(map(tuple, out[["doc_a", "doc_b", "jaccard"]].itertuples(index=False)))

    naive = run(cap=10**9)
    blocked = run(cap=6)  # forces ceil(40/6)=7 chunks on the hot postings
    assert naive == blocked
    # the 4 exact-duplicate groups are fully paired at J=1.0
    full = {(a, b) for a, b, j in naive if j == 1.0}
    assert len(full) == 4 * (n // 4) * (n // 4 - 1) // 2


def test_embedding_near_dup_pairs(ray_session):
    import ray.data

    from geojson_vt_ray.ray_pipeline.ann import embedding_near_dup_pairs

    rs = np.random.RandomState(3)
    base = rs.standard_normal(16)
    vecs = [base, base + rs.standard_normal(16) * 0.05] + [
        rs.standard_normal(16) for _ in range(30)
    ]
    table = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs], pa.list_(pa.float32())),
        }
    )
    out = embedding_near_dup_pairs(ray.data.from_arrow(table), threshold=0.9).to_pandas()
    assert {(0, 1)} == set(zip(out["vec_a"], out["vec_b"]))
    assert (out["cos_sim"] >= 0.9).all()


def test_bpe_token_counts(ray_session):
    from geojson_vt_ray.ray_pipeline.text import bpe_token_counts

    out = {r["doc_id"]: (r["n_bpe_tokens"], r["n_word_tokens"])
           for r in bpe_token_counts(_docs_ds(["hello, world 1234!", "a b"])).iter_rows()}
    # hello | , | world | 123 | 4 | !  -> 6 non-space tokens, 2 word tokens
    assert out[0] == (6, 2)
    assert out[1] == (2, 2)


def test_fingerprint_order_sensitivity(ray_session):
    from geojson_vt_ray.ray_pipeline.text import fingerprints

    out = {r["doc_id"]: r["fingerprint"]
           for r in fingerprints(_docs_ds(["a b c", "c b a", "a b c"])).iter_rows()}
    assert out[0] == out[2]
    assert out[0] != out[1]


def test_top_tokens_matches_local_counter(ray_session):
    """Distributed heavy-hitter wordcount equals a local Counter, with
    deterministic (count desc, token asc) boundary ties."""
    from collections import Counter

    import pyarrow as pa
    import ray

    from geojson_vt_ray.ray_pipeline.text import top_tokens

    texts = [
        "a b b c c c dd dd dd dd",
        "a a e  e",  # double space -> empty token, counted like SQL's split
        "c dd a b e zz",
    ]
    ds = ray.data.from_arrow(pa.table({"text": pa.array(texts)}))
    got = top_tokens(ds, k=4).to_pandas()
    cnt = Counter()
    for t in texts:
        cnt.update(t.split(" "))
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:4]
    assert list(map(tuple, got[["token", "n"]].itertuples(index=False))) == want


def test_simhash_pairs_monster_bucket_blocking(ray_session):
    """Triangle blocking of over-cap band buckets returns exactly the
    same pair set as the unblocked path — on a degenerate corpus where
    every document collides into one bucket per band."""
    import pyarrow as pa
    import ray

    from geojson_vt_ray.ray_pipeline.text import simhash_near_dup_pairs

    n = 60
    # 3 exact-duplicate groups -> giant buckets in every band
    texts = [f"alpha beta gamma delta epsilon {i % 3}" for i in range(n)]
    docs_tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts),
        }
    )

    def run(cap):
        ds = ray.data.from_arrow(docs_tbl)
        out = simhash_near_dup_pairs(ds, max_hamming=3, bucket_cap=cap).to_pandas()
        return set(
            map(tuple, out[["doc_a", "doc_b", "hamming"]].itertuples(index=False))
        )

    naive = run(cap=10**9)  # cap never reached -> single-block path
    blocked = run(cap=8)  # forces ceil(20/8)+ chunks per bucket
    assert naive == blocked
    assert len(naive) >= 3 * (n // 3) * (n // 3 - 1) // 2  # within-group pairs


def test_minhash_candidates_monster_bucket_blocking(ray_session):
    """Triangle blocking of over-cap LSH buckets: identical (pair,
    n_bands) rows as the unblocked path on a corpus of exact-duplicate
    groups (every band bucket collides)."""
    import pyarrow as pa
    import ray

    from geojson_vt_ray.ray_pipeline.text import minhash_candidate_pairs

    n = 48
    texts = [f"one two three four five six seven {i % 2}" for i in range(n)]
    docs_tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts),
        }
    )

    def run(cap):
        ds = ray.data.from_arrow(docs_tbl)
        out = minhash_candidate_pairs(ds, bucket_cap=cap).to_pandas()
        return set(map(tuple, out[["doc_a", "doc_b", "n_bands"]].itertuples(index=False)))

    naive = run(cap=10**9)
    blocked = run(cap=7)
    assert naive == blocked
    # exact duplicates collide in ALL 16 bands; the two dup groups are
    # fully paired (cross-group pairs also appear, at fewer bands)
    full = {(a, b) for a, b, nb in naive if nb == 16}
    assert len(full) == 2 * (n // 2) * (n // 2 - 1) // 2


def test_normalize_docs(ray_session):
    """Lowercase + whitespace collapse + trim, with python-reference
    equality (including tabs/newlines and multi-space runs)."""
    import pyarrow as pa
    import ray
    import re

    from geojson_vt_ray.ray_pipeline.text import normalize_docs

    # includes unicode-whitespace edges (NBSP, ideographic space, NEL, VT)
    # that RE2's \s does NOT match and the explicit ' ' trim must KEEP —
    # the exact set where Arrow/DuckDB builtin trims disagree
    texts = [
        "  Hello   WORLD ",
        "a\t\tb\nc",
        "already clean",
        "",
        "MiXeD   CaSe\r\n",
        "abc ",
        "x　y",
        "q\x85",
        "v\x0b",
    ]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)})
    )
    got = normalize_docs(ds).to_pandas().sort_values("doc_id")
    # RE2's \s is the ASCII class [\t\n\f\r ] (python's \s is unicode-
    # aware), and the trim strips only explicit ' '
    want = [re.sub(r"[ \t\n\r\f]+", " ", t.lower()).strip(" ") for t in texts]
    assert got["norm_text"].tolist() == want
    assert got["norm_chars"].tolist() == [len(w) for w in want]


def test_verify_jaccard_distributed_matches_driver(ray_session):
    """The no-driver verification pipeline returns the same verified
    (pair, jaccard) rows as the broadcast/driver-side verify_jaccard."""
    import ray

    from geojson_vt_ray.ray_pipeline.text import (
        minhash_candidate_pairs,
        verify_jaccard,
        verify_jaccard_distributed,
    )

    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    near = base.replace("lazy", "sleepy")
    mid = base.replace("again and again", "sometimes perhaps maybe")
    texts = [base, near, mid] + [
        f"totally different document number {i} with words w{i} x{i} y{i} z{i} "
        f"alpha{i} beta{i} gamma{i} delta{i} epsilon{i} zeta{i}"
        for i in range(20)
    ]
    docs = _docs_ds(texts)
    cands = minhash_candidate_pairs(docs).materialize()
    pair_list = [(int(r["doc_a"]), int(r["doc_b"])) for r in cands.iter_rows()]
    assert (0, 1) in pair_list

    want = {
        (a, b): j for a, b, j in verify_jaccard(docs, pair_list, threshold=0.5)
    }
    got_df = verify_jaccard_distributed(docs, cands, threshold=0.5).to_pandas()
    got = {(int(r.doc_a), int(r.doc_b)): r.jaccard for r in got_df.itertuples()}
    assert set(got) == set(want)
    for k, j in want.items():
        assert got[k] == pytest.approx(j, rel=1e-12)

    # duplicate candidate rows collapse to one verified row per pair, and
    # pairs referencing doc ids absent from the docs table are dropped
    import pyarrow as _pa

    ghost = ray.data.from_arrow(
        _pa.table(
            {"doc_a": _pa.array([10**6], _pa.int64()),
             "doc_b": _pa.array([10**6 + 1], _pa.int64())}
        )
    )
    noisy = cands.select_columns(["doc_a", "doc_b"]).union(
        cands.select_columns(["doc_a", "doc_b"]), ghost
    )
    got2_df = verify_jaccard_distributed(docs, noisy, threshold=0.5).to_pandas()
    got2 = {(int(r.doc_a), int(r.doc_b)): r.jaccard for r in got2_df.itertuples()}
    assert got2 == got


def test_embedding_dedup_clusters(ray_session):
    """Cosine near-dup components label every vector; duplicate groups share
    the min vec_id and singletons keep themselves."""
    import ray.data

    from geojson_vt_ray.ray_pipeline.ann import embedding_dedup_clusters

    rs = np.random.RandomState(5)
    a = rs.standard_normal(8)
    b = rs.standard_normal(8)
    vecs = [a, a * 2.0, a + 1e-4 * rs.standard_normal(8),  # cluster of 3 (0,1,2)
            b, -b]                                          # 3 singleton-ish (cos(b,-b)=-1)
    vecs += [rs.standard_normal(8) for _ in range(10)]
    table = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs], pa.list_(pa.float32())),
        }
    )
    out = embedding_dedup_clusters(
        ray.data.from_arrow(table), threshold=0.95
    ).to_pandas().set_index("vec_id").sort_index()
    assert len(out) == len(vecs)  # every vector labeled
    assert out.loc[0, "cluster_id"] == out.loc[1, "cluster_id"] == out.loc[2, "cluster_id"] == 0
    assert out.loc[0, "cluster_size"] == 3
    assert out.loc[4, "cluster_id"] == 4 and out.loc[4, "cluster_size"] == 1
    # keep-one filter keeps exactly one exemplar per cluster
    keep = out[out.index == out.cluster_id]
    assert len(keep) == out.cluster_id.nunique()


def test_minhash_mersenne_fold_equals_modulo():
    """The cache-blocked Mersenne fold in MinHasher.signatures must be
    bit-identical to the plain (a*h+b) % (2^31-1) formula the SQL oracle
    evaluates."""
    from geojson_vt_ray.ray_pipeline.text import MERSENNE31, MinHasher

    mh = MinHasher()
    rs = np.random.RandomState(123)
    words = [f"tok{i}" for i in range(300)]
    texts = [" ".join(rs.choice(words, rs.randint(1, 120))) for _ in range(200)]
    texts += ["a", "a b", ""]  # shorter-than-k edge cases
    got = mh.signatures(texts)

    M = np.uint64(MERSENNE31)
    sh_list = [mh.hasher.shingles(t) for t in texts]
    lens = np.array([len(s) for s in sh_list], dtype=np.int64)
    offsets = np.concatenate(([0], np.cumsum(lens)[:-1]))
    h31 = np.concatenate(sh_list) % M
    want = np.minimum.reduceat(
        (mh.a[:, None] * h31[None, :] + mh.b[:, None]) % M, offsets, axis=1
    )
    assert np.array_equal(got, want)


def test_token_hasher_cache_cap_is_transparent():
    """The bounded vocabulary cache is an optimization only: a hasher whose
    cache clears constantly must produce identical shingles to an uncapped
    one, and the cache must never exceed its cap by more than one batch."""
    from geojson_vt_ray.ray_pipeline.text import TokenHasher

    capped = TokenHasher(3, cache_cap=5)
    uncapped = TokenHasher(3)
    rs = np.random.RandomState(7)
    texts = [
        " ".join(f"w{rs.randint(0, 40)}" for _ in range(rs.randint(1, 20)))
        for _ in range(50)
    ]
    for t in texts:
        assert np.array_equal(capped.shingles(t), uncapped.shingles(t))
    # the cap bounds growth: after a clear the cache holds at most the
    # tokens of the texts hashed since
    assert len(capped._cache) <= 5 + 20


def test_phash_near_dup_pairs_bruteforce_and_blocking(ray_session):
    """Image phash Hamming dedup (generic banding core over the
    input_hint phash column): equals the numpy all-pairs scan exactly,
    and triangle-blocking over-cap buckets leaves the pair set
    unchanged on a degenerate corpus of near-identical hashes."""
    import pyarrow as pa
    import ray

    from geojson_vt_ray.ray_pipeline.images import phash_near_dup_pairs
    from geojson_vt_ray.ray_pipeline.text import _popcount64

    rng = np.random.RandomState(7)
    n, k = 80, 4
    base = rng.randint(0, 1 << 62, size=n // 4, dtype=np.int64)
    # each base spawns 4 variants within Hamming<=2 of it (so siblings are
    # within <=4 of each other) -> dense pairs AND giant band buckets
    ph = np.repeat(base, 4)
    flips = rng.randint(0, 62, size=(n, 2)).astype(np.uint64)
    masks = np.zeros(n, dtype=np.uint64)
    for j in range(2):
        masks |= np.uint64(1) << flips[:, j]
    ph = (ph.astype(np.uint64) ^ masks).astype(np.int64)
    ids = [f"img-{i:04d}" for i in range(n)]
    tbl = pa.table({"image_id": pa.array(ids, pa.string()), "phash": pa.array(ph)})

    # numpy brute-force truth
    ii, jj = np.triu_indices(n, k=1)
    ham = _popcount64(
        np.bitwise_xor(ph.astype(np.uint64)[ii], ph.astype(np.uint64)[jj])
    ).astype(np.int64)
    keep = ham <= k
    truth = {
        (ids[a], ids[b], int(h)) for a, b, h in zip(ii[keep], jj[keep], ham[keep])
    }
    assert len(truth) >= n // 4 * 6  # every 4-variant family is mutually close

    def run(cap):
        out = phash_near_dup_pairs(
            ray.data.from_arrow(tbl), max_hamming=k, bucket_cap=cap
        ).to_pandas()
        return set(
            map(tuple, out[["image_a", "image_b", "hamming"]].itertuples(index=False))
        )

    assert run(cap=10**9) == truth
    assert run(cap=7) == truth  # forced triangle-blocking, same pairs


def test_distinct_shingle_lists_matches_per_doc_shingles():
    """The whole-batch vectorized distinct shingling (the verify join side /
    ngram postings / SimHash hot path) is bit-identical — values AND order —
    to the per-doc `shingles()` reference across shingle sizes and text
    shapes (short docs, repeats, empty strings, duplicate shingles)."""
    from geojson_vt_ray.ray_pipeline.text import TokenHasher

    texts = [
        "a b c d e",
        "a a a",
        "x",
        "",
        "one two",
        "b a c a b c d",
        "tok1 tok2 tok3 tok1 tok2 tok3",
        "z " * 50 + "q",
    ]
    for k in (1, 2, 3, 5):
        batch = TokenHasher(k)
        flat, lens = batch.distinct_shingle_lists(pa.array(texts, pa.string()))
        offs = np.concatenate(([0], np.cumsum(lens)))
        ref = TokenHasher(k)
        for i, t in enumerate(texts):
            want = ref.shingles(t)
            got = flat[offs[i] : offs[i + 1]]
            assert np.array_equal(want, got), (k, i)
